"""Independent single-node BM25 oracle (pure Python/pandas).

Defines "reference output" for rank-identity tests (SURVEY §5.2.3): same
Lucene formula + SmallFloat norm quantization, implemented separately from
the distributed engine (no Spark, no shared scoring code path — it only
reuses the analyzer pure functions, which ARE the semantics under test via
their own golden tests, and the SmallFloat table which is checked by its
own unit tests).
"""

from __future__ import annotations

import math
from collections import Counter

from solr_sematic_importer_spark.functions.analyzer import PROFILES
from solr_sematic_importer_spark.functions.similarity import byte4_to_int, int_to_byte4


class OracleIndex:
    def __init__(self, docs: list[tuple], text_idx: int, profile: str):
        """docs: list of tuples sorted by key; doc_id = position."""
        analyze = PROFILES[profile]
        self.profile = profile
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, row in enumerate(docs):
            toks = analyze(row[text_idx])
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            for t in c:
                self.df[t] += 1
        self.n = len(docs)
        self.sum_dl = sum(self.dl.values())
        self.avgdl = self.sum_dl / self.n if self.n else 0.0

    def query(self, q: str, k: int = 10, k1: float = 1.2, b: float = 0.75,
              quantize: bool = True) -> list[tuple[int, float]]:
        terms = PROFILES[self.profile](q)
        scores: dict[int, list] = {}
        # fixed accumulation order: sorted unique terms, multiplicity as weight
        for t, mult in sorted(Counter(terms).items()):
            if self.df[t] == 0:
                continue
            w = mult * math.log(1.0 + (self.n - self.df[t] + 0.5) / (self.df[t] + 0.5))
            for doc_id, c in self.tf.items():
                tf = c.get(t)
                if not tf:
                    continue
                dl = self.dl[doc_id]
                if quantize:
                    dl = byte4_to_int(int_to_byte4(dl))
                norm = k1 * (1 - b + b * dl / self.avgdl)
                scores.setdefault(doc_id, []).append(w * tf / (tf + norm))
        agg = {d: _ordered_sum(parts) for d, parts in scores.items()}
        ranked = sorted(agg.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]


def _ordered_sum(parts: list[float]) -> float:
    acc = 0.0
    for p in parts:
        acc += p
    return acc
