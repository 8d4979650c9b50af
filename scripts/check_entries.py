#!/usr/bin/env python
"""Local replica of the driver's correctness gate over ALL entries.

The driver's per-round CORRECTNESS window covers only the first 50
oracle-gated ``queries()`` entries, so entry ORDER decides what gets the
hard external check each round. This script runs the SAME comparison
(row count + column names + order-insensitive value hash vs the DuckDB
oracle at sf=0.01) over EVERY oracle entry — regardless of order — plus a
rows-only smoke for the non-SQL-expressible entries, and writes
``CORRECTNESS_LOCAL.json`` next to the repo root as committed evidence
that a rotation never silently dropped coverage (VERDICT r3 next-round
#7). Run via ``make check-entries``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from solr_sematic_importer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
    spark = get_spark("check-entries", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracles = entrymod.oracle_sql()
    all_queries = entrymod.queries()
    report: dict = {}
    failed = []
    t0 = time.time()
    for name, fn in all_queries.items():
        row: dict = {"err": None}
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = list(sdf.columns)
            spark_rows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                row.update(
                    rows_match=len(spark_rows) == len(duck_rows),
                    schema_match=sorted(spark_cols) == sorted(duck_cols),
                    hash_match=_normalize(spark_rows, spark_cols)
                    == _normalize(duck_rows, duck_cols),
                    spark_rows=len(spark_rows),
                    oracle_rows=len(duck_rows),
                )
                ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
            else:
                row.update(rows_only=True, spark_rows=len(spark_rows))
                ok = True
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            row["err"] = f"{type(e).__name__}: {e}"[:500]
            ok = False
        report[name] = row
        if not ok:
            failed.append(name)
        print(f"  {'OK ' if ok else 'FAIL'} {name}", flush=True)

    out_path = os.path.join(REPO, "CORRECTNESS_LOCAL.json")
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "wall_s": round(time.time() - t0, 1),
                "n_entries": len(report),
                "n_oracle": sum(1 for r in report.values() if "hash_match" in r),
                "failed": failed,
                "entries": report,
            },
            f,
            indent=1,
        )
    print(f"\n{len(report) - len(failed)}/{len(report)} green -> {out_path}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
