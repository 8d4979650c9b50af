"""Query-time synonym expansion (Solr ``synonymGraph``).

The reference's ``text_general`` QUERY chain applies
``SynonymGraphFilter(synonyms.txt, expand=true)`` between the stop and
lowercase filters (``semantic_base_config.zip -> managed-schema.xml:311``).
The shipped file contains single-token rules only; multi-token LHS rules
("sea biscuit => seabiscuit") are additionally supported via greedy
longest-match span collapsing in ``expand_terms``. Multi-word RHS members
are flattened to individual SynonymQuery members — a documented
divergence from graph phrase-path scoring, which would require positional
postings.

Scoring follows Lucene's ``SynonymQuery`` (what Solr's query parser builds
for single-token synonym expansions): all terms of a group score as ONE
pseudo-term with ``df = max(df_member)`` and per-doc ``tf = sum(tf_member)``
— not a disjunction of independently-weighted terms.
"""

from __future__ import annotations

# The shipped configset's synonyms.txt rules verbatim (comments stripped):
# ``semantic_base_config.zip -> synonyms.txt`` — the stock Apache Solr
# example file (ASF-licensed sample data). All rules are single-token.
DEFAULT_SYNONYMS_TXT = """\
aaafoo => aaabar
bbbfoo => bbbfoo bbbbar
cccfoo => cccbar cccbaz
fooaaa,baraaa,bazaaa
GB,gib,gigabyte,gigabytes
MB,mib,megabyte,megabytes
Television, Televisions, TV, TVs
pixima => pixma
"""

_DEFAULT_RULES: dict[str, list[str]] | None = None


def default_synonyms() -> dict[str, list[str]]:
    """Parsed rules of the shipped config zip, ignoreCase=true per the
    query chain (``managed-schema.xml:311`` synonymGraph ignoreCase
    expand)."""
    global _DEFAULT_RULES
    if _DEFAULT_RULES is None:
        _DEFAULT_RULES = parse_synonyms(DEFAULT_SYNONYMS_TXT, ignore_case=True)
    return _DEFAULT_RULES


def parse_synonyms(text: str, ignore_case: bool = True) -> dict[str, list[str]]:
    """Parse Solr synonyms.txt -> {token: [expansion tokens]}.

    * ``a,b,c``      equivalence group; with expand=true each member maps
                     to the whole group.
    * ``a, b => x y`` explicit mapping: each LHS token maps to the RHS
                     list (LHS itself NOT included unless listed on RHS).
    """
    rules: dict[str, list[str]] = {}

    def norm(t: str) -> str:
        t = t.strip()
        return t.lower() if ignore_case else t

    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            rhs_toks = [norm(t) for t in rhs.split(",") for t in t.split()]
            rhs_toks = [t for t in rhs_toks if t]
            for src in (norm(t) for t in lhs.split(",")):
                if src:
                    rules.setdefault(src, [])
                    for t in rhs_toks:
                        if t not in rules[src]:
                            rules[src].append(t)
        else:
            group = [norm(t) for t in line.split(",")]
            group = [t for t in group if t]
            for src in group:
                rules.setdefault(src, [])
                for t in group:
                    if t not in rules[src]:
                        rules[src].append(t)
    return rules


def expand_terms(
    terms: list[str], rules: dict[str, list[str]]
) -> list[list[str]]:
    """Analyzed query tokens -> one synonym GROUP (list of terms) per
    matched position. Tokens without a rule stay singleton.

    Multi-token LHS rules ("sea biscuit => seabiscuit") are matched by
    GREEDY LONGEST-MATCH over the token sequence — the span collapses to
    one group, the synonymGraph side-path semantics. Multi-word RHS
    members are flattened to their individual tokens as group members
    (documented divergence: true graph queries score multi-word outputs
    as phrase paths, which requires positional postings; with the flat
    index each output token becomes a SynonymQuery member instead)."""
    lhs_map = {tuple(k.split()): v for k, v in rules.items()}
    max_len = max((len(k) for k in lhs_map), default=1)
    out: list[list[str]] = []
    i = 0
    while i < len(terms):
        hit = None
        for span_len in range(min(max_len, len(terms) - i), 0, -1):
            members = lhs_map.get(tuple(terms[i : i + span_len]))
            if members is not None:
                hit = (span_len, members)
                break
        if hit is None:
            out.append([terms[i]])
            i += 1
            continue
        span_len, members = hit
        flat: list[str] = []
        for m in members:
            for tok in m.split():
                if tok not in flat:
                    flat.append(tok)
        out.append(flat or list(terms[i : i + span_len]))
        i += span_len
    return out
