"""Pure-Python, single-threaded reference-semantics oracle.

Recomputes — with plain row loops and a literal union-find, the way the
reference does it (``InsertDataRDB.java:70-102``,
``AAExpansion/source/util/UnionFind.py:30-71``) — the exact triple set /
canonical groups the Spark pipeline must reproduce. Triple P/R vs this
oracle is the BASELINE.json correctness gate; both sides are deterministic
so the tests assert P = R = 1.0.

NOT copied from the reference: written from the documented semantics in
SURVEY.md (§1.3 URI scheme, §2.2 F1 null set, §2.10 G1/G2/G7).
"""

from __future__ import annotations

from knowledgegraphs_spark.config import BASE_PREFIX, RDF_TYPE, NULL_SENTINELS
from knowledgegraphs_spark.functions.similarity import is_near_duplicate

_NULLS = {s.strip() for s in NULL_SENTINELS}


def _nullish(v) -> bool:
    return v is None or str(v).strip().lower() in _NULLS


def _lit_ts(ts) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%S")


def expected_structural_triples(rows: list[tuple]) -> set[tuple[str, str, str]]:
    """(subj, pred, obj) set for transcript rows
    (conv_id, turn_idx, role, text, tool, ts)."""
    triples: set[tuple[str, str, str]] = set()
    attr_dtypes = {"role": "xsd:string", "text": "xsd:string", "tool": "xsd:string", "ts": "xsd:dateTime"}
    for conv_id, turn_idx, role, text, tool, ts in rows:
        conv = f"{BASE_PREFIX}Conversation_1_{conv_id}"
        turn = f"{BASE_PREFIX}Turn_2_{conv_id}_{turn_idx}"
        triples.add((conv, RDF_TYPE, f"{BASE_PREFIX}Conversation"))
        triples.add((turn, RDF_TYPE, f"{BASE_PREFIX}Turn"))
        triples.add((turn, "p_Turn_Conversation", conv))
        triples.add((conv, "p_Conversation_Turn", turn))
        for col, val in (("role", role), ("text", text), ("tool", tool), ("ts", ts)):
            if _nullish(val):
                continue
            attr = f"{BASE_PREFIX}{col}_ATTR_2_{conv_id}_{turn_idx}"
            lit = _lit_ts(val) if col == "ts" else str(val)
            triples.add((turn, f"has_{col}", attr))
            triples.add((attr, RDF_TYPE, f"{BASE_PREFIX}{col}_ATTR"))
            triples.add((attr, f"has_{col}_VALUE", lit))
    return triples


class UnionFind:
    """Literal quick-union with path recursion, as the reference documents."""

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb

    def groups(self) -> dict[str, set[str]]:
        out: dict[str, set[str]] = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), set()).add(x)
        return out


def canonical_pick(group: set[str]) -> str:
    """Reference pick (``NearDuplicates.py:91-102``): min token-concat
    length, then most whitespace in the noPunct form; returns the noPunct
    form. Written as a literal loop over the reference's update rule."""
    import math

    from knowledgegraphs_spark.functions.similarity import nd_process

    min_len, max_white, min_annot = math.inf, -1, None
    for s in sorted(group):
        annot, _toks, concat = nd_process(s)
        n_white = len(annot) - len(concat)
        c_len = len(concat)
        if c_len < min_len or (c_len == min_len and n_white > max_white):
            min_len, max_white, min_annot = c_len, n_white, annot
    return min_annot


def expected_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """node → canonical representative."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    mapping: dict[str, str] = {}
    for _root, members in uf.groups().items():
        canon = canonical_pick(members)
        for m in members:
            mapping[m] = canon
    return mapping


def expected_near_dup_groups(surfaces: list[str]) -> dict[str, str]:
    """O(n²) pairwise near-duplicate grouping, as the reference does
    (``NearDuplicates.py:70-78``)."""
    edges = [
        (a, b)
        for i, a in enumerate(surfaces)
        for b in surfaces[i + 1 :]
        if is_near_duplicate(a, b, strict=False)
    ]
    mapping = expected_components(edges)
    for s in surfaces:
        # singleton groups also canonicalize to their noPunct form —
        # groupNearDuplicates stores processed[idx][0] for every set
        mapping.setdefault(s, canonical_pick({s}))
    return mapping


def expected_full_triples(rows: list[tuple]) -> set[tuple[str, str, str]]:
    """Structural + mention/entity triples, with O(n²) near-dup grouping —
    the complete reference-semantics output for a transcript corpus."""
    from knowledgegraphs_spark.functions.naming import valid_name
    from knowledgegraphs_spark.operators.mentions import extract_mentions_python

    triples = set(expected_structural_triples(rows))
    mentions: list[tuple[str, int, str, str, int]] = []
    surfaces: set[str] = set()
    for conv_id, turn_idx, _role, text, _tool, _ts in rows:
        if _nullish(text):
            continue
        for m, kind, pos in extract_mentions_python(text):
            mentions.append((conv_id, turn_idx, m, kind, pos))
            surfaces.add(m)
    canon = expected_near_dup_groups(sorted(surfaces))
    for conv_id, turn_idx, m, kind, pos in mentions:
        turn = f"{BASE_PREFIX}Turn_2_{conv_id}_{turn_idx}"
        muri = f"{BASE_PREFIX}Mention_3_{conv_id}_{turn_idx}_{kind}_{pos}"
        euri = f"{BASE_PREFIX}Entity_{valid_name(canon[m])}"
        triples.add((turn, "has_mention", muri))
        triples.add((muri, RDF_TYPE, f"{BASE_PREFIX}Mention"))
        triples.add((muri, "has_surface_VALUE", m))
        triples.add((muri, "p_Mention_Entity", euri))
        triples.add((euri, RDF_TYPE, f"{BASE_PREFIX}Entity"))
        triples.add((euri, "has_label_VALUE", canon[m]))
    return triples


def triple_precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got or not expected:
        return (0.0, 0.0)
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)
