"""Matching stage: blocking coverage, BES/PJ selection, and end-to-end
canonical groups vs the O(n²) near-duplicate oracle."""

from pyspark.sql import functions as F

from knowledgegraphs_spark.config import MatchConfig
from knowledgegraphs_spark.operators.canonicalize import canonical_mapping
from knowledgegraphs_spark.operators.matching import (
    blocking_pairs,
    near_duplicate_edges,
    rank_candidates,
    score_pairs,
    select_matches,
)
from knowledgegraphs_spark.sources.transcripts import PERSON_FORMS

from tests.oracle_kg import expected_near_dup_groups


SURFACES = sorted({s for grp in PERSON_FORMS for s in grp} | {"CAD", "acct_no", "search_web", "Unrelated Thing"})


def _sdf(spark):
    return spark.createDataFrame([(s,) for s in SURFACES], "mention string")


def test_blocking_covers_oracle_near_dup_pairs(spark):
    """Every pair the O(n²) oracle would group must survive blocking —
    otherwise recall is lost silently at scale."""
    from knowledgegraphs_spark.functions.similarity import is_near_duplicate

    oracle_pairs = {
        tuple(sorted((a, b)))
        for i, a in enumerate(SURFACES)
        for b in SURFACES[i + 1 :]
        if is_near_duplicate(a, b, strict=False)
    }
    got_pairs = {
        tuple(sorted((r.src, r.tgt)))
        for r in blocking_pairs(_sdf(spark)).collect()
    }
    missing = oracle_pairs - got_pairs
    assert not missing, f"blocking lost near-dup pairs: {missing}"


def test_match_edge_paths_agree(spark):
    """Driver (in-memory) and distributed match-edge computation must emit
    the same edge set."""
    from knowledgegraphs_spark.operators.matching import compute_match_edges

    sdf = _sdf(spark)
    driver = {(r.src, r.tgt) for r in compute_match_edges(sdf).collect()}
    dist = {
        (r.src, r.tgt)
        for r in compute_match_edges(sdf, vocab_driver_threshold=0).collect()
    }
    assert driver == dist


def test_canonical_groups_match_oracle(spark):
    sdf = _sdf(spark)
    edges = near_duplicate_edges(blocking_pairs(sdf))
    got = {r.mention: r.canonical for r in canonical_mapping(sdf, edges).collect()}
    oracle = expected_near_dup_groups(SURFACES)

    def groups(m):
        inv = {}
        for k, v in m.items():
            inv.setdefault(v, set()).add(k)
        return {frozenset(g) for g in inv.values()}

    assert groups(got) == groups(oracle)
    assert got == oracle


def test_score_select_picks_best_target(spark):
    """BES/PJ selection: for src 'interest rate swap' vs a target lexicon,
    the candidate with all tokens contained and longest cLen wins
    (min composite PJRank, reference MappingSelection semantics)."""
    from knowledgegraphs_spark.operators.matching import blocking_join

    cfg = MatchConfig(bes_high=99.9, bes_low=30.0, pj_high=0.5, bes_reject=0.0)
    targets = ["interest rate", "rate", "base rate", "unrelated"]
    src_df = spark.createDataFrame([("interest rate swap",)], "mention string")
    tgt_df = spark.createDataFrame([(s,) for s in targets], "mention string")
    all_df = src_df.union(tgt_df)
    pairs = blocking_join(src_df, tgt_df, cfg, max_token_df=100)
    scored = score_pairs(pairs, all_df, cfg)
    picked = select_matches(rank_candidates(scored), cfg).collect()
    assert len(picked) == 1
    assert picked[0].src == "interest rate swap"
    assert picked[0].tgt == "interest rate"
