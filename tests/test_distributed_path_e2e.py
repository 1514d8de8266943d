"""Full-pipeline functional check through the DISTRIBUTED matching path
(blocking join + Arrow predicate + large-star/small-star CC + salted
canonical join), forced via thresholds on a planted-family corpus.

The planted structure makes correctness exact: every surface family must
collapse to one entity — no under- or over-merging — so the entity count
equals the family count."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.config import EngineConfig
from knowledgegraphs_spark.plans.pipeline import build_kg_triples
from knowledgegraphs_spark.sources.transcripts import synthesize_transcripts_distributed

N_CONV = 400
N_SURFACES = 800  # 200 families × 4 variants
N_FAMILIES = N_SURFACES // 4


@pytest.fixture(scope="module")
def planted(spark):
    turns = synthesize_transcripts_distributed(spark, N_CONV, n_partitions=8)
    fam = F.abs(F.xxhash64("conv_id", "turn_idx")) % N_SURFACES
    variant = F.abs(F.xxhash64("turn_idx", "conv_id")) % 4
    # md5-derived 6-letter ids: two different families share few characters,
    # so the ratio clauses can NOT chain them even when the common "inc?"
    # token survives IDF pruning at this small document frequency —
    # sequential ids ('b' vs 'bc') would chain transitively and collapse
    # everything into one component (observed before this fix)
    # 12 id letters make cross-family ratios unreachable: fixed common text
    # is 10 chars of 28, so clause D needs ≥ 0.845·28 ≈ 24 matches — more
    # than the whole id — while within-family variants score ≈ 0.96
    fam_letters = F.translate(
        F.substring(F.md5((fam / 4).cast("long").cast("string")), 1, 12),
        "0123456789", "qrstuvwxyz",
    )
    # "Entity<id> Inca/Incb/Incc/Incd": extractable 2-word name mentions whose
    # variants merge via the partial token-sort clause (ratio ≈ 94 ≥ 85)
    surface = F.concat(
        F.lit("Entity"), fam_letters,
        F.element_at(
            F.array(F.lit(" Inca"), F.lit(" Incb"), F.lit(" Incc"), F.lit(" Incd")),
            (variant + 1).cast("int"),
        ),
    )
    return turns.withColumn(
        "text", F.concat(F.lit("Please contact "), surface, F.lit(" about the review."))
    ).localCheckpoint(eager=True)


def test_distributed_matching_merges_exactly_the_planted_families(spark, planted):
    # thresholds 0 → every stage takes the distributed path
    cfg = EngineConfig(vocab_driver_threshold=0, cc_driver_threshold=0, shuffle_partitions=8)
    tri = build_kg_triples(spark, planted, cfg).localCheckpoint(eager=True)

    n_entities = tri.filter("pred = 'rdf:type' AND obj = 'kg:Entity'").count()
    # families actually present (small corpora may not hit every fam id)
    n_fams_present = (
        planted.select(
            (F.abs(F.xxhash64("conv_id", "turn_idx")) % N_SURFACES / 4).cast("long").alias("f")
        )
        .distinct()
        .count()
    )
    assert n_entities == n_fams_present

    n_mentions = tri.filter("pred = 'rdf:type' AND obj = 'kg:Mention'").count()
    assert n_mentions == planted.count()  # one name mention per turn


def test_distributed_equals_driver_path(spark, planted):
    """Both physical strategies must emit the identical triple set."""
    dist = build_kg_triples(
        spark, planted, EngineConfig(vocab_driver_threshold=0, cc_driver_threshold=0, shuffle_partitions=8)
    )
    driver = build_kg_triples(spark, planted, EngineConfig(shuffle_partitions=8))
    a = {tuple(r) for r in dist.select("subj", "pred", "obj").collect()}
    b = {tuple(r) for r in driver.select("subj", "pred", "obj").collect()}
    assert a == b
