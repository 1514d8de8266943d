"""Corpus-curation operators for training-data pipelines: rule-based
quality filtering, exact stratified sampling, and benchmark
decontamination.

No reference counterpart exists (the reference builds KGs, not training
corpora) — these extend the dedup/text-analysis family
(``dedup.py``/``text_analysis.py``) with the remaining curation steps a
100-TB pretraining pipeline runs between ingestion and packing:

* ``quality_filter`` — C4/Gopher-style document rules (length bounds,
  mean word length, symbol ratio, stopword floor, repetition cap), each
  rule a named boolean column plus a single ``keep`` verdict and the
  first-failing ``reject_reason``. Pure Catalyst column expressions —
  one codegen'd projection over the scan, zero shuffle, and every rule
  ANSI-SQL-expressible so the whole filter sits under the DuckDB value
  gate.
* ``stratified_sample`` — exact per-stratum quotas with a deterministic,
  engine-agnostic order key (md5 of the id: identical hex in Spark and
  DuckDB, uniform over strata). The naive form is one window per
  stratum over ALL rows — rank-shuffling the full corpus to keep 0.001 %
  of it. Here a count-based hash-threshold prune runs first: per-stratum
  counts (map-side combinable, stratum-cardinality rows to the driver),
  an overshoot threshold on the hex key prunes the scan down to
  ~margin×quota rows per stratum, and only the survivors enter the exact
  rank window. The prune is validated (selected-per-stratum counts vs
  quota) and the margin doubles until exact — normally zero extra
  rounds; the loop is a correctness guarantee, not a hot path.
* ``decontaminate`` — n-gram-overlap contamination check of a training
  corpus against a held-out benchmark set: the benchmark's distinct
  shingle fingerprints broadcast to every executor, the train side
  explodes shingles and counts distinct overlaps per document with a
  map-side-combinable groupBy. No shuffle touches benchmark-sized data;
  the only exchange is the per-document overlap count.
* ``mixture_upsample`` — epoch-weighted mixture materialization
  (fractional epochs via the same deterministic md5 key): one
  shuffle-free codegen'd projection + explode, ANSI-SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_analysis import STOPWORDS, punct_ratio, shingles, tokens_col

# ---------------------------------------------------------------------------
# quality filter
# ---------------------------------------------------------------------------

#: rule evaluation order — ``reject_reason`` is the FIRST failing rule
QUALITY_RULES = ("len", "word_len", "symbol", "stopword", "repetition")


def repetition_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of word n-gram shingles that are repeats of an earlier
    shingle in the same document (Gopher's duplicate-n-gram family,
    collapsed to the set form): ``1 - distinct/total``. 0.0 for docs too
    short to shingle."""
    sh = shingles(text, n)
    return F.when(
        F.size(sh) > 0,
        F.lit(1.0) - F.size(F.array_distinct(sh)) / F.size(sh),
    ).otherwise(F.lit(0.0))


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    word_len_bounds: tuple[float, float] = (2.0, 12.0),
    max_symbol_ratio: float = 0.3,
    min_stopwords: int = 2,
    max_repetition: float = 0.6,
) -> DataFrame:
    """Append per-rule flag columns ``r_<rule>``, the ``keep`` verdict
    (AND of all rules), and ``reject_reason`` (first failing rule in
    ``QUALITY_RULES`` order, NULL when kept).

    Defaults are the C4/Gopher-style heuristics: token-count bounds,
    mean word length within [2, 12], symbol-to-char ratio ≤ 0.3, at
    least 2 stopword hits, and duplicate-bigram fraction ≤ 0.6. All
    thresholds are literals folded into ONE codegen'd projection — at
    100 TB this is scan-bound, shuffle-free, and the flags survive for
    audit instead of silently dropping rows.
    """
    t = F.col(text_col)
    toks = tokens_col(t)
    n_tok = F.size(toks)
    # mean token length; 0.0 for empty docs (fails the len rule anyway)
    mean_wl = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) / n_tok,
    ).otherwise(F.lit(0.0))
    n_stop = F.size(F.filter(F.transform(toks, F.lower), lambda x: x.isin(STOPWORDS)))

    rules = {
        "len": (n_tok >= min_tokens) & (n_tok <= max_tokens),
        "word_len": (mean_wl >= word_len_bounds[0]) & (mean_wl <= word_len_bounds[1]),
        "symbol": punct_ratio(t) <= max_symbol_ratio,
        "stopword": n_stop >= min_stopwords,
        "repetition": repetition_ratio(t) <= max_repetition,
    }
    out = docs
    for name in QUALITY_RULES:
        out = out.withColumn(f"r_{name}", rules[name])
    keep = F.lit(True)
    for name in QUALITY_RULES:
        keep = keep & F.col(f"r_{name}")
    reason = F.lit(None).cast("string")
    for name in reversed(QUALITY_RULES):
        reason = F.when(~F.col(f"r_{name}"), F.lit(name)).otherwise(reason)
    return out.withColumn("keep", keep).withColumn("reject_reason", reason)


# ---------------------------------------------------------------------------
# exact stratified sampling
# ---------------------------------------------------------------------------


def _sample_key(id_col: str) -> Column:
    """Engine-agnostic uniform order key: md5 hex of the id string.
    Lowercase-hex lexicographic order is identical in Spark and DuckDB,
    and the first 8 hex chars read as a uniform 32-bit value for the
    threshold prune."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(
    docs: DataFrame,
    quotas: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    margin: float = 2.0,
) -> DataFrame:
    """Exactly ``quotas[s]`` rows per stratum ``s`` (all rows when the
    stratum is smaller), chosen as the quota-smallest md5 keys —
    deterministic under any partitioning and any engine.

    Returns ``(id, stratum, sample_rank)`` with ``sample_rank`` the
    1-based rank within the stratum. Strata absent from ``quotas`` are
    dropped.

    Scale shape: per-stratum counts first (map-side combinable; one row
    per stratum to the driver), then a hash-threshold prune keeps only
    rows whose 32-bit key prefix falls below ``margin × quota/count`` of
    the key space, and the exact rank window runs over the pruned
    remnant (~margin×quota rows per stratum, not the corpus). The prune
    is an over-approximation gamble, so it is VALIDATED: if any stratum
    came up short of its quota the margin doubles and the prune re-runs
    (threshold 1.0 degenerates to the naive full window, so termination
    is guaranteed). With margin 2 and quota ≥ 100 a short round is a
    >6-sigma event — the loop exists for correctness, not the hot path.
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        _sample_key(id_col).alias("u"),
    ).filter(F.col("stratum").isin(list(quotas)))

    counts = {r["stratum"]: r["n"] for r in base.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}

    from pyspark.sql import Window as W

    w = W.partitionBy("stratum").orderBy("u", "id")
    while True:
        # per-stratum hex-prefix threshold: fraction of the 2^32 key space
        thr = {
            s: format(min(2**32 - 1, int(margin * quotas[s] / max(counts.get(s, 1), 1) * 2**32)), "08x")
            for s in quotas
        }
        thr_col = F.lit(None).cast("string")
        for s, h in thr.items():
            thr_col = F.when(F.col("stratum") == s, F.lit(h)).otherwise(thr_col)
        pruned = base.filter(F.substring("u", 1, 8) <= thr_col)
        ranked = pruned.withColumn("sample_rank", F.row_number().over(w))
        quota_col = F.lit(None).cast("long")
        for s, q in quotas.items():
            quota_col = F.when(F.col("stratum") == s, F.lit(q)).otherwise(quota_col)
        picked = ranked.filter(F.col("sample_rank") <= quota_col).select("id", "stratum", "sample_rank")

        if all(counts.get(s, 0) <= quotas[s] for s in quotas):
            return picked  # every threshold ≥ 1.0 — nothing was pruned
        got = {r["stratum"]: r["n"] for r in picked.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
        short = [s for s in quotas if got.get(s, 0) < min(quotas[s], counts.get(s, 0))]
        if not short:
            return picked
        margin *= 2.0  # prune was too aggressive — provably rare, never wrong


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag training documents sharing ≥ ``min_overlap`` distinct word
    ``n``-gram shingles with the benchmark set (the standard
    train/eval-contamination sweep, e.g. the 13-gram check of GPT-3
    appendix C — ``n`` is a knob because the fixtures' documents are
    short).

    Returns every train row as ``(id, n_overlap, contaminated)``;
    ``n_overlap`` counts DISTINCT shared shingles.

    Scale shape: benchmark shingle fingerprints are distinct-ed and
    broadcast (benchmarks are MBs against a 100-TB corpus); the train
    side explodes its shingles once and inner-joins map-side, so the
    only shuffle is the per-document count groupBy (map-side
    combinable) and the final broadcast join-back of hit counts onto the
    train ids. md5 fingerprints, not raw shingle text, cross the wire.
    """
    bench_sh = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("sh"))
        .select(F.md5("sh").alias("sig"))
        .distinct()
    )
    train_sh = train.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    ).select("id", F.md5("sh").alias("sig"))
    hits = (
        train_sh.join(F.broadcast(bench_sh), "sig")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    # join-back is hit-count-sized (contaminated docs only) — left to AQE,
    # not force-broadcast: contamination volume is data-dependent
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# epoch-weighted mixture upsampling
# ---------------------------------------------------------------------------


def mixture_upsample(
    docs: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a training mixture with per-source epoch weights —
    the data-mixing step every pretraining run executes (a la the GPT-3 /
    LLaMA mixture tables, where e.g. Wikipedia is seen ~3.4 epochs and
    CommonCrawl ~0.44): each row of stratum ``s`` appears
    ``floor(weights[s])`` or ``ceil(weights[s])`` times so the stratum's
    expected multiplicity is exactly ``weights[s]``.

    Which rows get the extra epoch is decided by the same deterministic,
    engine-agnostic md5 key as :func:`stratified_sample`: the row gets
    ``ceil`` iff the first 8 hex chars of ``md5(id)`` fall below the
    fractional part's share of the 32-bit key space. Deterministic under
    any partitioning, identically computable in ANSI SQL (the t8 oracle),
    and unbiased across strata (the key depends on the id only).

    Returns ``(id, stratum, epoch)`` with ``epoch`` in ``[0, copies)`` —
    downstream shuffling/packing keys on ``(epoch, id)`` so repeated
    copies land in different shards. Strata absent from ``weights`` are
    dropped; weight 0 drops the stratum except the fractional share (use
    e.g. 0.25 to downsample a source, the other half of mixture design).

    Scale shape: ZERO shuffle — the whole operator is one codegen'd
    projection over the scan (md5 + threshold compare + ``sequence`` /
    ``explode``); output size is Σ weights[s]·|s| rows, the price of the
    mixture itself, and the explode streams (no row-group blow-up in
    memory). At 100 TB this is the shape you want: mixture materialization
    rides the same scan as tokenize/pack, no exchange anywhere.
    """
    full_col = F.lit(None).cast("int")
    thr_col = F.lit(None).cast("string")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative mixture weight for stratum {s!r}: {w}")
        full = int(w)
        frac = w - full
        full_col = F.when(F.col("stratum") == s, F.lit(full)).otherwise(full_col)
        thr_col = F.when(
            F.col("stratum") == s, F.lit(format(int(frac * 2**32), "08x"))
        ).otherwise(thr_col)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        _sample_key(id_col).alias("u"),
    ).filter(F.col("stratum").isin(list(weights)))
    copies = (
        full_col + F.when(F.substring("u", 1, 8) < thr_col, F.lit(1)).otherwise(F.lit(0))
    ).alias("n")
    # sequence(0, -1) would produce a DESCENDING [0, -1] — guard the
    # zero-copy case with an empty array, which explode() drops.
    return (
        base.select("id", "stratum", copies)
        .select(
            "id",
            "stratum",
            F.explode(
                F.when(
                    F.col("n") > 0, F.sequence(F.lit(0), F.col("n") - F.lit(1))
                ).otherwise(F.array().cast("array<int>"))
            ).alias("epoch"),
        )
        .select("id", "stratum", F.col("epoch").cast("long").alias("epoch"))
    )


def frequency_balanced_shards(
    freqs: DataFrame,
    n_shards: int,
    ent_col: str = "ent",
    freq_col: str = "freq",
) -> DataFrame:
    """Embedding-table shard assignment for distributed training — the
    parameter-server placement step after entity indexing (m7): spread
    entities over ``n_shards`` so each shard carries a near-equal share
    of total access frequency. Greedy bin-packing is inherently
    sequential; the distributed-and-deterministic equivalent is
    frequency-ranked round-robin (rank entities by descending frequency,
    shard = rank mod n_shards) — the heaviest n_shards entities land on
    distinct shards, and within any window of n_shards consecutive ranks
    every shard receives exactly one entity, bounding the load gap by
    one entity per rank-window (the classic LPT-style guarantee).

    Returns one row per entity: (ent, freq, rank, shard). Scale shape:
    one global ranking window — vocabulary-scale by definition (the
    embedding table must fit the training cluster), never corpus-scale;
    ties broken by the entity key so the plan is bit-stable.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(freq_col), F.asc(ent_col))
    return (
        freqs.select(ent_col, freq_col)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("shard", ((F.col("rank") - 1) % n_shards).cast("int"))
    )


def leakage_free_split(
    clustered: DataFrame,
    val_frac: float = 0.2,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Train/validation split that cannot leak near-duplicates across
    the boundary: the split decision is a deterministic hash threshold
    on the duplicate-CLUSTER id (``dedup`` d6's connected components),
    not the document id — every member of a near-dup family lands on
    the same side by construction, the failure mode a doc-id split has
    (one duplicate in train, its twin in val → inflated eval).

    Same engine-agnostic md5-threshold convention as
    ``mixture_upsample``: val iff the first 8 hex chars of
    md5(cluster_id) sort below floor(val_frac·2³²) in hex — a pure
    codegen'd projection, zero additional shuffle on top of the
    clustering. Expected (not exact) val mass is val_frac, by cluster.
    """
    thr = format(int(val_frac * 2**32), "08x")
    return clustered.select(
        id_col,
        cluster_col,
        *keep_cols,
        F.when(
            F.substring(F.md5(F.col(cluster_col).cast("string")), 1, 8) < F.lit(thr),
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
