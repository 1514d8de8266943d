"""Mergeable cardinality sketch (HyperLogLog) in pure Catalyst.

The distinct-count-at-scale primitive a 100-TB corpus audit runs where an
exact ``COUNT(DISTINCT)`` would shuffle the full key universe: vocabulary
size, unique-URL counts, per-source entity cardinalities. Spark ships
``approx_count_distinct`` but its HLL++ register state is opaque — no
cross-engine value gate, no register-level merge across jobs. This
implementation keeps the register relation FIRST-CLASS (a 2^p-row
DataFrame), so sketches built by different jobs/partitions merge with a
``groupBy(bucket).max(max_rank)`` and the whole path is value-checkable
against an independent pure-Python twin through the same XXH64 machinery
that gates the production MinHash family
(``functions/xxh64_twin.py``; reference parity note: the reference has no
sketching — this is an engine extension for the training-data-pipeline
surface, same family as dedup/ANN).

Shape per Flajolet et al. 2007 (HyperLogLog, AofA): hash each value to 64
bits (``F.xxhash64`` — JVM, codegen'd), bucket = top ``p`` bits, rank =
leading-zero count of the remaining ``64-p`` bits + 1, register =
``max(rank)`` per bucket. The rank uses ``length(bin(w))`` — the binary
string length IS ``floor(log2(w))+1`` integer-exactly, avoiding the
double-precision cliff that ``F.log2`` would hit for ``w`` near 2^53.
Everything is a single map-side-combinable aggregate: the shuffle carries
at most 2^p rows per mapper, independent of input size.

Estimator: the standard bias-corrected harmonic mean with the
small-range linear-counting correction (no large-range correction — with
64-bit hashes collisions are irrelevant below ~2^57 distincts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# seed column hashed ahead of the value — fixes the hash family exactly as
# the MinHash salt does (dedup.py), and the twin reproduces it bit-for-bit
_HLL_SEED = 0


def hll_registers(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """Build the register relation ``(bucket int, max_rank int)`` of an
    HLL sketch over ``df[col]`` (nulls skipped, duplicates harmless — the
    sketch is duplicate-insensitive by construction). Only OBSERVED
    buckets appear; absent rows are empty registers (rank 0) and
    :func:`hll_estimate` accounts for them. One codegen'd projection +
    one map-side-combinable ``groupBy(bucket).max`` — shuffle bounded by
    2^p rows per mapper regardless of input size."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    wbits = 64 - p
    h = F.xxhash64(F.lit(_HLL_SEED), F.col(col))
    bucket = F.shiftrightunsigned(h, wbits).cast("int")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    # length(bin(w)) == floor(log2(w)) + 1, integer-exact for any bigint
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket.alias("bucket"), rank.cast("int").alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge sketches built over different inputs (jobs, days, sources):
    union + ``max`` per bucket. The register relation is a semilattice —
    merge order never matters."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("bucket").agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Cardinality estimate from a register relation: one row
    ``(estimate double)``. Bias-corrected harmonic mean; linear counting
    when the estimate is small and empty registers remain."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("z_filled"),
        F.count(F.lit(1)).alias("filled"),
    )
    z = F.col("z_filled") + (F.lit(m) - F.col("filled"))  # empty: 2^-0 = 1
    v = F.lit(m) - F.col("filled")  # empty-register count
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("estimate"))


def hll_registers_py(values: list[str], p: int = 6) -> dict[int, int]:
    """Independent pure-Python twin (via the XXH64 twin that gates the
    production MinHash family) — bit-for-bit the register relation."""
    from knowledgegraphs_spark.functions.xxh64_twin import spark_xxhash64_twin

    wbits = 64 - p
    regs: dict[int, int] = {}
    for s in values:
        if s is None:
            continue
        u = spark_xxhash64_twin(_HLL_SEED, s)
        bucket = u >> wbits
        w = u & ((1 << wbits) - 1)
        rank = wbits + 1 if w == 0 else wbits - w.bit_length() + 1
        if regs.get(bucket, 0) < rank:
            regs[bucket] = rank
    return regs


def hll_estimate_py(regs: dict[int, int], p: int = 6) -> float:
    import math

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    z = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    v = m - len(regs)
    raw = alpha * m * m / z
    if raw <= 2.5 * m and v > 0:
        return round(m * math.log(m / v), 4)
    return round(raw, 4)


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency estimation / heavy hitters
# ---------------------------------------------------------------------------

def _cm_bucket(d_col, val_col, width: int, family: str):
    """Per-depth bucket assignment. ``xxhash64`` is the production family
    (JVM codegen'd, one hash op); ``md5`` is the oracle family — the same
    hex fold the negative sampler (m7) and random walks (g31) use, bit-
    reproducible in ANSI SQL. The two families are interchangeable by
    contract (only bucket placement differs, never estimate semantics)."""
    if family == "xxhash64":
        return F.pmod(F.xxhash64(d_col, val_col), F.lit(width))
    if family != "md5":
        raise ValueError(f"unknown family {family!r}")
    hexval = lambda c: F.ascii(c) - F.when(F.ascii(c) >= 97, F.lit(87)).otherwise(F.lit(48))  # noqa: E731
    fold = F.aggregate(
        F.filter(
            F.split(
                F.substring(
                    F.md5(F.concat_ws("|", d_col.cast("string"), val_col)), 1, 12
                ),
                "",
            ),
            lambda c: c != "",
        ),
        F.lit(0).cast("long"),
        lambda acc, c: acc * 16 + hexval(c),
    )
    return fold % width


def cm_registers(
    df: DataFrame, col: str, depth: int = 4, width: int = 512, family: str = "md5"
) -> DataFrame:
    """Build the Count-Min counter relation ``(d int, bucket int, cnt
    long)`` over ``df[col]`` (nulls skipped) — the frequency-estimation
    twin of :func:`hll_registers` (Cormode & Muthukrishnan 2005). Like
    the HLL registers, the state is a FIRST-CLASS relation: sketches from
    different jobs merge with ``groupBy(d, bucket).sum`` (:func:`cm_merge`)
    and every path is value-checkable. One projection (depth-explode +
    bucket hash) and one map-side-combinable count — the shuffle carries
    at most depth×width rows per mapper, independent of input size."""
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    rows = df.where(F.col(col).isNotNull()).select(F.col(col).alias("_v"), d)
    return (
        rows.select("d", _cm_bucket(F.col("d"), F.col("_v"), width, family).cast("int").alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge Count-Min counter relations built with the same (depth,
    width, family): counters add."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    registers: DataFrame,
    probes: DataFrame,
    col: str = "tok",
    depth: int = 4,
    width: int = 512,
    family: str = "md5",
) -> DataFrame:
    """Point-query the sketch for each probe value: est = min over depths
    of the probe's counter (absent counter = 0). Count-Min NEVER
    underestimates — ``est ≥ true`` always, with overcount bounded by
    collisions (ε·N w.h.p. for width ≥ e/ε). Probe side is query-scale;
    the join against the depth×width register relation broadcasts."""
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    pb = (
        probes.select(F.col(col).alias("_p"))
        .distinct()
        .select("_p", d)
        .select(
            "_p", "d",
            _cm_bucket(F.col("d"), F.col("_p"), width, family).cast("int").alias("bucket"),
        )
    )
    return (
        pb.join(F.broadcast(registers), ["d", "bucket"], "left")
        .groupBy(F.col("_p").alias(col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# Equi-width histogram sketch: mergeable quantile estimation
# ---------------------------------------------------------------------------

def hist_registers(
    df: DataFrame, col: str, step: int = 8, nbuckets: int = 32
) -> DataFrame:
    """Build the histogram relation ``(bucket int, cnt long)`` over a
    non-negative numeric column: bucket = floor(value/step), clamped to
    the last bucket — the third mergeable sketch next to HLL
    (cardinality) and Count-Min (frequency), answering QUANTILE queries
    with rank error bounded by one bucket's mass. Fixed, data-independent
    boundaries are what make it mergeable (``groupBy(bucket).sum``) and
    engine-agnostic (integer floor-division — no float bucketing drift);
    the price vs GK/t-digest is a fixed value range, the right trade
    when the metric is bounded by construction (token counts, document
    lengths). One projection + one map-side-combinable count; shuffle
    bounded by nbuckets rows per mapper."""
    b = F.least(F.floor(F.col(col) / step).cast("int"), F.lit(nbuckets - 1))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge histogram relations built with the same (step, nbuckets)."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    registers: DataFrame, qs=(0.5, 0.9, 0.99), step: int = 8
) -> DataFrame:
    """Estimate quantiles from the histogram: for each q, find the
    bucket where the cumulative count crosses q·N and interpolate
    linearly inside it. Returns ``(q double, est double)``, rounded to
    6 decimals. The quantile fan-out is an EXPLODE of the literal q
    array over the (≤ nbuckets)-row cumulative relation — a projection,
    not a theta-join, so the plan stays nested-loop-free. N comes from
    one aggregate over the sketch relation (sketch-scale by
    definition, the driver-twin discipline)."""
    from pyspark.sql import Window

    total = registers.agg(F.sum("cnt").alias("t")).first()["t"]
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    r = (
        registers.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        .select(
            "bucket", "cnt", "cum", "prev",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
    )
    target = F.col("q") * F.lit(float(total))
    hit = r.where((F.col("cum") >= target) & (F.col("prev") < target))
    return hit.select(
        "q",
        F.round(
            F.lit(float(step))
            * (F.col("bucket") + (target - F.col("prev")) / F.col("cnt")),
            6,
        ).alias("est"),
    )
