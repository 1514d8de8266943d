"""Sequence packing for LLM training-data pipelines: lay documents out on
a contiguous token stream and chunk it into fixed-budget bins.

Training pipelines concatenate tokenized documents and slice the stream
into context-window-sized sequences ("packing"); each document therefore
needs its **global start offset** — a prefix sum over an explicit total
order. The naive Spark spelling is ``SUM(...) OVER (ORDER BY ...)``,
which Catalyst executes as a SINGLE-partition window — the whole corpus
through one task, the textbook scale failure. This module implements the
canonical distributed prefix sum instead:

1. ``repartitionByRange(order_col)`` + ``sortWithinPartitions`` lays the
   corpus out in key order across ``n_parts`` partitions, materialized
   once (eager ``localCheckpoint``) so both passes below read the SAME
   partitioning — range-partition bounds come from sampling, and letting
   two separate jobs re-derive them independently is a correctness bug,
   not just a recompute. At cluster scale the materialization is a
   parquet staging write (the ``write_triples`` pattern); the price of a
   global prefix sum is one extra pass over the data either way.
2. Per-partition token totals — ``n_parts`` rows — collect to the
   driver, where the exclusive prefix offsets are computed and
   broadcast back (driver-scale by definition: one row per partition).
3. Intra-partition exclusive running sums are a window partitioned by
   the PHYSICAL partition id — every window group is one partition's
   rows, so the window is data-parallel — plus the broadcast offset.

Bin assignment is then pure arithmetic on the offset: ``bin_id = offset
div budget``, ``bin_offset = offset mod budget``, and a ``straddle``
flag for documents crossing a bin boundary (packing-aware loaders mask
attention across the seam; budget-sized bins mean a document longer
than the budget straddles by construction).

Determinism: ``order_col`` must be a UNIQUE total order (enforced — a
duplicate key would make offsets depend on partition layout). Output is
then a pure function of the data, any partitioning.

The reference has no packing stage (single-machine, no training-data
emission); this is part of the engine's training-pipeline surface, like
operators/dedup.py and text_analysis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text_analysis import token_count

__all__ = ["pack_documents", "render_chat_template"]


def pack_documents(
    docs: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Assign every document its global token ``start_offset`` (exclusive
    prefix sum of token counts in ``order_col`` order) and its packing
    position: ``bin_id``, ``bin_offset``, ``straddle``.

    ``token_count_col`` names a precomputed count column; otherwise
    counts come from :func:`text_analysis.token_count` over ``text_col``
    (whitespace tokens — swap in ``bpe_ish_token_count`` upstream for
    budget-accurate packing). ``n_parts`` overrides the layout partition
    count (default: the session's shuffle partitions).
    """
    if budget <= 0:
        raise ValueError(f"pack_documents: budget must be positive, got {budget}")
    spark = docs.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    n_tok = (
        F.col(token_count_col) if token_count_col else token_count(F.col(text_col))
    ).cast("long")
    base = docs.select(F.col(order_col), n_tok.alias("n_tokens"))

    # pass 0: the ordered layout both passes read (see module docstring on
    # why this materializes). sortWithinPartitions is what makes the
    # intra-partition window below a sort-free streaming frame.
    laid = (
        base.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # pass 1: per-partition totals -> driver (n_parts rows), exclusive
    # prefix offsets computed in plain Python, shipped back as a literal
    # map. min(order) per pid orders the partitions by key range rather
    # than trusting pid enumeration order.
    totals = (
        laid.groupBy("__pid")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.min(order_col).alias("lo"),
            F.count("*").alias("n"),
            F.count_distinct(order_col).alias("nd"),
        )
        .collect()
    )
    if any(r["n"] != r["nd"] for r in totals):
        raise ValueError(
            f"pack_documents: {order_col} is not unique — offsets would "
            "depend on partition layout"
        )
    running = 0
    offsets = {}
    for r in sorted(totals, key=lambda r: r["lo"]):
        offsets[r["__pid"]] = running
        running += r["t"]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("__pid")
    ) if offsets else F.lit(0).cast("long")

    # pass 2: intra-partition exclusive running sum + the partition offset
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + offset_expr).alias(
        "start_offset"
    )
    out = laid.select(order_col, "n_tokens", start)
    # integral `div`, not float division: offsets at corpus scale exceed
    # the 2^53 range where doubles stay exact
    b = int(budget)
    bin_id = F.expr(f"start_offset div {b}")
    end_bin = F.expr(f"(start_offset + greatest(n_tokens, 1) - 1) div {b}")
    return out.select(
        order_col,
        "n_tokens",
        "start_offset",
        bin_id.alias("bin_id"),
        (F.col("start_offset") % b).alias("bin_offset"),
        (end_bin != bin_id).alias("straddle"),
    )


def render_chat_template(
    turns: DataFrame,
    im_start: str = "<|im_start|>",
    im_end: str = "<|im_end|>",
) -> DataFrame:
    """Assemble one ChatML-style training example per conversation.

    SFT pipelines feed the trainer rendered conversations, not turn rows:
    every turn becomes ``<|im_start|>{role}\\n{text}<|im_end|>\\n`` and a
    conversation is the concatenation in ``turn_idx`` order. The reference
    stops at triple emission (it has no training-data stage); this is the
    engine's training-example assembly step, the last hop before
    ``pack_documents``.

    Scale shape: ONE shuffle keyed by ``conv_id`` (co-located already when
    the input came through ``ingest``'s conv_id repartition), per-group
    state bounded by the longest conversation — never corpus-sized. The
    in-group ordering is ``array_sort`` over ``(turn_idx, piece)`` structs,
    not a window: ``turn_idx`` is unique per conversation (the ingest
    contract), so the render is a pure function of the data under any
    partitioning.

    Output: ``(conv_id, n_turns, text, n_tokens)`` with ``n_tokens`` the
    whitespace token count of the rendered text — the number
    ``pack_documents`` bins by.

    Null-normalized ``role``/``text`` (F1 sentinels) render as empty
    strings: the turn keeps its slot in the template rather than shifting
    later turns' rendering.
    """
    piece = F.concat(
        F.lit(im_start),
        F.coalesce(F.col("role"), F.lit("")),
        F.lit("\n"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(im_end),
        F.lit("\n"),
    )
    per = turns.select("conv_id", "turn_idx", piece.alias("piece"))
    agg = per.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "piece"))),
                lambda s: s["piece"],
            ),
            "",
        ).alias("text"),
    )
    return agg.select(
        "conv_id", "n_turns", "text", token_count(F.col("text")).alias("n_tokens")
    )
