"""Sequence packing (operators/packing.py): the distributed prefix sum
must equal the single-window global cumsum for ANY input partitioning,
bin arithmetic must match a driver-side brute force, and the unique-order
guard must trip on duplicate keys.
"""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.packing import pack_documents


def brute(rows, budget):
    """Driver-side packing twin: rows = [(id, n_tokens)] in id order."""
    out, off = {}, 0
    for i, n in sorted(rows):
        bin_id = off // budget
        end_bin = (off + max(n, 1) - 1) // budget
        out[i] = (n, off, bin_id, off % budget, end_bin != bin_id)
        off += n
    return out


def collected(df):
    return {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["bin_id"], r["bin_offset"], r["straddle"]
        )
        for r in df.collect()
    }


def test_matches_brute_force_and_global_window(spark):
    rows = [(i, f"{'tok ' * ((i * 7) % 23)}end") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = collected(pack_documents(docs, budget=64, n_parts=8))
    expect = brute([(i, (i * 7) % 23 + 1) for i in range(200)], 64)
    assert got == expect


@pytest.mark.parametrize("layout_parts", [1, 3, 32])
def test_partitioning_invariance(spark, layout_parts):
    rows = [(i, "w " * (i % 11)) for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id int, text string").repartition(
        layout_parts, F.col("text")  # deliberately order-hostile layout
    )
    got = collected(pack_documents(docs, budget=32, n_parts=5))
    expect = brute([(i, max(i % 11, 0)) for i in range(150)], 32)
    # "w " * 0 -> empty string -> 0 tokens
    assert got == expect


def test_precomputed_token_column_and_long_doc_straddles(spark):
    rows = [(1, 10), (2, 100), (3, 5)]
    docs = spark.createDataFrame(rows, "doc_id int, n_tok long")
    got = collected(pack_documents(docs, budget=16, token_count_col="n_tok"))
    # doc 2 (100 tokens > budget 16) must straddle by construction
    assert got[2][1] == 10 and got[2][4] is True
    assert got[1] == (10, 0, 0, 0, False)
    assert got[3][1] == 110


def test_duplicate_order_key_raises(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (1, "c"), (2, "d")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="not unique"):
        pack_documents(docs, budget=8, n_parts=2)


def test_bad_budget_raises(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="budget"):
        pack_documents(docs, budget=0)


def test_no_single_partition_window(spark):
    """The scale property under test: the physical plan must not contain
    a global (empty-partition-spec) window — every Window's partition
    spec is the physical partition id."""
    rows = [(i, "x " * (i % 5)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    plan = (
        pack_documents(docs, budget=8, n_parts=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, line


def test_render_chat_template_order_and_nulls(spark):
    from knowledgegraphs_spark.operators.packing import render_chat_template

    # rows deliberately out of turn order; one null role, one null text
    rows = [
        ("c1", 1, "assistant", "hi there", None, None),
        ("c1", 0, "user", "hello", None, None),
        ("c1", 2, None, "tool output", None, None),
        ("c2", 0, "user", None, None, None),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = {r["conv_id"]: r for r in render_chat_template(turns).collect()}
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["text"] == (
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nhi there<|im_end|>\n"
        "<|im_start|>\ntool output<|im_end|>\n"
    )
    # null text renders as an empty slot, keeping the template frame
    assert out["c2"]["text"] == "<|im_start|>user\n<|im_end|>\n"
    assert out["c2"]["n_tokens"] == out["c2"]["text"].split().__len__()
    assert out["c1"]["n_tokens"] == len(out["c1"]["text"].split())


def test_render_chat_template_partitioning_invariant(spark):
    """Pure function of the data: 1-partition and 7-partition layouts
    render byte-identical conversations."""
    from knowledgegraphs_spark.operators.packing import render_chat_template

    rows = [(f"c{i % 3}", i // 3, "user", f"msg {i}", None, None) for i in range(30)]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    a = sorted((r["conv_id"], r["text"]) for r in render_chat_template(turns.coalesce(1)).collect())
    b = sorted((r["conv_id"], r["text"]) for r in render_chat_template(turns.repartition(7)).collect())
    assert a == b
