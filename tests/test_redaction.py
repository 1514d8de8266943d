"""PII detection/redaction (operators/redaction.py): Spark's JVM regex
behavior must equal a pure-Python `re` twin under the same sequential
semantics (the engine-portability claim the module makes), the
counts==replacements invariant must hold, NULLs must pass through, and
the whole thing must stay a shuffle-free, Python-free projection."""

from __future__ import annotations

import re

from knowledgegraphs_spark.operators.redaction import (
    PII_PATTERNS,
    detect_pii,
    redact_pii,
    scrub,
)

SAMPLES = [
    (0, "Reach bob.smith+x@ex-ample.co.uk or jo@a.io today"),
    (1, "pay 1234-5678-9012-3456 now, backup 9999 8888 7777 6666"),
    (2, "ssn 123-45-6789. call 555.123.4567 or 25-989-741-2988"),
    (3, "host 10.0.255.7:80 and 1.2.3.4 are up"),
    (4, "no pii here, just words and the number 12345"),
    (5, None),
    (6, "mixed: a@b.co 111-22-3333 4444-5555-6666-7777 9.8.7.6"),
    # boundary traps: digits touching word chars must NOT match
    (7, "id x123-45-6789y and 1234-5678-9012-34567 overlong"),
]


def _scrub_py(text):
    """Sequential twin with Python re — same order, same patterns."""
    if text is None:
        return {f"n_{k}": 0 for k, _, _ in PII_PATTERNS} | {"red": None, "total": 0}
    cur, counts = text, {}
    for kind, pat, repl in PII_PATTERNS:
        counts[f"n_{kind}"] = len(re.findall(pat, cur))
        cur = re.sub(pat, repl, cur)
    return counts | {"red": cur, "total": sum(counts.values())}


def _df(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string")


def test_scrub_equals_python_re_twin(spark):
    got = {r["doc_id"]: r for r in scrub(_df(spark)).collect()}
    for doc_id, text in SAMPLES:
        want = _scrub_py(text)
        r = got[doc_id]
        for kind, _, _ in PII_PATTERNS:
            assert r[f"n_{kind}"] == want[f"n_{kind}"], (doc_id, kind)
        assert r["pii_total"] == want["total"]
        assert r["has_pii"] == (want["total"] > 0)
        assert r["text_redacted"] == want["red"]


def test_counts_equal_replacements_made(spark):
    # sum of class counts == number of mask tokens in the redacted text
    for r in scrub(_df(spark)).collect():
        if r["text_redacted"] is None:
            assert r["pii_total"] == 0
            continue
        masks = sum(r["text_redacted"].count(m) for _, _, m in PII_PATTERNS)
        assert masks == r["pii_total"], r


def test_sequential_order_prevents_double_counting(spark):
    # the digits inside an email must not resurface as phone/ipv4 hits
    df = spark.createDataFrame(
        [(0, "mail 555.123.4567@example.com only")], "doc_id long, text string"
    )
    r = detect_pii(df).collect()[0]
    assert r["n_email"] == 1
    assert r["n_phone"] == 0 and r["n_ipv4"] == 0
    assert r["pii_total"] == 1


def test_null_text_stays_null_in_redaction(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    assert redact_pii(df).collect()[0]["text_redacted"] is None


def test_duckdb_runs_identical_patterns(spark):
    # the engine-portability claim, checked directly: DuckDB (RE2) with
    # the SAME pattern text and sequential semantics produces identical
    # counts and redacted strings
    import duckdb

    con = duckdb.connect()
    got = {r["doc_id"]: r for r in scrub(_df(spark)).collect()}
    for doc_id, text in SAMPLES:
        if text is None:
            continue
        cur = text
        for kind, pat, repl in PII_PATTERNS:
            n, cur = con.execute(
                "SELECT length(regexp_extract_all(?, ?)), regexp_replace(?, ?, ?, 'g')",
                [cur, pat, cur, pat, repl],
            ).fetchone()
            assert n == got[doc_id][f"n_{kind}"], (doc_id, kind)
        assert cur == got[doc_id]["text_redacted"]


def test_scrub_is_shuffle_free_and_python_free(spark):
    df = scrub(_df(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
