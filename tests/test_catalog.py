"""Catalog abstraction: URI routing + bucketed parquet layout."""

from knowledgegraphs_spark.sources.catalog import has_iceberg, read_table, write_table


def test_parquet_roundtrip_with_buckets(spark, tmp_path):
    df = spark.createDataFrame([(f"s{i}", i) for i in range(100)], "subj: string, v: int")
    path = str(tmp_path / "t")
    write_table(df, path, bucket_col="subj", n_buckets=4)
    back = read_table(spark, path)
    assert back.count() == 100
    # bucket partition column materialized for co-located downstream joins
    assert "subj_bucket" in back.columns
    assert back.select("subj_bucket").distinct().count() == 4


def test_session_table_roundtrip(spark):
    df = spark.createDataFrame([(1, "a")], "id: int, v: string")
    write_table(df, "table:t_cat_test")
    assert read_table(spark, "table:t_cat_test").count() == 1
    spark.sql("DROP TABLE t_cat_test")


def test_iceberg_detection_without_runtime(spark):
    # sandbox ships no Iceberg jar — detection must be a clean False
    assert has_iceberg(spark) is False


def test_iceberg_route_reaches_catalog_resolution(spark):
    """Runtime-jar scope-out evidence (COVERAGE.md "Storage layer"): the
    sandbox cannot run a real Iceberg round-trip (no runtime jar, no
    network), but the `iceberg:` branch must be exercised to the last
    step we control — building the DataFrameWriterV2 plan with the
    bucket(N, col) transform and submitting it. The failure must come
    from CATALOG RESOLUTION (unknown catalog / not a v2 table), never
    from our routing or transform construction."""
    import pytest as _pytest

    df = spark.createDataFrame([("s1", 1)], "subj: string, v: int")
    with _pytest.raises(Exception) as exc:
        write_table(df, "iceberg:lake.db.t", bucket_col="subj", n_buckets=8)
    msg = str(exc.value)
    # catalog-layer errors, not AttributeError/TypeError from our code
    assert exc.value.__class__.__name__ not in ("AttributeError", "TypeError"), msg
    assert "lake" in msg or "TABLE_OR_VIEW_NOT_FOUND" in msg or "CATALOG" in msg.upper(), msg


def test_iceberg_read_route_uses_table_reader(spark):
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        read_table(spark, "iceberg:lake.db.t").count()
    assert "lake" in str(exc.value) or "not found" in str(exc.value).lower(), str(exc.value)
