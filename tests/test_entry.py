"""Driver-contract conformance: every queries() entry with an oracle must
match DuckDB at sf0.01 (row count + schema + order-insensitive values)."""

import pytest

import __spark_entry__ as entry_mod
from tests.duck_compare import compare, duck_connection

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


def _oracle_keys():
    return sorted(entry_mod.oracle_sql().keys())


def test_all_queries_have_callables():
    qs = entry_mod.queries()
    for k in entry_mod.oracle_sql():
        assert k in qs, f"oracle_sql has {k} but queries() doesn't"


@pytest.mark.parametrize("name", _oracle_keys())
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    result = compare(q(spark, SF), duck, sql)
    assert result["rowcount_match"], result
    assert result["schema_match"], result
    assert result["values_match"], {k: v for k, v in result.items() if k != "values_match"} | {
        "spark_only": result.get("spark_only"), "duck_only": result.get("duck_only")
    }


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["subj", "pred", "obj", "obj_dtype", "is_literal"]
