"""Naming contract (X1-X3, X15) — both Python and Column forms agree."""

import pytest

from knowledgegraphs_spark.functions import naming


def test_normalise():
    assert naming.normalise("p_person_account") == "person account"
    assert naming.normalise("has_occupation_VALUE") == "has occupation"
    assert naming.normalise("occupation_ATTR") == "occupation"
    assert naming.normalise("[first,name]") == "firstname"
    assert naming.normalise("has_is_active", lowercase=False) == "is active"


def test_valid_name():
    assert naming.valid_name("a/b\\c%d#e f") == "a_b_c_d_e_f"


def test_constructors():
    assert naming.pure_obj_property("Person", "Account") == "p_Person_Account"
    assert naming.inverse_property("p_Person_Account") == "p_Account_Person"
    assert naming.attribute_obj_property("occupation") == "has_occupation"
    assert naming.attribute_data_property("occupation") == "has_occupation_VALUE"
    assert naming.attribute_class("occupation") == "occupation_ATTR"


def test_local_name():
    assert naming.local_name("http://x.org/onto#Person") == "Person"
    assert naming.local_name("http://x.org/onto/Person") == "Person"
    assert naming.local_name("Person") == "Person"


@pytest.mark.parametrize(
    "label",
    ["p_person_account", "has_occupation_VALUE", "occupation_ATTR", "[a,b]_c", "Hello World"],
)
def test_column_form_matches_python(spark, label):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(label,)], "label string")
    got = df.select(
        naming.normalise_col(F.col("label")).alias("n"),
        naming.valid_name_col(F.col("label")).alias("v"),
        naming.local_name_col(F.col("label")).alias("l"),
    ).first()
    assert got["n"] == naming.normalise(label)
    assert got["v"] == naming.valid_name(label)
    assert got["l"] == naming.local_name(label)
