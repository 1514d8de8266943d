"""S7/S8 against a real embedded Derby database (driver ships with Spark):
schema scan → TableSpec → RDB2OWL rules, and the parallel table scan."""

import pytest


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/kgdb;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE person (pid INT PRIMARY KEY, name VARCHAR(40), born DATE)"
    )
    st.executeUpdate(
        "CREATE TABLE orders (oid INT PRIMARY KEY, pid INT REFERENCES person(pid), "
        "amount DECIMAL(10,2))"
    )
    for i in range(1, 21):
        st.executeUpdate(f"INSERT INTO person VALUES ({i}, 'p{i}', DATE('2020-01-0{i % 9 + 1}'))")
        st.executeUpdate(f"INSERT INTO orders VALUES ({100 + i}, {i}, {i}.50)")
    st.close()
    conn.close()
    return url


def test_s7_schema_scan_to_rdb2owl(spark, derby_url):
    from knowledgegraphs_spark.operators.po_extraction import (
        rdb2owl_classes,
        rdb2owl_object_properties,
    )
    from knowledgegraphs_spark.sources.jdbc import scan_jdbc_schema

    specs = {s.name: s for s in scan_jdbc_schema(spark, derby_url)}
    assert set(specs) == {"PERSON", "ORDERS"}
    person, orders = specs["PERSON"], specs["ORDERS"]
    # SQL2XSD typing straight from JDBC TYPE_NAME
    assert person.columns == {"PID": "xsd:integer", "NAME": "xsd:string", "BORN": "xsd:date"}
    assert orders.columns["AMOUNT"] == "xsd:decimal"
    assert person.pks == ["PID"] and orders.pks == ["OID"]
    assert [(f.column, f.ref_table, f.ref_column) for f in orders.fks] == [
        ("PID", "PERSON", "PID")
    ]
    # the scanned schema drives the same class/property rules as files
    tables = list(specs.values())
    classes = rdb2owl_classes(tables)
    props = rdb2owl_object_properties(tables, classes)
    r1 = {n for n, dr in props.items() if "r1" in dr.rules}
    # Derby uppercases identifiers; the FK drives an r1 property + inverse
    assert any("ORDERS" in n.upper() and "PERSON" in n.upper() for n in r1), (r1, classes)


def test_s8_table_scan_parallel(spark, derby_url):
    from knowledgegraphs_spark.sources.jdbc import read_jdbc_table

    df = read_jdbc_table(
        spark, derby_url, "person",
        partition_column="pid", num_partitions=4, lower_bound=1, upper_bound=21,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 20
    assert {r["PID"] for r in rows} == set(range(1, 21))
    # dim-style single-connection scan agrees
    single = read_jdbc_table(spark, derby_url, "orders").count()
    assert single == 20
