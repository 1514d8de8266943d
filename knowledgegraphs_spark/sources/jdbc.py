"""S7/S8: JDBC schema scan + parallel JDBC table scan.

S7 mirrors the reference's ``RelationalDB.retrieveSchema``
(``RelationalDB.java:49-89`` over ``Connectors/SQLConnector.java:69-93``):
tables → columns (``TYPE_NAME``) → primary keys → imported foreign keys,
all from ``java.sql.DatabaseMetaData`` — reached through Spark's live JVM
(py4j), so any JDBC driver already on the executor classpath works with no
extra Python dependency. Column types map to XSD via the exact
``XSDmappers.SQL2XSD`` switch (``XSDmappers.java:20-64``).

S8 is ``spark.read.jdbc`` with explicit partitioning options: a scan
without ``partitionColumn/numPartitions`` is ONE executor pulling the
whole table over one connection — fine for dims, wrong for facts; the
reference is single-connection by construction (``SQLConnector.java:96-98``),
this is where the Spark version goes wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.po_extraction import FK, TableSpec

# XSDmappers.SQL2XSD (XSDmappers.java:20-64), verbatim
_SQL2XSD = {
    **dict.fromkeys(("int", "integer", "tinyint", "smallint", "mediumint", "bigint"), "xsd:integer"),
    **dict.fromkeys(("float", "double", "decimal", "numeric"), "xsd:decimal"),
    "date": "xsd:date",
    "time": "xsd:time",
    **dict.fromkeys(("datetime", "timestamp"), "xsd:dateTime"),
    "year": "xsd:gYear",
    **dict.fromkeys(
        ("char", "varchar", "text", "tinytext", "mediumtext", "longtext", "string"), "xsd:string"
    ),
    **dict.fromkeys(
        ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob"), "xsd:base64Binary"
    ),
    **dict.fromkeys(("boolean", "bit"), "xsd:boolean"),
}


def sql_type_to_xsd(sql_type: str) -> str:
    return _SQL2XSD.get((sql_type or "").lower(), "unknown")


def scan_jdbc_schema(
    spark: SparkSession,
    url: str,
    user: str | None = None,
    password: str | None = None,
    schema_pattern: str | None = None,
) -> list[TableSpec]:
    """S7: one driver-side metadata pass (schemas are tiny by definition)
    → ``TableSpec`` list ready for the RDB2OWL class/property rules and FK
    inference. ``table_id`` is discovery order, like the reference's
    insertion index."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    if user is not None:
        props.setProperty("user", user)
    if password is not None:
        props.setProperty("password", password)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        meta = conn.getMetaData()
        gateway = spark.sparkContext._gateway
        types = gateway.new_array(jvm.java.lang.String, 1)
        types[0] = "TABLE"
        rs = meta.getTables(None, schema_pattern, "%", types)
        tables: list[tuple[str | None, str]] = []
        while rs.next():
            tables.append((rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME")))
        rs.close()

        specs: list[TableSpec] = []
        for tid, (schem, name) in enumerate(tables):
            columns: dict[str, str] = {}
            rs = meta.getColumns(None, schem, name, "%")
            while rs.next():
                columns[rs.getString("COLUMN_NAME")] = sql_type_to_xsd(rs.getString("TYPE_NAME"))
            rs.close()
            pks: list[str] = []
            rs = meta.getPrimaryKeys(None, schem, name)
            while rs.next():
                pks.append(rs.getString("COLUMN_NAME"))
            rs.close()
            fks: list[FK] = []
            rs = meta.getImportedKeys(None, schem, name)
            while rs.next():
                fks.append(
                    FK(
                        rs.getString("FKCOLUMN_NAME"),
                        rs.getString("PKTABLE_NAME"),
                        rs.getString("PKCOLUMN_NAME"),
                    )
                )
            rs.close()
            specs.append(TableSpec(name=name, table_id=tid, columns=columns, pks=pks, fks=fks))
        return specs
    finally:
        conn.close()


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """S8: typed table scan. With ``partition_column`` + bounds +
    ``num_partitions`` the read fans out to parallel range queries (the
    100-TB path); without them it is a single-connection scan for dims."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table).option(
        "fetchsize", str(fetchsize)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError("partition_column needs num_partitions, lower_bound, upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()
