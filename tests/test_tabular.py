"""S1/S3-S6: delimiter sniff, header repair, vote-based type inference,
synthetic PK — semantics per TabularFilesReader.java (see module docstring).
"""

import pytest

from knowledgegraphs_spark.sources.tabular import (
    PK_COL,
    add_synthetic_pk,
    apply_inferred_types,
    decide_type,
    drop_empty_unknown_columns,
    infer_column_types,
    repair_headers,
    sniff_delimiter,
)


def test_sniff_delimiter():
    assert sniff_delimiter("a,b,c") == ","
    assert sniff_delimiter("a\tb\tc") == "\t"
    assert sniff_delimiter("a;b;c,d") == ";"
    # ties: first symbol to reach the max count wins (reference running max)
    assert sniff_delimiter("a,b;c") == ","
    assert sniff_delimiter("abc") is None
    # underscores and word chars are never delimiters
    assert sniff_delimiter("a_b|c_d") == "|"


def test_repair_headers():
    assert repair_headers(["a", "b"], 2) == ["a", "b"]
    # duplicate gets _<i+1> (1-based position)
    assert repair_headers(["a", "a"], 2) == ["a", "a_2"]
    # empties become Unknown_Header_k
    assert repair_headers(["", "b", ""], 3) == ["Unknown_Header_1", "b", "Unknown_Header_2"]
    # ragged tail padded
    assert repair_headers(["a"], 3) == ["a", "Unknown_Header_1", "Unknown_Header_2"]


class TestDecideType:
    """The pure decision tree over vote counters (TabularFilesReader.java:258-389)."""

    def test_bool_zero_one(self):
        # {0,1} → boolean
        assert decide_type(4, 0, 0, 4, 0, 0, 0, 0, 2, True, True) == "boolean"

    def test_bool_single_value(self):
        # {true} → boolean
        assert decide_type(3, 1, 0, 0, 0, 2, 2, 0, 1, False, True) == "boolean"

    def test_not_bool_true_one(self):
        # {true,1} fails the pair rule → falls to int (1 parses, 'true' doesn't → varchar)
        assert decide_type(2, 0, 0, 1, 0, 1, 1, 0, 2, False, True) == "varchar"

    def test_all_dates(self):
        assert decide_type(3, 1, 2, 0, 0, 2, 2, 2, 2, False, False) == "timestamp"

    def test_date_majority_varchar(self):
        # some dates but not all, dates outnumber numerics → varchar
        assert decide_type(4, 0, 2, 1, 0, 3, 3, 4, 4, False, False) == "varchar"

    def test_double(self):
        assert decide_type(3, 0, 0, 1, 2, 2, 0, 3, 3, False, False) == "double"

    def test_int(self):
        assert decide_type(3, 1, 0, 2, 0, 0, 0, 2, 2, False, False) == "int"

    def test_all_sentinels_is_int(self):
        # all-sentinel column: reference appends nulls into an IntColumn
        assert decide_type(2, 2, 0, 0, 0, 0, 0, 0, 0, False, False) == "int"


@pytest.fixture(scope="module")
def typed_df(spark):
    rows = [
        ("1", "1,5", "0", "15/3/2001", "hello", "-", "x"),
        ("2", "2.5", "1", "2020-01-15", "world", "none", "-"),
        ("-", "3", "0", "1999", "foo", "null", ""),
        ("4", "4e2", "true", "12-2020", "2001-01-01", "", "-"),
    ]
    return spark.createDataFrame(
        rows, ["c_int", "c_dbl", "c_bool", "c_date", "c_text", "c_sent", "Unknown_Header_1"]
    )


def test_infer_column_types(spark, typed_df):
    t = infer_column_types(typed_df)
    assert t["c_int"] == "int"
    assert t["c_dbl"] == "double"
    # {0,1,true} is 3 distinct values → not boolean; 'true' kills int/double
    assert t["c_bool"] == "varchar"
    # all four values are valid date shapes → timestamp
    assert t["c_date"] == "timestamp"
    assert t["c_text"] == "varchar"
    # all sentinels → int (reference behavior)
    assert t["c_sent"] == "int"


def test_apply_inferred_types(spark, typed_df):
    t = infer_column_types(typed_df)
    out = apply_inferred_types(typed_df, t)
    rows = {r.c_int: r for r in out.collect()}
    assert rows[1].c_dbl == 1.5  # ,→. repair
    assert rows[4].c_dbl == 400.0  # exponent
    assert rows[1].c_date == "2001-03-15"  # d/M/yyyy normalized
    assert rows[4].c_date == "2020-12-01"  # M-yyyy → day 01
    assert None in rows  # '-' sentinel → NULL int


def test_pure_bool_column(spark):
    df = spark.createDataFrame([("0",), ("1",), ("-",)], ["b"])
    t = infer_column_types(df)
    assert t["b"] == "boolean"
    vals = {r.b for r in apply_inferred_types(df, t).collect()}
    assert vals == {True, False, None}


def test_drop_empty_unknown_columns(spark):
    df = spark.createDataFrame(
        [("a", "", "x"), ("b", "-", "y")], ["keep", "Unknown_Header_1", "Unknown_Header_2"]
    )
    out = drop_empty_unknown_columns(df)
    assert out.columns == ["keep", "Unknown_Header_2"]


def test_add_synthetic_pk(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], ["k"])
    out = add_synthetic_pk(df, ["k"]).orderBy("k").collect()
    assert [r[PK_COL] for r in out] == ["1", "2", "3"]
    assert out[0].k == "a"


# --- S2: Excel scan ----------------------------------------------------------


def _write_min_xlsx(path: str) -> None:
    """Emit a minimal valid OOXML workbook with stdlib zipfile: shared
    strings, numerics, booleans, a duplicate header, a ragged row and an
    empty Unknown column."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared = ["name", "amount", "flag", "alice", "bob"]
    sst = (
        f'<?xml version="1.0"?><sst {ns} count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    # headers: name, amount, flag, name (dup), <empty>  → repair kicks in
    sheet = f'''<?xml version="1.0"?><worksheet {ns}><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>0</v></c></row>
<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>12.5</v></c><c r="C2" t="b"><v>1</v></c><c r="D2" t="s"><v>3</v></c><c r="E2"><v>7</v></c></row>
<row r="3"><c r="A3" t="inlineStr"><is><t>bob</t></is></c><c r="B3"><v>3</v></c><c r="C3" t="b"><v>0</v></c></row>
</sheetData></worksheet>'''
    workbook = (
        f'<?xml version="1.0"?><workbook {ns}><sheets>'
        '<sheet name="Sheet1" sheetId="1"/></sheets></workbook>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_s2_excel_scan_through_inference(spark, tmp_path):
    from knowledgegraphs_spark.sources.tabular import infer_column_types, read_excel

    p = str(tmp_path / "mini.xlsx")
    _write_min_xlsx(p)
    df = read_excel(spark, p)
    # duplicate header deduped, ragged 5th column became Unknown_Header_1
    # and survived (it has a value in row 2)
    assert df.columns == ["name", "amount", "flag", "name_4", "Unknown_Header_1"]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["alice"]["amount"] == "12.5"
    assert rows["alice"]["flag"] == "true"
    assert rows["bob"]["flag"] == "false"
    assert rows["bob"]["Unknown_Header_1"] == ""
    types = infer_column_types(df)
    assert types["amount"] == "double"
    assert types["flag"] == "boolean"
    assert types["name"] == "varchar"


def test_s2_excel_empty_unknown_column_dropped(spark, tmp_path):
    import zipfile

    from knowledgegraphs_spark.sources.tabular import read_excel

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = f'''<?xml version="1.0"?><worksheet {ns}><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v></v></c></row>
</sheetData></worksheet>'''
    p = str(tmp_path / "rag.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    df = read_excel(spark, p)
    # the ragged all-empty tail column is repaired then dropped (S4)
    assert df.columns == ["h"]
