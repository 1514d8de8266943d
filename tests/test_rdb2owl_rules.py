"""RDB2OWL class rules 1-2 (A2, X14) and object-property rules r1-r8
(incl. U2 FK-target intersection, A5 union-merge)."""

from knowledgegraphs_spark.operators.po_extraction import (
    FK,
    TableSpec,
    common_stem,
    rdb2owl_classes,
    rdb2owl_object_properties,
)


def spec(name, columns, pks, fks=()):
    return TableSpec(name=name, table_id=0, columns=dict.fromkeys(columns, "xsd:string"),
                     pks=list(pks), fks=list(fks))


PERSON = spec("person", ["pid", "name"], ["pid"])
ADDRESS = spec("address", ["aid", "street"], ["aid"])
JUNCTION = spec(
    "person_address",
    ["pid", "aid"],
    ["pid", "aid"],
    [FK("pid", "person", "pid"), FK("aid", "address", "aid")],
)


def test_common_stem():
    assert common_stem(["person_address", "address"]) == "address"
    assert common_stem(["abc", "xyz"]) == "abc_xyz"  # fallback join
    assert common_stem(["order"]) == "order"


def test_class_rule1_junction_clusters_with_target():
    classes = rdb2owl_classes([PERSON, ADDRESS, JUNCTION])
    # junction's 2nd FK overwrites its set → groups with address (A2),
    # named by the common stem (X14)
    assert classes["person_address"] == "address"
    assert classes["address"] == "address"
    assert classes["person"] == "person"  # rule 2: single PK


def test_class_rule2_conditions():
    no_key = spec("t_nokey", ["a", "b"], ["a", "b"])  # composite PK, no FK, no simple attr
    assert "t_nokey" not in rdb2owl_classes([no_key])
    attr = spec(
        "t_attr", ["x", "y", "note"], ["x", "y"],
        [FK("x", "p", "x"), FK("y", "q", "y")],
    )  # PK ⊆ FK and has a simple attribute
    assert "t_attr" in rdb2owl_classes([attr, spec("p", ["x"], ["x"]), spec("q", ["y"], ["y"])])


def test_objprop_r1_with_inverse():
    orders = spec("orders", ["oid", "cid"], ["oid"], [FK("cid", "person", "pid")])
    classes = rdb2owl_classes([PERSON, orders])
    props = rdb2owl_object_properties([PERSON, orders], classes)
    assert "p_orders_person" in props and "r1" in props["p_orders_person"].rules
    assert "p_person_orders" in props and "r1 inv" in props["p_person_orders"].rules


def test_objprop_r3_r4_junction():
    # person_address merges into 'address' (rule 1), so r3 emits
    # person↔address pairs through the junction's PK⊆FK shape
    tables = [PERSON, ADDRESS, JUNCTION]
    classes = rdb2owl_classes(tables)
    props = rdb2owl_object_properties(tables, classes)
    r3 = {n for n, dr in props.items() if "r3" in dr.rules}
    assert "p_person_address" in r3 and "p_address_person" in r3


def test_objprop_r6_symmetric():
    # PKs==FKs clusters the junction with person (rule 1, stem "person")
    friend = spec(
        "person_friend", ["a", "b"], ["a", "b"],
        [FK("a", "person", "pid"), FK("b", "person", "pid")],
    )
    tables = [PERSON, friend]
    classes = rdb2owl_classes(tables)
    props = rdb2owl_object_properties(tables, classes)
    sym = props.get("has_person")
    assert sym is not None and "r6" in sym.rules
    assert sym.domains == {"person"} and sym.ranges == {"person"}


def test_objprop_r7_self_fk():
    emp = spec(
        "employee", ["eid", "mgr"], ["eid"], [FK("mgr", "employee", "eid")]
    )
    classes = rdb2owl_classes([emp])
    props = rdb2owl_object_properties([emp], classes)
    assert "has_employee" in props and "r7" in props["has_employee"].rules


def test_objprop_r8_shared_fk_target():
    a = spec("a_tbl", ["id", "ref"], ["id"], [FK("ref", "dim", "k")])
    b = spec("b_tbl", ["id", "ref2"], ["id"], [FK("ref2", "dim", "k")])
    dim = spec("dim", ["k"], ["k"])
    tables = [dim, a, b]
    classes = rdb2owl_classes(tables)
    props = rdb2owl_object_properties(tables, classes)
    r8 = {n for n, dr in props.items() if "r8" in dr.rules}
    assert "p_a_tbl_b_tbl" in r8 and "p_b_tbl_a_tbl" in r8


def test_domran_union_merge():
    # two rules producing the same property name union their domains (A5)
    c1 = spec("c1", ["id", "x"], ["id"], [FK("x", "dim", "k")])
    dim = spec("dim", ["k"], ["k"])
    classes = rdb2owl_classes([dim, c1])
    props = rdb2owl_object_properties([dim, c1], classes)
    dr = props["p_c1_dim"]
    assert dr.rules == {"r1"} and dr.domains == {"c1"} and dr.ranges == {"dim"}


def test_objprop_r6_mixed_classed_unclassed_no_selfref():
    """Reference objPropRule6 keeps null tClass() results in the set before
    the size-1 test: a junction referencing one classed and one UNCLASSED
    table yields refs = {person, None} → size 2 → no symmetric property."""
    # 'orphan' is never passed to rdb2owl_classes → unclassed
    mixed = spec(
        "person_orphan", ["a", "b"], ["a", "b"],
        [FK("a", "person", "pid"), FK("b", "orphan", "oid")],
    )
    tables = [PERSON, mixed]
    classes = rdb2owl_classes([PERSON])
    props = rdb2owl_object_properties(tables, classes)
    assert not any("r6" in dr.rules for dr in props.values())
