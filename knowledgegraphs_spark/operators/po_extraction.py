"""Putative-ontology (PO) extraction: deterministic rules over table schemas.

Reference stage C (``C_POextractor/POntologyExtractor.java:31-40``,
``RDB2OWL/{ClassExtractor,ObjectPropExtractor,DataPropExtractor}.java``):
each table becomes a class; each FK becomes a pure object property
``p_<src>_<tgt>``; each plain attribute column becomes a 3-element path —
object property ``has_<col>`` → attribute class ``<col>_ATTR`` → data
property ``has_<col>_VALUE`` (naming contract ``util/Annotations.java:41-78``).

Schema metadata is tiny, so this runs driver-side — but the *naming
functions* are the shared library code under test, and the resulting PO is
broadcast to every triple-emission task as plain column expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions import naming


@dataclass(frozen=True)
class FK:
    column: str
    ref_table: str
    ref_column: str


@dataclass
class TableSpec:
    """Schema-level description of one input table (reference ``RTable.java:5-37``)."""

    name: str
    table_id: int                      # insertion index (``InsertDataRDB.java:38-45``)
    columns: dict[str, str]            # column → xsd-ish dtype
    pks: list[str]
    fks: list[FK] = field(default_factory=list)

    @property
    def class_name(self) -> str:
        return naming.valid_name(self.name.capitalize())

    def fk_columns(self) -> set[str]:
        return {fk.column for fk in self.fks}

    def attribute_columns(self) -> list[str]:
        """Plain data columns: not part of PK, not an FK (derived schema ops
        PK∩FK / FK−PK, reference ``RTable.java:100-135``)."""
        skip = set(self.pks) | self.fk_columns()
        return [c for c in self.columns if c not in skip]


@dataclass
class ColumnPath:
    """Per-column mapping-file entry: [objMap, classMap, dataMap] — the
    3-slot ordered column mapping of the reference IR
    (``MappingsFiles/MappingsFileTemplate.java:172-217``)."""

    table: str
    column: str
    obj_prop: str      # has_<col>
    attr_class: str    # <col>_ATTR
    data_prop: str     # has_<col>_VALUE
    dtype: str


@dataclass
class PutativeOntology:
    classes: list[str]
    attr_classes: list[str]
    object_properties: dict[str, tuple[str, str]]   # name → (domain, range)
    data_properties: dict[str, tuple[str, str]]     # name → (domain, xsd dtype)
    column_paths: list[ColumnPath]
    tables: dict[str, TableSpec]


def extract_po(specs: list[TableSpec], with_inverses: bool = True) -> PutativeOntology:
    classes, attr_classes = [], []
    obj_props: dict[str, tuple[str, str]] = {}
    data_props: dict[str, tuple[str, str]] = {}
    paths: list[ColumnPath] = []
    by_name = {s.name: s for s in specs}

    for spec in specs:
        classes.append(spec.class_name)
        for fk in spec.fks:
            tgt = by_name[fk.ref_table].class_name
            p = naming.pure_obj_property(spec.class_name, tgt)
            obj_props[p] = (spec.class_name, tgt)
            if with_inverses:
                obj_props[naming.inverse_property(p)] = (tgt, spec.class_name)
        for col in spec.attribute_columns():
            ac = naming.attribute_class(col)
            op = naming.attribute_obj_property(col)
            dp = naming.attribute_data_property(col)
            if ac not in attr_classes:
                attr_classes.append(ac)
            obj_props[op] = (spec.class_name, ac)
            data_props[dp] = (ac, spec.columns[col])
            paths.append(ColumnPath(spec.name, col, op, ac, dp, spec.columns[col]))

    return PutativeOntology(classes, attr_classes, obj_props, data_props, paths, by_name)


# ---------------------------------------------------------------------------
# Full RDB2OWL rule system (reference C-stage):
#   class rules 1-2 + table clustering (A2) + common-stem naming (X14)
#     — ClassExtractor.java:25-88
#   object-property rules r1-r8 incl. FK-target intersection (U2) and
#   symmetric self-references, with DomRan union-merge (A5)
#     — ObjectPropExtractor.java:34-140, Properties.java:22-58
# Schema metadata is tiny → driver-side; outputs broadcast into emission.
# ---------------------------------------------------------------------------


@dataclass
class DomRan:
    """A5: same-named properties union their domains/ranges/rules
    (Properties.java:22-27,50-58)."""

    rules: set[str] = field(default_factory=set)
    domains: set[str] = field(default_factory=set)
    ranges: set[str] = field(default_factory=set)

    def union(self, rule: str, domain: str, range_: str) -> None:
        self.rules.add(rule)
        self.domains.add(domain)
        self.ranges.add(range_)


def _pk_fk_intersection(spec: TableSpec) -> set[str]:
    return set(spec.pks) & spec.fk_columns()


def _fk_pk_difference(spec: TableSpec) -> set[str]:
    """Referenced targets (``refTable.refColumn``) of non-PK FK columns
    (RTable.java:109-117 stores the FK *pointer* string)."""
    return {f"{fk.ref_table}.{fk.ref_column}" for fk in spec.fks if fk.column not in spec.pks}


def _pks_eq_fks(spec: TableSpec) -> bool:
    return spec.fk_columns() == set(spec.pks)


def _pks_subset_fks(spec: TableSpec) -> bool:
    return set(spec.pks) <= spec.fk_columns()


def _has_simple_attribute(spec: TableSpec) -> bool:
    return any(c not in spec.pks and c not in spec.fk_columns() for c in spec.columns)


def common_stem(names: list[str]) -> str:
    """X14: longest substring of names[0] contained in every name; fallback
    ``join("_")`` (ClassExtractor.java:63-88)."""
    if not names:
        return ""
    s = names[0]
    best = ""
    for i in range(len(s)):
        for j in range(i + 1, len(s) + 1):
            stem = s[i:j]
            if len(stem) > len(best) and all(stem in n for n in names[1:]):
                best = stem
    return best if best else "_".join(names)


def rdb2owl_classes(specs: list[TableSpec]) -> dict[str, str]:
    """Class rules 1-2: junction tables (PKs==FKs) cluster with their FK
    targets under a common-stem class; remaining tables become their own
    class when keyed/intersected/attributed (ClassExtractor.java:25-60)."""
    by_name = {s.name: s for s in specs}
    set_of_table: dict[str, int] = {}
    n_sets = 0
    for spec in specs:
        if spec.fks and _pks_eq_fks(spec):
            for fk in spec.fks:
                if fk.ref_table in set_of_table:
                    set_of_table[spec.name] = set_of_table[fk.ref_table]
                else:
                    set_of_table[spec.name] = n_sets
                    set_of_table[fk.ref_table] = n_sets
                    n_sets += 1
    groups: dict[int, list[str]] = {}
    for t, g in set_of_table.items():
        groups.setdefault(g, []).append(t)

    table_classes: dict[str, str] = {}
    for members in groups.values():
        ordered = [s.name for s in specs if s.name in members]
        cls = naming.valid_name(common_stem(ordered))
        for t in ordered:
            table_classes[t] = cls
    for spec in specs:  # rule 2
        if spec.name not in table_classes and (
            len(spec.pks) == 1
            or len(_pk_fk_intersection(spec)) >= 1
            or (_has_simple_attribute(spec) and _pks_subset_fks(spec))
        ):
            table_classes[spec.name] = naming.valid_name(spec.name)
    _ = by_name
    return table_classes


def rdb2owl_object_properties(
    specs: list[TableSpec], table_classes: dict[str, str]
) -> dict[str, DomRan]:
    """Rules r1-r8 (ObjectPropExtractor.java:34-140) with A5 merging."""
    props: dict[str, DomRan] = {}
    by_name = {s.name: s for s in specs}

    def cls(table: str) -> str | None:
        return table_classes.get(table)

    def add(rule: str, domain: str, range_: str, name: str | None = None) -> None:
        name = name or naming.pure_obj_property(domain, range_)
        props.setdefault(name, DomRan()).union(rule, domain, range_)

    for spec in specs:
        this = cls(spec.name)
        inter = _pk_fk_intersection(spec)

        # r1: non-PK FK onto a PK column of another class
        for fk in spec.fks:
            other = cls(fk.ref_table)
            ref_spec = by_name.get(fk.ref_table)
            if (
                this and other and this != other
                and fk.column not in spec.pks
                and ref_spec is not None and fk.ref_column in ref_spec.pks
            ):
                add("r1", this, other)
                add("r1 inv", other, this)

        # r2: composite key with FK overlap plus extra attributes
        if this and len(spec.pks) > 1 and inter and len(spec.columns) > len(spec.pks):
            for key in inter:
                fkp = next((fk for fk in spec.fks if fk.column == key), None)
                if fkp:
                    other = cls(fkp.ref_table)
                    if other and other != this:
                        add("r2", this, other)

        # r3/r4: PK ⊆ FK relates every referenced class pair (and the table)
        if _pks_subset_fks(spec):
            for fk1 in spec.fks:
                o1 = cls(fk1.ref_table)
                if not o1:
                    continue
                for fk2 in spec.fks:
                    o2 = cls(fk2.ref_table)
                    if o2 and o1 != o2:
                        add("r3", o1, o2)
                    if this:
                        if this != o1:
                            add("r4", o1, this)
                        if o2 and this != o2:
                            add("r4", o2, this)

        # r6: even composite key entirely referencing ONE table → symmetric.
        # The unclassed results (None) stay IN the set before the size test,
        # exactly like the reference's HashSet of tClass() results
        # (ObjectPropExtractor.objPropRule6): a junction referencing one
        # classed and one unclassed table has refs = {C, None} → size 2 →
        # no property.
        if len(spec.pks) % 2 == 0 and len(spec.pks) > 0 and _pks_subset_fks(spec):
            refs = {cls(fk.ref_table) for fk in spec.fks if fk.column in inter}
            if len(refs) == 1:
                c = refs.pop()
                if c:
                    add("r6", c, c, name=f"has_{c}")

        # r7: FK to own PK → symmetric self-reference
        if this:
            for fk in spec.fks:
                if fk.ref_table == spec.name and fk.ref_column in spec.pks:
                    add("r7", this, this, name=f"has_{this}")

        # r8 (U2): shared non-PK FK targets across tables
        if this:
            mine = _fk_pk_difference(spec)
            if mine:
                for other_spec in specs:
                    other = cls(other_spec.name)
                    if other and other != this and mine & _fk_pk_difference(other_spec):
                        add("r8", this, other)

    return props


# --- the transcripts PO (fixed: schema is pinned by the input hint) ---------

CONVERSATION_SPEC = TableSpec(
    name="conversation", table_id=1, columns={"conv_id": "xsd:string"}, pks=["conv_id"]
)
TURN_SPEC = TableSpec(
    name="turn",
    table_id=2,
    columns={
        "conv_id": "xsd:string",
        "turn_idx": "xsd:integer",
        "role": "xsd:string",
        "text": "xsd:string",
        "tool": "xsd:string",
        "ts": "xsd:dateTime",
    },
    pks=["conv_id", "turn_idx"],
    fks=[FK("conv_id", "conversation", "conv_id")],
)


def transcript_po() -> PutativeOntology:
    return extract_po([CONVERSATION_SPEC, TURN_SPEC])
