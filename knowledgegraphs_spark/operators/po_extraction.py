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
