"""The naming contract: label normalization, IRI-safe names, and the
predicate/class name constructors.

These functions determine triple P/R more than anything else (SURVEY.md §7
"hard parts"), so they exist in two exactly-equivalent forms:

* pure-Python (driver-side schema work, and the pytest oracle), and
* Spark ``Column`` expressions (JVM-side, codegen'd — no Python in the hot
  path).

Semantics mirror reference ``util/Annotations.java``:
  * ``normalise``  — :91-111: strip ``[``/``]``/``,``, ``_``→space, drop the
    ``p `` prefix and `` VALUE``/`` ATTR`` suffixes, collapse ``has is``→``is``.
  * ``valid_name`` — :114-121: replace ``[/\\%# ]`` with ``_`` (IRI-safe).
  * constructors  — :41-78: ``p_<domain>_<range>``, ``has_<x>``,
    ``has_<x>_VALUE``, ``<attr>_ATTR``, inverse ``p_B_A``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pure-Python form ------------------------------------------------------

_STRIP_CHARS = re.compile(r"[\[\],]")
_INVALID_IRI = re.compile(r"[/\\%# ]")


def normalise(label: str, lowercase: bool = True) -> str:
    """Human-comparable form of an ontology element label.

    Exact reference behavior: ALL occurrences of ``p ``/`` VALUE``/`` ATTR``
    are removed (plain substring replace, not anchored), and a leading
    ``has is`` keeps only ``is ...``.
    """
    s = _STRIP_CHARS.sub("", label)
    s = s.replace("_", " ")
    s = s.replace("p ", "").replace(" VALUE", "").replace(" ATTR", "")
    if s.startswith("has is"):
        s = s[4:]
    return s.lower() if lowercase else s


def valid_name(name: str) -> str:
    """IRI-safe local name."""
    return _INVALID_IRI.sub("_", name)


def pure_obj_property(domain: str, range_: str) -> str:
    return f"p_{valid_name(domain)}_{valid_name(range_)}"


def inverse_property(prop: str) -> str:
    """p_A_B → p_B_A (only meaningful for pure object properties)."""
    if prop.startswith("p_"):
        parts = prop[2:].rsplit("_", 1)
        if len(parts) == 2:
            return f"p_{parts[1]}_{parts[0]}"
    return f"inv_{prop}"


def attribute_obj_property(attr: str) -> str:
    return f"has_{valid_name(attr)}"


def attribute_data_property(attr: str) -> str:
    return f"has_{valid_name(attr)}_VALUE"


def attribute_class(attr: str) -> str:
    return f"{valid_name(attr)}_ATTR"


def local_name(uri: str) -> str:
    """Extract the fragment after the last ``/`` or ``#``."""
    m = re.search(r"[/#]([^/#]+)$", uri)
    return m.group(1) if m else uri


# --- Column form (identical semantics, JVM-side) ---------------------------


def normalise_col(c: Column, lowercase: bool = True) -> Column:
    s = F.regexp_replace(c, r"[\[\],]", "")
    s = F.regexp_replace(s, "_", " ")
    s = F.regexp_replace(s, r"p ", "")
    s = F.regexp_replace(s, r" VALUE", "")
    s = F.regexp_replace(s, r" ATTR", "")
    s = F.regexp_replace(s, r"^has is", "is")
    return F.lower(s) if lowercase else s


def valid_name_col(c: Column) -> Column:
    return F.regexp_replace(c, r"[/\\%# ]", "_")


def local_name_col(c: Column) -> Column:
    return F.coalesce(
        F.nullif(F.regexp_extract(c, r"[/#]([^/#]+)$", 1), F.lit("")), c
    )


def soundex_py(s: str | None) -> str | None:
    """Pure-Python twin of Spark's JVM ``F.soundex`` (American Soundex,
    the Commons-codec variant: H/W are transparent — they neither emit
    nor reset the previous code). Used to build the x17 oracle's
    vocabulary mapping at SQL-build time (the d2b pattern) and pinned
    against ``F.soundex`` hash-by-hash in pytest."""
    if not s:
        return None
    letters = [c for c in s.upper() if c.isalpha()]
    if not letters:
        return None
    codes = {
        **{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
        **{c: "3" for c in "DT"}, "L": "4", **{c: "5" for c in "MN"}, "R": "6",
    }
    out = letters[0]
    prev = codes.get(letters[0], "")
    for c in letters[1:]:
        code = codes.get(c, "")
        if code and code != prev:
            out += code
        if c not in "HW":
            prev = code
        if len(out) == 4:
            break
    return (out + "000")[:4]
