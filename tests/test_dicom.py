"""S10: stdlib Part-10 DICOM parse → dson tree → S9 triple emission.

The fixture writer emits real Explicit-VR-LE Part-10 bytes with stdlib
struct (preamble, DICM, file meta with transfer syntax, strings, US ints,
DS decimals, a nested SQ with two items, and OW pixel data)."""

import struct

import pytest


def _el(group, elem, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, elem) + vr.encode()
    if vr in ("OB", "OW", "SQ", "UN", "UT"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _pad(s: str) -> bytes:
    b = s.encode()
    return b + (b" " if len(b) % 2 else b"")


def make_dicom(patient="DOE^JANE", pid="P001", rows=4, cols=4, modality="CT") -> bytes:
    meta = _el(0x0002, 0x0010, "UI", _pad("1.2.840.10008.1.2.1"))
    item1 = _el(0x0008, 0x0018, "UI", _pad("1.2.3.1"))
    item2 = _el(0x0008, 0x0018, "UI", _pad("1.2.3.2"))
    seq_body = (
        struct.pack("<HHI", 0xFFFE, 0xE000, len(item1)) + item1 +
        struct.pack("<HHI", 0xFFFE, 0xE000, len(item2)) + item2
    )
    pixel = bytes(range(rows * cols * 2 % 256)) or b"\x00\x00"
    dataset = (
        _el(0x0008, 0x0060, "CS", _pad(modality))
        + _el(0x0010, 0x0010, "PN", _pad(patient))
        + _el(0x0010, 0x0020, "LO", _pad(pid))
        + _el(0x0018, 0x0050, "DS", _pad("2.5"))
        + _el(0x0028, 0x0010, "US", struct.pack("<H", rows))
        + _el(0x0028, 0x0011, "US", struct.pack("<H", cols))
        + _el(0x0008, 0x1140, "SQ", seq_body)
        + _el(0x7FE0, 0x0010, "OW", pixel)
    )
    return b"\x00" * 128 + b"DICM" + meta + dataset


def test_parse_dicom_bytes():
    from knowledgegraphs_spark.sources.dicom import parse_dicom_bytes

    dson, pixel, tags = parse_dicom_bytes(make_dicom())
    assert dson["PatientName"] == "DOE^JANE"
    assert dson["PatientID"] == "P001"
    assert dson["Modality"] == "CT"
    assert dson["Rows"] == 4 and dson["Columns"] == 4
    assert dson["SliceThickness"] == 2.5                     # DS → float
    assert [it["SOPInstanceUID"] for it in dson["ReferencedImageSequence"]] == [
        "1.2.3.1", "1.2.3.2"
    ]
    assert pixel is not None and len(pixel) >= 2             # opaque payload
    assert "PixelData" not in dson
    names = {t[1] for t in tags}
    assert {"PatientName", "ReferencedImageSequence", "Rows"} <= names


def test_parse_dicom_rejects_non_dicom():
    from knowledgegraphs_spark.sources.dicom import parse_dicom_bytes

    with pytest.raises(ValueError):
        parse_dicom_bytes(b"not a dicom file at all, truly")


def test_dicom_scan_to_triples(spark, tmp_path):
    from knowledgegraphs_spark.sources.dicom import dicom_triples, read_dicom

    d = tmp_path / "dcm"
    d.mkdir()
    (d / "a.dcm").write_bytes(make_dicom(patient="DOE^JANE", pid="P001"))
    (d / "b.dcm").write_bytes(make_dicom(patient="ROE^RICK", pid="P002", modality="MR"))

    records, tags = read_dicom(spark, str(d))
    recs = {r["path"].split("/")[-1]: r for r in records.collect()}
    assert len(recs) == 2 and recs["a.dcm"]["payload"] is not None
    tag_rows = {(t["tag"], t["name"], t["vr"]) for t in tags.collect()}
    assert ("(0010,0010)", "PatientName", "PN") in tag_rows

    tri = dicom_triples(spark, str(d))
    got = {(r.subj, r.pred, r.obj) for r in tri.collect()}
    assert ("DICOMObjecta.dcm", "rdf:type", "kg:DICOMObject") in got
    # leaf tags emit literal triples exactly like the S9 JSON path
    assert ("DICOMObjecta.dcm", "has_PatientName", "DOE^JANE") in got
    assert ("DICOMObjectb.dcm", "has_Modality", "MR") in got
    # sequence items became typed child nodes linked from the record
    assert (
        "DICOMObjecta.dcm",
        "has_ReferencedImageSequence",
        "DICOMObjecta.dcm_ReferencedImageSequence0",
    ) in got
    assert (
        "DICOMObjecta.dcm_ReferencedImageSequence1",
        "has_SOPInstanceUID",
        "1.2.3.2",
    ) in got


def test_parse_implicit_vr_le():
    """Implicit VR Little Endian: no VR bytes, 4-byte lengths, types from
    the embedded dictionary."""
    from knowledgegraphs_spark.sources.dicom import parse_dicom_bytes

    def iel(group, elem, value: bytes) -> bytes:
        return struct.pack("<HHI", group, elem, len(value)) + value

    meta = _el(0x0002, 0x0010, "UI", _pad("1.2.840.10008.1.2"))
    dataset = (
        iel(0x0008, 0x0060, _pad("US"))          # Modality (CS via dict)
        + iel(0x0010, 0x0020, _pad("P009"))      # PatientID (LO via dict)
        + iel(0x0028, 0x0010, struct.pack("<H", 7))  # Rows (US via dict)
    )
    dson, pixel, tags = parse_dicom_bytes(b"\x00" * 128 + b"DICM" + meta + dataset)
    assert dson["Modality"] == "US"
    assert dson["PatientID"] == "P009"
    assert dson["Rows"] == 7
    assert pixel is None
    assert ("(0028,0010)", "Rows", "US") in set(tags)


def test_parse_rejects_unknown_transfer_syntax():
    from knowledgegraphs_spark.sources.dicom import parse_dicom_bytes

    meta = _el(0x0002, 0x0010, "UI", _pad("1.2.840.10008.1.2.4.50"))  # JPEG
    with pytest.raises(ValueError, match="transfer syntax"):
        parse_dicom_bytes(b"\x00" * 128 + b"DICM" + meta)
