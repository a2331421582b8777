"""DICOM golden parity + robustness (reference tests/1.DCM pair)."""

from __future__ import annotations

from docwire_spark.kernel.api import extract
from docwire_spark.kernel.dicom_extract import is_dicom
from tests.conftest import reference_fixture


def test_dicom_golden_byte_identical():
    data = reference_fixture("1.DCM")
    exp = reference_fixture("1.DCM.out")
    r = extract(data, url="1.DCM")
    assert r.error is None
    assert r.mime == "application/dicom"
    assert r.text == exp


def test_dicom_magic_detection_without_extension():
    data = reference_fixture("1.DCM")
    r = extract(data, url="https://x.example/blob")  # no .dcm hint
    assert r.mime == "application/dicom"
    assert r.error is None


def test_dicom_truncations_never_raise():
    data = reference_fixture("1.DCM")
    for cut in (0, 131, 132, 140, 200, 1000, len(data) // 2):
        r = extract(data[:cut], url="t.dcm")  # must not raise
        assert r is not None


def test_is_dicom():
    assert not is_dicom(b"")
    assert not is_dicom(b"\x00" * 200)
    assert is_dicom(b"\x00" * 128 + b"DICM" + b"\x00" * 8)
