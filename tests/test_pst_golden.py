"""PST golden parity + robustness (reference tests/1.pst pair)."""

from __future__ import annotations

from docwire_spark.kernel.api import extract
from tests.conftest import reference_fixture


def test_pst_golden_byte_identical():
    data = reference_fixture("1.pst")
    exp = reference_fixture("1.pst.out")
    r = extract(data, url="1.pst")
    assert r.error is None
    assert r.mime == "application/vnd.ms-outlook-pst"
    assert r.text == exp


def test_pst_mail_min_creation_time_filter_golden():
    """standard_filter::filterByMailMinCreationTime semantics: both
    mails predate the threshold, so only the folder skeleton remains
    (reference tests/1.pst.2.out)."""
    data = reference_fixture("1.pst")
    exp = reference_fixture("1.pst.2.out")
    r = extract(data, url="1.pst", mail_min_creation_time=1644216799)
    assert r.error is None
    assert r.text == exp


def test_pst_magic_detection_without_extension():
    data = reference_fixture("1.pst")
    r = extract(data, url="https://x.example/blob")
    assert r.mime == "application/vnd.ms-outlook-pst"
    assert r.error is None


def test_pst_truncations_never_raise():
    data = reference_fixture("1.pst")
    for cut in (0, 4, 100, 564, 1024, 4096, len(data) // 2,
                len(data) - 512):
        r = extract(data[:cut], url="t.pst")  # must not raise
        assert r is not None


def test_pst_mutations_never_raise():
    import random

    data = bytearray(reference_fixture("1.pst"))
    rng = random.Random(11)
    for _ in range(40):
        buf = bytearray(data)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        r = extract(bytes(buf), url="m.pst")
        assert r is not None


def test_password_protected_pst_errors_honestly():
    data = reference_fixture("test_with_password.pst")
    r = extract(data, url="p.pst")
    # either parses (password only gates the client, not the format)
    # or errors per-row — never raises
    assert r is not None
