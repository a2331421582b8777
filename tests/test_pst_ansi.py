"""ANSI-PST generation support (MS-PST wVer 14/15, 32-bit layout).

The fixture is written by tests/pst_builder.py from the public spec —
the reference handles both generations via libpff (pst_parser.cpp), so
the ANSI path needs parity even though the golden corpus ships only a
Unicode PST.
"""

from __future__ import annotations

import pytest

from docwire_spark.kernel.api import extract
from tests.pst_builder import build_ansi_pst


def test_ansi_pst_extracts_folder_mail_attachment():
    data = build_ansi_pst()
    r = extract(data, url="a.pst")
    assert r.error is None
    assert r.mime == "application/vnd.ms-outlook-pst"
    assert b"Inbox" in r.text
    assert b"hello ansi" in r.text
    assert b"ansi body" in r.text
    assert b"note.txt" in r.text
    assert b"attachment text" in r.text


def test_ansi_pst_crypt_permute_roundtrip():
    """crypt=1 (NDB_CRYPT_PERMUTE) and crypt=0 must extract to
    byte-identical text — proves the completed decode table inverts
    the spec encode table on the ANSI block path."""
    plain = extract(build_ansi_pst(crypt=0), url="a.pst")
    enc = extract(build_ansi_pst(crypt=1), url="a.pst")
    assert plain.error is None and enc.error is None
    assert plain.text == enc.text


def test_ansi_pst_min_creation_time_filter():
    """filterByMailMinCreationTime on the ANSI path: the message (and
    its attachments) disappear, the folder skeleton stays."""
    data = build_ansi_pst(creation_unix=1_700_000_000)
    kept = extract(data, url="a.pst", mail_min_creation_time=1_600_000_000)
    dropped = extract(data, url="a.pst",
                      mail_min_creation_time=1_800_000_000)
    assert kept.error is None and dropped.error is None
    assert b"ansi body" in kept.text
    assert b"ansi body" not in dropped.text
    assert b"attachment text" not in dropped.text
    assert b"Inbox" in dropped.text


def test_ansi_pst_truncations_never_raise():
    data = build_ansi_pst()
    for cut in (0, 4, 100, 511, 512, 1024, len(data) // 2):
        r = extract(data[:cut], url="t.pst")
        assert r is not None


def test_permute_table_is_complete_bijection():
    from docwire_spark.kernel.pst_extract import PERMUTE_D, PERMUTE_E

    assert sorted(PERMUTE_E) == list(range(256))
    assert sorted(PERMUTE_D) == list(range(256))
    for p in range(256):
        assert PERMUTE_D[PERMUTE_E[p]] == p


def test_unicode_golden_still_passes_with_completed_table():
    from tests.conftest import reference_fixture

    data = reference_fixture("1.pst")
    exp = reference_fixture("1.pst.out")
    assert extract(data, url="1.pst").text == exp


def test_ansi_multipage_btree_and_xblock_data_tree():
    """The reader paths a single-leaf fixture cannot reach: a 2-level
    NBT (ANSI BTENTRY intermediate pages) and a chunked attachment
    under an XBLOCK (u32-stride data tree), both through the permute
    crypt."""
    from tests.pst_builder import build_ansi_pst_multi

    big = (b"0123456789abcdef" * 400)[:6100]  # 4 chunks -> XBLOCK
    msgs = [
        (f"subject {i:03d}", 1_700_000_000 + i,
         f"<p>body {i:03d}</p>".encode(), [])
        for i in range(40)
    ]
    msgs.append(("big one", 1_700_100_000, b"<p>big body</p>",
                 [("big.txt", big)]))
    data = build_ansi_pst_multi([("Inbox", msgs)])
    r = extract(data, url="big.pst")
    assert r.error is None
    for i in range(40):
        assert f"subject {i:03d}".encode() in r.text
    assert big in r.text                       # data tree reassembled
    plain = extract(build_ansi_pst_multi([("Inbox", msgs)], crypt=0),
                    url="big.pst")
    assert plain.text == r.text                # crypt roundtrip holds
