"""Binary-format parsers through the DISTRIBUTED extraction path.

Each case synthesizes real payloads (classic-xref PDF, OOXML zip,
RTF, RFC-822, ZIP archive) from documents.text inside the Arrow
builder kernel, runs the full extract_pages pipeline on Spark, and
asserts per-row byte identity of the extracted text — the same gate
the driver applies via the DuckDB oracles in ops/extraction_binary.py.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


@pytest.mark.parametrize(
    "fmt,mime,tail",
    [
        ("pdf", "application/pdf", "\n\n"),
        ("docx",
         "application/vnd.openxmlformats-officedocument"
         ".wordprocessingml.document", "\n\n"),
        ("rtf", "application/rtf", "\n\n"),
        ("eml", "message/rfc822", "\n"),
        ("zip", "application/zip", "\n\n"),
        ("pptx",
         "application/vnd.openxmlformats-officedocument"
         ".presentationml.presentation", "\n\n"),
        ("odt", "application/vnd.oasis.opendocument.text", "\n\n"),
    ],
)
def test_roundtrip_byte_identity(spark, fmt, mime, tail):
    from docwire_spark.ops.common import load
    from docwire_spark.ops.extraction_binary import _roundtrip

    expected = {
        r["doc_id"]: r["text"] + tail
        for r in load(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    rows = _roundtrip(spark, SF_DIR, fmt).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert r["error"] is None, (fmt, r["doc_id"], r["error"])
        assert r["mime"] == mime, (fmt, r["doc_id"], r["mime"])
        assert r["extracted_text"] == expected[r["doc_id"]], (fmt, r["doc_id"])


def test_xlsx_roundtrip_grid_render(spark):
    from docwire_spark.ops.common import load
    from docwire_spark.ops.extraction_binary import _roundtrip

    expected = {
        r["doc_id"]: (
            r["text"].ljust(len(r["text"]) + 2)
            + "7".ljust(len(r["text"])) + "\n\n"
        )
        for r in load(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    for r in _roundtrip(spark, SF_DIR, "xlsx").collect():
        assert r["error"] is None
        assert r["extracted_text"] == expected[r["doc_id"]]


def test_binary_dispatch_no_failures(spark):
    from docwire_spark.ops.extraction_binary import extract_binary_dispatch

    rows = extract_binary_dispatch(spark, SF_DIR).collect()
    assert len(rows) == 5  # five distinct mimes
    assert all(r["n_failed"] == 0 for r in rows)


def test_payload_builders_are_deterministic():
    from docwire_spark.ops.extraction_binary import (
        make_docx, make_eml, make_pdf, make_rtf, make_zip,
    )

    for mk in (make_docx, make_pdf, make_rtf, make_zip):
        assert mk("abc 123") == mk("abc 123")
    assert make_eml(7, "abc") == make_eml(7, "abc")
