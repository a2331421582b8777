"""Golden-file byte-identity tests replaying the reference's HTML
fixtures (reference harness: tests/document_parsing_tests.cpp:125-147,
full-string EXPECT_EQ against N.html.out)."""

import pytest

from docwire_spark.kernel.api import extract
from tests.conftest import reference_fixture

HTML_GOLDENS = [
    "1.html", "2.html", "3.html", "4.html", "5.html",
    "6.html", "7.html", "8.html", "9.html",
    "nested_tables.html",
    pytest.param(
        "embedded_images.html",
        marks=pytest.mark.xfail(
            reason="golden embeds tesseract OCR output of data-URL images; "
            "no OCR engine in this environment (reference ocr_parser.cpp)",
            strict=True,
        ),
    ),
]


@pytest.mark.parametrize("name", HTML_GOLDENS)
def test_html_golden(name):
    data = reference_fixture(name)
    expected = reference_fixture(name + ".out")
    res = extract(data, url=name)
    assert res.error is None, res.error
    assert res.mime in ("text/html", "application/xhtml+xml")
    assert res.text == expected, (
        f"\n--- got ---\n{res.text!r}\n--- want ---\n{expected!r}"
    )
