"""TXT/XML golden replays (reference tests: test.txt/test.json/
test.xml/gb18030_without_bom.text/utf16_with_bom.text + .out)."""

import pytest

from docwire_spark.kernel.api import extract
from tests.conftest import reference_fixture

TXT_GOLDENS = [
    "test.txt",
    "test.json",
    "test.css",
    "test.js",
    "utf16_with_bom.text",
    "gb18030_without_bom.text",
]


@pytest.mark.parametrize("name", TXT_GOLDENS)
def test_txt_golden(name):
    data = reference_fixture(name)
    expected = reference_fixture(name + ".out")
    res = extract(data, url=name)
    assert res.error is None, res.error
    assert res.text == expected, (
        f"mime={res.mime}\n--- got ---\n{res.text!r}\n--- want ---\n{expected!r}"
    )


def test_xml_golden():
    data = reference_fixture("test.xml")
    expected = reference_fixture("test.xml.out")
    res = extract(data, url="test.xml")
    assert res.error is None, res.error
    assert res.mime == "application/xml"
    assert res.text == expected, (
        f"\n--- got ---\n{res.text!r}\n--- want ---\n{expected!r}"
    )
