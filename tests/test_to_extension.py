"""Reverse mime->extension map (reference to_extension,
content_type_by_file_extension.cpp:1341-1348)."""

from docwire_spark.kernel.sniff import EXTENSION_MIME, to_extension


def test_known_mimes_roundtrip():
    assert to_extension("text/html") == "html"
    assert to_extension("application/pdf") == "pdf"
    # first occurrence in the vendored list wins, matching the
    # reference's try_emplace loop: .jpeg precedes .jpg
    # (content_type_by_file_extension.cpp:980-982)
    assert to_extension("image/jpeg") == "jpeg"
    assert to_extension("application/zip") == "zip"


def test_vendored_db_parity_with_reference_table():
    """The vendored multimap matches the reference's generated list in
    size and spot rows (§2.2 'full mime-db' parity)."""
    from docwire_spark.kernel.mime_db import MIME_DB_PAIRS
    from docwire_spark.kernel.sniff import EXT_TO_MIMES

    assert len(MIME_DB_PAIRS) == 1284
    assert "application/xml" in EXT_TO_MIMES["xml"]
    assert "application/xml" in EXT_TO_MIMES["xsl"]
    assert "text/javascript" in EXT_TO_MIMES["js"]
    assert EXT_TO_MIMES["ez"] == ["application/andrew-inset"]
    # multimap rows survive (rtf maps to two mimes in mime-db)
    assert len(EXT_TO_MIMES["rtf"]) >= 2
    # curated fill for extensions the db lacks
    assert EXT_TO_MIMES["dcm"] == ["application/dicom"]


def test_unknown_mime_is_none():
    assert to_extension("application/x-nonexistent") is None


def test_every_forward_mime_has_a_reverse():
    from docwire_spark.kernel.sniff import EXT_TO_MIMES

    for mime in set(EXTENSION_MIME.values()):
        ext = to_extension(mime)
        assert ext is not None and mime in EXT_TO_MIMES[ext]
