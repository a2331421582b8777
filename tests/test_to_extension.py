"""Reverse mime->extension map (reference to_extension,
content_type_by_file_extension.cpp:1341-1348)."""

from docwire_spark.kernel.sniff import EXTENSION_MIME, to_extension


def test_known_mimes_roundtrip():
    assert to_extension("text/html") == "html"
    assert to_extension("application/pdf") == "pdf"
    assert to_extension("image/jpeg") == "jpg"
    assert to_extension("application/zip") == "zip"


def test_unknown_mime_is_none():
    assert to_extension("application/x-nonexistent") is None


def test_every_forward_mime_has_a_reverse():
    for mime in set(EXTENSION_MIME.values()):
        ext = to_extension(mime)
        assert ext is not None and EXTENSION_MIME[ext] == mime
