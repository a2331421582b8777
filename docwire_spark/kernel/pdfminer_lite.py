"""Minimal pure-Python PDF document model (placeholder).

Full content-stream text extraction lands in this module; until then
parsing raises :class:`PdfError`, which the extraction API surfaces as
a per-row ``error`` value.
"""

from __future__ import annotations


class PdfError(Exception):
    pass


class PdfDocument:
    def __init__(self, data: bytes):
        raise PdfError("PDF content-stream parser not implemented yet")

    def pages(self):  # pragma: no cover
        return []

    def metadata(self):  # pragma: no cover
        return {}
