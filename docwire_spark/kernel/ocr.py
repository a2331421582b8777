"""Pluggable OCR hook (reference: src/ocr_parser.cpp).

The sandbox ships no tesseract, so the hook degrades gracefully:
``available()`` is False and callers fall back to alt text (HTML
images) or a per-row error (standalone image payloads).  When
``pytesseract`` + ``PIL`` ARE importable, the reference's word-joining
semantics apply (src/ocr_parser.cpp:326-460):

- words with confidence >= 75 (the reference default,
  ocr_parser.cpp:326) are kept
- consecutive high-confidence words on one line are joined by a
  single space (ocr_parser.cpp:360-366)
- each line that produced any high-confidence text ends with a
  break_line (ocr_parser.cpp:380-388)
"""

from __future__ import annotations

from docwire_spark.kernel import events as E

OCR_CONFIDENCE_THRESHOLD = 75.0

_engine = None  # lazily resolved: None=unprobed, False=absent, tuple=ready


def _resolve():
    global _engine
    if _engine is None:
        try:
            import pytesseract  # noqa: F401
            from PIL import Image  # noqa: F401

            # a present module with no tesseract binary still fails at
            # call time; probe once
            pytesseract.get_tesseract_version()
            _engine = (pytesseract, Image)
        except Exception:
            _engine = False
    return _engine


def available() -> bool:
    return bool(_resolve())


def ocr_image(data: bytes) -> str | None:
    """Recognize ``data`` (an encoded image); None when no engine or
    nothing above the confidence threshold."""
    eng = _resolve()
    if not eng:
        return None
    pytesseract, Image = eng
    import io

    try:
        img = Image.open(io.BytesIO(data))
        d = pytesseract.image_to_data(
            img, output_type=pytesseract.Output.DICT
        )
    except Exception:
        return None
    lines: list[str] = []
    cur_key = None
    cur_words: list[str] = []
    for i in range(len(d["text"])):
        word = (d["text"][i] or "").strip()
        try:
            conf = float(d["conf"][i])
        except (TypeError, ValueError):
            conf = -1.0
        key = (d["block_num"][i], d["par_num"][i], d["line_num"][i])
        if key != cur_key:
            if cur_words:
                lines.append(" ".join(cur_words))
            cur_key, cur_words = key, []
        if word and conf >= OCR_CONFIDENCE_THRESHOLD:
            cur_words.append(word)
    if cur_words:
        lines.append(" ".join(cur_words))
    return "\n".join(lines) if lines else None


def ocr_to_events(data: bytes):
    """Standalone image payload -> events (reference routes image/*
    mimes to ocr_parser).  Raises when no engine is present so the
    extraction API surfaces an honest per-row error instead of empty
    text."""
    if not available():
        raise ValueError(
            "OCR engine not available (pytesseract/tesseract not installed)"
        )
    text = ocr_image(data)
    evs = []
    if text:
        for k, line in enumerate(text.split("\n")):
            if k:
                evs.append((E.BREAK_LINE, None))
            evs.append((E.TEXT, line))
    return evs, {}
