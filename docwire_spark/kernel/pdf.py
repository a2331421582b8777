"""PDF -> events (reference: src/pdf_parser.cpp).

Pure-Python PDF content-stream text extractor (PDFium is not available
in this environment).  Implements the same page-element model: text
objects with (x, y, width, height, font_size), sorted by the adaptive
y-tolerance comparator (descending y, then ascending x; tolerance =
max(2.0, 0.40 * max char-height), pdf_parser.cpp:180-219), then
inter-element whitespace synthesis (pdf_parser.cpp:396-510):

- y_diff > 0.65*max_line_height -> round(y_diff/max_line_height)>=1
  break_lines
- x going backwards on the same line -> one break_line
- text/text horizontal gap > font_size/3.5 (>=1.0) -> single space
  unless either side already has one

Implemented in :mod:`docwire_spark.kernel.pdfminer_lite`; this module
wires it to the event vocabulary.
"""

from __future__ import annotations

import math

from docwire_spark.kernel import events as E
from docwire_spark.kernel.pdfminer_lite import PdfDocument, PdfError


def _characteristic_height(el) -> float:
    # el: (text, x, y, w, h, font_size); images not extracted (no pdfium)
    h = 10.0
    if el[5] and el[5] > 0:
        h = el[5]
    elif el[4] and el[4] > 0:
        h = el[4]
    return max(1.0, h)


def _sort_elements(elements):
    """Replicates the std::multiset ordering with the adaptive-tolerance
    comparator via insertion sort (the comparator is not a strict weak
    order globally, so a plain key sort can differ; multiset insertion
    order must be reproduced).

    The comparator keys (y, x, 0.40 * characteristic height) are pure
    per-element functions, so they are computed once and the comparator
    inlined over the cached triples — identical decisions to
    ``_less``, ~2x fewer Python ops per comparison on dense pages."""
    result = []
    res_keys = []  # parallel (y, x, ch40) triples
    for el in elements:
        y, x = el[2], el[1]
        ch40 = _characteristic_height(el) * 0.40
        # multiset::insert places equal elements after existing ones:
        # find first position where result[pos] > el (el < result[pos])
        # scanning upper bound with the comparator
        pos = len(result)
        for i, (oy, ox, och40) in enumerate(res_keys):
            # inline _less((y, x, ch40), (oy, ox, och40))
            if y is None:
                continue  # el < other is False for None y_l
            if oy is None:
                pos = i
                break
            tol = ch40 if ch40 > och40 else och40
            if tol < 2.0:
                tol = 2.0
            d = y - oy
            if d > tol or d < -tol:
                if y > oy:
                    pos = i
                    break
                continue
            if x is None:
                continue
            if ox is None or x < ox:
                pos = i
                break
        result.insert(pos, el)
        res_keys.insert(pos, (y, x, ch40))
    return result


def _less(lhs, rhs) -> bool:
    y_l, y_r = lhs[2], rhs[2]
    if y_l is None and y_r is None:
        return False
    if y_l is None:
        return False
    if y_r is None:
        return True
    tol = max(2.0, max(_characteristic_height(lhs), _characteristic_height(rhs)) * 0.40)
    if abs(y_l - y_r) > tol:
        return y_l > y_r
    x_l, x_r = lhs[1], rhs[1]
    if x_l is None and x_r is None:
        return False
    if x_l is None:
        return False
    if x_r is None:
        return True
    return x_l < x_r


def _space_threshold(el) -> float:
    v = 2.0
    if el[5] and el[5] > 0:
        v = el[5] / 3.5
    elif el[4] and el[4] > 0:
        v = el[4] / 3.0
    return max(1.0, v)


def _effective_line_height(el) -> float:
    h = 10.0
    if el[5] and el[5] > 0:
        h = el[5]
    elif el[4] and el[4] > 0:
        h = el[4]
    return max(1.0, h)


def _ends_ws(s: str) -> bool:
    return bool(s) and s[-1] in " \t\n\r\x0b\x0c"


def _begins_ws(s: str) -> bool:
    return bool(s) and s[0] in " \t\n\r\x0b\x0c"


def _is_rtl_char(c: str) -> bool:
    o = ord(c)
    return (
        0x0590 <= o <= 0x08FF
        or 0xFB1D <= o <= 0xFDFF
        or 0xFE70 <= o <= 0xFEFF
    )


def _bidi_visual_to_output(text: str) -> str:
    """Simplified UBA as PDFium's text page applies it to objects on an
    RTL-base line (observed via the reference's 9.pdf golden): split
    into direction runs; emit runs in REVERSE order; LTR runs keep
    their internal character order, RTL and neutral runs are
    character-reversed ('Arabski tekst: ' -> ' :tekst Arabski';
    visual-order Arabic 'صن ةنيع' -> logical 'عينة نص')."""
    runs = []  # (cls, chars): cls L / R / N
    for c in text:
        if _is_rtl_char(c):
            cls = "R"
        elif c.isalnum():
            cls = "L"
        else:
            cls = "N"
        if runs and runs[-1][0] == cls:
            runs[-1][1].append(c)
        else:
            runs.append((cls, [c]))
    out = []
    for cls, chars in reversed(runs):
        out.extend(chars if cls == "L" else reversed(chars))
    return "".join(out)


def _apply_line_bidi(elements):
    """PDFium's text page bidi-reorders the characters of every object
    on a line whose content contains RTL characters.  Elements are
    already position-sorted; lines are delimited with the comparator's
    own same-line tolerance."""
    out = []
    line = []

    def flush():
        if any(_is_rtl_char(c) for el in line for c in el[0]):
            out.extend(
                (_bidi_visual_to_output(el[0]),) + el[1:] for el in line
            )
        else:
            out.extend(line)
        line.clear()

    for el in elements:
        if line:
            prev = line[-1]
            tol = max(
                2.0,
                max(
                    _characteristic_height(prev), _characteristic_height(el)
                ) * 0.40,
            )
            if prev[2] is None or el[2] is None or abs(prev[2] - el[2]) > tol:
                flush()
        line.append(el)
    flush()
    return out


def pdf_to_events(data: bytes, max_pages: int | None = None):
    doc = PdfDocument(data)
    events = [(E.DOCUMENT, None)]
    meta = doc.metadata()
    for page_no, page in enumerate(doc.pages()):
        if max_pages is not None and page_no >= max_pages:
            # reference analog: a transformer_func returning stop after
            # MAX_PAGES page events (document_parsing_tests.cpp:465-500)
            break
        events.append((E.PAGE, None))
        elements = _apply_line_bidi(_sort_elements(page.text_elements()))
        prev = None
        for el in elements:
            if prev is not None:
                _synthesize_whitespace(events, prev, el)
            events.append((E.TEXT, el[0]))
            prev = el
        events.append((E.CLOSE_PAGE, None))
    events.append((E.CLOSE_DOCUMENT, None))
    return events, meta


def _synthesize_whitespace(events, prev, cur):
    # elements: (text, x, y, w, h, font_size)
    if (
        prev[2] is None or prev[4] is None or prev[1] is None or prev[3] is None
        or cur[2] is None or cur[4] is None or cur[1] is None
    ):
        return
    prev_yc = prev[2] + prev[4] / 2.0
    cur_yc = cur[2] + cur[4] / 2.0
    y_diff = prev_yc - cur_yc
    max_h = max(_effective_line_height(prev), _effective_line_height(cur))
    single_nl = max_h * 0.65
    if y_diff > single_nl:
        n = int(round_half_away(y_diff / max_h))
        if n < 1:
            n = 1
        for _ in range(n):
            events.append((E.BREAK_LINE, None))
    elif cur[1] < prev[1] and abs(y_diff) < single_nl:
        events.append((E.BREAK_LINE, None))
    else:
        # both are text (images are not extracted in this build)
        threshold = _space_threshold(cur)
        x_gap = cur[1] - (prev[1] + prev[3])
        if x_gap > threshold and not _ends_ws(prev[0]) and not _begins_ws(cur[0]):
            events.append((E.TEXT, " "))


def round_half_away(x: float) -> float:
    """C std::round semantics (half away from zero), unlike Python's
    banker's rounding."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
