"""Minimal iWork '08/'09 (Pages/Numbers/Keynote XML) -> events.

Reference: src/iwork_parser.cpp — SAX walk over index.xml /
index.apxl / presentation.apxl with literal-prefix element dispatch
("sf:p", "sf:tabular-info", ...).  Text accumulates through a current
text pointer that handlers redirect (body, attachments, table cells,
headers/footers, notes); characters only flow inside sf:p (and for
Keynote only inside slides/titles).  Tables render tab/newline grids
driven by rows/columns counts and per-row cell counts; number cells
format per the style's number-format (fixed precision, currency,
percentage); positioned shapes sort by (y, x) before merging
(CompareElements).  Charts/footnotes/annotations are omitted — the
reference corpus for these formats doesn't exercise them.

Output = one text event in a document wrapper.
"""

from __future__ import annotations

import io
import zipfile
import xml.parsers.expat


class _NumberFormat:
    __slots__ = ("type_numbers", "fraction_precision", "currency",
                 "format_string")

    def __init__(self):
        self.type_numbers = 0
        self.fraction_precision = 0
        self.currency = ""
        self.format_string = ""


class _CellStyle:
    __slots__ = ("id", "number_format", "date_format", "duration_format")

    def __init__(self, sid=""):
        self.id = sid
        self.number_format = None
        self.date_format = ""
        self.duration_format = ""


class _Cell:
    __slots__ = ("value", "is_date", "is_duration", "is_text",
                 "is_number", "style")

    def __init__(self):
        self.clear()

    def clear(self):
        self.value = []
        self.is_date = False
        self.is_duration = False
        self.is_text = False
        self.is_number = True
        self.style = None


class _Buf:
    """A named text accumulator (the C++ std::string* target)."""

    __slots__ = ("parts",)

    def __init__(self):
        self.parts: list[str] = []

    def add(self, s: str):
        self.parts.append(s)

    def text(self) -> str:
        return "".join(self.parts)

    def set_text(self, s: str):
        self.parts = [s]

    def __len__(self):
        return len(self.text())


class _Table:
    def __init__(self, text_buf: _Buf):
        self.buf = text_buf  # where the rendered grid goes
        self.rows_count = 0
        self.columns_count = 0
        self.current_column = 0
        self.cells_per_rows: list[int] = []
        self.cell = _Cell()
        self.x = 0.0
        self.y = 0.0

    def add_cell(self, walker):
        value = "".join(self.cell.value)
        style = self.cell.style
        nf = style.number_format if style else None
        if self.cell.is_duration:
            fmt = (style.duration_format if style and
                   style.duration_format else "hhh mmm sss")
            value = _parse_duration(fmt, _strtol(value))
        elif self.cell.is_date:
            fmt = (style.date_format if style and style.date_format
                   else "dd.MM.yyyy hh:mm a")
            value = _parse_date(fmt, _strtol(value))
        elif self.cell.is_number:
            v = _strtod(value)
            if nf is None:
                value = str(int(v))
            else:
                if v < 0.0 and ";-" not in nf.format_string:
                    v = -v
                prec = nf.fraction_precision
                if nf.type_numbers == 1:  # money
                    cur = {"EUR": "€", "USD": "$", "MXN": "$"}.get(
                        nf.currency, "")
                    body = (f"{v:.{prec}f}" if prec > 0
                            else str(int(round(v))))
                    value = cur + body
                elif nf.type_numbers == 2:  # percentage
                    v *= 100
                    body = (f"{v:.{prec}f}" if prec > 0
                            else str(int(round(v))))
                    value = body + "%"
                else:
                    value = (f"{v:.{prec}f}" if prec > 0
                             else str(int(round(v))))
        self.buf.add(value)
        self.cell.clear()

    def finish_cell(self):
        self.current_column += 1
        new_row = False
        if self.cells_per_rows:
            if self.cells_per_rows[0] == self.current_column:
                self.cells_per_rows.pop(0)
                new_row = True
        elif self.current_column == self.columns_count:
            new_row = True
        if new_row:
            for _ in range(self.current_column, self.columns_count):
                self.buf.add("\t")
            self.buf.add("\n")
            self.current_column = 0
        else:
            self.buf.add("\t")


def _strtol(s: str) -> int:
    m = 0
    i = 0
    s = s.strip()
    neg = s[:1] == "-"
    if s[:1] in "+-":
        i = 1
    while i < len(s) and s[i].isdigit():
        m = m * 10 + int(s[i])
        i += 1
    return -m if neg else m


def _strtod(s: str) -> float:
    s = s.strip()
    out = []
    for i, ch in enumerate(s):
        if ch.isdigit() or ch in "+-.eE":
            out.append(ch)
        else:
            break
    try:
        return float("".join(out)) if out else 0.0
    except ValueError:
        return 0.0


def _parse_duration(fmt: str, value: int) -> str:
    # reference ParseDuration: h/m/s runs in the format string
    out = []
    i = 0
    secs = value
    hours = secs // 3600
    minutes = (secs % 3600) // 60
    seconds = secs % 60
    while i < len(fmt):
        ch = fmt[i]
        if ch in "hms":
            run = 1
            while i + run < len(fmt) and fmt[i + run] == ch:
                run += 1
            num = {"h": hours, "m": minutes, "s": seconds}[ch]
            out.append(str(num))
            i += run
        else:
            out.append(ch)
            i += 1
    return "".join(out)


_IWORK_EPOCH_OFFSET = 978307200  # 2001-01-01 UTC


def _parse_date(fmt: str, value: int) -> str:
    import datetime

    dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(
        seconds=value + _IWORK_EPOCH_OFFSET
    )
    rep = {
        "yyyy": f"{dt.year:04d}", "yy": f"{dt.year % 100:02d}",
        "MMMM": dt.strftime("%B"), "MMM": dt.strftime("%b"),
        "MM": f"{dt.month:02d}", "M": str(dt.month),
        "dd": f"{dt.day:02d}", "d": str(dt.day),
        "HH": f"{dt.hour:02d}", "hh": f"{(dt.hour % 12) or 12:02d}",
        "h": str((dt.hour % 12) or 12),
        "mm": f"{dt.minute:02d}", "ss": f"{dt.second:02d}",
        "a": "AM" if dt.hour < 12 else "PM",
    }
    out = []
    i = 0
    while i < len(fmt):
        for key in ("yyyy", "MMMM", "MMM", "yy", "MM", "dd", "HH",
                    "hh", "mm", "ss", "M", "d", "h", "a"):
            if fmt.startswith(key, i):
                out.append(rep[key])
                i += len(key)
                break
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


class _IWork:
    def __init__(self, app: str):
        self.app = app  # 'pages' | 'numbers' | 'key'
        self.body = _Buf()
        self.notes = _Buf()
        self.header = ""
        self.footer = ""
        self.tmp_hf = _Buf()
        self.cur = self.body          # current text pointer
        self.reading_text = False
        self.in_slide = False
        self.in_title = False
        self.in_table = False
        self.table: _Table | None = None
        self.textual: list = []       # positioned elements this page
        self.cur_textual = None
        self.in_textual = False
        self.attachments: dict[str, _Buf] = {}
        self.att_stack: list[str] = []
        self.att_name = None
        self.pages_count = 0
        self.cell_styles: dict[str, _CellStyle] = {}
        self.cur_cell_style: _CellStyle | None = None
        self.in_cell_style = False
        self.number_formats: dict[str, _NumberFormat] = {}
        self.date_formats: dict[str, str] = {}
        self.duration_formats: dict[str, str] = {}
        self.in_formula = False
        self.inside_headers = False
        self.which_hf = None

    # -- expat callbacks -------------------------------------------------
    def chars(self, data: str):
        if self.reading_text:
            if self.app in ("pages", "numbers") or (
                self.app == "key" and (self.in_slide or self.in_title)
            ):
                self.cur.add(data)

    def flush_textuals(self):
        self.textual.sort(key=lambda t: (t[0], t[1]))
        for _y, _x, buf in self.textual:
            self.body.add(buf.text())
        self.textual = []

    def start(self, name, attrs):
        self.dispatch(name, attrs, True)

    def end(self, name):
        self.dispatch(name, {}, False)

    def dispatch(self, name, attrs, opening):  # noqa: C901
        t = self.table
        if name == "sf:p":
            self.reading_text = opening
        elif name in ("sf:br", "sf:lnbr", "sf:crbr", "sf:contbr",
                      "sf:sectbr"):
            if opening:
                self.cur.add("\n")
        elif name == "sf:tab":
            if opening:
                self.cur.add("\t")
        elif name == "ls:workspace":
            if opening:
                self.pages_count += 1
                if self.pages_count > 1:
                    self.cur.add("\n")
            else:
                self.flush_textuals()
        elif name == "key:slide":
            if opening:
                self.pages_count += 1
                if self.pages_count > 1:
                    self.cur.add("\n")
                self.in_slide = True
            else:
                self.in_slide = False
                self.flush_textuals()
                if len(self.notes):
                    self.body.add("\n" + self.notes.text())
                self.notes = _Buf()
        elif name == "key:title-placeholder":
            if opening:
                self.in_title = True
                self.body.add("\n")
                self.cur = self.body
            else:
                self.in_title = False
                self.body.add("\n")
        elif name == "key:notes":
            self.cur = self.notes if opening else self.body
        elif name == "sf:text-storage":
            if self.app == "pages":
                if opening and attrs.get("sf:kind") == "body":
                    if len(self.body):
                        self.body.add("\n")
                    self.cur = self.body
        elif name == "sf:tabular-info":
            if opening:
                if self.app == "pages":
                    table = _Table(self.cur)
                else:
                    table = _Table(_Buf())
                    table.buf.add("\n")
                self.table = table
                self.in_table = True
                self.in_textual = True
                self.cur = _CellProxy(table)
                if self.app != "pages":
                    self.textual.append((0.0, 0.0, table.buf))
                    self.cur_textual = table
            else:
                self.cur = (self.table.buf if self.app == "pages"
                            else self.body)
                self.in_table = False
                self.in_textual = False
                self.table = None
                self.cur_textual = None
        elif name == "sf:tabular-model":
            if self.in_table and opening:
                if attrs.get("sf:name-is-visible") == "true" and \
                        attrs.get("sf:name") is not None:
                    t.buf.add(attrs["sf:name"] + "\n")
        elif name == "sf:position":
            if opening and self.in_textual and self.cur_textual is not None:
                try:
                    x = float(attrs.get("sfa:x", "0"))
                    y = float(attrs.get("sfa:y", "0"))
                except ValueError:
                    x = y = 0.0
                for i, e in enumerate(self.textual):
                    if e[2] is getattr(self.cur_textual, "buf", None):
                        self.textual[i] = (y, x, e[2])
        elif name == "sf:rows":
            if self.in_table and opening and "sf:count" in attrs:
                t.rows_count = _strtol(attrs["sf:count"])
        elif name == "sf:columns":
            if self.in_table and opening and "sf:count" in attrs:
                t.columns_count = _strtol(attrs["sf:count"])
        elif name == "sf:grid-row":
            if self.in_table and opening and "sf:nc" in attrs:
                t.cells_per_rows.append(_strtol(attrs["sf:nc"]))
        elif name == "sf:t":
            if self.in_table:
                if opening:
                    self.cur = _CellProxy(t)
                    t.cell.is_text = True
                    t.cell.is_number = False
                else:
                    t.add_cell(self)
                    t.finish_cell()
        elif name == "sf:ct":
            if self.in_table and opening:
                if "sfa:s" in attrs:
                    self.cur.add(attrs["sfa:s"])
                if self.in_formula:
                    t.cell.is_text = True
                    t.cell.is_number = False
        elif name in ("sf:n", "sf:sl", "sf:st"):
            if self.in_table:
                if opening and "sf:v" in attrs:
                    t.cell.value = [attrs["sf:v"]]
                if opening and "sf:s" in attrs:
                    t.cell.style = self.cell_styles.get(attrs["sf:s"])
                if not opening:
                    t.add_cell(self)
                    t.finish_cell()
        elif name in ("sf:s", "sf:cb", "sf:g", "sf:o"):
            if not opening and self.in_table:
                t.finish_cell()
        elif name == "sf:rd":
            if self.in_table and opening and "sf:cell-date" in attrs:
                t.cell.value = [attrs["sf:cell-date"]]
                t.cell.is_date = True
                t.cell.is_number = False
        elif name == "sf:d":
            if self.in_table:
                if opening and "sf:cell-date" in attrs:
                    t.cell.value = [attrs["sf:cell-date"]]
                if opening and "sf:s" in attrs:
                    t.cell.style = self.cell_styles.get(attrs["sf:s"])
                if not opening:
                    t.cell.is_date = True
                    t.cell.is_number = False
                    t.add_cell(self)
                    t.finish_cell()
        elif name == "sf:f":
            if self.in_table:
                if opening:
                    if "sf:s" in attrs:
                        t.cell.style = self.cell_styles.get(attrs["sf:s"])
                    self.in_formula = True
                else:
                    t.add_cell(self)
                    t.finish_cell()
                    self.in_formula = False
        elif name == "sf:rdu":
            if self.in_table and opening and "sf:du" in attrs:
                t.cell.value = [attrs["sf:du"]]
                t.cell.is_duration = True
                t.cell.is_number = False
        elif name == "sf:du":
            if self.in_table:
                if opening and "sf:du" in attrs:
                    t.cell.value = [attrs["sf:du"]]
                if opening and "sf:s" in attrs:
                    t.cell.style = self.cell_styles.get(attrs["sf:s"])
                if not opening:
                    t.cell.is_duration = True
                    t.cell.is_number = False
                    t.add_cell(self)
                    t.finish_cell()
        elif name == "sf:rn":
            if self.in_table and opening and "sf:v" in attrs:
                t.cell.value = [attrs["sf:v"]]
        elif name in ("sf:shape", "sf:sticky-note",
                      "sf:cell-comment-drawable-info"):
            if opening:
                buf = _Buf()
                self.cur = buf
                self.in_textual = True
                self.cur_textual = _Shape(buf)
                self.textual.append((0.0, 0.0, buf))
            else:
                self.cur.add("\n")
                self.cur = self.body
                self.cur_textual = None
                self.in_textual = False
        elif name == "sf:cell-style":
            if opening and "sfa:ID" in attrs:
                style = self.cell_styles.setdefault(
                    attrs["sfa:ID"], _CellStyle(attrs["sfa:ID"])
                )
                self.cur_cell_style = style
                self.in_cell_style = True
            if not opening:
                self.in_cell_style = False
                self.cur_cell_style = None
        elif name == "sf:date-format-ref":
            if self.in_cell_style and opening and "sfa:IDREF" in attrs:
                fid = attrs["sfa:IDREF"]
                if fid in self.date_formats:
                    self.cur_cell_style.date_format = self.date_formats[fid]
        elif name == "sf:duration-format-ref":
            if self.in_cell_style and opening and "sfa:IDREF" in attrs:
                fid = attrs["sfa:IDREF"]
                if fid in self.duration_formats:
                    self.cur_cell_style.duration_format = (
                        self.duration_formats[fid]
                    )
        elif name == "sf:date-format":
            if opening:
                fmt = attrs.get("sf:fmt", "")
                if "sfa:ID" in attrs and fmt:
                    self.date_formats[attrs["sfa:ID"]] = fmt
                if self.in_cell_style and fmt:
                    self.cur_cell_style.date_format = fmt
                elif fmt and self.in_table and t.cell.style is not None:
                    t.cell.style.date_format = fmt
        elif name == "sf:duration-format":
            if opening:
                fmt = attrs.get("sf:fmt", "")
                if "sfa:ID" in attrs and fmt:
                    self.duration_formats[attrs["sfa:ID"]] = fmt
                if self.in_cell_style and fmt:
                    self.cur_cell_style.duration_format = fmt
                elif fmt and self.in_table and t.cell.style is not None:
                    t.cell.style.duration_format = fmt
        elif name == "sf:number-format-ref":
            if self.in_cell_style and opening and "sfa:IDREF" in attrs:
                fid = attrs["sfa:IDREF"]
                if fid in self.number_formats:
                    self.cur_cell_style.number_format = (
                        self.number_formats[fid]
                    )
        elif name == "sf:number-format":
            if opening:
                fmt = None
                if self.in_cell_style and "sfa:ID" not in attrs:
                    fid = "Internet_format_number_" + self.cur_cell_style.id
                    fmt = self.number_formats.setdefault(fid, _NumberFormat())
                if "sfa:ID" in attrs:
                    fmt = self.number_formats.setdefault(
                        attrs["sfa:ID"], _NumberFormat()
                    )
                if fmt:
                    if self.in_table and t.cell.style is not None:
                        t.cell.style.number_format = fmt
                    elif self.in_cell_style:
                        self.cur_cell_style.number_format = fmt
                    if "sf:format-type" in attrs:
                        fmt.type_numbers = _strtol(attrs["sf:format-type"])
                    if "sf:format-decimal-places" in attrs:
                        fmt.fraction_precision = _strtol(
                            attrs["sf:format-decimal-places"]
                        )
                    if "sf:format-currency-code" in attrs:
                        fmt.currency = attrs["sf:format-currency-code"]
                    if "sf:format-string" in attrs:
                        fmt.format_string = attrs["sf:format-string"]
        elif name == "sf:attachment":
            if opening:
                if "sfa:ID" in attrs:
                    aname = attrs["sfa:ID"]
                    buf = self.attachments.setdefault(aname, _Buf())
                    self.cur = buf
                    if self.att_name is not None:
                        self.att_stack.append(self.att_name)
                    self.att_name = aname
            elif self.att_name is not None:
                if not self.att_stack:
                    self.att_name = None
                    self.cur = self.body
                else:
                    self.att_name = self.att_stack.pop()
                    self.cur = self.attachments[self.att_name]
            else:
                self.cur = self.body
        elif name == "sf:attachment-ref":
            if opening and "sfa:IDREF" in attrs:
                ref = attrs["sfa:IDREF"]
                if ref in self.attachments:
                    self.cur.add(self.attachments[ref].text())
        elif name == "sf:header":
            if self.app == "pages":
                if opening:
                    self.tmp_hf = _Buf()
                    self.cur = self.tmp_hf
                    self.which_hf = "header"
                else:
                    if len(self.tmp_hf.text()) > len(self.header):
                        self.header = self.tmp_hf.text()
        elif name == "sf:footer":
            if self.app == "pages":
                if opening:
                    self.tmp_hf = _Buf()
                    self.cur = self.tmp_hf
                    self.which_hf = "footer"
                else:
                    if len(self.tmp_hf.text()) > len(self.footer):
                        self.footer = self.tmp_hf.text()

    def result(self) -> str:
        if self.app == "numbers" or self.app == "key":
            self.flush_textuals()
        header = self.header
        if header and not header.endswith("\n"):
            header += "\n"
        body = self.body.text()
        footer = self.footer
        if body and footer and not body.endswith("\n") and \
                not footer.startswith("\n"):
            body += "\n"
        return header + body + footer


class _Shape:
    def __init__(self, buf: _Buf):
        self.buf = buf


class _CellProxy(_Buf):
    """Text pointer aimed at the current cell's value."""

    def __init__(self, table: _Table):
        self.table = table

    def add(self, s: str):
        self.table.cell.value.append(s)

    def text(self) -> str:
        return "".join(self.table.cell.value)

    parts = property(lambda self: self.table.cell.value)


def iwork_to_events(data: bytes, app: str):
    """Returns (events, meta).  ``app`` in ('pages','numbers','key')."""
    from docwire_spark.kernel import events as E

    zf = zipfile.ZipFile(io.BytesIO(data))
    names = set(zf.namelist())
    for candidate in ("index.xml", "index.apxl", "presentation.apxl"):
        if candidate in names:
            xml_bytes = zf.read(candidate)
            break
    else:
        raise ValueError("no iWork index xml found")

    walker = _IWork(app)
    p = xml.parsers.expat.ParserCreate()  # no ns processing: raw prefixes
    p.StartElementHandler = walker.start
    p.EndElementHandler = walker.end
    p.CharacterDataHandler = walker.chars
    p.buffer_text = True
    p.Parse(xml_bytes, True)
    text = walker.result()
    events = [
        (E.DOCUMENT, None),
        (E.TEXT, text),
        (E.CLOSE_DOCUMENT, None),
    ]
    return events, {}
