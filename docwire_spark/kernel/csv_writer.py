"""Event stream -> CSV (reference csv_writer.cpp:18-45).

Tables only; everything outside table...close_table is ignored.  Cells
accumulate raw text; close_table_row joins the row with commas and
emits CRLF; NO quoting or escaping (reference behavior — verified
csv_writer.cpp has no quote handling).
"""

from __future__ import annotations

from docwire_spark.kernel import events as E


def render_csv(events) -> bytes:
    out: list[str] = []
    in_table = False
    curr_line: list[str] = []
    curr_cell: list[str] = []
    for kind, payload in events:
        if not in_table and kind != E.TABLE:
            continue
        if kind == E.TABLE:
            in_table = True
        elif kind == E.CLOSE_TABLE:
            in_table = False
        elif kind == E.CLOSE_TABLE_ROW:
            out.append(",".join(curr_line))
            out.append("\r\n")
            curr_line = []
        elif kind == E.CLOSE_TABLE_CELL:
            curr_line.append("".join(curr_cell))
            curr_cell = []
        elif kind == E.TEXT:
            curr_cell.append(payload)
    return "".join(out).encode("utf-8", "surrogateescape")
