"""Metadata rendering (reference meta_data_writer.cpp:20-85).

Byte format: six fixed lines Author / Creation time / Last modified by
/ Last modification time / Page count / Word count, each falling back
to ``unidentified``; timestamps rendered ``YYYY-MM-DD HH:MM:SS``
(reference convert_chrono.cpp:112-128, zero-padded fields, unpadded
year).
"""

from __future__ import annotations

import datetime


def format_timestamp(dt) -> str:
    if isinstance(dt, datetime.datetime):
        return (
            f"{dt.year}-{dt.month:02d}-{dt.day:02d} "
            f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}"
        )
    return str(dt)


def _field(meta: dict, key: str, is_time: bool = False) -> str:
    v = meta.get(key)
    if v is None:
        return "unidentified"
    return format_timestamp(v) if is_time else str(v)


def render_metadata(meta: dict) -> bytes:
    text = (
        f"Author: {_field(meta, 'author')}\n"
        f"Creation time: {_field(meta, 'creation_date', True)}\n"
        f"Last modified by: {_field(meta, 'last_modified_by')}\n"
        f"Last modification time: {_field(meta, 'last_modification_date', True)}\n"
        f"Page count: {_field(meta, 'page_count')}\n"
        f"Word count: {_field(meta, 'word_count')}\n"
    )
    return text.encode("utf-8", "surrogateescape")
