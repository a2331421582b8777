"""Event-stream standard filters (reference src/standard_filter.h:38-62,
standard_filter.cpp).

The reference installs these as ``message_transform_func`` links in the
parsing chain; here they are pure transforms over the kernel's event
list, applied between parse and render (kernel/api.py:_finish) — same
observable semantics:

- ``filterByFolderName(names)``  — a named folder not in ``names`` is
  skipped with its whole subtree (pst_parser.cpp reacts to
  ``continuation::skip`` with ``continue`` around the recursion).
- ``filterByAttachmentType(types)`` — an attachment whose filename
  extension is not in ``types`` is skipped (payload parse and
  close_attachment included); attachments without an extension pass.
- ``filterByMailMinCreationTime`` / ``MaxCreationTime`` — a mail whose
  date is outside the bound is skipped with body and attachments;
  mails without a date pass.
- ``filterByMaxNodeNumber(n)`` — ``continuation::stop`` once the n-th
  message has passed: the event stream is truncated at n events.

Deliberate deviation, kept from ADVICE r2: our PST parser applies the
min-creation-time check per *message* at parse time, so a body-less
message cannot bypass the filter; the reference can only skip a
message when it emits a ``mail::mail`` element (html body present).
"""

from __future__ import annotations

from docwire_spark.kernel import events as E


def _drop_spans(events, open_k, close_k, should_drop):
    """Drop every (open_k .. matching close_k) span whose opening
    payload satisfies should_drop; nesting-aware."""
    out = []
    depth = 0
    for k, p in events:
        if depth:
            if k == open_k:
                depth += 1
            elif k == close_k:
                depth -= 1
            continue
        if k == open_k and should_drop(p):
            depth = 1
            continue
        out.append((k, p))
    return out


def _norm_ext(name):
    if not name or "." not in name:
        return None
    return name.rsplit(".", 1)[1].lower()


def filter_by_folder_name(events, names):
    keep = set(names)
    return _drop_spans(
        events, E.FOLDER, E.CLOSE_FOLDER,
        lambda p: p is not None and p[0] is not None and p[0] not in keep,
    )


def filter_by_attachment_type(events, types):
    keep = {str(t).lstrip(".").lower() for t in types}
    return _drop_spans(
        events, E.ATTACHMENT, E.CLOSE_ATTACHMENT,
        lambda p: _norm_ext(p) is not None and _norm_ext(p) not in keep,
    )


def _mail_date(p):
    return p[1] if p is not None and len(p) > 1 else None


def filter_by_mail_min_creation_time(events, min_time):
    return _drop_spans(
        events, E.MAIL, E.CLOSE_MAIL,
        lambda p: _mail_date(p) is not None and _mail_date(p) < min_time,
    )


def filter_by_mail_max_creation_time(events, max_time):
    return _drop_spans(
        events, E.MAIL, E.CLOSE_MAIL,
        lambda p: _mail_date(p) is not None and _mail_date(p) > max_time,
    )


def filter_by_max_node_number(events, max_nodes):
    """continuation::stop at the max_nodes-th message
    (standard_filter.cpp:93-101: ``node_no++ == max_nodes -> stop``).
    The reference counts every chain message — each emitted tag,
    including opens/closes/text — and stops mid-span without closing
    open elements; one kernel event ~ one chain message, so a plain
    prefix truncation is the faithful semantics."""
    return events[:max_nodes]


def apply_standard_filters(
    events,
    folder_names=None,
    attachment_types=None,
    mail_min_creation_time=None,
    mail_max_creation_time=None,
    max_node_number=None,
):
    """Chain the active filters in the reference's documented order
    (standard_filter.h usage example: folder -> attachment -> time ->
    node cap)."""
    if folder_names is not None:
        events = filter_by_folder_name(events, folder_names)
    if attachment_types is not None:
        events = filter_by_attachment_type(events, attachment_types)
    if mail_min_creation_time is not None:
        events = filter_by_mail_min_creation_time(
            events, mail_min_creation_time
        )
    if mail_max_creation_time is not None:
        events = filter_by_mail_max_creation_time(
            events, mail_max_creation_time
        )
    if max_node_number is not None:
        events = filter_by_max_node_number(events, max_node_number)
    return events
