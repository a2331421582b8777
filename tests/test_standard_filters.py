"""standard_filter family semantics (reference standard_filter.h:38-62,
standard_filter.cpp) replayed over the ANSI-PST fixture."""

from __future__ import annotations

from docwire_spark.kernel.api import extract
from tests.pst_builder import build_ansi_pst


def _fixture():
    return build_ansi_pst(
        folder_name="Inbox",
        subject="hello ansi",
        body_html=b"<html><body><p>ansi body</p></body></html>",
        attach_name="note.txt",
        attach_data=b"attachment text",
    )


def test_filter_by_folder_name_keeps_listed():
    r = extract(_fixture(), url="a.pst", folder_names=["Inbox", "Sent"])
    assert r.error is None
    assert b"Inbox" in r.text and b"ansi body" in r.text


def test_filter_by_folder_name_drops_subtree():
    r = extract(_fixture(), url="a.pst", folder_names=["Archive"])
    assert r.error is None
    assert b"Inbox" not in r.text
    assert b"ansi body" not in r.text          # message inside folder
    assert b"attachment text" not in r.text    # ...and its attachment


def test_filter_by_attachment_type():
    kept = extract(_fixture(), url="a.pst", attachment_types=["txt"])
    dropped = extract(_fixture(), url="a.pst", attachment_types=["jpg"])
    assert b"attachment text" in kept.text
    assert b"attachment text" not in dropped.text
    assert b"ansi body" in dropped.text        # mail itself survives
    # reference accepts ".txt"-style file_extension values too
    dotted = extract(_fixture(), url="a.pst", attachment_types=[".TXT"])
    assert b"attachment text" in dotted.text


def test_filter_by_mail_max_creation_time():
    # fixture ctime = 1_700_000_000
    kept = extract(_fixture(), url="a.pst",
                   mail_max_creation_time=1_800_000_000)
    dropped = extract(_fixture(), url="a.pst",
                      mail_max_creation_time=1_600_000_000)
    assert b"ansi body" in kept.text
    assert b"ansi body" not in dropped.text
    # skip covers the whole message incl. attachments
    # (pst_parser.cpp `continue` past the attachment loop)
    assert b"attachment text" not in dropped.text
    assert b"Inbox" in dropped.text


def test_filter_by_max_node_number():
    full = extract(_fixture(), url="a.pst")
    capped = extract(_fixture(), url="a.pst", max_node_number=3)
    assert capped.error is None
    assert len(capped.text) < len(full.text)
    assert b"attachment text" not in capped.text
    # a generous cap passes everything through (continuation::stop
    # never fires)
    uncapped = extract(_fixture(), url="a.pst", max_node_number=10_000)
    assert uncapped.text == full.text


def test_filters_compose_in_chain_order():
    r = extract(
        _fixture(), url="a.pst",
        folder_names=["Inbox"], attachment_types=["pdf"],
        mail_max_creation_time=1_800_000_000,
    )
    assert r.error is None
    assert b"ansi body" in r.text
    assert b"attachment text" not in r.text


def test_nested_folder_drop_is_nesting_aware():
    from docwire_spark.kernel import events as E
    from docwire_spark.kernel.standard_filter import filter_by_folder_name

    ev = [
        (E.DOCUMENT, None),
        (E.FOLDER, ("drop", 0)),
        (E.FOLDER, ("keep-inner", 1)),   # swallowed with the parent
        (E.CLOSE_FOLDER, None),
        (E.CLOSE_FOLDER, None),
        (E.FOLDER, ("keep", 0)),
        (E.CLOSE_FOLDER, None),
        (E.CLOSE_DOCUMENT, None),
    ]
    out = filter_by_folder_name(ev, ["keep", "keep-inner"])
    assert out == [
        (E.DOCUMENT, None),
        (E.FOLDER, ("keep", 0)),
        (E.CLOSE_FOLDER, None),
        (E.CLOSE_DOCUMENT, None),
    ]


def test_unnamed_elements_pass_filters():
    from docwire_spark.kernel import events as E
    from docwire_spark.kernel.standard_filter import (
        filter_by_attachment_type, filter_by_folder_name,
        filter_by_mail_max_creation_time,
    )

    ev = [
        (E.FOLDER, (None, 0)), (E.CLOSE_FOLDER, None),
        (E.ATTACHMENT, "noext"), (E.CLOSE_ATTACHMENT, None),
        (E.MAIL, ("s", None, 0)), (E.CLOSE_MAIL, None),
    ]
    assert filter_by_folder_name(ev, ["x"]) == ev
    assert filter_by_attachment_type(ev, ["jpg"]) == ev
    assert filter_by_mail_max_creation_time(ev, 0) == ev


def _multi():
    from tests.pst_builder import build_ansi_pst_multi

    return build_ansi_pst_multi([
        ("Inbox", [
            ("m one", 1_700_000_000, b"<p>first body</p>",
             [("a.txt", b"att A"), ("b.csv", b"c,1")]),
            ("nobody msg", 1_650_000_000, None,
             [("orphan.txt", b"orphan data")]),
        ]),
        ("Sent", [
            ("m two", 1_710_000_000, b"<p>second body</p>", []),
        ]),
    ])


def test_multi_folder_pst_extracts_everything():
    r = extract(_multi(), url="m.pst")
    assert r.error is None
    for frag in (b"Inbox", b"Sent", b"first body", b"second body",
                 b"att A", b"c,1", b"orphan data"):
        assert frag in r.text, frag


def test_min_creation_filter_covers_bodyless_messages():
    """Documented deviation from the reference (ADVICE r2): the
    parse-time filter skips a body-less message's attachments too —
    the reference can only skip messages that emit a mail element."""
    r = extract(_multi(), url="m.pst",
                mail_min_creation_time=1_660_000_000)
    assert b"first body" in r.text          # 1.7e9 >= threshold
    assert b"orphan data" not in r.text     # body-less, 1.65e9 < thr
    assert b"second body" in r.text


def test_folder_filter_on_multi_folder_pst():
    r = extract(_multi(), url="m.pst", folder_names=["Sent"])
    assert b"second body" in r.text
    assert b"first body" not in r.text
    assert b"orphan data" not in r.text


def test_attachment_filter_multi_attachment_table():
    r = extract(_multi(), url="m.pst", attachment_types=["csv"])
    assert b"c,1" in r.text
    assert b"att A" not in r.text
    assert b"orphan data" not in r.text     # .txt filtered too


def test_max_node_truncates_mid_stream():
    full = extract(_multi(), url="m.pst")
    capped = extract(_multi(), url="m.pst", max_node_number=5)
    assert len(capped.text) < len(full.text)
    assert b"Sent" not in capped.text


def test_extract_tree_multi_attachment_pst():
    from docwire_spark.kernel.api import extract_tree

    rows = extract_tree(_multi(), "m.pst")
    kids = {(u, p, d) for u, p, d, *_ in rows}
    assert ("a.txt", "m.pst", 1) in kids
    assert ("b.csv", "m.pst", 1) in kids
    assert ("orphan.txt", "m.pst", 1) in kids
    assert ("m.pst", None, 0) in kids


# ---- property tests: filters preserve event-stream well-formedness ----

from hypothesis import given, settings, strategies as st

from docwire_spark.kernel import events as E
from docwire_spark.kernel.standard_filter import apply_standard_filters

_PAIRS = [
    (E.FOLDER, E.CLOSE_FOLDER),
    (E.MAIL, E.CLOSE_MAIL),
    (E.ATTACHMENT, E.CLOSE_ATTACHMENT),
]


@st.composite
def _event_streams(draw):
    """Random well-nested streams of folder/mail/attachment spans with
    text leaves."""
    events = [(E.DOCUMENT, None)]
    stack = []
    for _ in range(draw(st.integers(0, 40))):
        action = draw(st.integers(0, 3))
        if action == 0 and len(stack) < 4:
            op, cl = draw(st.sampled_from(_PAIRS))
            if op == E.FOLDER:
                payload = (draw(st.sampled_from(
                    [None, "Inbox", "Sent", "Spam"])), len(stack))
            elif op == E.MAIL:
                payload = (draw(st.text(max_size=5)),
                           draw(st.one_of(st.none(),
                                          st.integers(0, 2_000_000_000))),
                           len(stack))
            else:
                payload = draw(st.sampled_from(
                    [None, "a.txt", "b.jpg", "noext"]))
            events.append((op, payload))
            stack.append(cl)
        elif action == 1 and stack:
            events.append((stack.pop(), None))
        else:
            events.append((E.TEXT, draw(st.text(max_size=8))))
    while stack:
        events.append((stack.pop(), None))
    events.append((E.CLOSE_DOCUMENT, None))
    return events


def _balanced(events):
    depth = {op: 0 for op, _ in _PAIRS}
    for k, _ in events:
        for op, cl in _PAIRS:
            if k == op:
                depth[op] += 1
            elif k == cl:
                depth[op] -= 1
                if depth[op] < 0:
                    return False
    return all(v == 0 for v in depth.values())


@settings(max_examples=200, deadline=None)
@given(
    ev=_event_streams(),
    folders=st.one_of(st.none(), st.lists(
        st.sampled_from(["Inbox", "Sent"]), max_size=2)),
    types=st.one_of(st.none(), st.lists(
        st.sampled_from(["txt", "jpg"]), max_size=2)),
    min_t=st.one_of(st.none(), st.integers(0, 2_000_000_000)),
    max_t=st.one_of(st.none(), st.integers(0, 2_000_000_000)),
)
def test_filters_preserve_balance_and_are_idempotent(
    ev, folders, types, min_t, max_t
):
    kwargs = dict(folder_names=folders, attachment_types=types,
                  mail_min_creation_time=min_t,
                  mail_max_creation_time=max_t)
    out = apply_standard_filters(ev, **kwargs)
    assert _balanced(out)
    assert len(out) <= len(ev)
    # filtering is idempotent: a second pass changes nothing
    assert apply_standard_filters(out, **kwargs) == out
