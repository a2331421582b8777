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
