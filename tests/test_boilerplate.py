"""Boilerplate / main-content stage (additive north-star stage).

Must NOT alter the byte-identity default output; classification follows
the published NumWordsRulesClassifier tree (boilerpipe, WSDM'10).
"""

from docwire_spark.kernel.api import extract, extract_events
from docwire_spark.kernel.boilerplate import (
    Block, classify, main_content, segment_blocks,
)

NAV = (
    '<div><a href="https://s.local/">Home</a> '
    '<a href="https://s.local/a">About</a> '
    '<a href="https://s.local/c">Contact</a></div>'
)
ARTICLE_WORDS = " ".join(f"word{i}" for i in range(50))
FOOTER = (
    '<div><a href="https://s.local/p">Privacy</a> '
    '<a href="https://s.local/t">Terms</a></div>'
)
PAGE = (
    "<html><head><title>t</title></head><body>"
    + NAV
    + "<p>" + ARTICLE_WORDS + "</p>"
    + FOOTER
    + "</body></html>"
).encode()


def test_segment_blocks_link_density():
    events, _ = extract_events(PAGE)
    blocks = segment_blocks(events)
    assert len(blocks) == 3
    nav, art, foot = blocks
    assert nav.link_density == 1.0
    assert foot.link_density == 1.0
    assert art.link_density == 0.0
    assert art.n_words == 50


def test_main_content_strips_chrome():
    events, _ = extract_events(PAGE)
    assert main_content(events) == ARTICLE_WORDS


def test_default_output_unchanged():
    plain = extract(PAGE).text
    with_mc = extract(PAGE, want_main_content=True)
    assert with_mc.text == plain  # byte-identity path untouched
    assert with_mc.main_content == ARTICLE_WORDS


def test_classifier_tree_paths():
    # curr link-dense -> boilerplate regardless of size
    dense = Block(text="x", n_words=10, n_link_words=9)
    long_b = Block(text="x", n_words=50)
    short_b = Block(text="x", n_words=3)
    assert classify([dense]) == [False]
    # short isolated block between empties -> boilerplate
    assert classify([short_b]) == [False]
    # long block is content even after a link-dense prev
    assert classify([dense, long_b]) == [False, True]
    # prev link-dense + curr <=40 words + next <=17 -> boilerplate
    # (the trailing short block is rescued by its wordy prev: tree path
    # curr<=16, next<=15, prev>4 -> content)
    mid = Block(text="x", n_words=30)
    assert classify([dense, mid, short_b]) == [False, False, True]
    # ...but a wordy next flips it to content
    nxt = Block(text="x", n_words=20)
    assert classify([dense, mid, nxt]) == [False, True, True]


def test_short_quote_kept_between_long_paragraphs():
    # prev.n_words > 4 rescues a short block (tree: curr<=16,
    # next<=15, prev>4 -> content)
    para = Block(text="p", n_words=30)
    quote = Block(text="q", n_words=6)
    assert classify([para, quote]) == [True, True]
