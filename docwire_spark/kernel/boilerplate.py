"""Boilerplate stripping: text/link-density block classification.

North-star stage (BASELINE.json): "boilerplate-stripping heuristics
(text-density / link-density scoring a la Boilerpipe)".  This is an
ADDITIVE, separately-gated stage — it never alters the byte-identical
default plain-text output (reference parity, SURVEY.md §2.3.1); it
produces the optional ``main_content`` column.

Algorithm: the published NumWordsRulesClassifier decision tree from
Kohlschütter, Fankhauser, Nejdl — "Boilerplate Detection using Shallow
Text Features" (WSDM 2010) and the open-source boilerpipe
DefaultExtractor: blocks are classified CONTENT/BOILERPLATE from
(words, link-density) of the previous/current/next block.

The reference implements no boilerplate removal (its HTML path only
suppresses script/style/title/head — html_parser.cpp:562-611,810-813);
this stage is our engine's extension, hence OFF by default.
"""

from __future__ import annotations

from dataclasses import dataclass

from docwire_spark.kernel import events as E

# events that end the current text block (block-level boundaries in
# the reference's whitespace machine, html_parser.cpp:622-627, plus
# list items and table cells which boilerpipe treats as separate
# blocks)
_BLOCK_BOUNDARIES = frozenset(
    (
        E.PARAGRAPH, E.CLOSE_PARAGRAPH,
        E.SECTION, E.CLOSE_SECTION,
        E.LIST, E.CLOSE_LIST,
        E.LIST_ITEM, E.CLOSE_LIST_ITEM,
        E.TABLE, E.CLOSE_TABLE,
        E.TABLE_ROW, E.CLOSE_TABLE_ROW,
        E.TABLE_CELL, E.CLOSE_TABLE_CELL,
        E.CAPTION, E.CLOSE_CAPTION,
        E.HEADER, E.CLOSE_HEADER,
        E.FOOTER, E.CLOSE_FOOTER,
        E.PAGE, E.CLOSE_PAGE,
        E.DOCUMENT, E.CLOSE_DOCUMENT,
    )
)


@dataclass
class Block:
    text: str = ""
    n_words: int = 0
    n_link_words: int = 0

    @property
    def link_density(self) -> float:
        return self.n_link_words / self.n_words if self.n_words else 0.0


def segment_blocks(events) -> list[Block]:
    """Fold the SAX-like event stream into boilerpipe-style text
    blocks.  Link words are words emitted while inside <a> (LINK depth
    > 0).  Empty blocks are dropped (they carry no classification
    signal and would dilute the prev/next context)."""
    blocks: list[Block] = []
    parts: list[str] = []
    words = 0
    link_words = 0
    link_depth = 0

    def flush():
        nonlocal parts, words, link_words
        text = "".join(parts).strip()
        if text:
            blocks.append(
                Block(text=text, n_words=words, n_link_words=link_words)
            )
        parts, words, link_words = [], 0, 0

    for kind, payload in events:
        if kind == E.TEXT:
            t = payload or ""
            parts.append(t)
            w = len(t.split())
            words += w
            if link_depth > 0:
                link_words += w
        elif kind == E.LINK:
            link_depth += 1
        elif kind == E.CLOSE_LINK:
            link_depth = max(0, link_depth - 1)
        elif kind == E.BREAK_LINE:
            parts.append(" ")  # soft wrap stays inside the block
        elif kind in _BLOCK_BOUNDARIES:
            flush()
    flush()
    return blocks


def classify(blocks: list[Block]) -> list[bool]:
    """NumWordsRulesClassifier (boilerpipe, WSDM'10): True = content.

    Decision tree over (prev, curr, next) word counts and link
    densities; thresholds are the published ones.
    """
    out = []
    n = len(blocks)
    empty = Block()
    for i, curr in enumerate(blocks):
        prev = blocks[i - 1] if i > 0 else empty
        nxt = blocks[i + 1] if i + 1 < n else empty
        if curr.link_density > 0.333333:
            is_content = False
        elif prev.link_density <= 0.555556:
            if curr.n_words <= 16:
                if nxt.n_words <= 15:
                    is_content = prev.n_words > 4
                else:
                    is_content = True
            else:
                is_content = True
        else:
            if curr.n_words <= 40:
                is_content = nxt.n_words > 17
            else:
                is_content = True
        out.append(is_content)
    return out


def main_content(events) -> str:
    """Extract the main-content text: classified content blocks joined
    with a single newline (boilerpipe's getText contract)."""
    blocks = segment_blocks(events)
    keep = classify(blocks)
    return "\n".join(b.text for b, k in zip(blocks, keep) if k)
