"""Real-HTML main-content extractor for the pluggable parse slot.

The pinned default extractor (:mod:`semtools_spark.operators.parse`) is a
paragraph-regex over the synthetic corpus — byte-identity with the
reference is its contract, so it must never change. THIS module is the
extractor a user points at real crawl HTML: a text-density /
link-density block classifier in the style of the public boilerplate-
removal literature (Kohlschütter et al., "Boilerplate Detection using
Shallow Text Features", WSDM 2010; Arc90 Readability's class-weight +
link-density heuristic; trafilatura's rule cascade). No network, no
model artifact, fully deterministic: a pure ``bytes -> str`` function,
safe for the fingerprint/resume contract of the parse cache.

Algorithm (single pass over the token stream, stdlib ``html.parser``):

1. Drop subtree content of non-text elements (``script``/``style``/
   ``noscript``/``svg``/``template``/``iframe``/``head``…).
2. Segment text into blocks at block-level tags (``p``/``div``/``li``/
   headings/``td``/``blockquote``…), tracking per block: its text, the
   number of characters inside ``<a>`` (anchor chars), and whether it
   sits inside a structural-boilerplate container (``nav``/``footer``/
   ``header``/``aside``/``form``/``menu``).
3. Classify each block: CONTENT iff it is not inside a boilerplate
   container, has ≥ ``MIN_BLOCK_CHARS`` characters, and its link density
   (anchor chars / chars) is ≤ ``MAX_LINK_DENSITY``. These are the two
   shallow features Kohlschütter et al. found dominate (text length ×
   link density); nav menus and footers are short and link-dense, body
   prose is long and link-sparse.
4. Smoothing: a short low-link-density block ADJACENT to a content
   block is kept (headings, captions, one-line continuations) — the
   sequence-smoothing step of the same paper.
5. Join kept blocks with "\\n\\n" (the reference's page-concat
   separator, src/parse/client.rs:87-88).

Entity references are resolved by the parser (``convert_charrefs``);
whitespace is collapsed per block. Malformed HTML never raises — the
stdlib parser is lenient by design.
"""

from __future__ import annotations

from html.parser import HTMLParser

#: content threshold (chars after whitespace collapse) — blocks shorter
#: than this are boilerplate unless rescued by smoothing
MIN_BLOCK_CHARS = 25

#: a block whose anchor-char fraction exceeds this is a link list
MAX_LINK_DENSITY = 0.33

_SKIP_TAGS = frozenset(
    "script style noscript svg template iframe head title option select "
    "datalist canvas object embed applet map".split()
)
_BOILER_TAGS = frozenset("nav footer header aside form button menu".split())
_BLOCK_TAGS = frozenset(
    "p div section article main li h1 h2 h3 h4 h5 h6 td th blockquote "
    "pre dd dt figcaption summary".split()
)


class _Block:
    __slots__ = ("parts", "link_chars", "raw_chars", "boiler")

    def __init__(self, boiler: bool):
        self.parts: list[str] = []
        self.link_chars = 0
        self.raw_chars = 0
        self.boiler = boiler

    def text(self) -> str:
        return " ".join("".join(self.parts).split())


class _BlockCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._skip = 0
        self._boiler = 0
        self._link = 0

    def _flush(self) -> None:
        if self._cur is not None and self._cur.raw_chars:
            self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if tag in _BOILER_TAGS:
            self._boiler += 1
        if tag == "a":
            self._link += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag in _BOILER_TAGS:
            self._boiler = max(0, self._boiler - 1)
        if tag == "a":
            self._link = max(0, self._link - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip or not data:
            return
        if self._cur is None:
            self._cur = _Block(boiler=self._boiler > 0)
        elif self._boiler > 0:
            self._cur.boiler = True
        self._cur.parts.append(data)
        n = len(data)
        self._cur.raw_chars += n
        if self._link:
            self._cur.link_chars += n

    def close(self):
        super().close()
        self._flush()


def extract_main_text(html: bytes) -> str:
    """Main-content text of a real HTML page (see module docstring).
    Pure and deterministic — drop-in for the ``extractor`` slot of
    :func:`semtools_spark.operators.parse.parse_pages`."""
    if not html:
        return ""
    parser = _BlockCollector()
    try:
        parser.feed(html.decode("utf-8", errors="replace"))
        parser.close()
    except Exception:
        # stdlib parser is lenient, but a pathological page must degrade
        # to empty, not kill the Spark task
        return ""

    # whitespace-only blocks (inter-tag newlines) carry no signal and
    # would break the adjacency step below
    blocks = [b for b in parser.blocks if b.text()]
    texts = [b.text() for b in blocks]
    dens = [(b.link_chars / b.raw_chars) if b.raw_chars else 1.0 for b in blocks]
    content = [
        (not b.boiler) and len(t) >= MIN_BLOCK_CHARS and d <= MAX_LINK_DENSITY
        for b, t, d in zip(blocks, texts, dens)
    ]
    # smoothing: short clean blocks adjacent to content are kept
    kept = list(content)
    for i, b in enumerate(blocks):
        if content[i] or b.boiler or not texts[i] or dens[i] > MAX_LINK_DENSITY:
            continue
        if (i > 0 and content[i - 1]) or (i + 1 < len(content) and content[i + 1]):
            kept[i] = True
    return "\n\n".join(t for t, k in zip(texts, kept) if k)
