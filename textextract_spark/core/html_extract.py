"""Main-content extraction from HTML via block text/link-density scoring.

Readability/Boilerpipe-style: flatten the DOM into a stream of text blocks
(one per block-level element), score each block by text density
(chars per inline tag) and link density (anchor chars / chars), and keep
blocks classified as content. Pure stdlib (html.parser) — lxml is not
available in this environment and determinism matters more than speed per
document (throughput comes from Arrow-batched parallelism, not the parser).

Reference analog: the vision-LLM prompt "Extract and return only the exact
text visible ... Preserve the text exactly" (/root/reference/backend/routes/
api_routes.py:78) — i.e. the contract is exact, deterministic text per
document. This module IS the oracle: golden files are produced by this same
code path (SURVEY.md §5.1).

Determinism rules (SURVEY.md §7 hard parts): pure function of the input
string; no hash-order iteration (blocks kept in document order); stable
thresholds; no wall-clock, no randomness.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Elements whose entire subtree is dropped.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "svg", "iframe",
     "object", "embed", "title", "canvas", "audio", "video"}
)

# Elements that delimit text blocks.
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "aside", "header", "footer",
     "nav", "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6", "table",
     "thead", "tbody", "tr", "td", "th", "blockquote", "pre", "br", "hr",
     "form", "figure", "figcaption", "dl", "dt", "dd", "body", "html",
     "address", "center", "fieldset", "legend", "details", "summary"}
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Scoring thresholds — these constants DEFINE the extraction semantics; the
# golden corpus is generated with the same values. Do not tune casually.
MIN_BLOCK_CHARS = 25
MIN_HEADING_CHARS = 8
MAX_LINK_DENSITY = 0.33
MIN_TEXT_DENSITY = 10.0
BLOCK_SEP = "\n\n"


def _collapse(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip."""
    return " ".join(s.split())


class _Block:
    __slots__ = ("tag", "parts", "anchor_parts", "inline_tags")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.parts: list[str] = []
        self.anchor_parts: list[str] = []
        self.inline_tags = 0


class _BlockParser(HTMLParser):
    """Flatten HTML into scored text blocks, in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._anchor_depth = 0
        self._block_stack: list[str] = ["body"]
        self._cur = _Block("body")
        self.blocks: list[tuple[str, str, int, float, float]] = []
        # (tag, text, chars, link_density, text_density)

    # -- block lifecycle ---------------------------------------------------
    def _flush(self) -> None:
        b = self._cur
        text = _collapse("".join(b.parts))
        if text:
            chars = len(text)
            anchor_chars = len(_collapse("".join(b.anchor_parts)))
            link_density = (anchor_chars / chars) if chars else 1.0
            text_density = chars / (1.0 + b.inline_tags)
            self.blocks.append((b.tag, text, chars, link_density, text_density))
        self._cur = _Block(self._block_stack[-1] if self._block_stack else "body")

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag not in ("br", "hr"):
                self._block_stack.append(tag)
                self._cur.tag = tag
        else:
            if tag == "a":
                self._anchor_depth += 1
            self._cur.inline_tags += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip_depth:
            return
        if tag in ("br", "hr"):
            self._flush()
        elif tag not in _BLOCK_TAGS and tag not in _SKIP_TAGS:
            self._cur.inline_tags += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            # pop the matching open block if present (lenient on bad nesting)
            for i in range(len(self._block_stack) - 1, 0, -1):
                if self._block_stack[i] == tag:
                    del self._block_stack[i:]
                    break
            self._cur.tag = self._block_stack[-1] if self._block_stack else "body"
        elif tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        self._cur.parts.append(data)
        if self._anchor_depth:
            self._cur.anchor_parts.append(data)

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def _is_content(tag: str, chars: int, link_density: float,
                text_density: float) -> bool:
    """Boilerpipe-style block classification (content vs boilerplate)."""
    if link_density > MAX_LINK_DENSITY:
        return False
    if tag in _HEADING_TAGS:
        return chars >= MIN_HEADING_CHARS
    if chars < MIN_BLOCK_CHARS:
        return False
    return text_density >= MIN_TEXT_DENSITY or tag in ("p", "blockquote", "pre")


def extract_html(html_text: str) -> tuple[str, list[tuple[str, int, int]]]:
    """Extract main content text + char spans from an HTML string.

    Returns ``(text, spans)`` where spans are ``(tag, start, end)`` char
    offsets into ``text``, one per kept block, non-overlapping, in document
    order, covering exactly the block texts (separators excluded).
    """
    parser = _BlockParser()
    parser.feed(html_text)
    parser.close()

    out_parts: list[str] = []
    spans: list[tuple[str, int, int]] = []
    pos = 0
    for tag, text, chars, link_density, text_density in parser.blocks:
        if not _is_content(tag, chars, link_density, text_density):
            continue
        if out_parts:
            pos += len(BLOCK_SEP)
        out_parts.append(text)
        spans.append((tag, pos, pos + len(text)))
        pos += len(text)
    return BLOCK_SEP.join(out_parts), spans
