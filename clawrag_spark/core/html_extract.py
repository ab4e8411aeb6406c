"""Deterministic HTML main-content extractor (boilerplate stripper).

Re-expresses the *behavior* of the reference's Docling HTML conversion
(backend/src/services/docling_loader.py:42-108 — ``DocumentConverter`` →
``export_to_markdown()``) as a from-scratch, dependency-light extractor:

1. tokenize HTML with the stdlib ``html.parser`` (lenient on malformed
   markup, deterministic),
2. build a DOM tree,
3. classify blocks as content vs boilerplate using readability/
   trafilatura-style heuristics (container tag deny-list, ad-ish
   class/id deny-list, link-density),
4. emit Docling-flavored markdown: ``#``-prefixed headings, ``-`` list
   items, ``|``-delimited table rows, blank-line-separated paragraphs.

The same function runs inside the Spark pandas UDF and in the
single-process oracle, so extracted text is byte-identical per url by
construction (BASELINE.json north rule); pytest verifies the two paths.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Subtrees that never contribute content (readability deny-list).
DROP_TAGS = frozenset(
    "script style noscript template head nav footer header aside form "
    "iframe svg button select option object embed applet meta link title".split()
)

# Void elements that never receive children.
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Elements that start a new output block.
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_BLOCK_TAGS = frozenset(
    "p li pre blockquote td th caption dt dd figcaption".split()
) | _HEADING_TAGS

# Container elements: traversed, not emitted directly.
_CONTAINER_TAGS = frozenset(
    "html body div main article section ul ol dl table thead tbody tfoot "
    "tr figure details summary span center".split()
)

# Ad-ish class/id fragments (boilerplate classification).
_DROP_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(ad|ads|advert|advertisement|banner|promo|sponsor|"
    r"sidebar|cookie|popup|modal|social|share|breadcrumb|pagination|"
    r"comment|comments|related|widget)(?:$|[\s_-])",
    re.IGNORECASE,
)

# A linky block shorter than this many chars is navigation, not content.
_LINK_DENSITY_MAX = 0.5
_LINK_BLOCK_MIN_CHARS = 120

_WS_RE = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "dropped", "children", "parent")

    def __init__(self, tag: str, dropped: bool, parent: "_Node | None"):
        self.tag = tag
        self.dropped = dropped
        self.children: list[object] = []  # _Node | str
        self.parent = parent


class _TreeBuilder(HTMLParser):
    """Lenient DOM builder; unclosed/misnested tags close implicitly."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", False, None)
        self._cur = self.root

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            if tag == "br":
                self._cur.children.append("\n")
            return
        attr_map = dict(attrs)
        classish = " ".join(
            v for v in (attr_map.get("class"), attr_map.get("id")) if v
        )
        dropped = (
            self._cur.dropped
            or tag in DROP_TAGS
            or bool(classish and _DROP_CLASS_RE.search(classish))
        )
        node = _Node(tag, dropped, self._cur)
        self._cur.children.append(node)
        self._cur = node

    def handle_endtag(self, tag: str) -> None:
        # close the nearest open ancestor with this tag (lenient recovery)
        node = self._cur
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self._cur = node.parent

    def handle_data(self, data: str) -> None:
        if data:
            self._cur.children.append(data)


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def _gather(node: _Node, parts: list[str], link_chars: list[int], in_link: bool) -> None:
    """Collect descendant text and count chars under <a> for link density."""
    for child in node.children:
        if isinstance(child, str):
            parts.append(child)
            if in_link:
                link_chars[0] += len(_norm(child))
        else:
            if child.dropped:
                continue
            _gather(child, parts, link_chars, in_link or child.tag == "a")


def _block_text(node: _Node) -> tuple[str, int]:
    parts: list[str] = []
    link_chars = [0]
    _gather(node, parts, link_chars, node.tag == "a")
    return _norm("".join(parts)), link_chars[0]


def _is_boilerplate(text: str, link_chars: int) -> bool:
    if not text:
        return True
    density = link_chars / len(text)
    return density > _LINK_DENSITY_MAX and len(text) < _LINK_BLOCK_MIN_CHARS


class _Emitter:
    def __init__(self) -> None:
        self.blocks: list[str] = []
        self.counts = {"headings": 0, "lists": 0, "tables": 0, "paragraphs": 0}

    def walk(self, node: _Node) -> None:
        for child in node.children:
            if isinstance(child, str):
                # bare text directly inside a container becomes a paragraph
                text = _norm(child)
                if text and not node.dropped and node.tag in _CONTAINER_TAGS | {"#root"}:
                    self.blocks.append(text)
                    self.counts["paragraphs"] += 1
                continue
            if child.dropped:
                continue
            tag = child.tag
            if tag == "tr":
                self._emit_row(child)
            elif tag in _BLOCK_TAGS:
                self._emit_block(child)
            else:
                self.walk(child)

    def _emit_row(self, node: _Node) -> None:
        cells = []
        for child in node.children:
            if isinstance(child, _Node) and not child.dropped and child.tag in ("td", "th"):
                text, link_chars = _block_text(child)
                cells.append(text)
        if any(cells):
            self.blocks.append("| " + " | ".join(cells) + " |")
            self.counts["tables"] += 1

    def _emit_block(self, node: _Node) -> None:
        text, link_chars = _block_text(node)
        if _is_boilerplate(text, link_chars):
            return
        tag = node.tag
        if tag in _HEADING_TAGS:
            self.blocks.append("#" * int(tag[1]) + " " + text)
            self.counts["headings"] += 1
        elif tag == "li":
            self.blocks.append("- " + text)
            self.counts["lists"] += 1
        else:
            self.blocks.append(text)
            self.counts["paragraphs"] += 1


def extract_html(html_text: str) -> tuple[str, dict[str, int]]:
    """Extract main content from an HTML string.

    Returns ``(markdown_text, artifact_counts)`` where artifact_counts
    feeds the structure-preservation score
    (backend/src/core/quality_scorer.py:22-60 takes tables/headings/
    lists/images counts).
    """
    builder = _TreeBuilder()
    try:
        builder.feed(html_text)
        builder.close()
    except Exception:
        # html.parser is lenient; a hard failure means garbage input —
        # fall through with whatever tree was built so far.
        pass
    emitter = _Emitter()
    emitter.walk(builder.root)
    text = "\n\n".join(emitter.blocks)
    counts = {
        "headings_count": emitter.counts["headings"],
        "lists_count": emitter.counts["lists"],
        "tables_count": emitter.counts["tables"],
        "paragraphs_count": emitter.counts["paragraphs"],
        "images_count": 0,
    }
    return text, counts
