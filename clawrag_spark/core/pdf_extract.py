"""Deterministic Docling-style PDF layout parser.

Re-expresses the *behavior* of the reference's PDF pipeline
(backend/src/services/docling_service.py:264-444 routing,
backend/src/services/pdf_analyzer.py:12-85 ``has_text`` analysis,
backend/src/services/pdf_repair_service.py:12-46 repair-passthrough) as a
from-scratch parser over uncompressed PDF text content streams:

- each ``stream … endstream`` block is a page (pages in document order),
- text ops ``BT [/Fn SIZE Tf] X Y Td (TEXT) Tj ET`` are decoded into
  positioned text spans,
- span x-origins are clustered into COLUMN BLOCKS (gap > ``_COL_GAP``
  starts a column); a full-width header band above the columns reads
  first, then each column left-to-right (Docling-style block detection
  + reading-order sort; single-cluster pages take the unchanged
  single-column path),
- within a segment spans sort into reading order (top-to-bottom by
  ``y`` descending — PDF y grows upward — then left-to-right by ``x``),
- consecutive lines are merged into blocks; a vertical gap larger than
  ``_PARA_GAP`` starts a new paragraph (block detection),
- large font sizes become markdown headings (Docling-style structure).

Real-world PDFs with compressed streams/OCR would be handled by a
swappable engine behind the same function signature; this container has
no PDF/OCR libraries, so the parser targets uncompressed text streams
(which the synthetic corpus and the byte-identity oracle share).
"""

from __future__ import annotations

import re

_PARA_GAP = 20.0  # y-units; a larger gap starts a new paragraph
_H1_SIZE = 18.0
_H2_SIZE = 14.0
_COL_GAP = 100.0  # x-units; a larger gap between x clusters = new column

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_OP_RE = re.compile(
    rb"BT\s+(?:/F\d+\s+([\d.]+)\s+Tf\s+)?"
    rb"([\-\d.]+)\s+([\-\d.]+)\s+Td\s+"
    rb"\(((?:\\.|[^\\()])*)\)\s*Tj\s+ET",
    re.DOTALL,
)
_ENCRYPT_RE = re.compile(rb"/Encrypt\b")
_UNESCAPE_RE = re.compile(rb"\\([\\()nrt])")
_UNESCAPE_MAP = {
    b"\\": b"\\", b"(": b"(", b")": b")",
    b"n": b"\n", b"r": b"\r", b"t": b"\t",
}


def _unescape(raw: bytes) -> str:
    out = _UNESCAPE_RE.sub(lambda m: _UNESCAPE_MAP[m.group(1)], raw)
    return out.decode("utf-8", errors="replace")


def analyze_pdf(payload: bytes) -> dict:
    """PDF analysis mirroring pdf_analyzer.py:12-85.

    Returns ``is_encrypted``, ``page_count`` and ``has_text`` (more than
    50 stripped chars over the first 3 pages — pdf_analyzer.py:59-76).
    """
    streams = _STREAM_RE.findall(payload)
    chars = 0
    for stream in streams[:3]:
        for m in _TEXT_OP_RE.finditer(stream):
            chars += len(_unescape(m.group(4)).strip())
    return {
        "is_encrypted": bool(_ENCRYPT_RE.search(payload)),
        "page_count": len(streams),
        "has_text": chars > 50,
    }


def _table_bands(
    spans: list[tuple],
) -> tuple[list[tuple[float, float, str]], list[tuple]]:
    """Aligned-row table detection for one page (Docling-style block
    analysis, the grid case): group spans into rows by exact baseline,
    take each row's x-signature (sorted distinct x origins), and call
    >= 2 CONSECUTIVE rows with an IDENTICAL signature of >= 3 columns a
    table band.  Three columns minimum is the disambiguator against
    two-column LAYOUTS, whose aligned baselines produce 2-wide
    signatures — separating a 2-column table from a 2-column layout
    needs glyph widths this span model doesn't carry (documented
    limitation).

    Returns ``(bands, remaining_spans)``; a band is ``(top_y,
    bottom_y, markdown)`` with the first row rendered as the header
    row.  Cell text joins the row's spans at that x, left to right.
    """
    rows: dict[float, list[tuple]] = {}
    for s in spans:
        rows.setdefault(s[0], []).append(s)
    ordered = [
        (
            y,
            tuple(sorted({sp[1] for sp in rows[y]})),
            rows[y],
        )
        for y in sorted(rows, reverse=True)
    ]
    bands: list[tuple[float, float, str]] = []
    in_band: set[float] = set()
    i = 0
    while i < len(ordered):
        y, sig, _row = ordered[i]
        if len(sig) >= 3:
            j = i + 1
            while j < len(ordered) and ordered[j][1] == sig:
                j += 1
            if j - i >= 2:
                md_rows = []
                for yy, _s, row in ordered[i:j]:
                    cells = [
                        " ".join(
                            sp[3]
                            for sp in sorted(row, key=lambda s: s[0])
                            if sp[1] == x
                        )
                        for x in sig
                    ]
                    md_rows.append("| " + " | ".join(cells) + " |")
                    in_band.add(yy)
                md_rows.insert(1, "|" + " --- |" * len(sig))
                bands.append(
                    (ordered[i][0], ordered[j - 1][0], "\n".join(md_rows))
                )
                i = j
                continue
        i += 1
    rest = [s for s in spans if s[0] not in in_band]
    return bands, rest


def _column_segments(spans: list[tuple]) -> list[list[tuple]]:
    """Docling-style column-block detection for one page.

    Clusters span x-origins (a gap > ``_COL_GAP`` starts a new column).
    A single cluster — the overwhelmingly common case — returns the
    whole page as one segment, which keeps single-column extraction
    byte-for-byte what it was before multi-column support.  With 2+
    clusters, spans strictly ABOVE the top of every non-leftmost column
    form a full-width header band (title/abstract) read first; the
    rest are read column by column, left to right, each column
    top-to-bottom.  Paragraphs flowing across a column break are split
    at the break (a simplification over true flow reconstruction —
    deterministic and shared with the byte-identity oracle).
    """
    if not spans:
        return []
    xs = sorted({s[1] for s in spans})
    clusters: list[list[float]] = [[xs[0]]]
    for x in xs[1:]:
        if x - clusters[-1][-1] > _COL_GAP:
            clusters.append([x])
        else:
            clusters[-1].append(x)
    if len(clusters) == 1:
        return [spans]
    col_of = {x: i for i, cl in enumerate(clusters) for x in cl}
    top_right = max(s[0] for s in spans if col_of[s[1]] > 0)
    header = [s for s in spans if s[0] > top_right]
    cols: list[list[tuple]] = [[] for _ in clusters]
    for s in spans:
        if s[0] > top_right:
            continue
        cols[col_of[s[1]]].append(s)
    return [seg for seg in ([header] + cols) if seg]


def extract_pdf(payload: bytes) -> tuple[str, dict[str, int]]:
    """Extract markdown text from a PDF payload in reading order.

    Returns ``(markdown_text, artifact_counts)`` like
    ``html_extract.extract_html``.  Raises ``ValueError`` for encrypted
    documents (the reference gates them out: docling_service.py:304-309).
    """
    if _ENCRYPT_RE.search(payload):
        raise ValueError("encrypted_pdf")

    blocks: list[str] = []
    headings = 0
    paragraphs = 0
    tables = 0

    for stream in _STREAM_RE.findall(payload):
        spans = []
        for m in _TEXT_OP_RE.finditer(stream):
            size = float(m.group(1)) if m.group(1) else 12.0
            x = float(m.group(2))
            y = float(m.group(3))
            text = _unescape(m.group(4)).strip()
            if text:
                spans.append((y, x, size, text))

        bands, spans = _table_bands(spans)
        segments = _column_segments(spans)
        # tables read inline (by y) when the page is single-column;
        # in a multi-column page a band's flow position is ambiguous
        # without widths, so bands append after the columns
        if not segments and bands:
            segments = [[]]
        inline = bands if len(segments) == 1 else []

        for segment in segments:
            # reading order within a segment: top-to-bottom (y desc,
            # PDF y grows upward), then left-to-right (x asc)
            segment.sort(key=lambda s: (-s[0], s[1]))

            # group spans on (nearly) the same baseline into lines
            lines: list[tuple[float, float, str]] = []  # (y, size, text)
            for y, x, size, text in segment:
                if lines and abs(lines[-1][0] - y) < 2.0:
                    prev_y, prev_size, prev_text = lines[-1]
                    lines[-1] = (prev_y, max(prev_size, size), prev_text + " " + text)
                else:
                    lines.append((y, size, text))

            # block detection: vertical gap > _PARA_GAP starts a new
            # paragraph; segment boundaries always flush
            cur: list[str] = []
            cur_size = 0.0
            prev_y: float | None = None

            def flush() -> None:
                nonlocal cur, cur_size, headings, paragraphs
                if not cur:
                    return
                text = " ".join(cur)
                if cur_size >= _H1_SIZE:
                    blocks.append("# " + text)
                    headings += 1
                elif cur_size >= _H2_SIZE:
                    blocks.append("## " + text)
                    headings += 1
                else:
                    blocks.append(text)
                    paragraphs += 1
                cur = []
                cur_size = 0.0

            events: list[tuple] = [("line", *ln) for ln in lines]
            events.extend(("table", top, bot, md) for top, bot, md in inline)
            inline = []
            events.sort(key=lambda e: -e[1])

            for ev in events:
                if ev[0] == "table":
                    flush()
                    blocks.append(ev[3])
                    tables += 1
                    prev_y = ev[2]
                    continue
                _, y, size, text = ev
                if prev_y is not None and (prev_y - y) > _PARA_GAP:
                    flush()
                # a font-size change also separates blocks (heading boundary)
                if cur and size != cur_size:
                    flush()
                cur.append(text)
                cur_size = max(cur_size, size)
                prev_y = y
            flush()

        if bands and len(segments) > 1:
            # multi-column page: bands were not inlined — append them
            for _top, _bot, md in bands:
                blocks.append(md)
                tables += 1

    counts = {
        "headings_count": headings,
        "lists_count": 0,
        "tables_count": tables,
        "paragraphs_count": paragraphs,
        "images_count": 0,
    }
    return "\n\n".join(blocks), counts


def repair_pdf(payload: bytes) -> bytes:
    """S8: structural PDF repair — the from-scratch stand-in for
    pdf_repair_service.py:12-46's pikepdf open→save round-trip, which
    rebuilds broken xref/trailer structure and closes truncated
    objects.  For this engine's uncompressed-content-stream dialect the
    equivalent structural fixes are:

    - resync to the ``%PDF`` header (leading garbage bytes before it),
      or prepend a minimal header when it is missing entirely,
    - close an unterminated final text operation (payload truncated
      inside ``BT … Tj ET``: unbalanced ``(`` gets its ``) Tj``, a
      dangling text object gets its ``ET``),
    - balance ``stream``/``endstream`` (missing terminators appended),

    all deterministic and idempotent (repairing an intact document
    returns it unchanged).  Callers re-extract the repaired bytes and
    fall back to the original failure if the repair salvages nothing —
    the reference's passthrough-on-failure contract.
    """
    fixed = payload
    idx = fixed.find(b"%PDF")
    if idx > 0:
        fixed = fixed[idx:]
    elif idx < 0:
        fixed = b"%PDF-1.4\n" + fixed

    # truncated final text op: BT opened after the last ET
    last_bt = fixed.rfind(b"BT")
    last_et = fixed.rfind(b"ET")
    if last_bt >= 0 and last_bt > last_et:
        tail = fixed[last_bt:]
        # salvage-level paren balance (escaped parens are rare enough in
        # a truncation tail that exactness doesn't change the outcome)
        n_open = tail.count(b"(") - tail.count(b")")
        if n_open > 0:
            fixed += b")"
            tail = fixed[last_bt:]
        if n_open > 0 and not tail.rstrip().endswith(b"Tj"):
            fixed += b" Tj"
        fixed += b"\nET"

    # \bstream\b does not match inside 'endstream' (no word boundary)
    n_streams = len(re.findall(rb"\bstream\b", fixed))
    n_ends = len(re.findall(rb"\bendstream\b", fixed))
    if n_streams > n_ends:
        fixed += b"\nendstream" * (n_streams - n_ends)
    return fixed
