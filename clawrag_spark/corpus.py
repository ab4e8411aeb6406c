"""Deterministic synthetic Common-Crawl-style page corpus.

Produces exactly the BASELINE.json ``input_hint`` schema:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Per FIXTURES.md §1:
- hosts drawn from a Zipf-skewed pool (a few hosts own ~half the rows —
  exercises salting / skew handling),
- HTML pages with nav/header/footer/ad boilerplate + main content
  (headings, paragraphs, lists, a table),
- ~5 % PDF-like payloads (``%PDF`` magic, uncompressed text content
  streams with positioned blocks emitted in shuffled order so the
  reading-order sort is exercised),
- ~2 % malformed rows (truncated tags, latin-1 bytes, empty payloads)
  for parse-failure counting,
- ~1 % declared-charset pages (windows-1251 Cyrillic behind a meta
  declaration, UTF-16LE behind a BOM) exercising the WHATWG prescan in
  `core/charset.py` — decode them as UTF-8/latin-1 and the byte-identity
  gate fails,
- ~3 % exact-duplicate bodies under different urls (dedup/versioning),
- deterministic increasing ``warc_ts`` within a 30-day window,
- everything seeded — same (n_rows, seed) → byte-identical corpus.
"""

from __future__ import annotations

import random
import zlib
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
_T0 = datetime(2025, 6, 1, 0, 0, 0)

_HOSTS = [f"host{i:03d}.example.com" for i in range(40)]

_VOCAB = {
    "en": (
        "the quick brown fox jumps over a lazy dog while data pipelines "
        "process web pages at scale and extraction quality depends on "
        "boilerplate removal link density heuristics reading order and "
        "deterministic chunking with overlap across partitions clusters "
        "shuffle joins aggregate window functions spark arrow pandas"
    ).split(),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund während "
        "die daten pipeline web seiten im großen maßstab verarbeitet und "
        "die qualität der extraktion von der entfernung von boilerplate "
        "mit deterministischer aufteilung und überlappung abhängt für "
        "eine verteilte verarbeitung auf vielen rechnern zugleich"
    ).split(),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux pendant "
        "que les pipelines de données traitent les pages web à grande "
        "échelle et la qualité de extraction dépend de la suppression du "
        "boilerplate avec un découpage déterministe et chevauchement"
    ).split(),
}
_LANGS = ["en", "en", "en", "en", "en", "en", "de", "de", "fr"]

#: Cyrillic vocabulary for the declared-charset (windows-1251) pages —
#: every char must exist in cp1251 (plain Russian does).
_VOCAB_RU = (
    "быстрая бурая лиса прыгает через ленивую собаку пока конвейеры "
    "данных обрабатывают веб страницы в большом масштабе и качество "
    "извлечения зависит от удаления шаблонов"
).split()


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    vocab = _VOCAB[lang]
    words = [rng.choice(vocab) for _ in range(n_words)]
    return " ".join(words).capitalize() + "."


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang, rng.randint(6, 16)) for _ in range(rng.randint(2, 5)))


def _html_page(rng: random.Random, lang: str, title: str, content_scale: int = 1) -> str:
    nav_links = "".join(
        f'<a href="/{rng.randint(1, 99)}">{rng.choice(_VOCAB[lang])}</a> '
        for _ in range(rng.randint(4, 9))
    )
    parts = [
        "<!DOCTYPE html>",
        f'<html lang="{lang}"><head><title>{title}</title>',
        '<script>var x = "tracking junk";</script>',
        "<style>body { color: red }</style></head><body>",
        f"<nav>{nav_links}</nav>",
        f'<header><a href="/">home</a> | <a href="/about">about</a></header>',
        f'<div class="ad-banner">BUY NOW {rng.choice(_VOCAB["en"])}! '
        f'<a href="http://ads.example/click">click here</a></div>',
        "<main>",
        f"<h1>{title}</h1>",
    ]
    for si in range(rng.randint(1, 3) * content_scale):
        parts.append(f"<h2>{_sentence(rng, lang, rng.randint(3, 6))[:-1]}</h2>")
        for _ in range(rng.randint(1, 4)):
            parts.append(f"<p>{_paragraph(rng, lang)}</p>")
        if rng.random() < 0.4:
            items = "".join(
                f"<li>{_sentence(rng, lang, rng.randint(3, 8))}</li>"
                for _ in range(rng.randint(2, 5))
            )
            parts.append(f"<ul>{items}</ul>")
    if rng.random() < 0.3:
        rows = "".join(
            "<tr>"
            + "".join(f"<td>{rng.choice(_VOCAB[lang])} {rng.randint(0, 999)}</td>" for _ in range(3))
            + "</tr>"
            for _ in range(rng.randint(2, 4))
        )
        parts.append(f"<table>{rows}</table>")
    parts.append("</main>")
    parts.append(
        '<footer><a href="/imprint">imprint</a> <a href="/privacy">privacy</a> '
        "&copy; 2025 example</footer>"
    )
    parts.append("</body></html>")
    return "".join(parts)


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_page_stream(
    rng: random.Random, lang: str, title: str | None, layout_key: str = ""
) -> bytes:
    """One uncompressed content stream; ops emitted in shuffled order.

    ~1 in 4 pages (chosen by a CRC of ``layout_key`` — NO extra rng
    draw, so adding the two-column feature left every other page of a
    seeded corpus byte-identical) lays its body out in TWO COLUMNS
    (x=72 and x=320, title full-width above): the extractor's
    column-block detection must segment them or the columns interleave
    line-by-line.
    """
    items: list[tuple[float, float, str]] = []  # (y_step_after, size, text)
    if title:
        items.append((40.0, 20.0, title))
    for _ in range(rng.randint(2, 4)):
        if rng.random() < 0.4:
            items.append((30.0, 15.0, _sentence(rng, lang, rng.randint(3, 6))[:-1]))
        for _ in range(rng.randint(2, 5)):
            items.append((14.0, 12.0, _sentence(rng, lang, rng.randint(5, 10))))
        items[-1] = (items[-1][0] + 26.0, items[-1][1], items[-1][2])  # para gap

    crc = zlib.crc32(layout_key.encode("utf-8")) if layout_key else 1
    two_col = crc % 4 == 0
    has_table = crc % 16 == 2  # disjoint from two_col (2 % 4 != 0)
    ops: list[tuple[float, float, float, str]] = []  # (y, x, size, text)
    body = items[1:] if title else items
    y = 720.0
    if title:
        ops.append((y, 72.0, 20.0, title))
        y -= items[0][0]
    if two_col and len(body) >= 4:
        mid = (len(body) + 1) // 2
        col_top = y
        for x, col_items in ((72.0, body[:mid]), (320.0, body[mid:])):
            y = col_top
            for step, size, text in col_items:
                ops.append((y, x, size, text))
                y -= step
    else:
        for step, size, text in body:
            ops.append((y, 72.0, size, text))
            y -= step
    table_ops: list[tuple[float, float, float, str]] = []
    if has_table:
        # a 3-column table below the body; cell words recycle the text
        # already drawn above, and the ops stay OUT of the rng shuffle
        # (its draw count depends on len(ops)) — zero rng perturbation
        words = " ".join(t for _, _, t in items).split() or ["cell"]
        n_rows = 3 + (crc >> 8) % 3  # header + 2-4 data rows
        y -= 30.0
        for r in range(n_rows):
            for c, x in enumerate((72.0, 220.0, 368.0)):
                w = words[(r * 3 + c) % len(words)]
                table_ops.append((y, x, 12.0, f"{w}{r}" if r else w))
            y -= 18.0
    shuffled = ops[:]
    rng.shuffle(shuffled)  # parser must restore reading order
    shuffled.extend(reversed(table_ops))  # disordered, but rng-free
    stream = "\n".join(
        f"BT /F1 {size:g} Tf {x:g} {y:g} Td ({_pdf_escape(text)}) Tj ET"
        for (y, x, size, text) in shuffled
    )
    return b"stream\n" + stream.encode("utf-8") + b"\nendstream\n"


def _pdf_doc(rng: random.Random, lang: str, title: str, content_scale: int = 1) -> bytes:
    pages = [_pdf_page_stream(rng, lang, title, layout_key=title)]
    for p in range(rng.randint(0, 2) * content_scale):
        pages.append(
            _pdf_page_stream(rng, lang, None, layout_key=f"{title}|p{p + 1}")
        )
    return b"%PDF-1.4\n" + b"".join(pages) + b"%%EOF\n"


def generate_pages(n_rows: int, seed: int = SEED, content_scale: int = 1) -> pa.Table:
    """Generate the pages table as a pyarrow Table (deterministic).

    ``content_scale`` multiplies the amount of main content per page
    (sections/paragraphs) — scale 1 gives ~2-3 KB toy pages for fast
    unit tests; scale 8-16 approximates realistic Common-Crawl page
    sizes for benchmarking, where per-document extraction compute must
    dominate fixed job overheads.
    """
    rng = random.Random(seed)
    zipf_rng = np.random.default_rng(seed)
    # Zipf-skewed host choice: host000 dominates
    host_idx = np.minimum(zipf_rng.zipf(1.3, size=n_rows) - 1, len(_HOSTS) - 1)

    urls: list[str] = []
    tss: list[datetime] = []
    payloads: list[bytes] = []
    hints: list[str] = []
    langs: list[str] = []

    dup_pool: list[tuple[bytes, str]] = []
    step = timedelta(days=30) / max(n_rows, 1)

    for i in range(n_rows):
        host = _HOSTS[int(host_idx[i])]
        url = f"https://{host}/s{seed}/page/{i:07d}"
        ts = _T0 + step * i
        lang = rng.choice(_LANGS)
        title = _sentence(rng, lang, rng.randint(2, 5))[:-1]
        roll = rng.random()

        if roll < 0.03 and dup_pool:
            # exact duplicate body under a different url
            payload, lang = dup_pool[rng.randrange(len(dup_pool))]
        elif roll < 0.05:
            payload = _pdf_doc(rng, lang, title, content_scale)
        elif roll < 0.055:
            # truncated / malformed html
            full = _html_page(rng, lang, title)
            payload = full[: rng.randint(20, max(21, len(full) // 3))].encode("utf-8")
        elif roll < 0.06:
            # latin-1 bytes (non-utf8 text)
            payload = f"{title} - caf\xe9 na\xefve r\xe9sum\xe9 {_paragraph(rng, 'fr')}".encode("latin-1")
        elif roll < 0.065:
            payload = b""  # empty
        elif roll < 0.07:
            payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 256)))  # binary junk
        elif roll < 0.075:
            # declared-charset page: windows-1251 Cyrillic with a meta
            # declaration — decoded correctly only via the WHATWG
            # prescan (core/charset.py); utf-8-with-latin-1-fallback
            # would mojibake it
            ru = " ".join(rng.choice(_VOCAB_RU) for _ in range(rng.randint(20, 60)))
            ru_title = " ".join(rng.choice(_VOCAB_RU) for _ in range(3)).capitalize()
            payload = (
                f'<html><head><meta charset="windows-1251"><title>{ru_title}</title>'
                f"</head><body><p>{ru}</p></body></html>"
            ).encode("windows-1251")
        elif roll < 0.08:
            # UTF-16LE page with BOM: routing must decode before the
            # marker match (NUL-laced bytes are "valid UTF-8")
            payload = b"\xff\xfe" + _html_page(rng, lang, title).encode("utf-16-le")
        elif roll < 0.09:
            payload = _paragraph(rng, lang).encode("utf-8")  # plain text page
        else:
            payload = _html_page(rng, lang, title, content_scale).encode("utf-8")
            if rng.random() < 0.1 and len(dup_pool) < 64:
                dup_pool.append((payload, lang))

        urls.append(url)
        tss.append(ts)
        payloads.append(payload)
        hints.append("")  # pre-extracted hint intentionally empty: must not be relied on
        langs.append(lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(hints, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(
    path: str,
    n_rows: int,
    seed: int = SEED,
    n_files: int = 1,
    content_scale: int = 1,
) -> str:
    """Write the corpus to parquet.

    ``n_files > 1`` writes a directory of part files so Spark's scan
    parallelizes from the first stage — a single big file serializes
    the read + first repartition through one task (real crawl inputs
    are always many files).
    """
    table = generate_pages(n_rows, seed, content_scale)
    if n_files <= 1:
        pq.write_table(table, path, row_group_size=max(256, n_rows // 64))
        return path
    import os

    os.makedirs(path, exist_ok=True)
    per = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * per, per)
        if part.num_rows:
            pq.write_table(
                part,
                os.path.join(path, f"part-{i:04d}.parquet"),
                row_group_size=max(256, per),
            )
    return path
