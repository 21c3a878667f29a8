"""Main-content extraction from HTML: boilerplate strip + DOM heuristics.

The north rule names this family explicitly (HTML boilerplate strip,
PDF/layout parse, DOM heuristics). Two paths, scale-shaped like the OCR
stage:

- ``strip_tags_col``: the cheap column-expression path (JVM regex, SQL
  oracle-checkable) — tags out, entities decoded, whitespace collapsed.
- ``extract_main_content``: the DOM path — stdlib ``html.parser`` inside an
  Arrow-batched ``mapInPandas`` (same no-per-row-Python rule as OCR).
  Readability/Boilerpipe-style heuristics (public literature: Kohlschütter
  et al., boilerpipe; arc90 readability): kill script/style/nav/header/
  footer/aside/form subtrees, score remaining blocks by text length and
  link density, keep content-y blocks, join in document order.

PDF/layout parsing follows the same shape (binary column -> mapInPandas ->
typed blocks); the decode kernel needs a PDF lib not in this container, so
it is stubbed in operators/multimodal.py style.
"""

from __future__ import annotations

import html as html_mod
import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- path 1: column expressions (Catalyst-only, SQL twin exists) ---------

_TAG_RE = r"<[^>]*>"


def strip_tags_col(html: Column) -> Column:
    """Tags -> space, whitespace collapsed, trimmed. Entity decoding is left
    to the DOM path (regex entity tables diverge across engines)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(html, _TAG_RE, " "), r"\s+", " ")
    )


# --- path 2: DOM heuristics inside mapInPandas ---------------------------

_KILL_TAGS = frozenset(
    "script style noscript nav header footer aside form iframe svg button".split()
)
_BLOCK_TAGS = frozenset(
    "p div article section li h1 h2 h3 h4 h5 h6 td pre blockquote".split()
)
MIN_BLOCK_CHARS = 25     # blocks shorter than this are boilerplate-ish
MAX_LINK_DENSITY = 0.33  # boilerpipe-style link-density cutoff


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._cur_text: list[str] = []
        self._cur_link_chars = 0
        self._kill_depth = 0
        self._link_depth = 0
        self.title = ""
        self._in_title = False

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self._cur_text)).strip()
        if text:
            self.blocks.append(
                {"text": text, "link_chars": self._cur_link_chars}
            )
        self._cur_text = []
        self._cur_link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _KILL_TAGS:
            self._kill_depth += 1
        elif tag == "a":
            self._link_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _KILL_TAGS:
            self._kill_depth = max(0, self._kill_depth - 1)
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        elif tag == "title":
            self._in_title = False
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._in_title:
            self.title += data
            return
        if self._kill_depth:
            return
        self._cur_text.append(data)
        if self._link_depth:
            self._cur_link_chars += len(data)


def extract_main_text(html: str) -> dict:
    """Pure function: HTML -> {title, main_text, n_kept, n_dropped}."""
    p = _Extractor()
    p.feed(html_mod.unescape(html) if "&" in html and "<" not in html else html)
    p._flush()
    kept, dropped = [], 0
    for b in p.blocks:
        n = len(b["text"])
        density = b["link_chars"] / n if n else 1.0
        if n >= MIN_BLOCK_CHARS and density <= MAX_LINK_DENSITY:
            kept.append(b["text"])
        else:
            dropped += 1
    return {
        "title": re.sub(r"\s+", " ", p.title).strip(),
        "main_text": "\n".join(kept),
        "n_kept": len(kept),
        "n_dropped": dropped,
    }


MAIN_CONTENT = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("main_text", T.StringType()),
        T.StructField("n_kept", T.IntegerType()),
        T.StructField("n_dropped", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in MAIN_CONTENT.fields}
        for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
            row = {
                "doc_id": str(doc_id),
                "title": None,
                "main_text": None,
                "n_kept": None,
                "n_dropped": None,
                "error": None,
            }
            try:
                row.update(extract_main_text(html or ""))
            except Exception as exc:  # malformed HTML dead-letters, job lives
                row["error"] = str(exc)[:1000]
            for k, v in row.items():
                out[k].append(v)
        yield pd.DataFrame(out)


def extract_main_content(docs: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, html) -> MAIN_CONTENT rows, Arrow-batched."""
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(html_col).alias("html")
    ).mapInPandas(_extract_batches, schema=MAIN_CONTENT)


# --- deterministic synthetic HTML (for tests/queries: wrap a text doc in
#     boilerplate so the golden answer is the original text) --------------


def wrap_in_boilerplate(doc_id: str, body_text: str) -> str:
    nav = '<nav><a href="/">home</a> <a href="/a">sec a</a> <a href="/b">sec b</a></nav>'
    ad = '<div class="ad"><a href="/buy">click here to buy now</a></div>'
    # quote=False: quotes need no escaping in element content, and it keeps
    # byte parity with the column-expression twin (wrap_in_boilerplate_col)
    paras = "".join(
        f"<p>{html_mod.escape(p, quote=False)}</p>" for p in _split_paras(body_text)
    )
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        f"<script>var x=1;</script><style>.a{{color:red}}</style></head>"
        f"<body><header>site {doc_id}</header>{nav}{ad}"
        f"<article>{paras}</article>"
        f"{ad}<footer>copyright 2026 example corp all rights reserved</footer>"
        f"</body></html>"
    )


def _split_paras(text: str, words_per_para: int = 20) -> list[str]:
    words = (text or "").split()
    if not words:
        return ["(empty)" + " placeholder" * 10]
    return [
        " ".join(words[i : i + words_per_para])
        for i in range(0, len(words), words_per_para)
    ]


def wrap_in_boilerplate_col(doc_id: Column, text: Column) -> Column:
    """Column-expression twin of wrap_in_boilerplate: same bytes, but built
    JVM-side (no per-row Python) so query paths that synthesize test HTML
    stay inside codegen AND the downstream extraction result is fully
    SQL-oracle-able (queries.py html_main_content). Parity with the Python
    version is pinned by tests/test_html_extract.py."""
    from ..operators.textstats import tokens  # local import avoids a cycle

    tk = tokens(text)

    def esc(c: Column) -> Column:
        return F.replace(
            F.replace(
                F.replace(c, F.lit("&"), F.lit("&amp;")),
                F.lit("<"),
                F.lit("&lt;"),
            ),
            F.lit(">"),
            F.lit("&gt;"),
        )

    n_chunks = F.ceil(F.size(tk) / F.lit(20.0)).cast("int")
    chunks = F.when(
        F.size(tk) == 0, F.array(F.lit("(empty)" + " placeholder" * 10))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(tk, i * 20 + 1, 20), " "),
        )
    )
    paras = F.aggregate(
        chunks,
        F.lit(""),
        lambda acc, c: F.concat(acc, F.lit("<p>"), esc(c), F.lit("</p>")),
    )
    nav = '<nav><a href="/">home</a> <a href="/a">sec a</a> <a href="/b">sec b</a></nav>'
    ad = '<div class="ad"><a href="/buy">click here to buy now</a></div>'
    return F.concat(
        F.lit("<html><head><title>Doc "),
        doc_id,
        F.lit(
            "</title><script>var x=1;</script><style>.a{color:red}</style>"
            "</head><body><header>site "
        ),
        doc_id,
        F.lit(f"</header>{nav}{ad}<article>"),
        paras,
        F.lit(
            f"</article>{ad}<footer>copyright 2026 example corp "
            "all rights reserved</footer></body></html>"
        ),
    )
