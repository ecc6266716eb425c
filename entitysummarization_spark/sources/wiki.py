"""S9 — Wikipedia page fetch as a distributed source (SURVEY §2.1 S9).

Reference semantics (DbpediaProcessor.java:155-258
``downloadWikipediaPagesForCorpusConcepts`` and
WikipediaAccessLayer.java:698-720 ``downloadWikipediaPagesForConcepts``):
for a deduplicated set of entity names, GET ``<base_url><entity>``,
extract the text of the ``#mw-content-text p`` paragraphs (jsoup
``Elements.text()`` — element texts joined by single spaces, intra-
element whitespace normalized), keep pages whose extracted text exceeds
``min_words`` whitespace-split words, and persist one document per
entity. Failures are logged per entity and never abort the crawl.

Spark-first shape — the reference's single-threaded jsoup loop becomes a
partitioned fetch stage:

  - the entity list is a DataFrame column: ``distinct()`` replaces the
    reference's ``existingEntities`` HashSet dedup, and an explicit
    ``repartition`` spreads the (latency-bound, not CPU-bound) fetch
    across executors;
  - the fetch itself is ``mapInPandas`` — one HTTP round-trip per row,
    Arrow-batched in and out, so a 1000-executor crawl is just more
    partitions. ``fetch_concurrency`` threads per partition hide
    request latency the way the reference never could;
  - parsing is a stdlib ``html.parser`` re-expression of jsoup's
    ``select("#mw-content-text p").text()`` (no jsoup/bs4 in this
    container) — real, golden-tested logic, not a stub;
  - the HTTP layer is INJECTABLE: ``transport(url) -> html | None``.
    The default is a urllib transport (stdlib, honest User-Agent,
    timeout, None on any error — the reference's catch-and-log). This
    sandbox has no network, so tests exercise the full distributed
    path through deterministic fake/file transports; the default
    transport's code path is the same ``mapInPandas`` closure.

At 100 TB / full-enwiki scale nothing changes: the entity column is
just bigger, fetch partitions stay independent, and the result lands in
parquet via ``entity_pages`` → ``df.write.parquet`` instead of the
reference's one-file-per-entity FileWriter (``write_text_files`` keeps
that layout available for parity with the downstream directory scans).
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Callable, Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

Transport = Callable[[str], Optional[str]]

_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr"
    .split()
)


class _ContentParagraphParser(HTMLParser):
    """Collect the text of ``<p>`` descendants of id="mw-content-text".

    jsoup's ``select("#mw-content-text p")`` matches every ``p`` at any
    depth under the content div; ``Elements.text()`` then yields each
    element's whitespace-normalized text, elements joined by one space.
    ``<script>``/``<style>`` children contribute no text (jsoup treats
    their payload as DataNode, not TextNode).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._content_depth = 0  # >0 ⇔ inside the content subtree
        self._p_depth = 0  # >0 ⇔ inside a <p> inside the content subtree
        self._skip_depth = 0  # inside <script>/<style>
        self._stack: list[str] = []  # open tags inside content subtree
        self._current: list[str] = []
        self.paragraphs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_ELEMENTS:
            return
        if self._content_depth == 0:
            if dict(attrs).get("id") == "mw-content-text":
                self._content_depth = 1
                self._stack = []
            return
        self._stack.append(tag)
        if tag == "p":
            if self._p_depth == 0:
                self._current = []
            self._p_depth += 1
        if tag in ("script", "style"):
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _VOID_ELEMENTS:
            return
        if self._content_depth == 0:
            return
        if not self._stack:
            # closing the content div itself
            self._content_depth = 0
            return
        # pop to the matching open tag (tolerates unclosed children)
        while self._stack:
            top = self._stack.pop()
            if top == "p" and self._p_depth > 0:
                self._p_depth -= 1
                if self._p_depth == 0:
                    text = " ".join("".join(self._current).split())
                    if text:
                        self.paragraphs.append(text)
            if top in ("script", "style") and self._skip_depth > 0:
                self._skip_depth -= 1
            if top == tag:
                break

    def handle_data(self, data):
        if self._p_depth > 0 and self._skip_depth == 0:
            self._current.append(data)


def parse_content_paragraphs(html_doc: str) -> str:
    """``select("#mw-content-text p").text()`` re-expressed in stdlib.

    Returns the single-space-joined, whitespace-normalized text of every
    paragraph under the content div — "" when the div or all paragraphs
    are absent (jsoup's Elements.text() on an empty selection).
    """
    parser = _ContentParagraphParser()
    try:
        parser.feed(html_doc)
        parser.close()
    except Exception:  # malformed markup: keep what parsed, like jsoup
        pass
    return " ".join(parser.paragraphs)


def urllib_transport(
    timeout: float = 20.0,
    user_agent: str = "entitysummarization-spark/1.0 (research crawler)",
) -> Transport:
    """Default stdlib HTTP transport: html on 200, None on any failure
    (the reference catches IOException per entity and moves on)."""

    def fetch(url: str) -> Optional[str]:
        import urllib.request

        try:
            req = urllib.request.Request(
                url, headers={"User-Agent": user_agent}
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                charset = resp.headers.get_content_charset() or "utf-8"
                return resp.read().decode(charset, errors="replace")
        except Exception:
            return None

    return fetch


def file_transport(root: str) -> Transport:
    """Serve ``<root>/<quoted title>.html`` — the offline/file:// twin
    used where the sandbox has no network (and handy for replaying a
    saved crawl deterministically)."""

    def fetch(url: str) -> Optional[str]:
        import os
        import urllib.parse

        title = url.rsplit("/", 1)[-1]
        path = os.path.join(root, urllib.parse.unquote(title) + ".html")
        try:
            with open(path, encoding="utf-8") as fh:
                return fh.read()
        except OSError:
            return None

    return fetch


PAGE_SCHEMA = StructType(
    [
        StructField("entity", StringType(), False),
        StructField("text", StringType(), True),
        StructField("n_words", IntegerType(), True),
    ]
)


@dataclass(frozen=True)
class WikiFetchConfig:
    base_url: str = "https://en.wikipedia.org/wiki/"
    # DbpediaProcessor uses 300 (dir variant) / 200 (set variant);
    # WikipediaAccessLayer applies no floor. Callers pick.
    min_words: int = 200
    fetch_concurrency: int = 8  # threads per partition (latency hiding)
    n_partitions: Optional[int] = None  # default: session parallelism


def entity_pages(
    entities: DataFrame,
    transport: Optional[Transport] = None,
    config: WikiFetchConfig = WikiFetchConfig(),
    entity_col: str = "entity",
) -> DataFrame:
    """Distributed S9 crawl: (entity) → (entity, text, n_words).

    Rows whose page fails to fetch, parses to empty, or falls at/below
    ``min_words`` are dropped — exactly the pages the reference never
    writes a .txt for. Entity names are trimmed and deduplicated before
    any fetch (one request per distinct entity, as the reference's
    ``existingEntities`` set guarantees).
    """
    spark = entities.sparkSession
    fetch = transport if transport is not None else urllib_transport()
    base_url, min_words = config.base_url, config.min_words
    concurrency = max(int(config.fetch_concurrency), 1)
    n_parts = (
        config.n_partitions
        if config.n_partitions is not None
        else spark.sparkContext.defaultParallelism
    )

    todo = (
        entities.select(F.trim(F.col(entity_col)).alias("entity"))
        .where(F.col("entity") != "")
        .distinct()
        .repartition(n_parts, "entity")
    )

    def crawl(batches: Iterator) -> Iterator:
        import urllib.parse
        from concurrent.futures import ThreadPoolExecutor

        def one(entity: str):
            url = base_url + urllib.parse.quote(entity, safe="/:()_,.-")
            html_doc = fetch(url)
            if html_doc is None:
                return None
            text = parse_content_paragraphs(html_doc)
            n = len(text.split())
            if n <= min_words:
                return None
            return entity, text, n

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in batches:
                rows = [
                    r
                    for r in pool.map(one, pdf["entity"].tolist())
                    if r is not None
                ]
                import pandas as pd

                yield pd.DataFrame(
                    rows, columns=["entity", "text", "n_words"]
                )

    return todo.mapInPandas(crawl, PAGE_SCHEMA)


def parse_pages(
    pages: DataFrame,
    min_words: int = 200,
    entity_col: str = "entity",
    html_col: str = "html",
) -> DataFrame:
    """The crawl's parse+filter stage over an ALREADY-FETCHED page table
    (a saved crawl snapshot — WARC-style dump, or the offline mirror a
    100-TB pipeline would stage before re-processing): (entity, html) →
    (entity, text, n_words), same selector, word floor and drop
    semantics as ``entity_pages`` (DbpediaProcessor.java:193-199) minus
    the network. One scan, one Arrow-batched projection — no shuffle."""
    min_w = int(min_words)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for entity, html_doc in zip(pdf[entity_col], pdf[html_col]):
                if html_doc is None:
                    continue
                text = parse_content_paragraphs(html_doc)
                n = len(text.split())
                if n > min_w:
                    rows.append((entity, text, n))
            yield pd.DataFrame(rows, columns=["entity", "text", "n_words"])

    return pages.mapInPandas(run, PAGE_SCHEMA)


def write_text_files(pages: DataFrame, output_dir: str) -> int:
    """Reference sink parity: one ``<entity>.txt`` per page
    (DbpediaProcessor.java:193-199). Executor-side foreachPartition —
    no driver collect — writing to a shared filesystem path; returns
    the number of files written. ``read_text_dir`` (S8) scans the
    result straight back into the engine. Prefer
    ``pages.write.parquet`` for anything at scale; this layout exists
    because the reference's downstream corpus loaders consume it."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    count = pages.sparkSession.sparkContext.accumulator(0)

    def dump(rows):
        for row in rows:
            safe = row["entity"].replace(os.sep, "_")
            path = os.path.join(output_dir, safe + ".txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(row["text"])
            count.add(1)

    pages.select("entity", "text").foreachPartition(dump)
    return count.value


def make_page_html(title: str, paragraphs: list[str]) -> str:
    """Deterministic Wikipedia-shaped HTML (test/fixture helper): a
    chrome div the selector must ignore, the content div with the given
    paragraphs, an infobox table and a script whose text must NOT leak
    into the extraction."""
    body = "".join(f"<p>{_html.escape(p)}</p>" for p in paragraphs)
    return (
        "<!DOCTYPE html><html><head><title>"
        f"{_html.escape(title)}</title>"
        "<style>p { color: red }</style></head><body>"
        "<div id='siteNotice'><p>Site notice — not content.</p></div>"
        "<div id='mw-content-text'>"
        "<table class='infobox'><tr><td>infobox cell</td></tr></table>"
        f"{body}"
        "<script>var leak = 'must not appear';</script>"
        "<div class='reflist'><p>A nested <b>reference</b> para.</p></div>"
        "</div>"
        "<div id='footer'><p>Footer — not content.</p></div>"
        "</body></html>"
    )
