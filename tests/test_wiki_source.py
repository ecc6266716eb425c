"""S9 — Wikipedia fetch source (sources/wiki.py).

Reference: DbpediaProcessor.java:155-258, WikipediaAccessLayer.java:698-720.
No network in this sandbox, so the distributed path runs through
deterministic fake/file transports; the urllib default shares the same
mapInPandas closure and is exercised for its error path only.
"""

import os

import pytest

from entitysummarization_spark.sources.wiki import (
    WikiFetchConfig,
    entity_pages,
    file_transport,
    make_page_html,
    parse_content_paragraphs,
    urllib_transport,
    write_text_files,
)
from entitysummarization_spark.sources.readers import read_text_dir


def test_parse_selects_only_content_paragraphs():
    html_doc = make_page_html(
        "Apache Spark", ["First para.", "Second  para,\n  wrapped."]
    )
    text = parse_content_paragraphs(html_doc)
    # jsoup Elements.text(): per-element whitespace normalized, elements
    # joined by one space; the nested reflist <p> matches the descendant
    # selector too
    assert text == (
        "First para. Second para, wrapped. A nested reference para."
    )
    # chrome/script/style/infobox text never leaks
    for bad in ("Site notice", "Footer", "leak", "color: red", "infobox"):
        assert bad not in text


def test_parse_empty_and_malformed():
    assert parse_content_paragraphs("<html><p>no content div</p>") == ""
    assert parse_content_paragraphs("") == ""
    # content div present but paragraph unterminated at EOF: jaws shut
    # cleanly, nothing flushed, no exception
    assert (
        parse_content_paragraphs(
            "<div id='mw-content-text'><p>dangling"
        )
        == ""
    )
    # entity references decode
    assert (
        parse_content_paragraphs(
            "<div id='mw-content-text'><p>A &amp; B</p></div>"
        )
        == "A & B"
    )


def _fake_transport(pages):
    """dict title -> html; None for anything else (fetch failure)."""

    def fetch(url):
        import urllib.parse

        title = urllib.parse.unquote(url.rsplit("/", 1)[-1])
        return pages.get(title)

    return fetch


@pytest.fixture(scope="module")
def crawled(spark):
    pages = {
        "Apache_Spark": make_page_html(
            "Apache Spark", ["Spark is a distributed engine. " * 5]
        ),
        "Short_Page": make_page_html("Short Page", ["Too short."]),
        "No_Paragraphs": "<div id='mw-content-text'></div>",
    }
    entities = spark.createDataFrame(
        [
            (" Apache_Spark ",),  # trimmed
            ("Apache_Spark",),  # deduped with the above
            ("Short_Page",),  # fails min_words
            ("No_Paragraphs",),  # parses empty
            ("Missing_Page",),  # transport returns None
            ("",),  # dropped before fetch
        ],
        ["entity"],
    )
    df = entity_pages(
        entities,
        transport=_fake_transport(pages),
        # every fixture page carries the 4-word reflist para; the short
        # page totals 6 words, so a floor of 10 drops it
        config=WikiFetchConfig(min_words=10, n_partitions=3),
    )
    return df.collect()


def test_crawl_dedup_trim_filter(crawled):
    assert len(crawled) == 1
    row = crawled[0]
    assert row["entity"] == "Apache_Spark"
    assert row["text"].startswith("Spark is a distributed engine.")
    # a nested reflist paragraph rides along in the fixture html
    assert row["n_words"] == len(row["text"].split()) > 10


def test_file_transport_and_text_sink_roundtrip(spark, tmp_path):
    src = tmp_path / "html"
    out = tmp_path / "txt"
    src.mkdir()
    titles = [f"Entity_{i}" for i in range(4)]
    for t in titles:
        (src / f"{t}.html").write_text(
            make_page_html(t, [f"Body of {t}. " * 10])
        )
    entities = spark.createDataFrame([(t,) for t in titles], ["entity"])
    pages = entity_pages(
        entities,
        transport=file_transport(str(src)),
        config=WikiFetchConfig(min_words=3, n_partitions=2),
    )
    n = write_text_files(pages, str(out))
    assert n == 4
    assert sorted(os.listdir(out)) == sorted(f"{t}.txt" for t in titles)
    # S8 directory scan reads the crawl output straight back
    back = read_text_dir(spark, str(out))
    assert back.count() == 4
    row = back.orderBy("path").collect()[0]
    assert "Body of Entity_0." in row["content"]


def test_urllib_transport_error_path_returns_none():
    fetch = urllib_transport(timeout=0.2)
    # no network in this sandbox: any scheme/host fails -> None, never
    # raises (the reference catches IOException per entity)
    assert fetch("http://127.0.0.1:9/never") is None
    assert fetch("not a url") is None
