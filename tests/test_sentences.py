"""G13 sentence detection (SentParDetector analog) + per-sentence AC scan."""

from entitysummarization_spark.functions.automaton import split_sentences
from entitysummarization_spark.operators.linking import detect_mentions


def test_split_basic():
    assert split_sentences("One sentence. Another one! A third? Done.") == [
        "One sentence.", "Another one!", "A third?", "Done.",
    ]


def test_split_requires_capital_or_digit_next():
    # lowercase continuation → no break (the reference's [A-Z0-9"'( guard)
    assert split_sentences("approx. value is fine. Next starts here.") == [
        "approx. value is fine.", "Next starts here.",
    ]


def test_split_protects_abbreviations_and_initials():
    got = split_sentences("Dr. Smith met Mr. Jones on Jan. 5. They left.")
    assert got == ["Dr. Smith met Mr. Jones on Jan. 5.", "They left."]
    got2 = split_sentences("A. Lincoln spoke. B. Franklin wrote.")
    assert got2 == ["A. Lincoln spoke.", "B. Franklin wrote."]


def test_abbreviation_guard_only_applies_to_periods():
    # "max"/"min"/"no" are in the protected-unit list, but abbreviations
    # only ever end in '.' — '?'/'!' is always a real boundary
    assert split_sentences("Loads were at max! Next run started.") == [
        "Loads were at max!", "Next run started.",
    ]
    assert split_sentences("It hit the min? Then it rose.") == [
        "It hit the min?", "Then it rose.",
    ]
    # the '.' form stays protected
    assert split_sentences("Weight was 5 kg. Then more.") == [
        "Weight was 5 kg. Then more.",
    ]


def test_split_quotes_and_paragraphs():
    got = split_sentences('He said "stop." Then left.\n\nNew paragraph here')
    assert got == ['He said "stop."', "Then left.", "New paragraph here"]


def test_detect_mentions_per_sentence_blocks_cross_boundary(spark):
    # doc 1: one in-sentence match; doc 2: the bigram spans a PARAGRAPH
    # boundary (a [.?!] boundary can't span — the tokenizer keeps the
    # terminator glued to the previous token)
    docs = spark.createDataFrame(
        [(1, "We use hash value here. Sentences are split."),
         (2, "ends with hash\n\nvalue starts the next paragraph")],
        "doc_id long, text string",
    )
    whole = {
        (r["id"], r["surface"]): r["freq"]
        for r in detect_mentions(spark, docs, ["hash value"]).collect()
    }
    per_sent = {
        (r["id"], r["surface"]): r["freq"]
        for r in detect_mentions(
            spark, docs, ["hash value"], unit="sentence"
        ).collect()
    }
    # doc-level scan sees the cross-paragraph bigram too
    assert whole == {(1, "hash value"): 1, (2, "hash value"): 1}
    # sentence/paragraph-level scan only matches within a unit
    assert per_sent == {(1, "hash value"): 1}
