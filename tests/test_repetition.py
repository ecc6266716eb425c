"""Within-doc repetition ratios (textstats.repetition_stats)."""

from entitysummarization_spark.operators.textstats import repetition_stats


def test_repetition_stats_hand_counts(spark):
    docs = spark.createDataFrame(
        [
            # 6 tokens: "a" ×3, bigram "a a" ×2 (positions 1-2, 2-3),
            # distinct {a, b, c} → dup mass 1 - 3/6
            (1, "a a a b c b"),
            # all distinct, every bigram unique
            (2, "w x y z"),
            # single token: no bigram positions
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    out = repetition_stats(docs).toPandas().set_index("doc_id").sort_index()
    assert abs(out.loc[1, "top_token_frac"] - 0.5) < 1e-9       # 3/6
    assert abs(out.loc[1, "top_bigram_frac"] - 0.4) < 1e-9      # 2/5
    assert abs(out.loc[1, "dup_token_frac"] - 0.5) < 1e-9       # 1 - 3/6
    assert abs(out.loc[2, "top_token_frac"] - 0.25) < 1e-9
    assert abs(out.loc[2, "top_bigram_frac"] - (1 / 3) // 0.0001 * 0.0001
               ) < 2e-4                                          # 1/3 → .3333
    assert out.loc[2, "dup_token_frac"] == 0.0
    assert out.loc[3, "top_token_frac"] == 1.0
    assert out.loc[3, "top_bigram_frac"] == 0.0
    assert out.loc[3, "dup_token_frac"] == 0.0


def test_scrub_text_redacts_and_counts(spark):
    from entitysummarization_spark.operators.textstats import scrub_text

    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or see https://x.io/p?q=1 now"),
            (2, "server 10.0.0.1 and 192.168.1.255 up"),
            # the URL's userinfo must be eaten by the URL pass, not
            # counted as an email
            (3, "ftp not matched; https://user@host.com/path stays one url"),
            (4, "nothing to scrub here"),
        ],
        "doc_id long, text string",
    )
    out = scrub_text(docs).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_email"] == 1 and out.loc[1, "n_url"] == 1
    assert "<EMAIL>" in out.loc[1, "text_clean"]
    assert "<URL>" in out.loc[1, "text_clean"]
    assert "example.org" not in out.loc[1, "text_clean"]
    assert out.loc[2, "n_ipv4"] == 2
    assert out.loc[2, "text_clean"] == "server <IP> and <IP> up"
    assert out.loc[3, "n_url"] == 1 and out.loc[3, "n_email"] == 0
    assert out.loc[4, ["n_url", "n_email", "n_ipv4"]].sum() == 0
    assert out.loc[4, "text_clean"] == "nothing to scrub here"
