"""Repetition signals (text/repetition.py) and PII redaction (text/pii.py)."""

from __future__ import annotations

import pytest

from gofast_spark.text import pii_profile, redact_pii, repetition_signals


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "id bigint, text string")
    return repetition_signals(df, "text").collect()[0]


def test_no_repetition(spark):
    r = _one(spark, "one two three four five")
    assert r["dup_word_frac"] == 0.0
    assert r["dup_2gram_frac"] == 0.0
    assert r["dup_3gram_frac"] == 0.0
    # all 2-grams occur once -> max count*len is the longest gram,
    # "three|four" (len 10), over len(norm)=23
    assert r["top_2gram_char_frac"] == pytest.approx(10 / 23)


def test_fully_repeated(spark):
    # "ab ab ab ab": 4 words 1 distinct -> 3/4; 3 bigrams 1 distinct -> 2/3
    r = _one(spark, "ab ab ab ab")
    assert r["dup_word_frac"] == pytest.approx(3 / 4)
    assert r["dup_2gram_frac"] == pytest.approx(2 / 3)
    assert r["dup_3gram_frac"] == pytest.approx(1 / 2)
    # top 2-gram "ab|ab" x3, len 5, norm len 11 -> 15/11 > 1 (overlap, documented)
    assert r["top_2gram_char_frac"] == pytest.approx(15 / 11)


def test_short_doc_no_crash(spark):
    r = _one(spark, "single")
    assert r["dup_2gram_frac"] == 0.0
    assert r["dup_3gram_frac"] == 0.0
    assert r["top_2gram_char_frac"] == 0.0


def test_redact_all_classes(spark):
    txt = (
        "mail bob.smith+x@ex-ample.co.uk ip 192.168.0.1 "
        "ssn 123-45-6789 call 25-989-741-2988 done"
    )
    df = spark.createDataFrame([(1, txt)], "id bigint, text string")
    got = redact_pii(df, "text").collect()[0]["text"]
    assert got == "mail <EMAIL> ip <IP> ssn <ID> call <PHONE> done"


def test_email_digits_not_counted_as_phone(spark):
    # staged counts: the email is consumed first, its digits never reach
    # the phone pattern
    txt = "a 123-456-789-1234@mail.com b"
    df = spark.createDataFrame([(1, txt)], "id bigint, text string")
    r = pii_profile(df, "text").collect()[0]
    assert r["n_email"] == 1
    assert r["n_phone"] == 0
    got = redact_pii(df, "text").collect()[0]["text"]
    assert got == "a <EMAIL> b"


def test_plain_text_untouched(spark):
    txt = "nothing sensitive here just words and the number 42"
    df = spark.createDataFrame([(1, txt)], "id bigint, text string")
    assert redact_pii(df, "text").collect()[0]["text"] == txt


def _cf(spark, text, **rules):
    from gofast_spark.text import corpus_filter

    df = spark.createDataFrame([(1, text)], "id bigint, text string")
    return corpus_filter(df, "text", rules=rules or None).collect()[0]


def test_corpus_filter_short_doc(spark):
    r = _cf(spark, "too short")
    assert not r["keep"] and r["reason"] == "min_tokens"


def test_corpus_filter_repetitive_doc(spark):
    r = _cf(spark, "the spam " * 40)
    assert not r["keep"] and r["reason"] == "max_dup_3gram_frac"


def test_corpus_filter_no_stopwords(spark):
    r = _cf(spark, "alpha beta gamma delta epsilon zeta eta theta iota")
    assert not r["keep"] and r["reason"] == "min_stopword_ratio"


def test_corpus_filter_good_doc_keeps(spark):
    r = _cf(
        spark,
        "the quick brown fox jumps over a lazy dog while the sun "
        "sets behind these quiet hills and every bird sings its song",
    )
    assert r["keep"] and r["reason"] is None


def test_corpus_filter_rule_override_and_disable(spark):
    txt = "alpha beta gamma delta epsilon zeta eta theta iota"
    r = _cf(spark, txt, min_stopword_ratio=None, min_tokens=3)
    assert r["keep"]


def test_corpus_filter_first_failure_wins(spark):
    # fails min_tokens AND min_stopword_ratio; attribution = first rule
    r = _cf(spark, "zz qq")
    assert r["reason"] == "min_tokens"


def test_normalize_url_cases(spark):
    from pyspark.sql import functions as F

    from gofast_spark.text.columns import normalize_url

    cases = [
        ("HTTPS://WWW.Example.com/A/", "example.com/a"),
        ("http://example.com/a?utm_source=x", "example.com/a"),
        ("example.com/a?id=1&utm_campaign=y&b=2", "example.com/a?id=1&b=2"),
        ("example.com/a?utm_a=1&id=3", "example.com/a?id=3"),
        ("example.com/a?utm_a=1&utm_b=2", "example.com/a"),
        ("example.com/a#section", "example.com/a"),
        ("example.com/a?fbclid=abc#x", "example.com/a"),
        ("example.com", "example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r["n"] for r in df.select(normalize_url("u").alias("n")).collect()]
    assert got == [e for _, e in cases]
