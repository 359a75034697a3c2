"""PII scrub (operators/pii.py) and repetition stats
(operators/textstats.repetition_stats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.pii import pii_counts, scrub_pii
from wp_etl_migration_spark.operators.textstats import repetition_stats


def test_scrub_pii_all_kinds(spark):
    text = ("mail a.b+c@ex.co, ip 10.0.0.1, ssn 123-45-6789, "
            "phone (555) 123-4567 end")
    row = (spark.createDataFrame([(text,)], ["t"])
           .select(scrub_pii("t").alias("clean"),
                   pii_counts("t").alias("c"))
           .select("clean", "c.*").first())
    assert row.clean == ("mail <EMAIL>, ip <IP>, ssn <SSN>, "
                         "phone <PHONE> end")
    assert (row.n_email, row.n_ip, row.n_ssn, row.n_phone) == (1, 1, 1, 1)


def test_scrub_pii_order_no_double_count(spark):
    # The SSN must not also be counted as a phone; the IP must not feed
    # the phone pattern.
    text = "333-22-4444 and 1.2.3.4"
    row = (spark.createDataFrame([(text,)], ["t"])
           .select(pii_counts("t").alias("c")).select("c.*").first())
    assert (row.n_ssn, row.n_ip, row.n_phone) == (1, 1, 0)


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"),          # one bigram dominates
         (2, "x\nx\ny"),              # duplicate line
         (3, "solo")],                # <2 words -> null bigram frac
        ["doc_id", "text"])
    got = {r.doc_id: r for r in
           repetition_stats(df, "doc_id", "text").collect()}
    # bigrams of doc 1: [a b, b a, a b, b a, a b] -> top 'a b' = 3/5
    assert abs(got[1].top_bigram_frac - 0.6) < 1e-12
    assert abs(got[2].dup_line_frac - (1 - 2 / 3)) < 1e-12
    assert got[3].top_bigram_frac is None
    assert got[1].dup_word_frac == 1 - 2 / 6
