"""Golden contract for the composed wp_post_all journey (VERDICT r5
#3): the CSV → preset → staged-sinks → ledger pipeline has no natural
single SQL oracle, so its CORRECTNESS-style witness is a pinned
golden — ledger row count + content hash over the stable lineage
columns, plus sink-table invariants — at sf0.01. Any semantic change
to the preset chain, the staged loaders, ID minting, media dedupe or
the ledger projection moves the hash and fails here."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wp_etl_migration_spark.queries import q_wp_post_all

#: pinned from two fresh-session runs (bit-identical) at sf0.01
GOLDEN_LEDGER_ROWS = 2000
GOLDEN_LEDGER_HASH = "84a8a946959edd0a2495a01c579027b2"


def _ledger_hash(led):
    return (led.select(
        F.md5(F.concat_ws("|", "source_id", "post_id", "slug"))
        .alias("h"))
        .agg(F.md5(F.concat_ws("", F.sort_array(F.collect_list("h"))))
             .alias("H"))
        .first().H)


def test_wp_post_all_golden(spark):
    led = q_wp_post_all(spark, SF_DIR)
    # uid is the per-run uuid (reference's Orchestrator row uid) —
    # excluded from the hash; everything else is content-addressed.
    assert sorted(led.columns) == ["post_id", "slug", "source_id",
                                   "uid"]
    assert led.count() == GOLDEN_LEDGER_ROWS
    assert _ledger_hash(led) == GOLDEN_LEDGER_HASH
    # every source row got a post id; ids are unique per slug match
    assert led.where(F.col("post_id").isNull()).count() == 0
    assert led.select("source_id").distinct().count() == \
        GOLDEN_LEDGER_ROWS
