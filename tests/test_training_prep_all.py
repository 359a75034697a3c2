"""Golden contract for the composed training_prep_all journey — the
pretraining twin of test_wp_post_all: gates → dedup recipe → packing →
deterministic shard write has no single SQL oracle, so its
CORRECTNESS-style witness is a pinned golden (per-shard row/token
summary + content hash over the full shard layout) at sf0.01. Any
semantic change to gating, dedup thresholds, packing arithmetic, the
content-addressed shuffle or the manifest moves a pinned value and
fails here."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wp_etl_migration_spark.queries import q_training_prep_all

#: pinned from two fresh-session runs (bit-identical) at sf0.01
GOLDEN_SUMMARY = [(0, 38, 2027), (1, 40, 2203), (2, 45, 2380),
                  (3, 38, 2055), (4, 45, 2765), (5, 41, 2321),
                  (6, 49, 2490), (7, 43, 2125)]
GOLDEN_LAYOUT_HASH = "5a313e7be5eb07a27bdb566edd50d947"
GOLDEN_ROWS = 339


def test_training_prep_all_golden(spark):
    got = q_training_prep_all(spark, SF_DIR)
    assert sorted(got.columns) == ["n_rows", "n_tokens", "shard"]
    summary = sorted((r.shard, r.n_rows, r.n_tokens)
                     for r in got.collect())
    assert summary == GOLDEN_SUMMARY
    assert sum(r for _, r, _ in summary) == GOLDEN_ROWS

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "training_prep_run_"
        + os.path.basename(SF_DIR))
    full = spark.read.parquet(out)
    # the full layout — shard membership, in-shard order, bin
    # assignment — is content-addressed and must never drift
    h = (full.select(
        F.md5(F.concat_ws("|", "doc_id", "shard", "pos", "bin_id",
                          "bin_offset", "n_tokens")).alias("h"))
        .agg(F.md5(F.concat_ws("", F.sort_array(
            F.collect_list("h")))).alias("H"))
        .first().H)
    assert h == GOLDEN_LAYOUT_HASH
    # loader contract: pos is dense 1-based per shard (row_number),
    # bins fill to <= 512
    per_shard = (full.groupBy("shard")
                 .agg(F.count("*").alias("n"),
                      F.min("pos").alias("lo"),
                      F.max("pos").alias("hi")).collect())
    assert all(r.lo == 1 and r.hi == r.n for r in per_shard)
    assert full.where(
        (F.col("bin_offset") < 0)
        | (F.col("bin_offset") >= 512)).count() == 0
    # manifest exists and is loader-readable JSON with exact totals
    import json
    with open(os.path.join(out, "_manifest.json")) as fh:
        man = json.load(fh)
    assert man["n_rows"] == GOLDEN_ROWS
    assert sum(s["tokens"] for s in man["shards"].values()) == \
        sum(t for *_, t in GOLDEN_SUMMARY)
