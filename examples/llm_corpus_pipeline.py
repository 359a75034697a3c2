#!/usr/bin/env python
"""End-to-end training-corpus curation pipeline, composed from the
engine's operators — the kind of job this engine exists for at 100 TB:

    documents ──ž boilerplate line dedup ──ž Gopher + heuristic quality
              gates ──ž language filter ──ž exact dedup ──ž MinHash-LSH
              near-dup pairs ──ž connected-component keep-list
              ──ž bigram-LM fluency gate ──ž benchmark-contamination
              gate ──ž domain caps ──ž stratified sampling ──ž quality-weighted
              downsampling ──ž token-budget truncation ──ž token
              accounting ──ž train/val/test
              splits ──ž shuffled training shards + manifest
              ──ž per-shard sequence packing
    embeddings ─ž SemDeDup keep-list ─ž k-means-fitted IVF ANN audit
               ─ž int8 quantization (compact ANN index + error audit)

Run:  python examples/llm_corpus_pipeline.py [sf_dir] [out_dir]

Every stage is declarative DataFrame composition (one Catalyst plan per
materialization), so filters push into the parquet scan and the dedup
shuffles are the only wide stages.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wp_etl_migration_spark.operators import textstats as ts
from wp_etl_migration_spark.operators.dedup import (
    contamination, exact_dedup, line_dedup, minhash_lsh_pairs)
from wp_etl_migration_spark.operators.gates import apply_gates
from wp_etl_migration_spark.operators.graph import dedup_keep_list
from wp_etl_migration_spark.operators.lm import bigram_counts, lm_score
from wp_etl_migration_spark.operators.packing import pack_sequences
from wp_etl_migration_spark.operators.profile import corpus_report
from wp_etl_migration_spark.operators.sampling import (
    assign_splits, cap_per_key, select_token_budget,
    stratified_hash_sample, weighted_hash_sample)
from wp_etl_migration_spark.operators.similarity import (
    ivf_topk, kmeans_centroids, quantize_embeddings, semantic_dedup)
from wp_etl_migration_spark.sinks.training import write_training_shards
from wp_etl_migration_spark.session import get_spark, tune
from wp_etl_migration_spark.sources.tables import Tables


def build_corpus(spark: SparkSession, sf_dir: str,
                 min_quality: float = 0.3,
                 langs: tuple[str, ...] = ("en",),
                 jaccard: float = 0.7):
    """Curated corpus: quality-gated, language-filtered, exact- and
    near-dup-free documents with token accounting columns. Returns
    (corpus_df, gate_observation) — the observation resolves with
    per-gate drop counts after the corpus is materialized."""
    raw = Tables(spark, sf_dir).documents()

    # Corpus-level boilerplate removal (C4-style): a segment repeated in
    # ≥10 distinct docs is nav/footer noise, stripped everywhere. The
    # synthetic docs are single-line, so ' table ' plays the delimiter.
    d = (line_dedup(raw, "doc_id", "text", max_line_df=10,
                    delimiter=" table ")
         .join(raw.select("doc_id", "source"), "doc_id"))

    scored = d.select(
        "doc_id", "text", "source",
        ts.quality_score("text").alias("quality"),
        # min_words/min_stopword_hits relaxed for the short synthetic
        # docs; production uses the paper defaults (50 words, 2 hits).
        ts.gopher_rules("text", min_words=10,
                        min_stopword_hits=1).alias("gopher"),
        ts.lang_id("text").alias("lang_pred"),
        ts.token_count("text").alias("n_tokens"),
        ts.fingerprint("text").alias("fingerprint"))
    # Observable gates: per-rule drop counts ride the same job that
    # materializes the filtered frame (no extra count() passes).
    gated, gate_obs = apply_gates(scored, {
        "quality": F.col("quality") >= min_quality,
        "gopher": F.col("gopher.passes"),
        "lang": F.col("lang_pred").isin(*langs),
    })
    gated = gated.drop("gopher")

    # Exact dedup keeps the smallest doc_id per identical text.
    survivors = exact_dedup(gated, "doc_id", ["text"])
    gated = gated.join(survivors, "doc_id", "left_semi")

    # Near-dup removal is TRANSITIVE: LSH-confirmed pairs → connected
    # components → one kept doc per cluster (pair-based loser-dropping
    # under-deletes on chains A-B, B-C where A and C never pair). The
    # survivor is the highest-QUALITY member, not the smallest id.
    pairs = minhash_lsh_pairs(gated, "doc_id", "text",
                              verify_threshold=jaccard)
    keep = dedup_keep_list(gated, pairs, "doc_id", order_col="quality")
    deduped = gated.join(keep, "doc_id", "left_semi")

    # Bigram-LM fluency gate (CCNet shape): the LM trains on the
    # quality-gated survivors themselves; docs whose bigrams the LM has
    # mostly never seen are off-distribution noise. hit_rate keeps the
    # gate engine-deterministic (see operators/lm.py).
    lm = bigram_counts(deduped, "text", min_count=2)
    fluency = lm_score(deduped, lm, "doc_id", "text") \
        .where(F.col("hit_rate") >= 0.2).select("doc_id")
    deduped = deduped.join(fluency, "doc_id", "left_semi")

    # Model-based quality gate (FineWeb-Edu shape): one library call —
    # weak-label seed from the survivors' own heuristic-quality
    # extremes (median ± dead zone), train the linear classifier on
    # that SAMPLE, score every doc through the codegen path, gate
    # permissively. At production scale the labels come from an
    # LLM/human pass; the train-on-sample / score-the-corpus split is
    # the same. The recipe pins its input (it reads the survivors
    # several times) and declines to train on a degenerate seed.
    from wp_etl_migration_spark.operators.classifier import (
        bootstrap_quality_gate)
    n_before = deduped.count()
    deduped, clf = bootstrap_quality_gate(deduped, "doc_id", "text",
                                          "quality")
    if clf is not None:
        print(f"classifier gate: kept {deduped.count()}/{n_before} "
              f"(weights={len(clf['weights'])})")
    else:
        print("classifier gate: skipped (weak-label sample too small)")

    # Benchmark-contamination gate: docs sharing an 8-gram with the
    # held-out eval slice (here: every 97th doc plays the benchmark)
    # are dropped — the eval side broadcasts, the corpus never shuffles.
    eval_df = Tables(spark, sf_dir).documents() \
        .where(F.col("doc_id") % 97 == 0)
    dirty = contamination(deduped, eval_df, "doc_id", "text", n=8) \
        .select("doc_id")
    deduped = deduped.join(dirty, "doc_id", "left_anti")

    # Domain cap: no single source may contribute more than 40 docs
    # (the web-corpus rule that stops one hot site from dominating the
    # mixture) — the kept set is a content-addressed draw, so re-runs
    # agree.
    deduped = cap_per_key(deduped, "doc_id", "source", max_per_key=40,
                          salt="corpus-v1-cap")

    # Deterministic source rebalancing: content-addressed keep decision,
    # so backfills and retries reproduce the identical sample.
    balanced = stratified_hash_sample(
        deduped, "doc_id", "source",
        {"src0": 0.5, "src1": 0.5}, default=1.0,
        salt="corpus-v1")

    # Importance resampling: longer/better documents keep a higher
    # probability (clamped to 1); same content-addressed determinism.
    resampled = weighted_hash_sample(
        balanced, "doc_id",
        F.col("quality") + F.least(F.col("n_tokens") / F.lit(256.0),
                                   F.lit(0.5)),
        salt="corpus-v1-w")

    # Token-budget truncation: every mix ends with "the best N
    # tokens" — keep the highest-quality documents until ~80% of the
    # surviving token mass is spent (two-phase distributed prefix
    # sum, no single-reducer window; ties break on doc_id so re-runs
    # agree).
    total = resampled.agg(F.sum("n_tokens")).first()[0] or 0
    kept = select_token_budget(resampled, "doc_id", "n_tokens",
                               int(total * 0.8),
                               priority_col="quality")
    print(f"token budget: kept {kept.count()} docs / "
          f"{int(total * 0.8)} of {total} tokens")
    return resampled.join(kept.select("doc_id"), "doc_id",
                          "left_semi"), gate_obs


def nearest_neighbor_audit(spark: SparkSession, sf_dir: str,
                           k: int = 5) -> DataFrame:
    """Embedding-side audit: SemDeDup keep-list prunes semantic
    duplicates, then a k-means-fitted IVF ANN spot-checks that the
    survivors' neighbors are genuinely distinct."""
    e = Tables(spark, sf_dir).embeddings()
    keep = semantic_dedup(e, "vec_id", "embedding", k=8, iters=2,
                          threshold=0.95)
    pruned = e.join(keep, "vec_id", "left_semi")
    cents = kmeans_centroids(pruned, "vec_id", "embedding", k=8, iters=2)
    return ivf_topk(pruned, "vec_id", "embedding", k=k, centroids=cents)


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    out_dir = argv[1] if len(argv) > 1 else "/tmp/llm_corpus"
    spark = tune(get_spark("llm-corpus-pipeline"))

    corpus, gate_obs = build_corpus(spark, sf_dir)
    corpus.write.mode("overwrite").parquet(f"{out_dir}/corpus")
    print("gate drops:", {k: v for k, v in gate_obs.get.items()
                          if k.startswith("dropped_") or k in
                          ("total", "kept")})

    # One-pass corpus health report (operators/profile.corpus_report):
    # the post-curation dup_rate should be ~0 — dedup just ran.
    rep = corpus_report(spark.read.parquet(f"{out_dir}/corpus"),
                        "doc_id", "text").first()
    print(f"corpus: {rep['n_docs']} docs, {rep['n_tokens']} tokens, "
          f"avg quality {round(rep['avg_quality'], 4)}, residual "
          f"dup rate {round(rep['dup_rate'], 4)} -> {out_dir}/corpus")

    # Training layout: disjoint content-addressed train/val/test
    # splits, then the train split written as shuffled shards with a
    # token manifest (sinks/training.py), then greedy sequence packing
    # per shard in shuffle order — the realistic loader shape: each
    # shard streams and packs independently.
    curated = assign_splits(spark.read.parquet(f"{out_dir}/corpus"),
                            "doc_id",
                            {"train": 0.8, "val": 0.1, "test": 0.1},
                            salt="train-v1")
    train = curated.where("split = 'train'").drop("split")
    manifest = write_training_shards(train, f"{out_dir}/shards",
                                     "doc_id", n_shards=4,
                                     salt="train-v1",
                                     tokens_col="n_tokens")
    first = min(manifest["shards"])   # tiny sf can leave a shard empty
    s0 = spark.read.parquet(f"{out_dir}/shards/shard={first}")
    layout = pack_sequences(s0, "doc_id", "n_tokens", seq_len=512,
                            order_col="pos")
    n_bins = layout.agg(F.countDistinct("bin_id")).first()[0]
    print(f"packed: {manifest['n_rows']} train docs "
          f"({manifest['shards'][first]['tokens']} tokens in shard "
          f"{first}, {n_bins} bins of 512) across "
          f"{manifest['n_shards']} shards -> {out_dir}/shards")
    # reader-side integrity: re-derive counts + membership hashes
    # from the written files and diff against the manifest
    from wp_etl_migration_spark.sinks.training import (
        verify_training_shards)
    check = verify_training_shards(spark, f"{out_dir}/shards",
                                   "doc_id")
    print(f"shard verify: ok={check['ok']} "
          f"(mismatches={len(check['mismatches'])})")

    nn = nearest_neighbor_audit(spark, sf_dir)
    nn.write.mode("overwrite").parquet(f"{out_dir}/nn_audit")
    print(f"nn audit: {nn.count()} rows -> {out_dir}/nn_audit")

    # Compact ANN index: int8 quantization, 4x less to scan at serve
    # time; the error column is the self-audit that the compression is
    # within the scale/2 bound.
    q = quantize_embeddings(Tables(spark, sf_dir).embeddings(),
                            "vec_id", "embedding")
    q.write.mode("overwrite").parquet(f"{out_dir}/emb_int8")
    worst = q.agg(F.max("max_abs_err")).first()[0]
    print(f"quantized: {q.count()} vectors, worst reconstruction "
          f"error {worst:.6f} -> {out_dir}/emb_int8")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
