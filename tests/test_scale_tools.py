"""Scale tooling: salted joins (result parity with the plain join),
bucketed co-located joins (exchange-free plan), janitor rollback, and
the CLI entry points."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from wp_etl_migration_spark.operators.skew import salted_join, write_bucketed
from wp_etl_migration_spark.plans import janitor
from wp_etl_migration_spark.sources.tables import load_table


def test_salted_join_matches_plain(spark):
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer") \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain = (o.join(c, on="o_custkey")
             .select("o_orderkey", "c_name"))
    salted = salted_join(o, c, ["o_custkey"]) \
        .select("o_orderkey", "c_name")
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_bucketed_join_no_exchange(spark):
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer") \
        .withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(o, "b_orders", ["o_custkey"], buckets=4)
    write_bucketed(c, "b_customer", ["o_custkey"], buckets=4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (spark.table("b_orders")
                  .join(spark.table("b_customer"), on="o_custkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Bucket-aligned scan: the join needs no shuffle exchange.
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == o.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_janitor_preview_delete_rewrite(spark, tmp_path):
    path = str(tmp_path / "posts")
    load_table(spark, SF_SMALL, "orders").write.parquet(path)
    df = spark.read.parquet(path)
    total = df.count()
    pred = F.col("o_orderstatus") == "F"
    n = janitor.preview_delete(df, pred)
    assert 0 < n < total
    janitor.rewrite_dataset(spark, path, janitor.delete_where(df, pred))
    back = spark.read.parquet(path)
    assert back.count() == total - n
    assert back.where(pred).count() == 0


def test_janitor_ledger_rollback(spark, tmp_path):
    from wp_etl_migration_spark.sinks.ledger import with_uid, write_ledger
    posts = spark.createDataFrame(
        [(1, "keep"), (2, "mine"), (3, "mine2")], ["id", "title"])
    loaded = (posts.where(F.col("id") >= 2)
              .withColumn("ledger.post_id", F.col("id")))
    write_ledger(with_uid(loaded), str(tmp_path), "myjob")
    survivors = janitor.delete_by_ledger(
        spark, posts, "id", str(tmp_path), "myjob", ledger_key="post_id")
    assert [r["id"] for r in survivors.collect()] == [1]


def test_partitioned_write_prunes(spark, tmp_path):
    """partitionBy layout + partition pruning: a filtered read must scan
    only the matching partition directories (PartitionFilters, not a
    post-scan filter)."""
    path = str(tmp_path / "events_by_type")
    load_table(spark, SF_SMALL, "events") \
        .write.partitionBy("event_type").parquet(path)
    df = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters")[1][:120]
    full = load_table(spark, SF_SMALL, "events")
    assert df.count() == full.where(F.col("event_type") == "click").count()


def test_cli_janitor_preview_and_delete(spark, tmp_path, capsys):
    from wp_etl_migration_spark.__main__ import main
    path = str(tmp_path / "ds")
    load_table(spark, SF_SMALL, "orders").write.parquet(path)
    total = spark.read.parquet(path).count()

    assert main(["janitor", path, "--where", "o_orderstatus = 'F'"]) == 0
    n = int(capsys.readouterr().out.split()[0])
    assert 0 < n < total
    assert main(["janitor", path, "--where", "o_orderstatus = 'F'",
                 "--yes"]) == 0
    assert spark.read.parquet(path).count() == total - n


def test_runner_rerun_is_idempotent(spark, tmp_path):
    """Running the same migration twice must leave the same sink state
    (overwrite-mode file sinks ≙ SaveMode::Overwrite,
    Load Orchestrator.php:106)."""
    from wp_etl_migration_spark.plans.runner import Runner
    src = tmp_path / "d.csv"
    src.write_text("id,title\n1,A\n2,B\n")
    cfg = tmp_path / "m.yaml"
    cfg.write_text(f"""
migration:
  - name: j1
    extract: {{adapter: csv, source: "{src}"}}
    transform:
      - slugify: {{column: legacy.title, into: post.post_name}}
    load:
      - adapter: json
        destination: "{tmp_path}/out.json"
        prefix: "post."
""")
    Runner(spark, str(cfg), output_dir=str(tmp_path)).run()
    first = sorted(map(tuple, spark.read.json(
        str(tmp_path / "out.json")).collect()))
    Runner(spark, str(cfg), output_dir=str(tmp_path)).run()
    second = sorted(map(tuple, spark.read.json(
        str(tmp_path / "out.json")).collect()))
    assert first == second == [("a",), ("b",)]


def test_cli_config_analyze_extract(spark, tmp_path, capsys):
    from wp_etl_migration_spark.__main__ import main
    src = tmp_path / "d.csv"
    src.write_text("id,title\n1,A\n2,B\n")
    cfg = tmp_path / "m.yaml"
    cfg.write_text(f"""
migration:
  - name: j1
    extract: {{adapter: csv, source: "{src}"}}
    load: [{{adapter: json}}]
""")
    assert main(["config", str(cfg)]) == 0
    assert "j1" in capsys.readouterr().out

    assert main(["process", str(cfg), "--output-dir", str(tmp_path),
                 "--dry-run"]) == 0
    assert "validated" in capsys.readouterr().out

    assert main(["extract", str(cfg), "j1",
                 "--output-dir", str(tmp_path)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 2
    assert main(["extract", str(cfg), "ghost",
                 "--output-dir", str(tmp_path)]) == 1


def test_hll_sketch_partials_merge_to_global(spark):
    """The scale property the sketch path rests on: per-group HLL
    partials unioned with hll_union_agg estimate the global distinct
    count — no re-scan, no full-width distinct shuffle."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    merged = (d.groupBy("source")
              .agg(F.expr("hll_sketch_agg(text, 14)").alias("sk"))
              .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                   .alias("n")).first()["n"])
    exact = d.select("text").distinct().count()
    assert merged == exact  # sparse-mode HLL is exact at this scale


def test_janitor_snapshot_restore_roundtrip(spark, tmp_path):
    path = str(tmp_path / "posts")
    load_table(spark, SF_SMALL, "orders").write.parquet(path)
    total = spark.read.parquet(path).count()

    snap = janitor.snapshot_dataset(path, tag="t1")
    assert janitor.list_snapshots(path) == [snap]

    # Destructive rewrite: drop every 'F' row.
    df = spark.read.parquet(path)
    janitor.rewrite_dataset(
        spark, path, janitor.delete_where(
            df, F.col("o_orderstatus") == "F"))
    assert spark.read.parquet(path).count() < total

    janitor.restore_dataset(path, snap)
    back = spark.read.parquet(path)
    assert back.count() == total
    assert back.where(F.col("o_orderstatus") == "F").count() > 0
    # Snapshot survives by default for repeated rollback.
    assert janitor.list_snapshots(path) == [snap]


def test_lsh_verify_is_candidate_only(spark):
    """Plan-shape guard: the LSH verify path must never regress to the
    full shingle-inverted-index self-join (its only shingle joins are
    the semi-join doc-frequency cap / candidate pruning)."""
    from wp_etl_migration_spark.operators.dedup import minhash_lsh_pairs
    d = load_table(spark, SF_SMALL, "documents")
    df = minhash_lsh_pairs(d, "doc_id", "text", verify_threshold=0.7,
                           max_doc_freq=100)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in plan
    for line in plan.splitlines():
        if "Join Inner" in line:
            assert "shingle" not in line, line


def test_scan_pushdown_and_pruning(spark):
    """Plan guards for the scan family: predicates reach the parquet
    scan (PushedFilters) and only referenced columns are read
    (ReadSchema column pruning)."""
    from wp_etl_migration_spark.queries import q_scan_filter_sort_limit
    df = q_scan_filter_sort_limit(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan, plan
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1].split("]")[0]
    # pruning: the 9-column orders table scans only the 4 used columns
    assert "o_comment" not in scan[0] and "o_clerk" not in scan[0]


def test_profile_table_and_key_skew(spark):
    from wp_etl_migration_spark.operators.profile import (
        key_skew_profile, profile_table)
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None)],
        ["id", "k"])
    prof = {r.col_name: r for r in profile_table(df).collect()}
    assert prof["id"].n_rows == 5 and prof["id"].n_nulls == 0
    assert prof["id"].n_distinct == 5
    assert prof["id"].min_str == "1" and prof["id"].max_str == "5"
    assert prof["k"].n_nulls == 1 and prof["k"].n_distinct == 2

    # approx path: same shape, no EXPAND in the plan (the scale mode)
    approx = {r.col_name: r.n_distinct
              for r in profile_table(df, exact_distinct=False).collect()}
    assert set(approx) == {"id", "k"} and approx["id"] > 0
    plan = profile_table(df, exact_distinct=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan

    # column names containing quotes/backslashes survive the stack()
    # literal (ADVICE r3: raw interpolation broke on a single quote)
    odd = df.withColumnRenamed("k", "it's \\odd")
    odd_prof = {r.col_name: r for r in profile_table(odd).collect()}
    assert odd_prof["it's \\odd"].n_nulls == 1

    skew = key_skew_profile(df.where("k is not null"), "k", top_k=1) \
        .first()
    assert skew.key == "a" and skew.n == 3
    assert abs(skew.share - 0.75) < 1e-12
    assert abs(skew.skew_factor - 1.5) < 1e-12   # 3 / mean(3,1)


def test_compact_dataset(spark, tmp_path):
    path = str(tmp_path / "frag")
    load_table(spark, SF_SMALL, "orders").repartition(40) \
        .write.parquet(path)
    import glob
    before_files = [f for f in glob.glob(path + "/*.parquet")]
    assert len(before_files) == 40
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    n = janitor.compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_quantize_embeddings_roundtrip_bound(spark):
    from wp_etl_migration_spark.operators.similarity import (
        quantize_embeddings)
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]),
         (2, [0.0, 0.0, 0.0, 0.0]),
         (3, [-2.0, 2.0, 1.0, -1.0])],
        ["vec_id", "embedding"])
    got = {r.vec_id: r for r in
           quantize_embeddings(df, "vec_id", "embedding").collect()}
    # scale = max|v|/127; every lane reconstructs within scale/2
    assert abs(got[1].scale - 1.0 / 127) < 1e-15
    # floor(x+0.5): halves round toward +inf, so -63.5 -> -63
    assert got[1].qvec == [127, -63, 32, 0]
    assert got[1].max_abs_err <= got[1].scale / 2 + 1e-15
    # all-zero vector: scale 0, zero qvec, zero error
    assert got[2].scale == 0.0 and got[2].qvec == [0, 0, 0, 0]
    assert got[2].max_abs_err == 0.0
    assert got[3].qvec == [-127, 127, 64, -63]
    for r in got.values():
        assert all(-128 <= q <= 127 for q in r.qvec)


def test_quantized_ann_agrees_with_exact(spark):
    """The int8 storage path composes with retrieval: dequantized
    vectors (qvec * scale) feed ivf_topk and recover the exact top-k
    neighbors on well-separated blobs — the compression is transparent
    to ANN at blob-scale separation."""
    import random
    from pyspark.sql import functions as F
    from wp_etl_migration_spark.operators.similarity import (
        ivf_topk, quantize_embeddings)
    rng = random.Random(5)
    rows = [(i, [rng.gauss(3 if i % 2 else -3, 0.3) for _ in range(4)])
            for i in range(60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    deq = (quantize_embeddings(emb, "vec_id", "embedding")
           .select("vec_id",
                   F.transform(
                       "qvec",
                       lambda q: q.cast("double") * F.col("scale"))
                   .alias("embedding")))
    exact = {(r.query_id, r.neighbor_id) for r in
             ivf_topk(emb, "vec_id", "embedding", k=3,
                      num_centroids=2).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in
             ivf_topk(deq, "vec_id", "embedding", k=3,
                      num_centroids=2).collect()}
    agree = len(exact & quant) / len(exact)
    assert agree >= 0.9, agree


def test_corpus_report_one_row_summary(spark):
    from wp_etl_migration_spark.operators.profile import corpus_report
    df = spark.createDataFrame(
        [(1, "the quick brown fox", "en"),
         (2, "the quick brown fox", "en"),     # exact dup of 1
         (3, "el rapido zorro marron", "es")],
        ["doc_id", "text", "lang"])
    r = corpus_report(df, "doc_id", "text", lang_col="lang").first()
    assert r.n_docs == 3 and r.n_tokens == 12
    assert abs(r.avg_tokens - 4.0) < 1e-12
    assert r.approx_distinct_texts == 2     # HLL exact at this size
    assert abs(r.dup_rate - 1 / 3) < 1e-9
    assert dict(r.langs) == {"en": 2, "es": 1}
    assert 0.0 <= r.avg_quality <= 1.0
    # single-pass shape: without langs it is ONE aggregate, no join
    plan = corpus_report(df, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_corpus_report_null_lang_and_scalable_plan(spark):
    """NULL langs bucket under 'unknown' (a NULL map key would make
    map_from_entries raise at runtime), and the lang-rollup join is a
    constant-key equi-join — no CartesianProduct/BNLJ, so pipelines
    wrapped in plancheck.assert_scalable don't false-fail on it."""
    from wp_etl_migration_spark.operators.profile import corpus_report
    from wp_etl_migration_spark.operators.plancheck import (
        assert_scalable)
    df = spark.createDataFrame(
        [(1, "the quick brown fox", "en"),
         (2, "le renard brun", None),
         (3, "el zorro marron", None)],
        ["doc_id", "text", "lang"])
    rep = assert_scalable(corpus_report(df, "doc_id", "text",
                                        lang_col="lang"))
    r = rep.first()
    assert dict(r.langs) == {"en": 1, "unknown": 2}
    assert r.n_docs == 3


def test_embedding_contamination_gate(spark):
    """Corpus vectors near an eval vector are flagged with max_sim and
    match count; orthogonal vectors pass; empty eval flags nothing."""
    from wp_etl_migration_spark.operators.similarity import (
        embedding_contamination)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),      # exact eval duplicate
         (2, [0.99, 0.14, 0.0, 0.0]),    # near (cos ~0.99)
         (3, [0.0, 0.0, 1.0, 0.0]),      # orthogonal
         (4, [0.0, 0.0, 0.0, 0.0])],     # zero vector: sim 0
        ["vec_id", "embedding"])
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        ["vec_id", "embedding"])
    got = {r.vec_id: r for r in embedding_contamination(
        corpus, ev, "vec_id", "embedding", threshold=0.9).collect()}
    assert set(got) == {1, 2}
    assert abs(got[1].max_sim - 1.0) < 1e-9 and got[1].n_matches == 1
    assert got[2].max_sim > 0.95 and got[2].n_matches == 1
    clean = corpus.join(
        embedding_contamination(corpus, ev, "vec_id", "embedding",
                                threshold=0.9).select("vec_id"),
        "vec_id", "left_anti")
    assert sorted(r.vec_id for r in clean.collect()) == [3, 4]
    empty_ev = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_contamination(corpus, empty_ev, "vec_id",
                                   "embedding").count() == 0


def test_profile_diff_flags_drift_and_schema_changes(spark):
    from wp_etl_migration_spark.operators.profile import profile_diff
    before = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(100)],
        ["id", "stable", "gone"])
    after_rows = [(i, "x", i % 3) for i in range(100)]
    after = spark.createDataFrame(
        [(i, "x" if i < 60 else None, i % 3) for i in range(100)],
        ["id", "stable", "new_col"])
    got = {r.col_name: r.status for r in
           profile_diff(before, after).collect()}
    assert got["gone"] == "removed"
    assert got["new_col"] == "added"
    assert got["stable"] == "drifted"   # null rate 0 -> 0.4
    assert got["id"] == "ok"


def test_mix_corpora_token_weighted(spark):
    from wp_etl_migration_spark.operators.sampling import mix_corpora
    from pyspark.sql import functions as F
    # long-doc source: few rows, many tokens; short-doc source inverse
    longs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit(100).alias("n_tokens"))
    shorts = spark.range(10000).select(
        (F.col("id") + 10**6).alias("doc_id"),
        F.lit(10).alias("n_tokens"))
    mixed = mix_corpora({"long": longs, "short": shorts}, "doc_id",
                        {"long": 0.5, "short": 0.5}, salt="t",
                        size_col="n_tokens")
    tok = {r.mix_source: r.t for r in
           mixed.groupBy("mix_source")
           .agg(F.sum("n_tokens").alias("t")).collect()}
    share = tok["long"] / (tok["long"] + tok["short"])
    # token shares ~50/50 despite a 10x row imbalance
    assert 0.45 < share < 0.55


def test_ann_index_build_query_roundtrip(spark, tmp_path):
    """Storable quantized ANN index: build -> parquet -> reread ->
    query matches the live index and recovers blob-exact neighbors;
    zero-norm queries/corpus rows never divide by zero."""
    import random
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    rng = random.Random(9)
    dims = 4
    rows = [(i, [rng.gauss(4 if i % 2 else -4, 0.4) for _ in range(dims)])
            for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    planes = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(2)]

    idx = build_ann_index(emb, "vec_id", "embedding", planes)
    path = str(tmp_path / "ann_index")
    idx.write.parquet(path)
    stored = spark.read.parquet(path)

    live = {(r.query_id, r.neighbor_id, r.rank) for r in
            query_ann_index(emb, idx, "vec_id", "embedding", planes,
                            k=3).collect()}
    replay = {(r.query_id, r.neighbor_id, r.rank) for r in
              query_ann_index(emb, stored, "vec_id", "embedding",
                              planes, k=3).collect()}
    assert live == replay and len(replay) == 40 * 3
    # blob structure survives quantization + bucketing: same parity
    for q, n, _ in replay:
        assert q % 2 == n % 2


def test_ann_index_arrow_rescore_matches_expr(spark):
    """The BLAS cogroup rescore returns the same neighbor ranks as the
    bit-exact expression path (ties impossible on gaussian data)."""
    import random
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    rng = random.Random(21)
    dims = 6
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dims)]) for i in range(60)],
        ["vec_id", "embedding"])
    planes = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(2)]
    idx = build_ann_index(emb, "vec_id", "embedding", planes)
    expr = {(r.query_id, r.neighbor_id, r.rank) for r in
            query_ann_index(emb, idx, "vec_id", "embedding", planes,
                            k=3, rescore="expr").collect()}
    arrow = {(r.query_id, r.neighbor_id, r.rank) for r in
             query_ann_index(emb, idx, "vec_id", "embedding", planes,
                             k=3).collect()}
    assert arrow == expr and len(arrow) > 0
    import pytest as _pt
    with _pt.raises(ValueError):
        query_ann_index(emb, idx, "vec_id", "embedding", planes,
                        rescore="bogus")


def test_ann_index_prepared_path_bit_identical(spark):
    """query_ann_index(prepared=True) over a prepare_ann_index frame
    returns bit-identical (id, rank, sim) to the raw path (r12 — the
    continuous loop's per-gen prepared cache rides this), on both
    rescore kernels, single- and multi-table, multi-probe."""
    import random
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, prepare_ann_index, query_ann_index)
    rng = random.Random(33)
    dims = 6
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dims)]) for i in range(50)],
        ["vec_id", "embedding"])
    for tables, planes in (
            (1, [[rng.gauss(0, 1) for _ in range(dims)]
                 for _ in range(2)]),
            (2, [[[rng.gauss(0, 1) for _ in range(dims)]
                  for _ in range(2)] for _ in range(2)])):
        idx = build_ann_index(emb, "vec_id", "embedding", planes,
                              tables=tables)
        prep = prepare_ann_index(idx, "vec_id", planes, tables=tables)
        for rescore in ("arrow", "expr"):
            for n_probes in (1, 2):
                raw = {(r.query_id, r.neighbor_id, r.rank, r.sim)
                       for r in query_ann_index(
                           emb, idx, "vec_id", "embedding", planes,
                           k=3, rescore=rescore, n_probes=n_probes,
                           tables=tables).collect()}
                pre = {(r.query_id, r.neighbor_id, r.rank, r.sim)
                       for r in query_ann_index(
                           emb, prep, "vec_id", "embedding", planes,
                           k=3, rescore=rescore, n_probes=n_probes,
                           tables=tables, prepared=True).collect()}
                assert pre == raw and len(raw) > 0, (
                    tables, rescore, n_probes)


def test_bench_paired_merge_policy():
    """bench.py --paired merge rules: --only names REPLACE (even if
    slower — their code changed), unnamed queries keep the historical
    minimum, and unknown fresh queries simply gain an entry."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    base = {"a": 1.0, "b": 2.0, "c": 3.0}
    fresh = {"a": 5.0, "b": 1.5, "d": 4.0}
    rep, low = bench.merge_baseline(base, fresh, names=["a"])
    assert rep == ["a"] and sorted(low) == ["b", "d"]
    assert base == {"a": 5.0, "b": 1.5, "c": 3.0, "d": 4.0}
    # named entries replace (even upward); the rest still min-merge

    base = {"a": 1.0, "b": 2.0}
    rep, low = bench.merge_baseline(base, fresh, names=None)
    assert rep == [] and sorted(low) == ["b", "d"]
    assert base == {"a": 1.0, "b": 1.5, "d": 4.0}   # min policy


def test_bench_io_canary(monkeypatch, tmp_path):
    """io_canary_sec (VERDICT r10 #3): generates its fixed file once
    (byte-for-byte deterministic, exact size), reuses it on the next
    call, rebuilds a corrupted/short file, and returns a positive
    best-of-3 wall."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(bench, "IO_CANARY_MIB", 16)  # keep test fast
    t1 = bench.io_canary_sec()
    path = tmp_path / "wp_etl_bench_io_canary_16.bin"
    assert t1 > 0 and path.exists()
    assert path.stat().st_size == 16 << 20
    head = path.read_bytes()[:512]
    assert head == (bytes(range(256)) * 2)  # deterministic content
    mtime = path.stat().st_mtime_ns
    t2 = bench.io_canary_sec()               # reused, not rewritten
    assert t2 > 0 and path.stat().st_mtime_ns == mtime
    path.write_bytes(b"short")               # corrupted => rebuilt
    bench.io_canary_sec()
    assert path.stat().st_size == 16 << 20


def test_bench_child_floor_contribution():
    """Paired floor merging must not ingest warm retry readings
    (r12): a retried row's child value is its best of 3 same-plan
    executions, so it is dropped from that child's contribution —
    unless the row is an explicit --only replacement."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    child = {"queries": {"a": 1.0, "b": 0.4, "c": 2.0},
             "retried": {"b": 1, "c": 2}}
    assert bench._child_floor_contribution(child) == {"a": 1.0}
    # explicit replacement keeps the named retried row only
    assert bench._child_floor_contribution(child, ["b"]) == \
        {"a": 1.0, "b": 0.4}
    # no retries → untouched
    assert bench._child_floor_contribution(
        {"queries": {"a": 1.0}}) == {"a": 1.0}
    # a row retried in BOTH children contributes nothing and the
    # min over present-in-any still covers the rest
    runs = [bench._child_floor_contribution(child),
            bench._child_floor_contribution(
                {"queries": {"a": 1.2, "b": 0.5},
                 "retried": {"b": 1}})]
    assert bench.merge_fresh_floors(runs) == {"a": 1.0}
    # ADVICE r12: the union spans ALL runs, not a hardcoded two —
    # a third child's exclusive row must survive the merge
    assert bench.merge_fresh_floors(
        runs + [{"e": 9.0}]) == {"a": 1.0, "e": 9.0}


def test_bench_mem_canary(monkeypatch):
    """mem_canary_sec (r12 — the third referee): all-core
    memory-bandwidth probe. Returns a positive best-of-2 wall; the
    worker count never exceeds the box; shrunk work still measures
    (the knobs exist so this test stays cheap)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert 1 <= bench.MEM_CANARY_WORKERS <= (os.cpu_count() or 1)
    monkeypatch.setattr(bench, "MEM_CANARY_WORKERS", 4)
    monkeypatch.setattr(bench, "MEM_CANARY_MIB", 8)
    monkeypatch.setattr(bench, "MEM_CANARY_PASSES", 2)
    t1 = bench.mem_canary_sec()
    t2 = bench.mem_canary_sec()
    assert t1 > 0 and t2 > 0


def test_bench_io_canary_medium_detection(monkeypatch, tmp_path):
    """io_canary_location (VERDICT r11 #4): a tmpfs temp dir is NOT a
    disk referee — the canary must relocate to the repo-local
    .scratch/ dir, and when every candidate is RAM-backed it must say
    so ("ram") instead of silently measuring memory bandwidth."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # _fs_type on this box: "/" resolves to a real fstype via
    # /proc/mounts (Linux CI), or "unknown" elsewhere — never crashes.
    assert isinstance(bench._fs_type("/"), str)
    # Longest-prefix matching on a synthetic mount table.
    table = "dev / ext4 rw 0 0\ndev /t\\040mp tmpfs rw 0 0\n"
    mounts = tmp_path / "mounts"
    mounts.write_text(table)
    real_open = open
    monkeypatch.setattr("builtins.open", lambda p, *a, **k: real_open(
        str(mounts) if p == "/proc/mounts" else p, *a, **k))
    assert bench._fs_type("/t mp/x.bin") == "tmpfs"   # octal-escaped
    assert bench._fs_type("/var/y.bin") == "ext4"
    monkeypatch.undo()

    # temp dir tmpfs => relocate to repo .scratch/ ("disk" here).
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    fstypes = {str(tmp_path): "tmpfs"}
    monkeypatch.setattr(bench, "_fs_type",
                        lambda p: fstypes.get(p, "ext4"))
    path, medium = bench.io_canary_location()
    assert medium == "disk" and "/.scratch/" in path

    # everything RAM-backed => temp-dir path, honest "ram" label.
    monkeypatch.setattr(bench, "_fs_type", lambda p: "tmpfs")
    path, medium = bench.io_canary_location()
    assert medium == "ram" and path.startswith(str(tmp_path))

    # unknown fstype (non-Linux) => keep temp dir, label "unknown".
    monkeypatch.setattr(bench, "_fs_type", lambda p: "unknown")
    path, medium = bench.io_canary_location()
    assert medium == "unknown" and path.startswith(str(tmp_path))


def test_bench_paired_garbled_child_stdout(monkeypatch, capsys):
    """paired() must fail structured (one {"error": ...} JSON line,
    rc 1) when a zero-exit child emits no parseable JSON — e.g. a
    stray warning line after stdout was truncated (ADVICE r5)."""
    import importlib.util
    import os
    import subprocess
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    class Garbled:
        returncode = 0
        stdout = "WARNING: something\nnot a json line"
        stderr = "some stderr noise"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Garbled())
    rc = bench.paired([])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert "error" in out and "stdout_tail" in out

    class Empty(Garbled):
        stdout = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Empty())
    rc = bench.paired([])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "error" in out


def test_ann_index_multi_probe_recall(spark):
    """Multi-probe querying (VERDICT r5 #7): probes 2..n flip the
    query's lowest-|margin| hyperplane bits, recovering neighbors a
    single bucket's boundary splits away. Checks: recall vs the exact
    brute-force top-k is monotone non-decreasing in n_probes and
    strictly better than single-probe on boundary-straddling data;
    the expr and arrow kernels agree under multi-probe; probe
    expansion never duplicates a (query, neighbor) pair; bounds
    enforced."""
    import random
    import pytest as _pt
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, cosine_topk, query_ann_index)
    rng = random.Random(33)
    dims = 6
    # Clustered points with small spread: many clusters sit near a
    # hyperplane, so their members split across buckets.
    rows = []
    for c in range(30):
        center = [rng.gauss(0, 1) for _ in range(dims)]
        for m in range(6):
            rows.append((c * 10 + m,
                         [x + rng.gauss(0, 0.15) for x in center]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    planes = [[rng.gauss(0, 1) for _ in range(dims)]
              for _ in range(4)]
    idx = build_ann_index(emb, "vec_id", "embedding", planes)
    truth = {(r.query_id, r.neighbor_id) for r in
             cosine_topk(emb, "vec_id", "embedding", k=3).collect()}

    def run(n_probes, rescore="arrow"):
        return [(r.query_id, r.neighbor_id) for r in
                query_ann_index(emb, idx, "vec_id", "embedding",
                                planes, k=3, rescore=rescore,
                                n_probes=n_probes).collect()]

    recalls = []
    for n in (1, 2, 3, 5):
        got = run(n)
        assert len(got) == len(set(got))       # no duplicate pairs
        recalls.append(len(truth & set(got)) / len(truth))
    assert recalls == sorted(recalls)          # monotone in probes
    assert recalls[-1] > recalls[0]            # boundary pairs found
    assert recalls[-1] > 0.9
    # kernels agree under multi-probe (gaussian data: no ties)
    assert sorted(run(3)) == sorted(run(3, rescore="expr"))
    with _pt.raises(ValueError):
        query_ann_index(emb, idx, "vec_id", "embedding", planes,
                        n_probes=len(planes) + 2)
    with _pt.raises(ValueError):
        query_ann_index(emb, idx, "vec_id", "embedding", planes,
                        n_probes=0)


def test_ann_index_multi_table_roundtrip_and_recall(spark, tmp_path):
    """Multi-table ANN (VERDICT r8 #7): T independent plane sets
    stored side by side (a `table` column). The stored index
    round-trips through parquet; candidates union ACROSS tables and
    deduplicate before the global rank (a vector can reach a query
    via several tables); and recall@k strictly improves over either
    single table on a fixture where one table's planes separate a
    true neighbor pair (>= 2 sign flips away — the regime single-set
    multi-probe plateaus in)."""
    import random

    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    rng = random.Random(33)
    dims = 4
    # clustered pairs: (2i, 2i+1) are near-identical — the true
    # nearest neighbor of any vector is its pair twin
    rows = []
    for i in range(30):
        base = [rng.gauss(0, 1) for _ in range(dims)]
        rows.append((2 * i, base))
        rows.append((2 * i + 1,
                     [x + rng.gauss(0, 0.01) for x in base]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    t0 = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(3)]
    t1 = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(3)]

    def recall(matches):
        got = {(r.query_id, r.neighbor_id) for r in matches
               if r.rank == 1}
        return sum((v, v ^ 1) in got for v, _ in
                   [(r[0], None) for r in rows]) / len(rows)

    idx = build_ann_index(emb, "vec_id", "embedding", [t0, t1],
                          tables=2)
    assert set(idx.columns) == {"vec_id", "table", "bucket", "qvec",
                                "scale"}
    path = str(tmp_path / "multi")
    idx.write.parquet(path)
    stored = spark.read.parquet(path)

    live = query_ann_index(emb, idx, "vec_id", "embedding", [t0, t1],
                           k=2, tables=2).collect()
    replay = query_ann_index(emb, stored, "vec_id", "embedding",
                             [t0, t1], k=2, tables=2).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in live} \
        == {(r.query_id, r.neighbor_id, r.rank) for r in replay}
    # no duplicate (query, neighbor) pairs survive the cross-table
    # union, and ranks are contiguous per query
    seen = {}
    for r in live:
        assert (r.query_id, r.neighbor_id) not in seen
        seen[(r.query_id, r.neighbor_id)] = r.rank
    r_multi = recall(live)
    r_single = max(
        recall(query_ann_index(emb, build_ann_index(
            emb, "vec_id", "embedding", t), "vec_id", "embedding",
            t, k=2).collect())
        for t in (t0, t1))
    assert r_multi >= r_single
    assert r_multi > 0.9

    # expr rescore agrees with the BLAS path on the multi-table union
    expr = {(r.query_id, r.neighbor_id, r.rank) for r in
            query_ann_index(emb, idx, "vec_id", "embedding",
                            [t0, t1], k=2, tables=2,
                            rescore="expr").collect()}
    assert expr == {(r.query_id, r.neighbor_id, r.rank) for r in live}

    import pytest as _pt
    with _pt.raises(ValueError):
        build_ann_index(emb, "vec_id", "embedding", [t0], tables=2)
    with _pt.raises(ValueError):
        query_ann_index(emb, idx, "vec_id", "embedding",
                        [t0, [[1.0, 0.0], [0.0, 1.0]]], tables=2)


def test_ann_index_multi_table_with_multi_probe(spark):
    """tables and n_probes compose: per-table probe expansion, union,
    dedupe, one global rank."""
    import random

    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    rng = random.Random(7)
    dims = 4
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dims)])
         for i in range(40)], ["vec_id", "embedding"])
    sets = [[[rng.gauss(0, 1) for _ in range(dims)] for _ in range(3)]
            for _ in range(2)]
    idx = build_ann_index(emb, "vec_id", "embedding", sets, tables=2)
    got = query_ann_index(emb, idx, "vec_id", "embedding", sets, k=3,
                          tables=2, n_probes=2).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(
            (r.rank, r.neighbor_id))
    for q, lst in per_q.items():
        ranks = sorted(rk for rk, _ in lst)
        assert ranks == list(range(1, len(lst) + 1)), (q, lst)
        assert len({n for _, n in lst}) == len(lst)


def test_ann_index_bits16_lifts_rescore_ceiling(spark):
    """The rescore-precision lever: bits=16 halves the quantization
    step, so dequantized sims track true cosines tighter and end-to-end
    ranks converge to the routing-level result. Max reconstruction
    error must shrink ~256x vs int8 (scale = max|v| / (2^(b-1)-1)),
    and the query path is bits-agnostic."""
    import random

    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index, quantize_embeddings)
    rng = random.Random(5)
    dims = 8
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(dims)])
         for i in range(50)], ["vec_id", "embedding"])
    e8 = quantize_embeddings(emb, "vec_id", "embedding", bits=8) \
        .agg(F.max("max_abs_err")).first()[0]
    e16 = quantize_embeddings(emb, "vec_id", "embedding", bits=16) \
        .agg(F.max("max_abs_err")).first()[0]
    assert e16 < e8 / 100
    planes = [[rng.gauss(0, 1) for _ in range(dims)]
              for _ in range(2)]
    idx16 = build_ann_index(emb, "vec_id", "embedding", planes,
                            bits=16)
    # int16 values really occupy the wider range
    assert idx16.agg(F.max(F.array_max("qvec"))).first()[0] > 127
    got = query_ann_index(emb, idx16, "vec_id", "embedding", planes,
                          k=3).collect()
    assert len(got) > 0
    # int16-dequantized sims are within 1e-3 of true cosine
    import numpy as np
    vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    for r in got[:20]:
        a, b = vecs[r.query_id], vecs[r.neighbor_id]
        true = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.sim - true) < 1e-3, (r, true)


def test_plane_tables_validation(spark):
    """ADVICE r9: _plane_tables rejects ragged plane sets (planes of
    differing lengths would make fold_dot silently truncate dot
    products) and empty sets, with descriptive errors — for the
    single-set and multi-table forms alike."""
    import pytest as _pytest

    from wp_etl_migration_spark.operators.similarity import (
        _plane_tables)
    # well-formed: single set and T=2
    assert _plane_tables([[1.0, 0.0], [0.0, 1.0]], 1) == \
        [[[1.0, 0.0], [0.0, 1.0]]]
    assert len(_plane_tables([[[1.0, 0.0]], [[0.0, 1.0]]], 2)) == 2
    # ragged within one set
    with _pytest.raises(ValueError, match="dimensionality"):
        _plane_tables([[1.0, 0.0], [0.0, 1.0, 2.0]], 1)
    # ragged across sets
    with _pytest.raises(ValueError, match="dimensionality"):
        _plane_tables([[[1.0, 0.0]], [[0.0, 1.0, 2.0]]], 2)
    # empty set
    with _pytest.raises(ValueError, match=">= 1 plane"):
        _plane_tables([[[1.0, 0.0]], []], 2)
    with _pytest.raises(ValueError, match=">= 1 plane"):
        _plane_tables([], 1)
    # wrong set count for tables
    with _pytest.raises(ValueError, match="tables=3"):
        _plane_tables([[[1.0]], [[1.0]]], 3)


def test_quiet_gate(monkeypatch, capsys):
    """tools/quiet.py (r12): exit 0 iff every canary ratio is at or
    under its bar; custom bars honored; referees without a committed
    reference are skipped (null)."""
    import importlib.util
    import json as _json
    import os
    import sys
    import types
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "quiet", os.path.join(root, "tools", "quiet.py"))
    quiet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(quiet)
    with open(os.path.join(root, "baseline_queries.json")) as fh:
        base = _json.load(fh)
    refs = (base["canary_sec"], base["io_canary_sec"],
            base["mem_canary_sec"])

    def fake(scale):
        return types.SimpleNamespace(
            canary_sec=lambda: refs[0] * scale,
            io_canary_sec=lambda: refs[1] * scale,
            mem_canary_sec=lambda: refs[2] * scale)

    monkeypatch.setitem(sys.modules, "bench", fake(1.0))
    assert quiet.main([]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["quiet"] and out["ratios"] == {"cpu": 1.0, "io": 1.0,
                                              "mem": 1.0}
    monkeypatch.setitem(sys.modules, "bench", fake(2.0))
    assert quiet.main([]) == 1
    assert quiet.main(["--cpu", "3", "--io", "3", "--mem", "3"]) == 0


def test_api_md_current():
    """API.md is generated (tools/gen_api.py) and committed; this
    regenerates it in memory and compares byte-for-byte, so the
    reference can never drift from the code — and every public
    top-level symbol of every module must appear (VERDICT r9 #8)."""
    import ast
    import importlib.util
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_api", os.path.join(repo, "tools", "gen_api.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    want = gen.render()
    with open(os.path.join(repo, "API.md")) as fh:
        got = fh.read()
    assert got == want, (
        "API.md is stale — run `python tools/gen_api.py` and commit")

    # completeness: every public top-level symbol appears
    for path in gen.module_files():
        with open(path) as fh:
            tree = ast.parse(fh.read())
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)) \
                    and not node.name.startswith("_"):
                assert f"`{node.name}" in want, (
                    f"{path}: public symbol {node.name} missing "
                    "from API.md")


def test_cli_takedown_tombstone_and_purge(spark, tmp_path, capsys):
    """The takedown CLI: tombstone ids out of a continuous-dedup
    store, then physically purge — the compliance workflow operable
    without code. Also validates the argument contract (ids require
    a batch id; empty invocations fail loudly)."""
    from wp_etl_migration_spark.__main__ import main
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "s")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=8, rows_per_sub=1,
                            auto_compact_tail=None)
    loop.process_batch(spark.createDataFrame(
        [(1, "secret sentinel alpha"), (2, "keeper one two")],
        ["doc_id", "text"]), 0)

    assert main(["takedown", store]) == 2
    capsys.readouterr()
    assert main(["takedown", store, "--ids", "1"]) == 2
    capsys.readouterr()

    assert main(["takedown", store, "--ids", "1",
                 "--batch-id", "1"]) == 0
    assert "tombstoned 1 id(s) at batch 1" in capsys.readouterr().out
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2]

    assert main(["takedown", store, "--purge"]) == 0
    out = capsys.readouterr().out
    assert "purged: 1 row(s) across 1 partition(s)" in out
    raw = spark.read.parquet(f"{store}/corpus")
    assert [r.doc_id for r in raw.collect()] == [2]


def test_cli_stats_dedup_and_ann(spark, tmp_path, capsys):
    """The stats CLI: one JSON line per store kind; the ANN store
    reports via the maintenance-only (planes=None) construction, and
    that construction refuses to ingest."""
    import json as _json

    import pytest as _pytest

    from wp_etl_migration_spark.__main__ import main
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex, IncrementalDedup)
    dstore = str(tmp_path / "d")
    loop = IncrementalDedup(spark, dstore, "doc_id", "text",
                            num_subs=8, rows_per_sub=1,
                            auto_compact_tail=None)
    loop.process_batch(spark.createDataFrame(
        [(1, "alpha beta gamma delta")], ["doc_id", "text"]), 0)
    assert main(["stats", dstore]) == 0
    got = _json.loads(capsys.readouterr().out.strip())
    assert got["corpus_rows"] == 1
    assert got["digests"]["tail_partitions"] == 1

    astore = str(tmp_path / "a")
    planes = [[1.0, -1.0, 0.5, 0.25]]
    idx = IncrementalAnnIndex(spark, astore, "vec_id", "emb", planes,
                              k=1, num_subs=8, rows_per_sub=1,
                              auto_compact_tail=None)
    idx.process_batch(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 0)
    assert main(["stats", astore, "--kind", "ann",
                 "--vec-col", "emb"]) == 0
    got = _json.loads(capsys.readouterr().out.strip())
    assert got["ann"]["tail_partitions"] == 1

    # maintenance-only construction cannot ingest
    bare = IncrementalAnnIndex(spark, astore, "vec_id", "emb")
    with _pytest.raises(ValueError, match="maintenance-only"):
        bare.process_batch(spark.createDataFrame(
            [(2, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, emb array<double>"), 1)


def _load_bench(name: str):
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _shingle_dfs(rows, n=3):
    """{df value -> count} over 3-gram shingle document frequencies."""
    from collections import Counter
    df = Counter()
    for text in rows:
        w = text.split()
        for sh in {tuple(w[i:i + n]) for i in range(len(w) - n + 1)}:
            df[sh] += 1
    return Counter(df.values())


def test_sf10_wide_corpus_properties(spark, tmp_path, monkeypatch):
    """The --wide recipe's claims, CI-proven at sf0.001: (a) ids are
    collision-free, (b) the per-shingle df DISTRIBUTION is pinned
    while vocabulary grows — the df histogram at 4 replicas is
    exactly 2x the 2-replica histogram (salt groups are disjoint and
    identical up to the suffix), so the max_doc_freq cap trims the
    same fraction at every scale, (c) each salt pair is a true
    near-dup (3-gram Jaccard above the kernels' 0.7/0.8 thresholds
    for long docs), (d) the build is deterministic."""
    mod = _load_bench("bench_sf10_dedup")
    monkeypatch.setattr(mod, "SRC", SF_SMALL)
    monkeypatch.setattr(mod, "SCRATCH_DIR", str(tmp_path / "s1"))

    p2 = mod.build_corpus(spark, 2, wide=True)
    p4 = mod.build_corpus(spark, 4, wide=True)
    n_src = spark.read.parquet(
        SF_SMALL + "/documents.parquet").count()
    c4 = spark.read.parquet(p4)
    assert c4.count() == 4 * n_src
    assert c4.select("doc_id").distinct().count() == 4 * n_src

    rows2 = [r.text for r in spark.read.parquet(p2).collect()]
    rows4 = [r.text for r in c4.collect()]
    h2, h4 = _shingle_dfs(rows2), _shingle_dfs(rows4)
    assert h4 == {k: 2 * v for k, v in h2.items()}

    # near-dup pairs: rep 0 vs rep 1 of the same source doc
    stride = max(r.doc_id for r in
                 spark.read.parquet(
                     SF_SMALL + "/documents.parquet")
                 .select("doc_id").collect()) + 1
    by_id = {r.doc_id: r.text
             for r in spark.read.parquet(p2).collect()}
    jacs = []
    for did, text in by_id.items():
        if did >= stride or len(text.split()) < 62:
            continue
        w0, w1 = text.split(), by_id[did + stride].split()
        s0 = {tuple(w0[i:i + 3]) for i in range(len(w0) - 2)}
        s1 = {tuple(w1[i:i + 3]) for i in range(len(w1) - 2)}
        jacs.append(len(s0 & s1) / len(s0 | s1))
    assert jacs, "no long docs in the fixture corpus"
    jacs.sort()
    assert jacs[len(jacs) // 2] >= 0.7, jacs[:5]

    # determinism: a rebuild under a fresh scratch dir is identical
    monkeypatch.setattr(mod, "SCRATCH_DIR", str(tmp_path / "s2"))
    pr = mod.build_corpus(spark, 4, wide=True)
    a = sorted((r.doc_id, r.text)
               for r in spark.read.parquet(p4).collect())
    b = sorted((r.doc_id, r.text)
               for r in spark.read.parquet(pr).collect())
    assert a == b


def test_sf10_ann_corpus_properties(spark, tmp_path, monkeypatch):
    """The ANN replica recipe's claims at sf0.001: collision-free
    ids; synthesized replicas are DIVERSE (|cos| to their source far
    below the 0.3 near-dup threshold on average — the vocabulary-
    growth analog, not 100 copies of the same vectors), bounded in
    [-1, 1], and deterministic; planes_for holds bucket occupancy."""
    import math

    mod = _load_bench("bench_sf10_ann")
    monkeypatch.setattr(mod, "SRC", SF_SMALL)
    monkeypatch.setattr(mod, "SCRATCH_DIR", str(tmp_path / "s1"))

    path = mod.build_corpus(spark, 3)
    src = spark.read.parquet(SF_SMALL + "/embeddings.parquet")
    n_src = src.count()
    c = spark.read.parquet(path)
    assert c.count() == 3 * n_src
    assert c.select("vec_id").distinct().count() == 3 * n_src

    stride = src.agg(F.max("vec_id")).first()[0] + 1
    by_id = {r.vec_id: r.embedding for r in c.collect()}
    lanes = [x for vid, v in by_id.items() if vid >= stride for x in v]
    assert min(lanes) >= -1.0 and max(lanes) <= 1.0
    coss = []
    for vid, v in by_id.items():
        if vid < stride:
            continue
        s = by_id[vid % stride]
        dot = sum(a * b for a, b in zip(v, s))
        nv = math.sqrt(sum(a * a for a in v))
        ns = math.sqrt(sum(a * a for a in s))
        if nv and ns:
            coss.append(abs(dot / (nv * ns)))
    assert coss and sum(coss) / len(coss) < 0.3, sum(coss) / len(coss)

    monkeypatch.setattr(mod, "SCRATCH_DIR", str(tmp_path / "s2"))
    pr = mod.build_corpus(spark, 3)
    a = sorted((r.vec_id, list(r.embedding))
               for r in spark.read.parquet(path).collect())
    b = sorted((r.vec_id, list(r.embedding))
               for r in spark.read.parquet(pr).collect())
    assert a == b

    # occupancy-constant plane sizing: 2^planes ~ N / target
    assert len(mod.planes_for(2_000)) == 4
    assert len(mod.planes_for(20_000)) == 8
    assert len(mod.planes_for(200_000)) == 11


def test_bench_mem_canary_fails_structured_on_dead_worker(monkeypatch):
    """ADVICE r12: a dead canary worker (the probe allocates under
    the very memory pressure it measures — OOM kills happen) must
    raise a RuntimeError promptly, not hang the bench or the quiet
    gate on out_q.get()."""
    import importlib.util
    import os
    import time

    import pytest
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setattr(bench, "MEM_CANARY_WORKERS", 2)
    monkeypatch.setattr(bench, "MEM_CANARY_TIMEOUT_SEC", 5)

    def dead_worker(barrier, out_q, passes):
        os._exit(3)

    monkeypatch.setattr(bench, "_mem_canary_worker", dead_worker)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="died or stalled"):
        bench.mem_canary_sec()
    assert time.monotonic() - t0 < 30   # bounded, not a hang


def test_quiet_gate_flag_parsing_structured(capsys):
    """ADVICE r12: tools/quiet.py keeps its one-JSON-line contract on
    a trailing or non-numeric --cpu/--io/--mem value (exit 2 +
    {"error": ...}) instead of a traceback."""
    import importlib.util
    import json
    import os
    spec = importlib.util.spec_from_file_location(
        "quiet", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "tools", "quiet.py"))
    quiet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(quiet)

    for argv in (["--cpu"], ["--mem", "fast"], ["--io", ""]):
        assert quiet.main(argv) == 2
        line = capsys.readouterr().out.strip()
        assert "error" in json.loads(line)


def test_staging_path_never_emits_authority_slashes():
    """Root-level datasets ('/data') must stage at '/._staging_data' —
    os.path.split-based joining produced '//._staging_data', which
    Hadoop URI parsing reads as an authority (host '._staging_data'),
    a different filesystem location (r13 ADVICE)."""
    from wp_etl_migration_spark.plans.janitor import _staging_path
    assert _staging_path("/data") == "/._staging_data"
    assert _staging_path("/data/") == "/._staging_data"
    assert _staging_path("/a/b/c") == "/a/b/._staging_c"
    assert _staging_path("rel/x") == "rel/._staging_x"
    assert _staging_path("x") == "._staging_x"
    assert _staging_path("s3a://bucket/exp/shard=3") == \
        "s3a://bucket/exp/._staging_shard=3"


def test_rewrite_crash_recovery_restores_from_staging(spark, tmp_path):
    """Crash contract of the staged swap: a COMPLETE staging dir
    (_SUCCESS present) with a truncated/missing target is exactly the
    mid-swap crash window — rewrite_dataset refuses to proceed (the
    survivors it would build derive from the bad target) and
    recover_dataset finishes the swap; an INCOMPLETE staging (no
    _SUCCESS) means the target was never touched — recover drops the
    garbage and reports False."""
    import os
    import shutil

    import pytest

    from wp_etl_migration_spark.plans.janitor import (
        recover_dataset, rewrite_dataset)
    path = str(tmp_path / "data")
    df = spark.range(100).toDF("id")
    df.write.parquet(path)

    # simulate: staging committed, then the overwrite died mid-way
    staging = str(tmp_path / "._staging_data")
    df.where("id >= 10").write.parquet(staging)
    assert os.path.exists(f"{staging}/_SUCCESS")
    shutil.rmtree(path)  # worst case: target fully gone

    with pytest.raises(RuntimeError, match="stale staging"):
        rewrite_dataset(spark, path, df.where("id >= 10"))
    assert recover_dataset(spark, path) is True
    assert not os.path.exists(staging)
    assert spark.read.parquet(path).count() == 90

    # incomplete staging: crash mid-staging-write — target intact
    os.makedirs(staging)
    with open(f"{staging}/part-junk.parquet", "w") as fh:
        fh.write("garbage")
    assert recover_dataset(spark, path) is False
    assert not os.path.exists(staging)
    assert spark.read.parquet(path).count() == 90
    # no staging at all is a no-op
    assert recover_dataset(spark, path) is False


def test_purge_converges_after_simulated_shard_crash(spark, tmp_path):
    """purge_training_shards' documented recovery ('run it again')
    must hold through the worst per-shard window: staging committed,
    target truncated. The re-run restores the shard FROM staging
    before reading it, so the truncated dir never seeds the anti-join
    (r13 ADVICE — the old overwrite-based swap recomputed the
    manifest to match the truncated shard, silently losing rows)."""
    import shutil

    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, verify_training_shards,
        write_training_shards)
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=4, salt="s")
    victims = [r.doc_id for r in
               spark.read.parquet(f"{path}/shard=1").limit(3)
               .collect()]

    # simulate the crash: a completed staging for shard=1 (survivors
    # already anti-joined) next to a truncated target dir
    shard_dir = f"{path}/shard=1"
    survivors = spark.read.parquet(shard_dir).where(
        ~F.col("doc_id").isin(victims))
    n_expect = survivors.count()
    survivors.write.parquet(f"{path}/._staging_shard=1")
    shutil.rmtree(shard_dir)

    res = purge_training_shards(spark, path, "doc_id", victims)
    assert res["rows_removed"] == 3
    assert verify_training_shards(spark, path, "doc_id")["ok"]
    assert spark.read.parquet(shard_dir).count() == n_expect
    assert spark.read.parquet(path).count() == 200 - 3


def test_purge_converges_after_simulated_grouped_crash(spark,
                                                       tmp_path):
    """Grouped-path crash window: ._staging_purge committed
    (_SUCCESS), some shard swaps done, some not, manifest stale. The
    re-run's entry recovery swaps the rest in, then the normal flow
    refreshes the manifest."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, verify_training_shards,
        write_training_shards)
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=4, salt="g")
    victims = [1, 2, 101, 202]

    # build the committed grouped staging the crashed run would have
    # left: survivors of every affected shard, partitioned
    from wp_etl_migration_spark.operators.sampling import hash_bucket
    ids = spark.createDataFrame([(i,) for i in victims], ["doc_id"])
    affected = sorted(
        r["shard"] for r in ids.select(
            F.pmod(hash_bucket("doc_id", "g"), F.lit(4)).cast("int")
            .alias("shard")).distinct().collect())
    rows = spark.read.option("basePath", path).parquet(
        *[f"{path}/shard={s}" for s in affected])
    staging = f"{path}/._staging_purge"
    (rows.join(F.broadcast(ids), "doc_id", "left_anti")
     .write.partitionBy("shard").parquet(staging))
    assert os.path.exists(f"{staging}/_SUCCESS")
    # crash after swapping ONE shard: its target became the staging
    # copy, the others are still pre-purge
    s0 = affected[0]
    shutil.rmtree(f"{path}/shard={s0}")
    os.rename(f"{staging}/shard={s0}", f"{path}/shard={s0}")

    res = purge_training_shards(spark, path, "doc_id", victims)
    assert not os.path.exists(staging)
    assert verify_training_shards(spark, path, "doc_id")["ok"]
    back = spark.read.parquet(path)
    assert back.count() == 300 - len(victims)
    assert back.where(F.col("doc_id").isin(victims)).count() == 0
    assert res["manifest"]["n_rows"] == 300 - len(victims)


def test_mem_canary_fast_fails_on_worker_death(monkeypatch):
    """A canary worker OOM-killed mid-sweep must fail the round
    within the ~0.5 s liveness poll, not stall the bench (and the
    quiet gate) for the full 60 s queue timeout (ADVICE r13)."""
    import os
    import signal
    import time as _time

    bench = _load_bench("bench")
    monkeypatch.setattr(bench, "MEM_CANARY_WORKERS", 2)
    monkeypatch.setattr(bench, "MEM_CANARY_MIB", 1)

    real_worker = bench._mem_canary_worker

    def dying_worker(barrier, out_q, passes):
        barrier.wait()
        os.kill(os.getpid(), signal.SIGKILL)

    monkeypatch.setattr(bench, "_mem_canary_worker", dying_worker)
    t0 = _time.monotonic()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="killed|died|stalled"):
        bench._mem_canary_round(2)
    # fast-fail: well under the 60 s timeout the old code waited out
    assert _time.monotonic() - t0 < 30

    # healthy round still returns a positive wall
    monkeypatch.setattr(bench, "_mem_canary_worker", real_worker)
    assert bench._mem_canary_round(1) > 0


def test_quiet_gate_arg_parsing(capsys, monkeypatch):
    """tools/quiet.py argv contract (ADVICE r13): both --k v and
    --k=v forms parse, unknown flags and bad values produce the
    one-JSON-line structured error (exit 2), never a traceback or a
    silently-ignored typo."""
    import importlib.util
    import json
    import os
    spec = importlib.util.spec_from_file_location(
        "quiet", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "tools", "quiet.py"))
    quiet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(quiet)

    for argv in (["--cpu"], ["--cpu", "abc"], ["--cpu=abc"],
                 ["--typo", "1.1"], ["--typo=1.1"], ["stray"],
                 ["--mem", "--cpu"]):
        assert quiet.main(argv) == 2, argv
        out = json.loads(capsys.readouterr().out.strip())
        assert "error" in out

    # happy path: stub the canaries so no real probe runs
    import sys
    sys.modules.pop("bench", None)
    bench = _load_bench("bench")
    monkeypatch.setattr(bench, "canary_sec", lambda: 1.0)
    monkeypatch.setattr(bench, "io_canary_sec", lambda: 1.0)
    monkeypatch.setattr(bench, "mem_canary_sec", lambda: 1.0)
    monkeypatch.setitem(sys.modules, "bench", bench)
    rc = quiet.main(["--cpu", "9.9", "--io=9.9", "--mem", "9.9"])
    out = json.loads(capsys.readouterr().out.strip())
    assert "ratios" in out and rc in (0, 1)
