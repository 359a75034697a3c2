"""Structured Streaming tests, run with the availableNow trigger over the
sf0.001 events parquet: the streamed result must equal the equivalent
batch aggregation (minus watermark-dropped rows, which availableNow's
single-pass replay never drops)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from wp_etl_migration_spark.sources.tables import load_table
from wp_etl_migration_spark.streaming.sessions import (
    sessionize, sessionize_batch)
from wp_etl_migration_spark.streaming.windows import (
    run_to_memory, stream_events, windowed_event_counts)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-write events as a clean TIMESTAMP-typed parquet dir (the raw
    testdata uses TIMESTAMP(NANOS), unreadable by a schema'd file
    stream)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, SF_SMALL, "events").write.parquet(path)
    return path


def test_windowed_counts_match_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    assert stream.isStreaming
    run_to_memory(windowed_event_counts(stream), "win_agg")
    got = {(r["window_start"], r["event_type"]): (r["n_events"],
                                                  r["sum_value"])
           for r in spark.table("win_agg").collect()}

    batch = (spark.read.parquet(events_dir)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"), F.sum("value").alias("s")))
    want = {(r["w"]["start"], r["event_type"]): (r["n"], r["s"])
            for r in batch.collect()}
    # Append mode only emits windows the watermark has passed; windows
    # inside the final watermark horizon (max ts − 2h) stay in state when
    # availableNow drains. Everything emitted must match batch exactly.
    assert set(got.items()) <= set(want.items())
    max_ts = (spark.read.parquet(events_dir)
              .agg(F.max("ts")).first()[0])
    import datetime
    horizon = max_ts - datetime.timedelta(hours=3)  # watermark + window
    missing = set(want) - set(got)
    assert all(ws >= horizon for ws, _ in missing)
    assert len(got) > 500


def test_sessionize_stream_matches_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    run_to_memory(sessionize(stream), "sessions")
    streamed = spark.table("sessions")

    batch = sessionize_batch(spark.read.parquet(events_dir))

    def key(rows):
        return sorted((r["user_id"], r["session_start"], r["session_end"],
                       r["n_events"], round(r["sum_value"], 6))
                      for r in rows)

    s, b = key(streamed.collect()), key(batch.collect())
    # availableNow replays everything in one microbatch: sessions whose
    # close-timeout never fires remain open (state), so the streamed set
    # is a prefix subset of the batch result. Every emitted session must
    # match a batch session exactly; most sessions must have emitted.
    assert set(s) <= set(b)
    assert len(s) >= len(b) * 0.5
    assert len(b) > 10


def test_stream_dedup_matches_batch_distinct(spark, events_dir, tmp_path):
    from wp_etl_migration_spark.streaming.dedup import (
        stream_dedup_content, stream_dedup_keys)
    # Duplicate the stream input: same events, two files.
    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(events_dir)
    base.write.mode("overwrite").parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)

    stream = stream_events(spark, dup_dir)
    run_to_memory(stream_dedup_keys(stream, ["event_id"]), "dedup_keys")
    assert (spark.table("dedup_keys").count()
            == base.select("event_id").distinct().count())

    stream2 = stream_events(spark, dup_dir)
    run_to_memory(stream_dedup_content(stream2, ["user_id", "event_type",
                                                 "value"]),
                  "dedup_content")
    assert (spark.table("dedup_content").count()
            == base.select("user_id", "event_type", "value")
            .distinct().count())


def test_stream_contamination_matches_batch(spark, tmp_path):
    """Stream-static contamination gate ≡ the batch twin windowed the
    same way (eval shingles broadcast; stream side never shuffles raw
    docs)."""
    from wp_etl_migration_spark.operators.dedup import contamination
    from wp_etl_migration_spark.streaming.dedup import stream_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "2024-01-01 00:10:00"),
         (2, "alpha beta gamma delta epsilon eta", "2024-01-01 00:20:00"),
         (3, "one two three four five six", "2024-01-01 01:10:00"),
         (4, "alpha beta gamma delta epsilon zeta", "2024-01-01 01:30:00"),
         # watermark flush: append mode only emits windows the final
         # watermark has passed; this doc shares nothing with eval.
         (5, "nothing shared here at all friend", "2024-01-02 00:00:00")],
        ["doc_id", "text", "ts_s"]).withColumn(
            "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    ev = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon theta")], ["doc_id", "text"])
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)

    stream = (spark.readStream.schema(docs.schema).parquet(doc_dir))
    got = stream_contamination(stream, ev, "doc_id", "text", n=5,
                               window="1 hour")
    run_to_memory(got, "contam")
    streamed = sorted(
        (r.window_start.isoformat(), r.doc_id, r.n_shared)
        for r in spark.table("contam").collect())

    batch = (contamination(docs, ev, "doc_id", "text", n=5)
             .join(docs.select("doc_id",
                               F.window("ts", "1 hour").alias("__w")),
                   on="doc_id")
             .select(F.col("__w.start").alias("window_start"),
                     "doc_id", "n_shared"))
    expected = sorted((r.window_start.isoformat(), r.doc_id, r.n_shared)
                      for r in batch.collect())
    assert streamed == expected and len(streamed) == 3  # docs 1,2,4


def test_windowed_agg_to_parquet_sink_resumes(spark, events_dir, tmp_path):
    """Durable streaming sink: windowed agg → parquet with a checkpoint.
    A second run over unchanged input must be a no-op (exactly-once via
    checkpointed offsets), not a duplicate append."""
    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (windowed_event_counts(stream_events(spark, events_dir))
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 > 500
    run_once()
    assert spark.read.parquet(out).count() == n1


def test_sessionize_batch_gap_semantics(spark):
    rows = [(1, f"2024-01-01 00:{m:02d}:00", 1.0) for m in (0, 10, 20)] + \
           [(1, "2024-01-01 02:00:00", 2.0),
            (2, "2024-01-01 00:00:00", 5.0)]
    df = (spark.createDataFrame(rows, ["user_id", "ts", "value"])
          .withColumn("ts", F.to_timestamp("ts")))
    out = {(r["user_id"], str(r["session_start"])): r["n_events"]
           for r in sessionize_batch(df).collect()}
    assert out == {(1, "2024-01-01 00:00:00"): 3,
                   (1, "2024-01-01 02:00:00"): 1,
                   (2, "2024-01-01 00:00:00"): 1}


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    from wp_etl_migration_spark.streaming.joins import interval_join

    def split(df):
        purchases = (df.filter(F.col("event_type") == "purchase")
                     .select(F.col("event_id").alias("purchase_id"),
                             "user_id", F.col("ts").alias("p_ts")))
        clicks = (df.filter(F.col("event_type") == "click")
                  .select(F.col("event_id").alias("click_id"),
                          "user_id", F.col("ts").alias("c_ts")))
        return purchases, clicks

    sp, sc = split(stream_events(spark, events_dir))
    streamed = interval_join(sp, sc, on=["user_id"],
                             left_ts="p_ts", right_ts="c_ts")
    assert streamed.isStreaming
    run_to_memory(streamed, "sj")
    got = {(r.purchase_id, r.click_id)
           for r in spark.table("sj").collect()}

    bp, bc = split(spark.read.parquet(events_dir))
    want = {(r.purchase_id, r.click_id)
            for r in interval_join(bp, bc, on=["user_id"],
                                   left_ts="p_ts",
                                   right_ts="c_ts").collect()}
    assert got == want
    assert len(got) >= 1  # sf0.001 has ~5 pairs within the hour


def test_interval_join_rejects_column_collision(spark, events_dir):
    from wp_etl_migration_spark.streaming.joins import interval_join
    df = spark.read.parquet(events_dir)
    with pytest.raises(ValueError, match="collision"):
        interval_join(df, df, on=["user_id"], left_ts="ts",
                      right_ts="ts")


def test_stream_curation_gates_and_sampling(spark, tmp_path):
    """The stateless curation operators (quality/textstats Column exprs,
    deterministic hash + weighted sampling) compose unchanged on a
    stream — same code path, zero state — and the streamed keep set is
    exactly the batch keep set."""
    from wp_etl_migration_spark.operators import textstats as ts
    from wp_etl_migration_spark.operators.sampling import (
        hash_sample, weighted_hash_sample)
    from wp_etl_migration_spark.streaming.windows import run_to_memory

    docs = spark.createDataFrame(
        [(i, ("many words here to pass the gate easily "
              * (1 + i % 5)).strip()) for i in range(200)],
        ["doc_id", "text"])
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)

    def curate(df):
        scored = df.select(
            "doc_id", ts.token_count("text").alias("n_tokens"))
        gated = scored.where(F.col("n_tokens") >= 16)
        sampled = hash_sample(gated, "doc_id", 0.7, salt="s1")
        return weighted_hash_sample(
            sampled, "doc_id",
            F.least(F.col("n_tokens") / F.lit(32.0), F.lit(1.0)),
            salt="s2")

    batch_keep = sorted(r.doc_id for r in curate(docs).collect())
    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    run_to_memory(curate(stream), "curated")
    stream_keep = sorted(r.doc_id for r in
                         spark.table("curated").collect())
    assert stream_keep == batch_keep and len(batch_keep) > 0


def test_stream_quality_gate_matches_batch(spark, tmp_path):
    """Stateless quality gate on a stream keeps exactly the docs the
    batch operators keep."""
    from wp_etl_migration_spark.operators.textstats import (
        gopher_rules, quality_score)
    from wp_etl_migration_spark.streaming.quality import (
        stream_quality_gate)
    good = ("the quick brown fox jumps over the lazy dog and then "
            "the dog wakes up to chase the fox around the big yard "
            "for a while before they both rest under a tree")
    docs = spark.createDataFrame(
        [(1, good), (2, "zz"), (3, "!!! ### ... " * 20)],
        ["doc_id", "text"])
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)

    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    gated = stream_quality_gate(stream, "text", min_quality=0.3,
                                min_words=10, min_stopword_hits=1)
    assert gated.isStreaming
    run_to_memory(gated, "qgate")
    streamed = sorted(r.doc_id for r in spark.table("qgate").collect())

    batch = (docs.withColumn("quality", quality_score("text"))
             .withColumn("g", gopher_rules("text", min_words=10,
                                           min_stopword_hits=1))
             .where((F.col("quality") >= 0.3) & F.col("g.passes")))
    expected = sorted(r.doc_id for r in batch.collect())
    assert streamed == expected == [1]


def test_stream_lm_score_matches_batch(spark, tmp_path):
    """Stream-static LM scoring ≡ the batch lm_score integer columns,
    windowed the same way."""
    from wp_etl_migration_spark.operators.lm import bigram_counts, lm_score
    from wp_etl_migration_spark.streaming.quality import stream_lm_score

    trusted = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(3)],
        ["doc_id", "text"])
    lm = bigram_counts(trusted, "text")
    docs = spark.createDataFrame(
        [(1, "the cat sat", "2024-01-01 00:10:00"),
         (2, "weird zxcv input", "2024-01-01 00:20:00"),
         # late sentinel so the watermark passes the first window
         (3, "the mat", "2024-01-02 00:00:00")],
        ["doc_id", "text", "ts_s"]).withColumn(
            "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)

    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    run_to_memory(stream_lm_score(stream, lm, "doc_id", "text"),
                  "lmscore")
    streamed = sorted(
        (r.doc_id, r.n_bigrams, r.n_hits, r.hit_rate)
        for r in spark.table("lmscore").collect())

    batch = lm_score(docs.where("doc_id < 3"), lm, "doc_id", "text")
    expected = sorted((r.doc_id, r.n_bigrams, r.n_hits, r.hit_rate)
                      for r in batch.collect())
    assert streamed == expected
    assert (1, 2, 2, 1.0) in streamed


def test_embedding_contamination_works_on_stream(spark, tmp_path):
    """The embedding decontamination gate is a stateless mapInPandas
    pass, so the SAME operator runs unchanged on a streaming corpus
    (stream-static semantic gate) and matches its batch output."""
    from wp_etl_migration_spark.operators.similarity import (
        embedding_contamination)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.97, 0.24])],
        ["vec_id", "embedding"])
    ev = spark.createDataFrame([(9, [1.0, 0.0])],
                               ["vec_id", "embedding"])
    emb_dir = str(tmp_path / "emb")
    corpus.write.parquet(emb_dir)

    stream = spark.readStream.schema(corpus.schema).parquet(emb_dir)
    flagged = embedding_contamination(stream, ev, "vec_id",
                                      "embedding", threshold=0.9)
    assert flagged.isStreaming
    run_to_memory(flagged, "econtam")
    streamed = sorted((r.vec_id, r.n_matches)
                      for r in spark.table("econtam").collect())
    batch = sorted((r.vec_id, r.n_matches) for r in
                   embedding_contamination(corpus, ev, "vec_id",
                                           "embedding",
                                           threshold=0.9).collect())
    assert streamed == batch == [(1, 1), (3, 1)]


def test_encode_bpe_works_on_stream(spark, tmp_path):
    """BPE encoding is a stateless Arrow pass, so merges trained
    offline apply unchanged to a document stream (the tokenize step
    of a streaming ingestion pipeline)."""
    from wp_etl_migration_spark.operators.bpe import encode_bpe, train_bpe
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newest")], ["doc_id", "text"])
    merges = train_bpe(docs, "text", num_merges=10)
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)
    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    enc = encode_bpe(stream, "doc_id", "text", merges)
    assert enc.isStreaming
    run_to_memory(enc, "bpe_enc")
    streamed = {r.doc_id: (list(r.tokens), r.n_tokens)
                for r in spark.table("bpe_enc").collect()}
    batch = {r.doc_id: (list(r.tokens), r.n_tokens)
             for r in encode_bpe(docs, "doc_id", "text",
                                 merges).collect()}
    assert streamed == batch and set(streamed) == {1, 2}




def test_stream_classifier_score_matches_batch(spark, tmp_path):
    """Stream-static trained-classifier scoring ≡ the batch
    score_text_classifier probabilities for every doc that emits a
    row (zero-token docs are the documented contract difference)."""
    from wp_etl_migration_spark.operators.classifier import (
        score_text_classifier, train_text_classifier)
    from wp_etl_migration_spark.streaming.quality import (
        stream_classifier_score)

    labeled = spark.createDataFrame(
        [(i, "study method result evidence", 1) for i in range(10)]
        + [(100 + i, "click free casino jackpot", 0)
           for i in range(10)],
        ["doc_id", "text", "label"])
    model = train_text_classifier(labeled, "doc_id", "text", "label",
                                  num_features=2 ** 10)

    docs = spark.createDataFrame(
        [(1, "study method casino", "2024-01-01 00:10:00"),
         (2, "click free pills", "2024-01-01 00:20:00"),
         (3, "unseen tokens only", "2024-01-01 00:30:00"),
         # late sentinel so the watermark passes the first window
         (4, "study", "2024-01-02 00:00:00")],
        ["doc_id", "text", "ts_s"]).withColumn(
            "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)

    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    run_to_memory(stream_classifier_score(stream, model, "doc_id",
                                          "text"), "clfscore")
    streamed = {r.doc_id: r.quality_prob
                for r in spark.table("clfscore").collect()}

    batch = {r.doc_id: r.quality_prob for r in
             score_text_classifier(docs.where("doc_id < 4"), "doc_id",
                                   "text", model).collect()}
    assert set(streamed) == {1, 2, 3}
    for d in streamed:
        assert streamed[d] == pytest.approx(batch[d], abs=1e-12), d
    # separability survived the stream: good-ish doc above bad doc
    assert streamed[1] > streamed[2]


def test_stream_classifier_emit_empty_docs_backfill(spark, tmp_path):
    """emit_empty_docs=True removes the batch/stream contract
    difference: zero-token documents emit sigmoid(intercept) rows
    exactly like score_text_classifier backfills them — via
    explode_outer, still stateless (no side stream). Default stays
    the drop behavior."""
    import math

    from wp_etl_migration_spark.operators.classifier import (
        score_text_classifier, train_text_classifier)
    from wp_etl_migration_spark.streaming.quality import (
        stream_classifier_score)
    from wp_etl_migration_spark.streaming.windows import run_to_memory

    labeled = spark.createDataFrame(
        [(i, "study method result evidence", 1) for i in range(10)]
        + [(100 + i, "click free casino jackpot", 0)
           for i in range(10)],
        ["doc_id", "text", "label"])
    model = train_text_classifier(labeled, "doc_id", "text", "label",
                                  num_features=2 ** 10)

    docs = spark.createDataFrame(
        [(1, "study method casino", "2024-01-01 00:10:00"),
         (2, "", "2024-01-01 00:15:00"),           # zero tokens
         (3, "!!! ...", "2024-01-01 00:20:00"),    # zero tokens too
         (4, "late", "2024-01-02 00:00:00")],      # watermark pusher
        ["doc_id", "text", "ts_s"]).withColumn(
            "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)

    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    run_to_memory(stream_classifier_score(
        stream, model, "doc_id", "text", emit_empty_docs=True),
        "clf_backfill")
    streamed = {r.doc_id: r.quality_prob
                for r in spark.table("clf_backfill").collect()}
    assert set(streamed) == {1, 2, 3}
    batch = {r.doc_id: r.quality_prob for r in
             score_text_classifier(docs.where("doc_id < 4"), "doc_id",
                                   "text", model).collect()}
    for d in streamed:
        assert streamed[d] == pytest.approx(batch[d], abs=1e-12), d
    want = 1.0 / (1.0 + math.exp(-model["intercept"]))
    assert streamed[2] == pytest.approx(want, abs=1e-12)

    # default (False): the empty docs drop, as before
    stream2 = spark.readStream.schema(docs.schema).parquet(doc_dir)
    run_to_memory(stream_classifier_score(
        stream2, model, "doc_id", "text"), "clf_drop")
    assert {r.doc_id for r in spark.table("clf_drop").collect()} \
        == {1}
