"""Streaming quality gates.

The batch quality operators re-expressed over unbounded input. The
heuristic/Gopher gates are pure Column expressions — STATELESS on a
stream (each microbatch filters independently, no watermark needed).
LM scoring is a stream-static join: the LM is a batch frame trained
offline (``operators.lm``), the per-document aggregation is the only
state and is watermark-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_quality_gate(docs: DataFrame, text_col: str,
                        min_quality: float = 0.3,
                        gopher: bool = True,
                        **gopher_kwargs) -> DataFrame:
    """Filter a document stream by the heuristic quality score and
    (optionally) the Gopher rule set — the batch twins are
    ``textstats.quality_score`` / ``textstats.gopher_rules``. Stateless:
    pure codegen expressions, so the stream never shuffles and any
    output mode works. Adds the ``quality`` column; drops the
    intermediate rule struct.
    """
    from wp_etl_migration_spark.operators.textstats import (
        gopher_rules, quality_score)
    out = docs.withColumn("quality", quality_score(text_col))
    keep = F.col("quality") >= min_quality
    if gopher:
        out = out.withColumn("__g", gopher_rules(text_col,
                                                 **gopher_kwargs))
        keep = keep & F.col("__g.passes")
    return out.where(keep).drop("__g")


def stream_lm_score(docs: DataFrame, lm: DataFrame, id_col: str,
                    text_col: str, ts_col: str = "ts",
                    window: str = "1 hour",
                    watermark: str = "1 hour") -> DataFrame:
    """Streaming bigram-LM scoring: incoming docs against a STATIC LM
    (from ``operators.lm.bigram_counts``), as watermarked windowed
    per-document aggregates (append-mode safe).

    Returns (window_start, id, n_bigrams, n_hits, hit_rate). The
    bigram generator is stateless; the stream-static left join adds no
    state (the pruned LM broadcasts); the only state is the windowed
    aggregation, bounded by the watermark. Batch twin:
    ``operators.lm.lm_score`` (minus the engine-float avg_logprob —
    windowed append mode recomputes nothing, so the deterministic
    integer columns are the streaming contract).
    """
    from wp_etl_migration_spark.operators.lm import _bigrams
    bg = _bigrams(docs, text_col, id_col, ts_col)
    scored = bg.join(F.broadcast(lm), ["w1", "w2"], "left")
    return (scored
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("__w"),
                     F.col(id_col))
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.count("n").cast("long").alias("n_hits"))
            .select(F.col("__w.start").alias("window_start"),
                    F.col(id_col), "n_bigrams", "n_hits",
                    (F.col("n_hits").cast("double")
                     / F.col("n_bigrams").cast("double"))
                    .alias("hit_rate")))


def stream_classifier_score(docs: DataFrame, model: dict, id_col: str,
                            text_col: str, ts_col: str = "ts",
                            window: str = "1 hour",
                            watermark: str = "1 hour",
                            emit_empty_docs: bool = False) -> DataFrame:
    """Streaming trained-classifier scoring against a STATIC model
    dict (``operators.classifier.train_text_classifier`` — trained
    offline on the labeled sample), as watermarked windowed
    per-document aggregates (append-mode safe).

    Returns (window_start, id, quality_prob). Same shape as
    :func:`stream_lm_score`: the tokenize/hash stage is stateless
    codegen, the stream-static left join adds no state (the
    model-sized weight table broadcasts), and the only state is the
    windowed per-document margin sum, watermark-bounded. Documents
    whose tokens hit no trained weight score sigmoid(intercept).

    Documents with ZERO tokens emit no row by default (nothing
    survives the explode). ``emit_empty_docs=True`` restores the
    batch twin's contract — they score sigmoid(intercept) — by
    switching to ``explode_outer`` (an empty token array yields one
    null-token row whose null feature index joins no weight), still
    fully stateless: no side stream, no extra state."""
    from wp_etl_migration_spark.operators.classifier import (
        TOKEN_PATTERN, _feature_index, _tokens)
    if model.get("token_pattern") not in (None, TOKEN_PATTERN):
        raise ValueError(
            "model was trained with a different token_pattern; "
            "retrain or score with the matching engine version")
    spark = docs.sparkSession
    n = int(model["num_features"])
    b = float(model["intercept"])
    w = spark.createDataFrame(
        [(int(i), float(v)) for i, v in model["weights"].items()],
        "feature int, weight double")
    explode = F.explode_outer if emit_empty_docs else F.explode
    feat = (docs.select(F.col(id_col), F.col(ts_col),
                        explode(_tokens(text_col)).alias("__t"))
            .select(id_col, ts_col,
                    # null token (explode_outer on an empty array)
                    # must keep a NULL feature — hash(NULL) is a real
                    # int that could collide with a trained weight
                    F.when(F.col("__t").isNull(), F.lit(None))
                    .otherwise(_feature_index(F.col("__t"), n))
                    .alias("feature")))
    return (feat.join(F.broadcast(w), "feature", "left")
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("__w"),
                     F.col(id_col))
            .agg(F.sum("weight").alias("__m"))
            .select(F.col("__w.start").alias("window_start"),
                    F.col(id_col),
                    (F.lit(1.0)
                     / (F.lit(1.0)
                        + F.exp(-(F.coalesce(F.col("__m"), F.lit(0.0))
                                  + F.lit(b)))))
                    .alias("quality_prob")))
