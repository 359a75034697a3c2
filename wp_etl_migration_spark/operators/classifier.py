"""Trained text-quality classifier (LLM-pipeline extension; no
counterpart in the reference, whose quality logic is static rules).

The modern corpus-curation pattern (FineWeb-Edu / fasttext-style):
train a LINEAR classifier on a small labeled sample ("educational" vs
not, clean vs spam), then score the whole corpus with it and gate on
the probability. Heuristic gates (``operators.gates`` + the Gopher
rules in ``operators.textstats``) catch pathologies; a trained
classifier captures the fuzzy quality signal the rules cannot.

Split by scale, which is the whole design:

- **Training** (:func:`train_text_classifier`) runs on the labeled
  SAMPLE — thousands to low millions of rows, bounded by labeling
  budget, never the corpus. Features are hashed bag-of-words
  (``pmod(hash(token), num_features)`` — Spark's codegen murmur3, NOT
  ml.HashingTF, whose internal hash differs and would chain scoring
  to the JVM vector path); the per-doc SparseVector assembly uses a
  row UDF, acceptable on a sample and NEVER on the corpus.
  Optimization is spark.ml LogisticRegression (JVM LBFGS).
- **Scoring** (:func:`score_text_classifier`) is the 100 TB path and
  stays whole-stage codegen end to end: explode tokens → hashed
  feature index → broadcast equi-join against the (index, weight)
  table (≤ num_features rows, model-sized) → one (id)-keyed sum →
  sigmoid. One uniform-keyed shuffle, no Python, no vectors.

The model is a plain dict (weights / intercept / num_features /
token_pattern) — JSON-serializable, engine-agnostic, and small enough
to broadcast anywhere.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tokenization shared verbatim by training and scoring — the two
#: sides MUST agree or scored features miss trained weights.
TOKEN_PATTERN = r"[^\p{L}\p{N}]+"


def _tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), TOKEN_PATTERN),
                    lambda t: t != "")


def _feature_index(token: Column, num_features: int) -> Column:
    """Hashed feature id: pmod(murmur3(token), N) via the codegen
    ``hash`` expression — identical at train and score time."""
    return F.pmod(F.hash(token), F.lit(num_features)).cast("int")


def _doc_features(df: DataFrame, id_col: str, text_col: str,
                  num_features: int) -> DataFrame:
    """(id, feature, tf) — the hashed bag-of-words, fully codegen."""
    return (df.select(F.col(id_col), F.explode(_tokens(text_col))
                      .alias("__t"))
            .select(id_col, _feature_index(F.col("__t"), num_features)
                    .alias("feature"))
            .groupBy(id_col, "feature")
            .agg(F.count("*").cast("double").alias("tf")))


def train_text_classifier(df: DataFrame, id_col: str, text_col: str,
                          label_col: str,
                          num_features: int = 2 ** 15,
                          reg_param: float = 1e-4,
                          elastic_net: float = 0.0,
                          max_iter: int = 50) -> dict:
    """Fit a logistic-regression quality classifier on a LABELED
    SAMPLE; returns the portable model dict for
    :func:`score_text_classifier` /
    :func:`save_classifier` — ``{"weights": {idx: w}, "intercept",
    "num_features", "token_pattern"}``.

    ``df`` is the labeled sample (``label_col`` ∈ {0, 1} — 1 = keep /
    high quality). The SparseVector assembly is a row UDF over
    collect_list — a deliberate sample-only slow path (the corpus
    never goes through here; scoring is UDF-free). Weights are
    returned sparse (zeros dropped — elastic_net > 0 shrinks the
    table further).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT

    feats = _doc_features(df, id_col, text_col, num_features)
    rows = (feats.groupBy(id_col)
            .agg(F.sort_array(F.collect_list(
                F.struct("feature", "tf"))).alias("fs"))
            .join(df.select(id_col,
                            F.col(label_col).cast("double")
                            .alias("__label")), id_col))

    @F.udf(returnType=VectorUDT())
    def to_vec(fs):
        return SparseVector(num_features,
                            [f["feature"] for f in fs],
                            [f["tf"] for f in fs])

    # pin: LBFGS makes one treeAggregate pass PER ITERATION over this
    # frame — without cutting lineage here, a deep upstream pipeline
    # (gates → dedup → LM …) re-executes max_iter times (observed: a
    # driver OOM from the stage flood in the curation example). The
    # frame is the bounded labeled sample, so materializing it is
    # cheap and correct.
    from wp_etl_migration_spark.operators.checkpoint import pin
    train = pin(rows.select(to_vec("fs").alias("features"),
                            F.col("__label").alias("label")))
    lr = LogisticRegression(regParam=reg_param,
                            elasticNetParam=elastic_net,
                            maxIter=max_iter, featuresCol="features",
                            labelCol="label")
    model = lr.fit(train)
    coefs = model.coefficients
    weights = {int(i): float(w) for i, w in enumerate(coefs.toArray())
               if w != 0.0}
    return {"weights": weights,
            "intercept": float(model.intercept),
            "num_features": int(num_features),
            "token_pattern": TOKEN_PATTERN}


def score_text_classifier(df: DataFrame, id_col: str, text_col: str,
                          model: dict,
                          out_col: str = "quality_prob") -> DataFrame:
    """(id, ``out_col``) — P(label=1) for every document, the corpus
    path: codegen tokenize/hash, broadcast join on the model-sized
    weight table, one (id)-keyed sum, sigmoid. Documents with no
    weighted token score sigmoid(intercept). One uniform shuffle;
    linear in corpus tokens; no Python anywhere in the plan."""
    if model.get("token_pattern") not in (None, TOKEN_PATTERN):
        raise ValueError(
            "model was trained with a different token_pattern; "
            "retrain or score with the matching engine version")
    spark = df.sparkSession
    n = int(model["num_features"])
    w = spark.createDataFrame(
        [(int(i), float(v)) for i, v in model["weights"].items()],
        "feature int, weight double")
    feats = _doc_features(df, id_col, text_col, n)
    margin = (feats.join(F.broadcast(w), "feature")
              .groupBy(id_col)
              .agg(F.sum(F.col("tf") * F.col("weight")).alias("__m")))
    b = float(model["intercept"])
    return (df.select(id_col).distinct()
            .join(margin, id_col, "left")
            .select(id_col,
                    (F.lit(1.0)
                     / (F.lit(1.0)
                        + F.exp(-(F.coalesce(F.col("__m"), F.lit(0.0))
                                  + F.lit(b))))).alias(out_col)))


def bootstrap_quality_gate(df: DataFrame, id_col: str, text_col: str,
                           quality_col: str,
                           dead_zone: float = 0.02,
                           min_class_size: int = 10,
                           keep_threshold: float = 0.2,
                           num_features: int = 2 ** 12,
                           **train_kw) -> tuple[DataFrame,
                                                dict | None]:
    """Weak-label classifier gate (FineWeb-Edu shape, one call):
    bootstrap labels from the corpus's own heuristic-quality extremes
    — label 1 at ``quality >= median + dead_zone``, label 0 at
    ``<= median − dead_zone`` (the dead zone keeps ambiguous middles
    out of the seed) — train :func:`train_text_classifier` on that
    SAMPLE, score every doc through the codegen path, and keep
    ``quality_prob >= keep_threshold``. At production scale the
    labels come from an LLM/human pass; the train-on-sample /
    score-the-corpus split is identical.

    Returns ``(gated_df, model)``; when either weak class has fewer
    than ``min_class_size`` docs the gate declines to train and
    returns ``(df, None)`` unchanged — a classifier fit on a
    degenerate seed would gate on noise.

    The input is :func:`~wp_etl_migration_spark.operators.checkpoint.
    pin`-ned first: this stage reads it several times (median probe,
    class counts, LBFGS passes, scoring), and each read of a deep
    curation pipeline (gates → dedup → LM …) would otherwise
    re-execute the whole upstream — the stage flood behind a driver
    OOM observed in the curation example before the cut."""
    from wp_etl_migration_spark.operators.checkpoint import pin

    df = pin(df)
    med = df.agg(F.percentile_approx(quality_col, 0.5)).first()[0] \
        or 0.0
    hi = df.where(F.col(quality_col) >= med + dead_zone) \
        .withColumn("__label", F.lit(1))
    lo = df.where(F.col(quality_col) <= med - dead_zone) \
        .withColumn("__label", F.lit(0))
    if hi.count() < min_class_size or lo.count() < min_class_size:
        return df, None
    model = train_text_classifier(hi.unionByName(lo), id_col,
                                  text_col, "__label",
                                  num_features=num_features,
                                  **train_kw)
    passing = (score_text_classifier(df, id_col, text_col, model)
               .where(F.col("quality_prob") >= keep_threshold)
               .select(id_col))
    return df.join(passing, id_col, "left_semi"), model


def classifier_margin_fixed_point(df: DataFrame, id_col: str,
                                  text_col: str, model: dict,
                                  fixed_point: int = 6) -> DataFrame:
    """(id, margin_fp, n_hits) — the engine-exact integer view of the
    classifier margin, for cross-engine verification and integer
    gating (the ``random_projection(fixed_point=...)`` discipline,
    taken one step further: because term frequencies are integers,
    the WEIGHTS can be quantized driver-side once —
    ``w_fp = round(w * 10^fixed_point)`` — and the whole scoring plan
    becomes pure BIGINT arithmetic: ``margin_fp = Σ tf · w_fp``. No
    float enters any engine, so no summation-order drift can either;
    a float margin fold's total depends on the engine's reduction
    order (~1e-16 drift measured vs DuckDB).

    ``n_hits`` is the integer count of weighted-token occurrences —
    docs with none are backfilled (0, 0) like the sigmoid path
    backfills sigmoid(intercept). Same plan shape as
    :func:`score_text_classifier`: codegen tokenize/hash, broadcast
    join on the model-sized integer weight table, one uniform
    (id)-keyed shuffle."""
    if model.get("token_pattern") not in (None, TOKEN_PATTERN):
        raise ValueError(
            "model was trained with a different token_pattern; "
            "retrain or score with the matching engine version")
    spark = df.sparkSession
    n = int(model["num_features"])
    scale = 10 ** int(fixed_point)
    w = spark.createDataFrame(
        [(int(i), int(round(float(v) * scale)))
         for i, v in model["weights"].items()],
        "feature int, w_fp long")
    feats = _doc_features(df, id_col, text_col, n) \
        .withColumn("tf", F.col("tf").cast("long"))
    margin = (feats.join(F.broadcast(w), "feature")
              .groupBy(id_col)
              .agg(F.sum(F.col("tf") * F.col("w_fp"))
                   .alias("margin_fp"),
                   F.sum("tf").alias("n_hits")))
    return (df.select(id_col).distinct()
            .join(margin, id_col, "left")
            .select(id_col,
                    F.coalesce("margin_fp", F.lit(0).cast("long"))
                    .alias("margin_fp"),
                    F.coalesce("n_hits", F.lit(0).cast("long"))
                    .alias("n_hits")))


def save_classifier(model: dict, path: str) -> None:
    """Model dict → JSON file (int keys serialized as strings; load
    restores them)."""
    with open(path, "w") as fh:
        json.dump(model, fh, sort_keys=True)


def load_classifier(path: str) -> dict:
    with open(path) as fh:
        m = json.load(fh)
    m["weights"] = {int(k): float(v) for k, v in m["weights"].items()}
    return m
