"""Trained text-quality classifier (operators/classifier.py): the
FineWeb-Edu-style train-on-sample / score-the-corpus split."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.classifier import (
    load_classifier, save_classifier, score_text_classifier,
    train_text_classifier)

GOOD_WORDS = ["study", "method", "result", "theory", "measure",
              "evidence", "chapter", "analysis"]
BAD_WORDS = ["click", "winner", "free", "casino", "pills",
             "subscribe", "jackpot", "limited"]


def _labeled_corpus(spark, n=400, seed=7):
    """Deterministic separable corpus: label-1 docs draw mostly GOOD
    words, label-0 mostly BAD, with 20% crossover noise words."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        label = i % 2
        main, other = ((GOOD_WORDS, BAD_WORDS) if label
                       else (BAD_WORDS, GOOD_WORDS))
        words = [rng.choice(main if rng.random() > 0.2 else other)
                 for _ in range(30)]
        rows.append((i, " ".join(words), label))
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "label int")


def test_classifier_train_score_accuracy_and_portability(
        spark, tmp_path):
    corpus = _labeled_corpus(spark)
    train = corpus.where(F.col("doc_id") % 4 != 0)
    holdout = corpus.where(F.col("doc_id") % 4 == 0)
    model = train_text_classifier(train, "doc_id", "text", "label",
                                  num_features=2 ** 12)
    assert model["intercept"] == pytest.approx(model["intercept"])
    assert 0 < len(model["weights"]) <= 2 ** 12

    scored = score_text_classifier(holdout, "doc_id", "text", model)
    joined = scored.join(holdout.select("doc_id", "label"), "doc_id")
    acc = (joined.select(
        ((F.col("quality_prob") > 0.5).cast("int")
         == F.col("label")).cast("int").alias("ok"))
        .agg(F.avg("ok")).first()[0])
    assert acc >= 0.95, acc

    # portable: JSON round-trip scores identically
    p = str(tmp_path / "model.json")
    save_classifier(model, p)
    again = score_text_classifier(holdout, "doc_id", "text",
                                  load_classifier(p))
    a = {r.doc_id: r.quality_prob for r in scored.collect()}
    b = {r.doc_id: r.quality_prob for r in again.collect()}
    assert a == b


def test_classifier_scoring_matches_mllib_transform(spark):
    """The codegen scoring path must agree with spark.ml's own
    transform on the SAME hashed features — proves the broadcast-join
    sum + sigmoid is the model, not an approximation of it."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from wp_etl_migration_spark.operators.classifier import (
        _doc_features)

    corpus = _labeled_corpus(spark, n=200, seed=11)
    n = 2 ** 10
    model = train_text_classifier(corpus, "doc_id", "text", "label",
                                  num_features=n)
    scored = {r.doc_id: r.quality_prob for r in
              score_text_classifier(corpus, "doc_id", "text",
                                    model).collect()}

    # rebuild the exact training-side vectors and refit — same data,
    # same params ⇒ same model; transform gives reference P(1)
    feats = _doc_features(corpus, "doc_id", "text", n)

    @F.udf(returnType=VectorUDT())
    def to_vec(fs):
        return SparseVector(n, [f["feature"] for f in fs],
                            [f["tf"] for f in fs])

    rows = (feats.groupBy("doc_id")
            .agg(F.sort_array(F.collect_list(
                F.struct("feature", "tf"))).alias("fs"))
            .join(corpus.select("doc_id",
                                F.col("label").cast("double")
                                .alias("label")), "doc_id"))
    vecs = rows.select("doc_id", to_vec("fs").alias("features"),
                       "label")
    ref = LogisticRegression(regParam=1e-4, maxIter=50).fit(
        vecs.select("features", "label"))
    got = {r.doc_id: float(r.probability[1]) for r in
           ref.transform(vecs).select("doc_id", "probability")
           .collect()}
    for d, p in got.items():
        assert scored[d] == pytest.approx(p, abs=1e-9), d


def test_classifier_scoring_plan_is_codegen(spark):
    """The corpus path must carry no Python: no BatchEvalPython /
    ArrowEval in the scoring plan, weight join broadcast."""
    corpus = _labeled_corpus(spark, n=80, seed=3)
    model = train_text_classifier(corpus, "doc_id", "text", "label",
                                  num_features=2 ** 10)
    plan = (score_text_classifier(corpus, "doc_id", "text", model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan

    # empty/no-token docs score sigmoid(intercept), not null
    import math
    empty = spark.createDataFrame([(1, ""), (2, "!!! ...")],
                                  "doc_id long, text string")
    got = {r.doc_id: r.quality_prob for r in
           score_text_classifier(empty, "doc_id", "text",
                                 model).collect()}
    want = 1.0 / (1.0 + math.exp(-model["intercept"]))
    assert got[1] == pytest.approx(want) and \
        got[2] == pytest.approx(want)


def test_pinned_model_hash_and_no_collisions(spark):
    """Oracle-equivalence guard for the classifier_score driver row
    (queries.PINNED_QUALITY_MODEL): the DuckDB oracle joins on raw
    TOKENS (no Spark-murmur3 in DuckDB) while Spark scores through
    the real hashed-feature path, so equivalence requires (a) the
    pinned token→index map to match Spark's pmod(hash, N) exactly and
    (b) no OTHER corpus token to hash into a weighted index. Both are
    asserted here against the live test corpus every round."""
    from wp_etl_migration_spark.operators.classifier import (
        _feature_index, _tokens)
    from wp_etl_migration_spark.queries import (
        _CLF_IDX, PINNED_QUALITY_MODEL)

    n = PINNED_QUALITY_MODEL["num_features"]
    # (a) the pinned index map IS Spark's hash
    toks = spark.createDataFrame([(t,) for t in _CLF_IDX],
                                 "tok string")
    got = {r.tok: r.idx for r in toks.select(
        "tok", _feature_index(F.col("tok"), n).alias("idx"))
        .collect()}
    assert got == _CLF_IDX
    # (b) full corpus vocab: nothing outside _CLF_IDX hits a
    # weighted index (injectivity of the whole vocab is sufficient)
    from tests.conftest import SF_DIR
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab = (docs.select(F.explode(_tokens("text")).alias("tok"))
             .distinct()
             .select("tok", _feature_index(F.col("tok"), n)
                     .alias("idx")).collect())
    weighted = set(PINNED_QUALITY_MODEL["weights"])
    strays = {r.tok for r in vocab
              if r.idx in weighted and r.tok not in _CLF_IDX}
    assert not strays, strays


def test_fixed_point_margin_matches_float_path(spark):
    """classifier_margin_fixed_point is the same model as the sigmoid
    path: sigmoid(margin_fp/10^fp + intercept) ≈ quality_prob up to
    the weight-quantization step (weights here chosen exact in
    micro-units so equality is tight)."""
    import math
    from wp_etl_migration_spark.operators.classifier import (
        classifier_margin_fixed_point)

    model = {"weights": {5: 0.25, 9: -1.5, 12: 0.125},
             "intercept": -0.5, "num_features": 16}
    # token 'a' etc. hash wherever — use a synthetic feature frame by
    # picking tokens whose hashed index we read back from the engine
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
        "doc_id long, text string")
    from wp_etl_migration_spark.operators.classifier import (
        _feature_index, _tokens)
    idx = {r.tok: r.idx for r in df.select(
        F.explode(_tokens("text")).alias("tok")).distinct()
        .select("tok", _feature_index(F.col("tok"), 16).alias("idx"))
        .collect()}
    model["weights"] = {idx["alpha"]: 0.25, idx["beta"]: -1.5,
                        idx.get("gamma", 7): 0.125}
    fp = classifier_margin_fixed_point(df, "doc_id", "text", model,
                                       fixed_point=6)
    rows = {r.doc_id: r for r in fp.collect()}
    assert rows[1].margin_fp == 2 * 250000 - 1500000  # 2·alpha + beta
    assert rows[1].n_hits == 3
    assert rows[2].margin_fp == 0 and rows[2].n_hits == 0
    assert rows[3].margin_fp == 125000 and rows[3].n_hits == 1
    probs = {r.doc_id: r.quality_prob for r in score_text_classifier(
        df, "doc_id", "text", model).collect()}
    for d, r in rows.items():
        want = 1.0 / (1.0 + math.exp(
            -(r.margin_fp / 1e6 + model["intercept"])))
        assert probs[d] == pytest.approx(want, abs=1e-12), d


def test_fixed_point_margin_plan_is_codegen(spark):
    """The integer view keeps the corpus-path guarantees: no Python
    eval, broadcast weight join."""
    from wp_etl_migration_spark.operators.classifier import (
        classifier_margin_fixed_point)
    df = spark.createDataFrame([(1, "x y z")],
                               "doc_id long, text string")
    model = {"weights": {3: 1.0}, "intercept": 0.0,
             "num_features": 16}
    plan = (classifier_margin_fixed_point(df, "doc_id", "text", model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_classifier_rejects_foreign_tokenization(spark):
    model = {"weights": {0: 1.0}, "intercept": 0.0,
             "num_features": 16, "token_pattern": r"\s+ONLY"}
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="token_pattern"):
        score_text_classifier(df, "doc_id", "text", model)


def test_bootstrap_quality_gate_recipe(spark):
    """The one-call weak-label gate (VERDICT r13 #4): extremes around
    the median seed the labels, the gate keeps high-prob docs, and a
    degenerate seed (a class below min_class_size) declines to train
    and passes the frame through unchanged."""
    from wp_etl_migration_spark.operators.classifier import (
        bootstrap_quality_gate)

    corpus = _labeled_corpus(spark, n=300, seed=5)
    # heuristic quality correlated with the latent label but
    # continuous (a binary score would leave one side of the median
    # empty): good docs mostly above the median, bad mostly below,
    # label column dropped — the gate must rediscover the split
    scored = corpus.withColumn(
        "quality",
        F.col("label") * 0.4 + (F.col("doc_id") % 50) / 100.0) \
        .drop("label")
    gated, model = bootstrap_quality_gate(scored, "doc_id", "text",
                                          "quality")
    assert model is not None and model["weights"]
    kept = {r.doc_id for r in gated.select("doc_id").collect()}
    labels = {r.doc_id: r.label for r in
              _labeled_corpus(spark, n=300, seed=5)
              .select("doc_id", "label").collect()}
    good = [d for d, l in labels.items() if l == 1]
    bad = [d for d, l in labels.items() if l == 0]
    # permissive gate: keeps essentially all good docs, drops a real
    # fraction of the bad
    assert sum(d in kept for d in good) / len(good) >= 0.95
    assert sum(d in kept for d in bad) / len(bad) <= 0.5
    # schema passes through untouched
    assert gated.columns == scored.columns

    # degenerate seed: constant quality ⇒ no extremes ⇒ no-op
    flat = scored.withColumn("quality", F.lit(0.5))
    out, m = bootstrap_quality_gate(flat, "doc_id", "text", "quality")
    assert m is None
    assert out.count() == flat.count()
