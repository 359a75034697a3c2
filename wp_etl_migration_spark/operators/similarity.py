"""Similarity search over embedding columns (LLM-pipeline extension).

``cosine_topk``          — brute-force all-pairs top-k: the correctness
baseline. O(N²·d); fine for probe sets, not for corpus×corpus at scale.

``cosine_topk_lsh``      — the scale path: random-hyperplane (SimHash)
bucketing; only vectors sharing a bucket are compared, turning the cross
join into a bucket-local join. Recall < 1.0 by construction — standard
ANN tradeoff; multiple hash tables raise recall.

Implementation note on the dot product: Spark's higher-order functions
(``zip_with``/``aggregate``) are CodegenFallback — interpreted per row —
which makes an N² pairwise kernel ~50× slower than it should be. For a
*fixed* dimensionality we instead unroll ``Σ a[i]*b[i]`` into an explicit
left-to-right addition chain of ``element_at`` terms, which whole-stage
codegen compiles to straight-line JVM arithmetic. Left-to-right order also
makes the float math bit-deterministic and engine-portable (the DuckDB
oracle's ``list_sum`` folds in the same order). Norms are precomputed once
per vector, not per pair.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def unrolled_dot(a: Column, b: Column, dims: int) -> Column:
    """Σ a[i]·b[i] as an unrolled, codegen-friendly, left-to-right chain."""
    terms = [F.element_at(a, i + 1) * F.element_at(b, i + 1)
             for i in range(dims)]
    return functools.reduce(operator.add, terms)


def _dims(emb: DataFrame, vec_col: str) -> int:
    first = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not first:
        raise ValueError("empty embedding table")
    return first[0]["d"]


def cosine_topk(emb: DataFrame, id_col: str, vec_col: str, k: int = 5,
                queries: DataFrame | None = None,
                dims: int | None = None) -> DataFrame:
    """Top-k cosine neighbors for each query vector (brute force).

    ``queries`` defaults to the corpus itself (self-join, excluding the
    identity pair). Returns (query_id, neighbor_id, rank) — rank 1 is the
    nearest. Ties break on neighbor id for determinism.
    """
    if dims is None:
        dims = _dims(emb, vec_col)

    def prep(df: DataFrame, id_alias: str, v_alias: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        out = df.select(F.col(id_col).alias(id_alias), v.alias(v_alias))
        norm = F.sqrt(unrolled_dot(F.col(v_alias), F.col(v_alias), dims))
        return out.withColumn(v_alias + "_norm", norm)

    corpus = prep(emb, "neighbor_id", "__cv")
    qdf = prep(queries if queries is not None else emb, "query_id", "__qv")
    sim = (unrolled_dot(F.col("__qv"), F.col("__cv"), dims)
           / (F.col("__qv_norm") * F.col("__cv_norm")))
    pairs = (qdf.crossJoin(F.broadcast(corpus))
             .where(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("__sim", sim))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def embedding_near_dup(emb: DataFrame, id_col: str, vec_col: str,
                       threshold: float = 0.95,
                       dims: int | None = None) -> DataFrame:
    """Near-duplicate vector pairs by cosine ≥ threshold (id_a < id_b).

    Brute-force O(N²) kernel — the correctness baseline; at corpus scale
    wrap the same similarity expression inside ``cosine_topk_lsh``-style
    hyperplane buckets so only bucket-local pairs are scored. Returns
    (id_a, id_b, cos_sim). The dot product is an unrolled left-to-right
    chain (see module docstring) so the float value is bit-deterministic.
    """
    if dims is None:
        dims = _dims(emb, vec_col)
    v = emb.select(F.col(id_col),
                   F.col(vec_col).cast("array<double>").alias("__v"))
    norm = F.sqrt(unrolled_dot(F.col("__v"), F.col("__v"), dims))
    vn = v.withColumn("__n", norm)
    a = vn.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va"),
                  F.col("__n").alias("__na"))
    b = vn.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"),
                  F.col("__n").alias("__nb"))
    sim = (unrolled_dot(F.col("__va"), F.col("__vb"), dims)
           / (F.col("__na") * F.col("__nb")))
    return (a.crossJoin(F.broadcast(b))
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cos_sim", sim)
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))


def ivf_topk(emb: DataFrame, id_col: str, vec_col: str, k: int = 5,
             centroid_stride: int = 100,
             dims: int | None = None) -> DataFrame:
    """IVF-style ANN: coarse-quantize to centroids, search within cells.

    Deterministic toy quantizer: every ``centroid_stride``-th vector (by
    id) is a centroid — production would run k-means, but the *query
    shape* is identical: (1) assign each vector to its nearest centroid
    (argmax cosine, centroid-id tiebreak) via a broadcast join against
    the small centroid set; (2) top-k search only among vectors sharing
    a cell (nprobe=1 ⇒ recall < 1, the standard IVF tradeoff — raise
    nprobe by assigning each query to its p nearest cells).

    Scale: the N×C assignment is broadcast (C ≪ N); the search join
    shuffles on cell id — cells are ~N/C vectors so the quadratic term
    is (N/C)² per cell, not N².
    """
    if dims is None:
        dims = _dims(emb, vec_col)
    v = emb.select(F.col(id_col),
                   F.col(vec_col).cast("array<double>").alias("__v"))
    v = v.withColumn("__n", F.sqrt(unrolled_dot(F.col("__v"), F.col("__v"),
                                                dims)))
    cents = (v.where(F.col(id_col) % centroid_stride == 0)
             .select(F.col(id_col).alias("__cid"),
                     F.col("__v").alias("__cv"),
                     F.col("__n").alias("__cn")))
    csim = (unrolled_dot(F.col("__v"), F.col("__cv"), dims)
            / (F.col("__n") * F.col("__cn")))
    wass = Window.partitionBy(id_col).orderBy(
        F.col("__csim").desc(), F.col("__cid"))
    assigned = (v.crossJoin(F.broadcast(cents))
                .withColumn("__csim", csim)
                .withColumn("__rn", F.row_number().over(wass))
                .where(F.col("__rn") == 1)
                .select(id_col, "__v", "__n", "__cid"))
    a = assigned.select(F.col(id_col).alias("query_id"),
                        F.col("__v").alias("__qv"),
                        F.col("__n").alias("__qn"), "__cid")
    b = assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col("__v").alias("__cv2"),
                        F.col("__n").alias("__cn2"), "__cid")
    sim = (unrolled_dot(F.col("__qv"), F.col("__cv2"), dims)
           / (F.col("__qn") * F.col("__cn2")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id"))
    return (a.join(b, on="__cid")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("__sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def hyperplane_bucket(vec: Column, planes: list[list[float]],
                      dims: int) -> Column:
    """SimHash bucket id: sign pattern of dot products against fixed
    hyperplanes, packed into a string of 0/1 bits."""
    bits = [F.when(unrolled_dot(vec, F.array(*[F.lit(float(x)) for x in p]),
                                dims) >= 0, "1").otherwise("0")
            for p in planes]
    return F.concat(*bits)


def cosine_topk_lsh(emb: DataFrame, id_col: str, vec_col: str,
                    planes: list[list[float]], k: int = 5,
                    dims: int | None = None) -> DataFrame:
    """Approximate top-k: compare only within hyperplane buckets.

    ``planes`` must be a fixed (driver-provided, seeded) list so results
    are reproducible. One shuffle on bucket id; bucket sizes ≈ N/2^planes
    keep the quadratic term bounded. Scale note: for corpus×corpus at
    100 TB, combine several independent plane sets (hash tables) and
    union the candidates to recover recall.
    """
    if dims is None:
        dims = _dims(emb, vec_col)
    v = emb.select(F.col(id_col),
                   F.col(vec_col).cast("array<double>").alias("__v"))
    norm = F.sqrt(unrolled_dot(F.col("__v"), F.col("__v"), dims))
    bucketed = (v.withColumn("__norm", norm)
                .withColumn("__bucket",
                            hyperplane_bucket(F.col("__v"), planes, dims)))
    a = bucketed.select(F.col(id_col).alias("query_id"),
                        F.col("__v").alias("__qv"),
                        F.col("__norm").alias("__qn"), "__bucket")
    b = bucketed.select(F.col(id_col).alias("neighbor_id"),
                        F.col("__v").alias("__cv"),
                        F.col("__norm").alias("__cn"), "__bucket")
    sim = (unrolled_dot(F.col("__qv"), F.col("__cv"), dims)
           / (F.col("__qn") * F.col("__cn")))
    pairs = (a.join(b, on="__bucket")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("__sim", sim))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))
