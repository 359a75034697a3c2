"""Similarity search over embedding columns (LLM-pipeline extension).

``cosine_topk``          — brute-force all-pairs top-k: the correctness
baseline. O(N²·d); fine for probe sets, not for corpus×corpus at scale.

``cosine_topk_lsh``      — the scale path: random-hyperplane (SimHash)
bucketing; only vectors sharing a bucket are compared, turning the cross
join into a bucket-local join. Recall < 1.0 by construction — standard
ANN tradeoff; multiple hash tables raise recall.

Implementation note on the dot product: ``fold_dot`` (and its
signature-compatible alias ``unrolled_dot``) evaluates ``Σ a[i]*b[i]``
as a sequential ``aggregate(zip_with(...))`` fold — strict
left-to-right order, so the float math is bit-deterministic and
engine-portable (the DuckDB oracle's ``list_sum`` folds identically).
The literally-unrolled ``element_at`` chain this module used to build
measured SLOWER in every regime on this Spark line (see ``fold_dot``).
Hot N²-pairwise kernels don't use per-pair expressions at all: they go
through the Arrow/BLAS block cogroup, with the expression fold
reserved for candidate-bounded rescoring and parity-pinned outputs.
Norms are precomputed once per vector, not per pair.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fold_dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] as a sequential ``aggregate(zip_with(...))`` fold —
    strict left-to-right float order (the DuckDB oracle's ``list_sum ∘
    list_transform`` folds identically), constant expression size.

    Measured against the literally-unrolled ``element_at`` chain this
    module used to build: the fold is ~2× faster even for a SINGLE dot
    per projection (56 s vs 101 s over 10M 64-dim pair dots — the
    64-term tree is either janino-overflowed or dominated by per-term
    bounds checks), and at 8 stacked hyperplane dots the chain
    overflows janino outright, silently de-compiling the whole stage.
    The fold wins every regime on this Spark line; the chain is gone.
    """
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def unrolled_dot(a: Column, b: Column, dims: int) -> Column:
    """Bit-deterministic left-to-right dot — now an alias of
    :func:`fold_dot` (identical evaluation order, verified bit-equal
    across all 95 oracle-parity rows; see that docstring for the
    measurements). ``dims`` is kept for the SQL-oracle contract
    (oracles unroll ``range(1, dims+1)``)."""
    del dims
    return fold_dot(a, b)


def _dims(emb: DataFrame, vec_col: str) -> int:
    first = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not first:
        raise ValueError("empty embedding table")
    return first[0]["d"]


def _grid_cogroup(emb: DataFrame, qdf: DataFrame, id_col: str,
                  vec_col: str, grid: int | None):
    """Block-grid cogroup for exact pairwise kernels — no driver collect.

    Queries are hashed to ``grid`` row-blocks and replicated across the
    ``grid`` corpus column-blocks (and vice versa), then cogrouped on the
    (query-block, corpus-block) cell — the classic distributed block
    matrix multiply. Each task sees O(N/grid · d) of each side, so the
    kernel scales by adding cells, never by materializing the corpus on
    the driver or in a broadcast. Shuffled volume is N·grid rows per
    side (grid ≈ √parallelism keeps that a small constant multiplier).
    """
    spark = emb.sparkSession
    if grid is None:
        par = spark.sparkContext.defaultParallelism
        grid = max(2, int(par ** 0.5))
    cells = F.array(*[F.lit(i) for i in range(grid)])
    # Both sides' group keys MUST be int on both positions: one side's
    # pmod(long id) is long while the other side's exploded literal is
    # int, and Spark hash-partitions by TYPE-SENSITIVE Murmur3 — a
    # (long 0, int 0) key and an (int 0, long 0) key land in different
    # shuffle partitions and the cogroup silently pairs every group
    # with an EMPTY other side (zero results, no error). Invisible on
    # single-partition inputs, fatal on real ones.
    q = (qdf.select(F.col(id_col).alias("__qid"),
                    F.col(vec_col).cast("array<double>").alias("__qv"))
         .withColumn("__qb",
                     F.pmod(F.col("__qid"), F.lit(grid)).cast("int"))
         .withColumn("__cb", F.explode(cells)))
    c = (emb.select(F.col(id_col).alias("__cid"),
                    F.col(vec_col).cast("array<double>").alias("__cv"))
         .withColumn("__cb",
                     F.pmod(F.col("__cid"), F.lit(grid)).cast("int"))
         .withColumn("__qb", F.explode(cells)))
    return q.groupby("__qb", "__cb").cogroup(c.groupby("__qb", "__cb"))


def cosine_topk(emb: DataFrame, id_col: str, vec_col: str, k: int = 5,
                queries: DataFrame | None = None,
                grid: int | None = None) -> DataFrame:
    """Top-k cosine neighbors for each query vector (exact).

    ``queries`` defaults to the corpus itself (self-join, excluding the
    identity pair). Returns (query_id, neighbor_id, rank) — rank 1 is the
    nearest. Ties break on neighbor id for determinism.

    Execution: block-grid cogroup (see ``_grid_cogroup``) — each grid
    cell scores an Arrow batch of queries against one corpus block with
    a BLAS matmul (~100× a pairwise-expression cross join) and keeps a
    per-cell top-(k+margin); a window merge then ranks the per-cell
    candidates globally. Nothing corpus-sized ever reaches the driver or
    a broadcast, so the same plan runs at 100 TB by raising ``grid``.
    """
    import numpy as np
    import pandas as pd

    qdf = queries if queries is not None else emb

    def cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        qids = qpdf["__qid"].to_numpy()
        cids = cpdf["__cid"].to_numpy()
        qm = np.array(list(qpdf["__qv"]), dtype=np.float64)
        cm = np.array(list(cpdf["__cv"]), dtype=np.float64)
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        cm /= np.linalg.norm(cm, axis=1, keepdims=True)
        sims = qm @ cm.T                            # (q-block, c-block)
        # The global (sim desc, id) window does the exact ranking; the
        # cell must keep everything that could make the global top-k
        # UNDER THE SAME ORDER. argpartition on sims alone can drop a
        # tied candidate whose smaller id should win the tiebreak, so
        # select with the full (sim desc, id asc) lexsort — the cell's
        # first k+1 under that order is exactly what the window can ever
        # use from this cell (+1 absorbs the identity pair).
        order = np.lexsort(
            (np.broadcast_to(cids, sims.shape), -sims), axis=1)
        kk = min(k + 1, sims.shape[1])
        part = order[:, :kk]
        cand_ids = cids[part]                       # (q-block, kk)
        cand_sims = np.take_along_axis(sims, part, axis=1)
        keep = cand_ids != qids[:, None]            # drop identity pair
        return pd.DataFrame({
            "query_id": np.repeat(qids, keep.sum(axis=1)),
            "neighbor_id": cand_ids[keep],
            "sim": cand_sims[keep]})

    cand = _grid_cogroup(emb, qdf, id_col, vec_col, grid).applyInPandas(
        cell, schema="query_id long, neighbor_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def embedding_near_dup(emb: DataFrame, id_col: str, vec_col: str,
                       threshold: float = 0.95,
                       dims: int | None = None,
                       grid: int | None = None) -> DataFrame:
    """Near-duplicate vector pairs by cosine ≥ threshold (id_a < id_b).

    Exact all-pairs kernel. Returns (id_a, id_b, cos_sim). The dot
    product is an unrolled left-to-right chain (see module docstring) so
    the float value is bit-deterministic.

    Stage 1 — candidate generation: block-grid cogroup (see
    ``_grid_cogroup``), one BLAS matmul per cell, keeping pairs within a
    safety margin of the threshold; each unordered pair lands in exactly
    one cell so no dedup pass is needed. Stage 2 — exact rescoring
    JVM-side with the unrolled chain, so the emitted cos_sim is
    bit-identical to the naive definition (numpy's SIMD summation order
    only affects candidate *selection*, covered by the margin). Nothing
    corpus-sized reaches the driver or a broadcast; the rescore joins
    shuffle on the (tiny) candidate set and AQE broadcasts when small.
    """
    import numpy as np
    import pandas as pd

    if dims is None:
        dims = _dims(emb, vec_col)
    margin = 1e-9

    def cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        qids = qpdf["__qid"].to_numpy()
        cids = cpdf["__cid"].to_numpy()
        qm = np.array(list(qpdf["__qv"]), dtype=np.float64)
        cm = np.array(list(cpdf["__cv"]), dtype=np.float64)
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        cm /= np.linalg.norm(cm, axis=1, keepdims=True)
        sims = qm @ cm.T
        hit = (sims >= threshold - margin) & (cids[None, :] > qids[:, None])
        rows, cols = np.nonzero(hit)
        return pd.DataFrame({"id_a": qids[rows], "id_b": cids[cols]})

    cand = _grid_cogroup(emb, emb, id_col, vec_col, grid).applyInPandas(
        cell, schema="id_a long, id_b long")

    v = emb.select(F.col(id_col),
                   F.col(vec_col).cast("array<double>").alias("__v"))
    norm = F.sqrt(unrolled_dot(F.col("__v"), F.col("__v"), dims))
    vn = v.withColumn("__n", norm)
    sim = (unrolled_dot(F.col("__va"), F.col("__vb"), dims)
           / (F.col("__na") * F.col("__nb")))
    return (cand
            .join(vn.select(F.col(id_col).alias("id_a"),
                            F.col("__v").alias("__va"),
                            F.col("__n").alias("__na")), on="id_a")
            .join(vn.select(F.col(id_col).alias("id_b"),
                            F.col("__v").alias("__vb"),
                            F.col("__n").alias("__nb")), on="id_b")
            .withColumn("cos_sim", sim)
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))


def _grouped_topk(grouped: DataFrame, group_col: str, k: int) -> DataFrame:
    """Bucket-local exact top-k: one numpy matmul per group.

    ``grouped`` must have (group_col, __id, __v). Work and memory are
    per-group quadratic — the point of bucketing: at 100 TB the groups,
    not the corpus, bound the kernel. Ties break on neighbor id via a
    stable lexsort, matching a row_number ORDER BY sim DESC, id.
    """
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].to_numpy()
        mat = np.array(list(pdf["__v"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        np.fill_diagonal(sims, -np.inf)
        # Full (sim desc, id asc) lexsort selection — argpartition on
        # sims alone can drop a tied candidate whose smaller id should
        # win the row_number tiebreak.
        order = np.lexsort(
            (np.broadcast_to(ids, sims.shape), -sims), axis=1)
        out_q, out_n, out_r = [], [], []
        for row in range(len(ids)):
            cand = order[row]
            cand = cand[np.isfinite(sims[row, cand])][:k]
            out_q.extend([ids[row]] * len(cand))
            out_n.extend(ids[cand])
            out_r.extend(range(1, len(cand) + 1))
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "rank": np.array(out_r, dtype=np.int32)})

    return grouped.groupBy(group_col).applyInPandas(
        fn, schema="query_id long, neighbor_id long, rank int")


def ivf_topk(emb: DataFrame, id_col: str, vec_col: str, k: int = 5,
             num_centroids: int = 4096,
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF-style ANN: coarse-quantize to centroids, search within cells.

    Deterministic quantizer: a FIXED-SIZE hash sample of the corpus is
    the centroid set — the ``num_centroids`` vectors whose md5(id) sorts
    first (id tiebreak), picked with a top-K sort (TakeOrderedAndProject:
    each partition ships at most K rows to the driver). Centroid count —
    and hence the driver collect and the broadcast — is independent of N,
    so the operator scales to any corpus; production would swap in
    k-means, but the *query shape* is identical: (1) assign each vector
    to its nearest centroid (argmax cosine, centroid-id tiebreak) via a
    broadcast join against the small centroid set; (2) top-k search only
    among vectors sharing a cell (nprobe=1 ⇒ recall < 1, the standard
    IVF tradeoff — raise nprobe by assigning each query to its p nearest
    cells).

    Scale: the N×C assignment is broadcast (C ≪ N, C fixed); the search
    join shuffles on cell id — cells are ~N/C vectors so the quadratic
    term is (N/C)² per cell, not N².

    Pass ``centroids`` — a (cluster_id, centroid) frame, e.g. from
    :func:`kmeans_centroids` — to replace the hash-sample quantizer with
    fitted cells (same fixed-size collect, k rows).
    """
    import numpy as np
    import pandas as pd

    if centroids is not None:
        crows = [{id_col: r["cluster_id"], "v": r["centroid"]}
                 for r in centroids.collect()]
    else:
        crows = (emb.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(num_centroids)
            .collect())
    cids = np.array([r[id_col] for r in crows], dtype=np.int64)
    cmat = np.array([r["v"] for r in crows], dtype=np.float64)
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    spark = emb.sparkSession
    b_cids = spark.sparkContext.broadcast(cids)
    b_cmat = spark.sparkContext.broadcast(cmat)

    def assign(batches):
        ci, cm = b_cids.value, b_cmat.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["__v"]), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ cm.T
            # argmax with centroid-id tiebreak: stable lexsort picks the
            # smallest cid among equal sims.
            best = np.array([ci[np.lexsort((ci, -sims[r]))[0]]
                             for r in range(len(q))], dtype=np.int64)
            yield pd.DataFrame({"__id": pdf["__id"], "__v": pdf["__v"],
                                "__cell": best})

    src = emb.select(F.col(id_col).alias("__id"),
                     F.col(vec_col).cast("array<double>").alias("__v"))
    assigned = src.mapInPandas(
        assign, schema="__id long, __v array<double>, __cell long")
    return _grouped_topk(assigned, "__cell", k)


def _det_assign_cells(src: DataFrame, cmat, dims: int) -> DataFrame:
    """Deterministic nearest-centroid assignment: (__id, __v, __cell).

    Similarity is dot(v,c)/|c| accumulated DIMENSION-BY-DIMENSION (a
    left-to-right fold, never BLAS) so the float result — and therefore
    any tie — is bit-identical to the SQL oracle's ``list_sum`` fold;
    argmax takes the first max, so the smallest cluster index wins ties
    (mirroring ORDER BY sim DESC, cid). The |v| term is a per-row
    positive scale and is omitted. ``cmat`` rows are cluster 0..k-1.
    """
    import numpy as np
    import pandas as pd

    b = src.sparkSession.sparkContext.broadcast(np.asarray(cmat))

    def assign(batches):
        cm = b.value
        nrm = np.zeros(len(cm))
        for i in range(dims):                # dim-ordered, matches SQL
            nrm += cm[:, i] * cm[:, i]
        nrm = np.sqrt(nrm)
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["__v"]), dtype=np.float64)
            sims = np.zeros((len(q), len(cm)))
            for i in range(dims):            # left-to-right fold
                sims += q[:, i:i + 1] * cm[None, :, i]
            sims /= nrm[None, :]
            yield pd.DataFrame({
                "__id": pdf["__id"], "__v": pdf["__v"],
                "__cell": np.argmax(sims, axis=1).astype(np.int32)})

    return src.mapInPandas(
        assign, schema="__id long, __v array<double>, __cell int")


def kmeans_centroids(emb: DataFrame, id_col: str, vec_col: str,
                     k: int = 64, iters: int = 2,
                     dims: int | None = None) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — the
    production centroid provider for :func:`ivf_topk`.

    Init is the same deterministic md5(id) hash-sample as ``ivf_topk``
    (the first ``k`` vectors in md5 order), so the whole fit is seedless
    and reproducible. Each iteration: (1) broadcast the k×d centroid
    matrix; (2) assign every vector to its nearest centroid by spherical
    similarity dot(v,c)/|c| — the |v| term is a per-row positive scale
    that cannot change the argmax, so it is omitted; ties take the
    smallest cluster id; (3) recompute per-dimension means with DECIMAL
    sums (posexplode → one map-side-combinable agg), the same
    order-independence contract as :func:`cluster_centroids`. Empty
    clusters keep their previous centroid.

    Numeric determinism: similarity accumulates dimension-by-dimension
    (left-to-right, never BLAS) and means route through decimal(25,9),
    so the fit is bit-identical across partitionings AND engines — the
    DuckDB oracle unrolls the same iterations in SQL.

    Scale: driver/broadcast traffic is k×d doubles + k×d decimal sums
    per iteration — independent of corpus size; the per-iteration corpus
    work is one mapInPandas pass + one shuffle on (cluster, dim). The
    (id, vector) projection is pinned ONCE (r15,
    ``operators.checkpoint.pin`` — the Lloyd loop and the seed sample
    re-executed the scan+cast per iteration: ``iters``+1 source scans
    for a frame every iteration consumes unchanged; the mapInPandas
    boundary already sees only the two columns it needs, guide §4).

    Returns (cluster_id int, centroid array<double>, n_members long),
    n_members from the final assignment (0 for empty clusters).
    """
    import numpy as np
    import pandas as pd

    from wp_etl_migration_spark.operators.checkpoint import pin

    if dims is None:
        dims = _dims(emb, vec_col)
    spark = emb.sparkSession
    src = pin(emb.select(F.col(id_col).alias("__id"),
                         F.col(vec_col).cast("array<double>")
                         .alias("__v")), eager=False)
    seeds = (src.orderBy(F.md5(F.col("__id").cast("string")),
                         F.col("__id"))
             .limit(k).collect())
    cmat = np.array([r["__v"] for r in seeds], dtype=np.float64)
    n_clusters = len(cmat)
    counts = [0] * n_clusters

    for _ in range(iters):
        assigned = _det_assign_cells(src, cmat, dims)
        stats = (assigned
                 .select("__cell", F.posexplode("__v")
                         .alias("__pos", "__val"))
                 .groupBy("__cell", "__pos")
                 .agg(F.sum(F.col("__val").cast("decimal(25,9)"))
                      .alias("__s"),
                      F.count("*").alias("__n"))
                 .collect())                 # k×d rows — fixed size
        new = cmat.copy()
        counts = [0] * n_clusters
        for r in stats:
            # CAST(sum AS DOUBLE)/n in both engines: correctly-rounded
            # decimal→double, then one double division.
            new[r["__cell"], r["__pos"]] = float(r["__s"]) / r["__n"]
            counts[r["__cell"]] = r["__n"]
        cmat = new

    return spark.createDataFrame(
        [(cid, [float(x) for x in cmat[cid]], counts[cid])
         for cid in range(n_clusters)],
        schema="cluster_id int, centroid array<double>, n_members long")


def semantic_dedup(emb: DataFrame, id_col: str, vec_col: str,
                   k: int = 64, iters: int = 2, threshold: float = 0.35,
                   dims: int | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication: keep-list of ids after
    dropping embedding near-duplicates within k-means cells.

    Composition of the engine's own primitives (the SemDeDup recipe,
    Abbas et al. 2023, public): :func:`kmeans_centroids` fit →
    deterministic cell assignment (:func:`_det_assign_cells`) →
    cell-local exact cosine pairs ≥ ``threshold`` (one equi-join on the
    cell id — per-cell quadratic, never corpus-quadratic; the clustering
    is what makes semantic dedup tractable at 100 TB) → connected
    components → keep the min id per component plus every untouched id.

    Size ``k`` proportionally to the corpus so cells stay roughly
    constant (cells are ~N/k vectors; per-cell work is (N/k)²·d). The
    fit cost is linear in N per iteration regardless of k.

    Returns a one-column keep-list (``id_col``); anti-join the corpus
    against its complement to drop the duplicates.
    """
    from wp_etl_migration_spark.operators.graph import dedup_keep_list

    if dims is None:
        dims = _dims(emb, vec_col)
    cents = kmeans_centroids(emb, id_col, vec_col, k=k, iters=iters,
                             dims=dims)
    cmat = [r["centroid"]
            for r in sorted(cents.collect(),
                            key=lambda r: r["cluster_id"])]
    src = emb.select(F.col(id_col).alias("__id"),
                     F.col(vec_col).cast("array<double>").alias("__v"))
    assigned = _det_assign_cells(src, cmat, dims)
    norm = F.sqrt(unrolled_dot(F.col("__v"), F.col("__v"), dims))
    # Materialize once: the pair self-join traverses this frame twice,
    # and without the checkpoint each traversal re-runs the Python
    # assignment pass over the corpus.
    from wp_etl_migration_spark.operators.checkpoint import pin

    withn = pin(assigned.withColumn("__n", norm))

    # Cell-local pair stage, two-phase like embedding_near_dup:
    # (1) candidates via one BLAS matmul per cell (Arrow batch) with a
    # safety margin — the expression-per-pair equi-join this replaces
    # measured ~2.4× slower at 50k vectors (interpreted fold × 39M
    # pairs); (2) exact fold rescore on the candidate set only, so
    # pair MEMBERSHIP stays bit-deterministic (numpy's SIMD summation
    # order affects selection only, absorbed by the margin).
    import numpy as np
    import pandas as pd

    margin = 1e-9

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        ids = pdf["__id"].to_numpy()
        vm = np.array(list(pdf["__v"]), dtype=np.float64)
        nrm = np.linalg.norm(vm, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            vm = vm / nrm
        sims = vm @ vm.T
        hit = (sims >= threshold - margin) \
            & (ids[None, :] > ids[:, None])
        r, c = np.nonzero(hit)
        return pd.DataFrame({"id_a": ids[r], "id_b": ids[c]})

    cand = (withn.select("__cell", "__id", "__v")
            .groupBy("__cell")
            .applyInPandas(cell_pairs, schema="id_a long, id_b long"))
    sim = (unrolled_dot(F.col("__va"), F.col("__vb"), dims)
           / (F.col("__na") * F.col("__nb")))
    pairs = (cand
             .join(withn.select(F.col("__id").alias("id_a"),
                                F.col("__v").alias("__va"),
                                F.col("__n").alias("__na")), on="id_a")
             .join(withn.select(F.col("__id").alias("id_b"),
                                F.col("__v").alias("__vb"),
                                F.col("__n").alias("__nb")), on="id_b")
             .where(sim >= threshold)
             .select("id_a", "id_b"))
    return dedup_keep_list(emb.select(id_col), pairs, id_col)


def embedding_near_dup_lsh(emb: DataFrame, id_col: str, vec_col: str,
                           planes: list[list[float]],
                           threshold: float = 0.35,
                           dims: int | None = None) -> DataFrame:
    """Near-dup pairs within hyperplane buckets — the corpus-scale path.

    Same exact left-to-right cosine as ``embedding_near_dup`` but only
    bucket-local pairs are scored (one shuffle on the sign pattern), so
    cost is Σ bucket² instead of N². Recall < 1 by construction: a pair
    split by any hyperplane is missed — union several plane sets to
    recover recall, exactly as with ``cosine_topk_lsh``.

    Same two-phase kernel as ``embedding_near_dup``: one BLAS matmul
    per bucket generates candidates within a safety margin, then the
    exact sequential fold rescores them — the emitted ``cos_sim`` (and
    therefore pair membership) is bit-identical to the naive
    definition; only which pairs get *scored* depends on numpy, which
    the margin absorbs.

    Construct ``planes`` with :func:`seeded_planes`; caller-supplied
    families are rank-checked by :func:`validate_planes` (degenerate
    families raise — the r12 rank-2 sinusoid trap).
    """
    import numpy as np
    import pandas as pd

    validate_planes(planes)
    if dims is None:
        dims = _dims(emb, vec_col)
    margin = 1e-9
    v = emb.select(F.col(id_col),
                   F.col(vec_col).cast("array<double>").alias("__v"))
    norm = F.sqrt(unrolled_dot(F.col("__v"), F.col("__v"), dims))
    bucketed = (v.withColumn("__n", norm)
                .withColumn("__b",
                            hyperplane_bucket(F.col("__v"), planes,
                                              dims)))

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        ids = pdf[id_col].to_numpy()
        vm = np.array(list(pdf["__v"]), dtype=np.float64)
        nrm = np.linalg.norm(vm, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            vm = vm / nrm
        sims = vm @ vm.T
        hit = (sims >= threshold - margin) \
            & (ids[None, :] > ids[:, None])
        r, c = np.nonzero(hit)
        return pd.DataFrame({"id_a": ids[r], "id_b": ids[c]})

    cand = (bucketed.select("__b", F.col(id_col), "__v")
            .groupBy("__b")
            .applyInPandas(bucket_pairs, schema="id_a long, id_b long"))
    sim = (unrolled_dot(F.col("__va"), F.col("__vb"), dims)
           / (F.col("__na") * F.col("__nb")))
    return (cand
            .join(bucketed.select(F.col(id_col).alias("id_a"),
                                  F.col("__v").alias("__va"),
                                  F.col("__n").alias("__na")),
                  on="id_a")
            .join(bucketed.select(F.col(id_col).alias("id_b"),
                                  F.col("__v").alias("__vb"),
                                  F.col("__n").alias("__nb")),
                  on="id_b")
            .withColumn("cos_sim", sim)
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))


def validate_planes(planes: list[list[float]],
                    what: str = "planes") -> None:
    """Reject DEGENERATE hyperplane families at the driver, before
    any Spark job runs (VERDICT r12 #2).

    The failure class this guards: a plane family whose vectors span
    a subspace of rank r < min(n_planes, dims) cuts at most ~2·r sign
    regions however many planes it has, so bucket occupancy stops
    growing with the plane count and the bucket-local quadratic term
    (Σ bucket²) explodes with corpus size. The r12 sf10 decade study
    measured exactly this with a rank-2 phase-shifted sinusoid family
    (11 "planes" → 22 occupied buckets over 200k vectors, a 142×
    candidate-work penalty) — invisible at 2k bench scale, where ≤2p
    regions is plenty, and invisible to correctness checks, because
    the in-bucket rescore is exact either way. Use
    :func:`seeded_planes` to construct plane families; this check is
    what stops the same bug class re-entering through caller-supplied
    planes.

    Driver-side and cheap: one numpy ``matrix_rank`` over the plane
    LITERALS (an n_planes×dims float matrix — microseconds at any
    realistic plane count), no Spark job. Raises ``ValueError`` on
    rank < min(n_planes, dims); n_planes > dims is fine (rank can
    reach at most dims — the family is as spread as the space
    allows)."""
    import numpy as np
    try:
        mat = np.asarray(planes, dtype=float)
    except (ValueError, TypeError) as exc:
        raise ValueError(
            f"{what}: expected a non-empty list of equal-length "
            f"numeric plane vectors ({exc})") from exc
    if mat.ndim != 2 or 0 in mat.shape:
        raise ValueError(
            f"{what}: expected a non-empty list of equal-length plane "
            f"vectors, got shape {mat.shape}")
    n_planes, dims = mat.shape
    rank = int(np.linalg.matrix_rank(mat))
    need = min(n_planes, dims)
    if rank < need:
        raise ValueError(
            f"{what}: degenerate hyperplane family — numerical rank "
            f"{rank} < min(n_planes={n_planes}, dims={dims}). All "
            f"planes lie in a {rank}-D subspace, so they cut at most "
            f"~{2 * rank} sign regions regardless of plane count and "
            f"bucket sizes will not shrink as planes are added "
            f"(quadratic in-bucket blowup at corpus scale). Construct "
            f"planes with operators.similarity.seeded_planes().")


def random_projection(emb: DataFrame, id_col: str, vec_col: str,
                      planes: list[list[float]],
                      out_col: str = "projected",
                      fixed_point: int | None = None) -> DataFrame:
    """Johnson-Lindenstrauss random projection: (id, ``out_col``
    array<double> of ``len(planes)`` lanes), lane p =
    dot(vec, planes[p]) / sqrt(n_planes).

    The 100 TB use is cheap dimensionality reduction ahead of the
    similarity family — an 8- or 16-lane projection of a 1024-d
    embedding column cuts every downstream scan/shuffle/cache by the
    dim ratio while JL preserves pairwise distances within ~ε for
    k = O(log n / ε²) lanes. Map-only (zero shuffles), whole relation
    streams through one projection; the same ``fold_dot`` stacking as
    :func:`hyperplane_bucket`, so any lane count compiles (no janino
    overflow).

    Construct ``planes`` with :func:`seeded_planes` (full rank ⇒ no
    lane is a linear combination of others — wasted width);
    caller-supplied families are rank-checked by
    :func:`validate_planes`.

    ``fixed_point=d`` switches the lanes to engine-exact BIGINT
    fixed-point (the integer-PageRank discipline): each TERM rounds
    once — ``round(x·y·10^d / √k)`` is three IEEE ops on identical
    operands, so every engine produces the identical integer — and
    integers sum exactly and commutatively, where a 64-term FLOAT
    fold's total depends on the engine's summation order (measured:
    DuckDB's ``list_sum`` drifts from the sequential fold at ~1e-16
    absolute). The float path (default) is the production path; the
    fixed-point view is for cross-engine parity gates and
    reproducibility contracts. Per-term magnitude ≲ 10^d, so keep
    ``d ≤ 15`` for 64-dim longs (Σ < 2⁶³)."""
    validate_planes(planes)
    k = float(len(planes))
    v = F.col(vec_col).cast("array<double>")
    if fixed_point is None:
        lanes = [fold_dot(v, F.array(*[F.lit(float(x)) for x in p]))
                 / F.sqrt(F.lit(k)) for p in planes]
    else:
        s = F.lit(float(10 ** fixed_point))
        lanes = [
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(x)) for x in p]),
                           lambda x, y: F.round(
                               x * y * s / F.sqrt(F.lit(k)))
                           .cast("long")),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            for p in planes]
    return emb.select(F.col(id_col), F.array(*lanes).alias(out_col))


def seeded_planes(n_planes: int, dims: int,
                  seed: float = 12.9898) -> list[list[float]]:
    """Deterministic FULL-RANK hyperplane set for the LSH family —
    ``n_planes`` vectors of ``dims`` doubles, uniform-ish in [-1, 1),
    reproducible from the formula alone (SQL oracles embed the same
    literals; no RNG state to ship).

    The rank trap this replaces (found by the r12 sf10 ANN decade
    study): phase-shifted sinusoid families like
    ``sin(c1 + p·c2 + i·c3)`` LOOK independent but expand to
    ``sin(φ_p)·cos(c3·i) + cos(φ_p)·sin(c3·i)`` — EVERY plane lies in
    the 2-D span of {sin(c3·i), cos(c3·i)}, so p hyperplanes cut at
    most ~2p sign regions no matter how many you add. Bucket counts
    then stop growing with the plane count and Σ bucket² explodes
    quadratically with corpus size: measured 22 occupied buckets
    (max 27k rows) from 11 such "planes" over 200k vectors — a 142×
    candidate-work penalty vs this full-rank family (2047 buckets,
    max 454) and invisible at bench scale, where ≤2p regions is
    plenty for 2k vectors.

    Here each lane is an independent sin-hash (frac(sin(k)·43758.55),
    the classic shader-noise construction — public folklore): lanes
    decorrelate because k strides per (plane, lane), so the matrix is
    full rank (asserted in tests) and sign regions grow ~2^p until
    dims bounds them.
    """
    import math
    out = []
    for p in range(n_planes):
        row = []
        for i in range(dims):
            v = math.sin((p * dims + i + 1) * seed) * 43758.5453
            row.append((v % 1.0) * 2.0 - 1.0)
        out.append(row)
    return out


def hyperplane_bucket(vec: Column, planes: list[list[float]],
                      dims: int) -> Column:
    """SimHash bucket id: sign pattern of dot products against fixed
    hyperplanes, packed into a string of 0/1 bits.

    Uses :func:`fold_dot`: len(planes) dots stack in ONE projection
    here, which overflows janino as unrolled chains (silent codegen
    fallback, ~3× slower measured at 8 planes × 64 dims)."""
    del dims
    bits = [F.when(fold_dot(vec, F.array(*[F.lit(float(x)) for x in p]))
                   >= 0, "1").otherwise("0")
            for p in planes]
    return F.concat(*bits)


def plane_dots(vec: Column, planes: list[list[float]]) -> Column:
    """Per-plane signed margins as one array column. Materialize it
    with ``withColumn`` BEFORE deriving buckets/flip order from it —
    both :func:`probe_buckets_from_dots` references would otherwise
    re-fold every plane dot."""
    return F.array(*[
        fold_dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        for p in planes])


def probe_buckets_from_dots(dots: Column, n_planes: int,
                            n_probes: int) -> Column:
    """The ``n_probes`` hyperplane buckets a query searches, from its
    materialized :func:`plane_dots` column: its own bucket first, then
    the buckets reached by flipping its lowest-|margin| sign bits in
    margin order (multi-probe LSH, Lv et al. 2007 — public). Same
    sign convention as :func:`hyperplane_bucket` (>= 0 → "1"); the
    flipped strings are built with dynamic substr so the whole
    expansion stays JVM-side."""
    bucket = F.concat(*[
        F.when(F.element_at(dots, i + 1) >= 0, "1").otherwise("0")
        for i in range(n_planes)])
    if n_probes == 1:
        return F.array(bucket)
    order = F.array_sort(F.transform(
        dots, lambda d, i: F.struct(F.abs(d).alias("m"),
                                    i.alias("i"))))

    def flip(b: Column, bit_i: Column) -> Column:
        ch = b.substr(bit_i + F.lit(1), F.lit(1))
        return F.concat(
            b.substr(F.lit(1), bit_i),
            F.when(ch == "1", F.lit("0")).otherwise(F.lit("1")),
            b.substr(bit_i + F.lit(2), F.lit(n_planes)))

    return F.array(
        bucket,
        *[flip(bucket, F.element_at(order, j + 1)["i"])
          for j in range(n_probes - 1)])


def cosine_topk_lsh(emb: DataFrame, id_col: str, vec_col: str,
                    planes: list[list[float]], k: int = 5,
                    dims: int | None = None) -> DataFrame:
    """Approximate top-k: compare only within hyperplane buckets.

    ``planes`` must be a fixed (driver-provided, seeded) list so results
    are reproducible. One shuffle on bucket id; bucket sizes ≈ N/2^planes
    keep the quadratic term bounded. Scale note: for corpus×corpus at
    100 TB, combine several independent plane sets (hash tables) and
    union the candidates to recover recall.

    Construct ``planes`` with :func:`seeded_planes`; caller-supplied
    families are rank-checked by :func:`validate_planes` (degenerate
    families raise — the r12 rank-2 sinusoid trap).
    """
    validate_planes(planes)
    if dims is None:
        dims = _dims(emb, vec_col)
    v = emb.select(F.col(id_col).alias("__id"),
                   F.col(vec_col).cast("array<double>").alias("__v"))
    bucketed = v.withColumn(
        "__bucket", hyperplane_bucket(F.col("__v"), planes, dims))
    return _grouped_topk(bucketed, "__bucket", k)


def cluster_centroids(emb: DataFrame, comp: DataFrame, id_col: str,
                      vec_col: str, comp_col: str = "component"
                      ) -> DataFrame:
    """Mean embedding per cluster: (component, centroid array<double>).

    The representative-vector step after dedup clustering
    (operators/graph.connected_components): downstream keeps one
    centroid per near-dup cluster instead of every member. Execution is
    posexplode → per-(component, position) mean → array reassembly:
    two shuffles on uniform keys, map-side combinable, no vector ever
    leaves the executors. Sums are routed through DECIMAL so the mean
    is identical under any partitioning / aggregation order (the same
    determinism contract as the engine's other float aggregates).
    Scale 9: comfortably inside double precision for unit-scale floats,
    where every engine's double→decimal conversion rounds identically —
    at scale 15 the conversion sits at the precision edge and engines
    disagree by 1 ulp.
    """
    joined = (emb.select(F.col(id_col), F.col(vec_col).alias("__v"))
              .join(comp.select(F.col("node").alias(id_col),
                                F.col(comp_col)), on=id_col))
    exploded = joined.select(
        F.col(comp_col),
        F.posexplode(F.col("__v").cast("array<double>"))
        .alias("__pos", "__val"))
    means = (exploded.groupBy(comp_col, "__pos")
             .agg((F.sum(F.col("__val").cast("decimal(25,9)"))
                   .cast("double") / F.count("*")).alias("__mean")))
    return (means.groupBy(comp_col)
            .agg(F.array_sort(F.collect_list(F.struct("__pos", "__mean")))
                 .alias("__pm"))
            .select(F.col(comp_col),
                    F.col("__pm.__mean").alias("centroid")))


def _grouped_pairs(grouped: DataFrame, group_col: str,
                   k: int) -> DataFrame:
    """Bucket-local candidates WITH similarities: (query_id,
    neighbor_id, sim) for the top k+16 neighbors inside each bucket —
    the mergeable form multi-table LSH unions before the global rank."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].to_numpy()
        mat = np.array(list(pdf["__v"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        np.fill_diagonal(sims, -np.inf)
        # Same tie-safe (sim desc, id asc) selection as _grouped_topk.
        order = np.lexsort(
            (np.broadcast_to(ids, sims.shape), -sims), axis=1)
        kk = min(k + 16, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for row in range(len(ids)):
            cand = order[row][:kk]
            cand = cand[np.isfinite(sims[row, cand])]
            out_q.extend([ids[row]] * len(cand))
            out_n.extend(ids[cand])
            out_s.extend(sims[row, cand])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "sim": np.array(out_s, dtype=np.float64)})

    return grouped.groupBy(group_col).applyInPandas(
        fn, schema="query_id long, neighbor_id long, sim double")


def cosine_topk_multi_lsh(emb: DataFrame, id_col: str, vec_col: str,
                          plane_sets: list[list[list[float]]],
                          k: int = 5,
                          dims: int | None = None) -> DataFrame:
    """Multi-table hyperplane LSH: union the candidates of several
    independent plane sets, dedupe pairs, rank globally.

    The standard recall lever — a pair missed by one table's bucketing
    is found by another; recall approaches exact top-k as tables are
    added while per-table work stays Σ bucket². One shuffle per table
    plus the final per-query rank (partitioned by query id, k small).
    """
    from pyspark.sql import Window
    if not plane_sets:
        raise ValueError("at least one plane set required")
    for t, planes in enumerate(plane_sets):
        validate_planes(planes, what=f"plane_sets[{t}]")
    if dims is None:
        dims = _dims(emb, vec_col)
    v = emb.select(F.col(id_col).alias("__id"),
                   F.col(vec_col).cast("array<double>").alias("__v"))
    cands = None
    for planes in plane_sets:
        b = v.withColumn("__bucket",
                         hyperplane_bucket(F.col("__v"), planes, dims))
        c = _grouped_pairs(b, "__bucket", k)
        cands = c if cands is None else cands.unionByName(c)
    deduped = (cands.groupBy("query_id", "neighbor_id")
               .agg(F.max("sim").alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               "neighbor_id")
    return (deduped.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def quantize_embeddings(emb: DataFrame, id_col: str, vec_col: str,
                        bits: int = 8) -> DataFrame:
    """Per-vector symmetric scalar quantization of an embedding column —
    the storage/bandwidth lever for ANN at corpus scale (float32 → int8
    is 4× less to scan, shuffle, and cache; rescoring dequantizes only
    the candidate set).

    Returns (id, qvec array<int>, scale, max_abs_err): ``qvec[i] =
    floor(v[i]/scale + 0.5)`` with ``scale = max|v| / (2^(bits-1)-1)``;
    ``max_abs_err`` is the per-vector worst reconstruction error
    (``max|v - q·scale|`` ≤ scale/2 by construction — a self-auditing
    bound). All-zero vectors get scale 0 and an all-zero qvec.

    Map-only pass, no shuffle; transform()/aggregate() higher-order
    functions are CodegenFallback but stay linear per element — fine
    for a once-per-corpus compression pass (the hot N² kernels are the
    unrolled codegen chains above, not this).

    Determinism: float→double widening is exact; each lane is one
    divide + floor (round-half-up, engine-portable — unlike round(),
    whose half-even/half-up convention differs across engines).
    """
    qmax = float((1 << (bits - 1)) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(qmax)
    q = F.when(amax == 0.0,
               F.transform(v, lambda x: F.lit(0))) \
        .otherwise(F.transform(
            v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")))
    out = (emb.select(F.col(id_col), v.alias("__v"),
                      scale.alias("scale"))
           .withColumn("qvec", F.when(F.col("scale") == 0.0,
                                      F.transform(F.col("__v"),
                                                  lambda x: F.lit(0)))
                       .otherwise(F.transform(
                           F.col("__v"),
                           lambda x: F.floor(x / F.col("scale")
                                             + F.lit(0.5)).cast("int")))))
    err = F.array_max(F.zip_with(
        F.col("__v"), F.col("qvec"),
        lambda a, b: F.abs(a - b.cast("double") * F.col("scale"))))
    return out.select(F.col(id_col), "qvec", "scale",
                      err.alias("max_abs_err"))


def embedding_contamination(corpus: DataFrame, eval_df: DataFrame,
                            id_col: str, vec_col: str,
                            threshold: float = 0.95) -> DataFrame:
    """Embedding-space benchmark decontamination: corpus vectors whose
    cosine similarity to ANY eval-set vector reaches ``threshold`` —
    the semantic twin of the n-gram ``operators.dedup.contamination``
    gate (paraphrased benchmark questions share no 8-gram but sit next
    to the eval embedding; both gates run in real pipelines).

    Returns (id, max_sim, n_matches); callers anti-join the result
    against the corpus. The eval side (benchmark-sized) is collected
    and broadcast as ONE normalized matrix; the corpus streams through
    an Arrow/BLAS ``mapInPandas`` pass — no shuffle of corpus data at
    all, the scan is the entire cost (the same scale shape as the
    n-gram gate's broadcast join).
    """
    import numpy as np
    import pandas as pd

    rows = eval_df.select(vec_col).collect()
    if not rows:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, max_sim double, n_matches long")
    ev = np.array([r[0] for r in rows], dtype=np.float64)
    ev = ev / np.maximum(np.linalg.norm(ev, axis=1, keepdims=True),
                         1e-12)
    bc = corpus.sparkSession.sparkContext.broadcast(ev)

    def score(batches):
        e = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            m = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ e.T
            keep = sims.max(axis=1) >= threshold
            if keep.any():
                yield pd.DataFrame({
                    id_col: pdf[id_col].values[keep],
                    "max_sim": sims.max(axis=1)[keep],
                    "n_matches": (sims >= threshold).sum(axis=1)[keep],
                })

    return corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, max_sim double, n_matches long")


def _plane_tables(planes, tables: int) -> list:
    """Normalize the ``planes``×``tables`` contract: tables=1 keeps
    the single-set API (planes = list of plane vectors); tables=T>1
    takes planes as a list of T INDEPENDENT plane sets. Every plane in
    every set must share one vector dimensionality (a ragged set would
    make ``fold_dot`` silently truncate the dot product) and no set may
    be empty."""
    sets = [planes] if tables == 1 else list(planes)
    if tables != 1 and len(sets) != tables:
        raise ValueError(
            f"tables={tables} needs planes to be a list of {tables} "
            f"plane sets, got {len(sets)}")
    dims = {len(plane) for pset in sets for plane in pset}
    if any(not pset for pset in sets):
        raise ValueError("every plane set must contain >= 1 plane")
    if len(dims) != 1:
        raise ValueError(
            "all planes in all sets must share one dimensionality; "
            f"saw lengths {sorted(dims)}")
    for t, pset in enumerate(sets):
        validate_planes(pset, what=f"planes (table {t})"
                        if tables != 1 else "planes")
    return sets


def build_ann_index(emb: DataFrame, id_col: str, vec_col: str,
                    planes: list, tables: int = 1,
                    bits: int = 8) -> DataFrame:
    """Storable ANN index: (id, bucket, qvec, scale) — hyperplane
    bucket for candidate routing plus the int8-quantized vector for
    in-bucket rescoring. Write it to parquet once per corpus snapshot;
    incremental query batches then search it WITHOUT touching corpus
    float vectors (the embedding-side twin of the text family's
    ``lsh_bands`` / ``incremental_lsh_pairs`` stored-index pattern,
    4× smaller than a float index).

    ``planes`` must be the same fixed (seeded, driver-provided) list
    at build and query time.

    ``tables=T > 1`` (VERDICT r8 #7) stores T INDEPENDENT plane sets
    side by side — ``planes`` becomes a list of T sets, the output
    gains a ``table`` int column, and each vector is routed into one
    bucket PER table (one corpus scan; the per-table rows explode
    from an array literal). Independent tables are the recall lever
    for neighbors ≥ 2 sign-flips away, where single-set multi-probe
    plateaus (the r6 multi-probe curve tops out at 0.9746 recall@5) —
    a neighbor split from its query by several planes in one table is
    usually on the same side of another table's independent planes.
    Index size scales ×T (the qvec repeats per table — kept
    deliberately so the query join stays a single equi-join on
    (table, bucket) with no second lookup).

    Takedowns against a STORED copy of this index use the generic
    batch-index pair (``operators.dedup.tombstone_index`` to mask a
    deleted id set before querying, ``purge_index`` to physically
    rewrite the stored table) — the id column is the first argument's
    key, same contract as the digest/band tables.

    ``bits`` picks the rescore precision (default int8). Routing
    recall is the tables/probes lever; END-TO-END recall is capped by
    the rescore quantization — measured 0.969 at int8 on the 50k rig
    (BASELINE.md §r9). ``bits=16`` halves the storage saving (still
    2× under float32) and lifts the ceiling past 0.99; the query path
    is bits-agnostic (it dequantizes ``qvec·scale`` whatever the
    width)."""
    sets = _plane_tables(planes, tables)
    dims = len(sets[0][0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = quantize_embeddings(emb, id_col, vec_col, bits=bits)
    if tables == 1:
        buckets = emb.select(
            F.col(id_col),
            hyperplane_bucket(v, sets[0], dims).alias("bucket"))
        return buckets.join(q.select(id_col, "qvec", "scale"), id_col)
    routed = emb.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(t).cast("int").alias("table"),
                     hyperplane_bucket(v, s, dims).alias("bucket"))
            for t, s in enumerate(sets)])).alias("__tb")) \
        .select(id_col, F.col("__tb.table").alias("table"),
                F.col("__tb.bucket").alias("bucket"))
    return routed.join(q.select(id_col, "qvec", "scale"), id_col)


def prepare_ann_index(index: DataFrame, id_col: str, planes: list,
                      tables: int = 1) -> DataFrame:
    """Dequantize + norm a stored :func:`build_ann_index` frame ONCE
    into the shape :func:`query_ann_index` needs on its index side:
    ``(neighbor_id, [table,] bucket, __cv, __cn)`` — every other input
    column (``batch_id``, ``sub``) is preserved so callers can keep
    filtering after preparation.

    The dequantize transform is CodegenFallback (interpreted per
    element) and the norm folds ``dims`` multiplies per row — the two
    dominant costs of querying a large stored index. A caller that
    queries the SAME immutable index repeatedly (the continuous ANN
    loop's compacted runs — gen dirs are write-once) should prepare
    once, ``persist()`` the result, and pass it to
    ``query_ann_index(..., prepared=True)``: the r11 stationary soak
    measured ≈2 s/batch of slope from re-paying this per bulk batch
    (BASELINE.md §r11/§r12). Values are bit-identical either way —
    the same expressions run, just once instead of per batch."""
    sets = _plane_tables(planes, tables)
    dims = len(sets[0][0])
    deq = F.transform(F.col("qvec"),
                      lambda x: x.cast("double") * F.col("scale"))
    return (index.withColumnRenamed(id_col, "neighbor_id")
            .withColumn("__cv", deq)
            .withColumn("__cn", F.sqrt(
                unrolled_dot(F.col("__cv"), F.col("__cv"), dims)))
            .drop("qvec", "scale"))


def query_ann_index(queries: DataFrame, index: DataFrame,
                    id_col: str, vec_col: str,
                    planes: list, k: int = 5,
                    rescore: str = "arrow",
                    n_probes: int = 1,
                    tables: int = 1,
                    prepared: bool = False) -> DataFrame:
    """Top-k neighbors of a query batch against a stored
    :func:`build_ann_index` index. Returns (query_id, neighbor_id,
    sim, rank) — ``sim`` is cosine against the DEQUANTIZED neighbor
    (within scale/2-per-lane of the true value; exact rescoring needs
    the float corpus, which this index deliberately doesn't carry).

    Scale: queries bucket with the same planes; with the default
    ``n_probes=1`` a query belongs to exactly ONE bucket, so
    per-bucket top-k IS global top-k — Σ per-bucket cost, never
    queries × corpus. ``rescore`` picks the in-bucket kernel:

    - ``"arrow"`` (default) — bucket-cogrouped BLAS matmul, the fast
      path (~10× the expression chain on big buckets);
    - ``"expr"`` — per-pair left-to-right expression dot:
      bit-deterministic and engine-portable (what the SQL parity
      oracle reproduces), right when reproducibility outranks speed.

    ``n_probes`` is the recall lever (multi-probe LSH, Lv et al. 2007,
    public): a query near a hyperplane has neighbors on the other
    side, so probes 2..n also search the buckets reached by flipping
    the query's lowest-|margin| sign bits, in margin order. The query
    side fans out ``n_probes``× (the INDEX side and the store are
    untouched — this is a pure query-time knob on the same stored
    index), candidates from all probed buckets merge under one global
    (sim desc, neighbor id) rank. A corpus vector lives in exactly one
    bucket, so probes never produce duplicate candidates. Recall vs
    cost is measured at the 50k corpus in BASELINE.md (§ round 6).

    ``tables=T > 1`` (VERDICT r8 #7) queries an index built with the
    same ``tables``/``planes`` (a list of T independent plane sets):
    the query fans out into one bucket per table (× ``n_probes``), the
    candidate join keys on (table, bucket), and candidates are
    DEDUPLICATED across tables before the global rank merge (unlike
    probes within one table, independent tables CAN route the same
    corpus vector to a query twice). Independent tables recover the
    recall that single-set multi-probe leaves on the table — the
    misses ≥ 2 sign-flips away; measured at the 50k rig in
    BASELINE.md §r9.

    ``prepared=True`` takes ``index`` as a :func:`prepare_ann_index`
    frame (already dequantized + normed — typically persisted by a
    caller that queries the same immutable index every batch, r12):
    the per-batch cost then drops to the probed-bucket semi-join +
    the cogroup itself. Results are bit-identical to the raw path.
    """
    if rescore not in ("arrow", "expr"):
        raise ValueError("rescore must be 'arrow' or 'expr'")
    sets = _plane_tables(planes, tables)
    if not all(1 <= n_probes <= len(s) + 1 for s in sets):
        raise ValueError(
            "n_probes must be in [1, n_planes + 1] — probe 1 is the "
            "query's own bucket, further probes flip one sign bit "
            "each")
    dims = len(sets[0][0])
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qn = F.sqrt(unrolled_dot(F.col("__qv"), F.col("__qv"), dims))
    qside = queries.select(F.col(id_col).alias("query_id"),
                           qv.alias("__qv"))
    join_key = ["bucket"] if tables == 1 else ["table", "bucket"]
    if tables == 1 and n_probes == 1:
        qside = qside.withColumn(
            "bucket", hyperplane_bucket(F.col("__qv"), sets[0], dims))
    elif tables == 1:
        # Per-plane signed margins, computed ONCE into a materialized
        # array column — the probe expansion's bucket string and flip
        # order both derive from it (re-folding every plane dot per
        # reference would multiply the cost). Flip order = |margin|
        # asc (ties by plane index). Shared with the incremental ANN
        # store's sub-prune path via plane_dots/probe_buckets_from_dots.
        qside = (qside
                 .withColumn("__dots", plane_dots(F.col("__qv"),
                                                  sets[0]))
                 .withColumn("bucket", F.explode(
                     probe_buckets_from_dots(F.col("__dots"),
                                             len(sets[0]), n_probes)))
                 .drop("__dots"))
    else:
        # Multi-table fan-out: per table, the same probe expansion
        # over a MATERIALIZED per-table dots column (the plane_dots
        # contract — inlining would re-fold every dot per bucket bit),
        # tagged with the table id; one explode over the flattened
        # (table, bucket) pairs.
        if n_probes > 1:
            for t, s in enumerate(sets):
                qside = qside.withColumn(
                    f"__dots{t}", plane_dots(F.col("__qv"), s))
        def _tag(table_id: int):
            # MUST be a one-arg lambda: a second (defaulted) arg would
            # make F.transform bind it to the element INDEX.
            return lambda b: F.struct(
                F.lit(table_id).cast("int").alias("table"),
                b.alias("bucket"))

        per_table = []
        for t, s in enumerate(sets):
            buckets_t = (probe_buckets_from_dots(F.col(f"__dots{t}"),
                                                 len(s), n_probes)
                         if n_probes > 1
                         else F.array(hyperplane_bucket(
                             F.col("__qv"), s, dims)))
            per_table.append(F.transform(buckets_t, _tag(t)))
        qside = (qside
                 .withColumn("__tb", F.explode(
                     F.flatten(F.array(*per_table))))
                 .select("query_id", "__qv",
                         F.col("__tb.table").alias("table"),
                         F.col("__tb.bucket").alias("bucket")))
    qside = qside.withColumn("__qn", qn)
    # Probed-bucket pruning (r11): drop index rows whose bucket no
    # query probes BEFORE dequantization — the dequantize transform
    # is CodegenFallback (interpreted per element) and the arrow path
    # Arrow-ships every surviving row through the cogroup, so both
    # costs must be paid only for buckets that can produce a
    # candidate. The probed-bucket set is bounded by the query batch
    # (× probes × tables), the small side by the microbatch contract,
    # hence the broadcast — this is what keeps a small query batch
    # against a large stored index O(probed buckets), not O(index)
    # (measured 19.6 s → index-fraction-proportional on the sf1
    # stationary soak, BASELINE.md §r11). Results are identical:
    # rows outside probed buckets could never join (inner/cogroup
    # key mismatch) — they only burned dequantize + shuffle.
    if prepared:
        # Index already dequantized (prepare_ann_index); the semi-join
        # still prunes what the cogroup would otherwise Arrow-ship.
        iside = (index
                 .join(F.broadcast(qside.select(*join_key).distinct()),
                       join_key, "left_semi")
                 .select("neighbor_id", *join_key, "__cv", "__cn"))
    else:
        deq = F.transform(F.col("qvec"),
                          lambda x: x.cast("double") * F.col("scale"))
        iside = (index.select(F.col(id_col).alias("neighbor_id"),
                              *join_key, "qvec", "scale")
                 .join(F.broadcast(qside.select(*join_key).distinct()),
                       join_key, "left_semi")
                 .withColumn("__cv", deq)
                 .withColumn("__cn", F.sqrt(
                     unrolled_dot(F.col("__cv"), F.col("__cv"), dims)))
                 .drop("qvec", "scale"))
    # Zero-norm vectors have no cosine direction: excluded explicitly
    # (a NULL sim would sort nulls-last in Spark but nulls-first in
    # other engines — undefined ordering, not a neighbor).
    qside = qside.where(F.col("__qn") > 0)
    iside = iside.where(F.col("__cn") > 0)

    if rescore == "expr":
        joined = (qside.join(iside, join_key)
                  .where(F.col("query_id") != F.col("neighbor_id"))
                  .withColumn("sim",
                              unrolled_dot(F.col("__qv"),
                                           F.col("__cv"), dims)
                              / (F.col("__qn") * F.col("__cn"))))
        if tables > 1:
            # The same (query, neighbor) pair can arrive via several
            # tables (identical sim — same dequantized vector);
            # dedupe before ranking so rank positions stay unique.
            joined = (joined.groupBy("query_id", "neighbor_id")
                      .agg(F.max("sim").alias("sim")))
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                                   "neighbor_id")
        return (joined.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "sim", "rank"))

    import numpy as np
    import pandas as pd

    def cell(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "sim": [],
                 "rank": []})
        qm = np.array(list(qpdf["__qv"]), dtype=np.float64)
        cm = np.array(list(cpdf["__cv"]), dtype=np.float64)
        sims = (qm / np.linalg.norm(qm, axis=1, keepdims=True)) @ \
               (cm / np.linalg.norm(cm, axis=1, keepdims=True)).T
        qids = qpdf["query_id"].to_numpy()
        cids = cpdf["neighbor_id"].to_numpy()
        # Vectorized deterministic (sim desc, neighbor asc) top-k over
        # ALL queries at once — a per-query Python loop building one
        # pandas frame per query dominates wall clock on big buckets.
        # The identity pair is sunk to -inf so it can't displace a real
        # candidate, then dropped after selection (it always sorts
        # last, so kept ranks stay contiguous 1..m).
        ident = cids[None, :] == qids[:, None]
        sims = np.where(ident, -np.inf, sims)
        order = np.lexsort(
            (np.broadcast_to(cids, sims.shape), -sims), axis=1)
        kk = min(k, sims.shape[1])
        part = order[:, :kk]
        cand_ids = cids[part]
        cand_sims = np.take_along_axis(sims, part, axis=1)
        keep = cand_ids != qids[:, None]
        ranks = np.broadcast_to(np.arange(1, kk + 1),
                                cand_sims.shape)
        return pd.DataFrame({
            "query_id": np.repeat(qids, keep.sum(axis=1)),
            "neighbor_id": cand_ids[keep],
            "sim": cand_sims[keep],
            "rank": ranks[keep].astype("int32")})

    cand = (qside.groupby(*join_key)
            .cogroup(iside.groupby(*join_key))
            .applyInPandas(
                cell,
                schema="query_id long, neighbor_id long, sim double, "
                       "rank int"))
    if n_probes == 1 and tables == 1:
        return cand                 # one bucket per query: rank final
    if tables > 1:
        # Cross-table duplicates carry identical sims (same
        # dequantized vector); collapse before the global rank.
        cand = (cand.groupBy("query_id", "neighbor_id")
                .agg(F.max("sim").alias("sim")))
    # Merge the probed buckets' / tables' per-bucket top-k under one
    # global rank (within ONE table probes cannot duplicate — each
    # corpus vector is indexed in exactly one bucket per table).
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               "neighbor_id")
    return (cand.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "sim", "rank"))
