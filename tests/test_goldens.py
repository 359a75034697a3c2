"""Pinned content-addressed goldens for the operators that have
neither a natural SQL oracle nor (until r7) a value-level contract:
token-weighted ``mix_corpora``, ``embedding_contamination``, and
``sideload_media`` (VERDICT r6 #9). Same contract style as
test_training_prep_all: values computed from the deterministic
content-addressed construction once, pinned as literals — any
semantic drift (hashing, threshold arithmetic, BLAS scoring path,
filename munging, fetch/skip/fail protocol) moves a pinned value and
fails here."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

# ------------------------------------------------- mix_corpora (tokens)

#: pinned at sf0.01, salt='golden7', web=doc_id%3!=0, code=doc_id%3==0,
#: proportions web 0.7 / code 0.3, token-weighted (token_count(text))
MIX_GOLDEN_SUMMARY = [("code", 131, 7506), ("web", 333, 17652)]
MIX_GOLDEN_HASH = "54bfb6211ac881d88fca9a2919cc8e19"


def test_mix_corpora_token_weighted_golden(spark):
    from wp_etl_migration_spark.operators.sampling import mix_corpora
    from wp_etl_migration_spark.operators.textstats import token_count
    docs = (spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet"))
        .withColumn("n_tokens", token_count("text")))
    web = docs.where(F.col("doc_id") % 3 != 0)
    code = docs.where(F.col("doc_id") % 3 == 0)
    mixed = mix_corpora({"web": web, "code": code}, "doc_id",
                        {"web": 0.7, "code": 0.3}, salt="golden7",
                        size_col="n_tokens")
    summary = sorted(
        (r.mix_source, r.rows, int(r.toks)) for r in
        mixed.groupBy("mix_source")
        .agg(F.count("*").alias("rows"),
             F.sum("n_tokens").alias("toks")).collect())
    assert summary == MIX_GOLDEN_SUMMARY
    # realized token share tracks the spec: 17652/25158 ≈ 0.702
    toks = {s: t for s, _, t in summary}
    share = toks["web"] / (toks["web"] + toks["code"])
    assert abs(share - 0.7) < 0.05
    # full kept-set membership is content-addressed: exact hash
    h = (mixed.select(F.md5(F.concat_ws(
        "|", "doc_id", "mix_source")).alias("h"))
        .agg(F.md5(F.concat_ws("", F.sort_array(
            F.collect_list("h")))).alias("H")).first().H)
    assert h == MIX_GOLDEN_HASH


# ------------------------------------- embedding_contamination (golden)

#: eval = vec_id<25 plus LEAKED corpus vectors 30/40/50; corpus =
#: vec_id>=25. At 0.95 exactly the leaks flag (sim 1.0); at 0.40 ten
#: corpus vectors flag — pinned by value hash (max_sim to 6 dp).
CONTAM_LEAK_GOLDEN = [(30, 1.0, 1), (40, 1.0, 1), (50, 1.0, 1)]
CONTAM_040_IDS = [30, 40, 50, 87, 234, 298, 340, 384, 402, 425]
CONTAM_040_HASH = "2b9660291827371d7e1d70462ff3bde4"


def test_embedding_contamination_golden(spark):
    from wp_etl_migration_spark.operators.similarity import (
        embedding_contamination)
    emb = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet"))
    ev = (emb.where(F.col("vec_id") < 25)
          .unionByName(emb.where(F.col("vec_id").isin(30, 40, 50)))
          .select("embedding"))
    corpus = emb.where(F.col("vec_id") >= 25)

    leaks = embedding_contamination(corpus, ev, "vec_id", "embedding",
                                    threshold=0.95)
    assert sorted((r.vec_id, round(r.max_sim, 6), r.n_matches)
                  for r in leaks.collect()) == CONTAM_LEAK_GOLDEN

    wide = embedding_contamination(corpus, ev, "vec_id", "embedding",
                                   threshold=0.4)
    rows = wide.collect()
    assert sorted(r.vec_id for r in rows) == CONTAM_040_IDS
    h = (wide.select(F.md5(F.concat_ws(
        "|", "vec_id",
        F.format_number(F.col("max_sim"), 6),
        "n_matches")).alias("h"))
        .agg(F.md5(F.concat_ws("", F.sort_array(
            F.collect_list("h")))).alias("H")).first().H)
    assert h == CONTAM_040_HASH


# ------------------------------------------- sideload_media (golden)

#: deterministic fake fetcher: md5(url) digest repeated 1+len(url)%4
#: times; URLs containing 'missing' raise. The full directory layout
#: (names, sizes, content md5s) is pinned.
SIDELOAD_LAYOUT_HASH = "d9f532472c587a9b8223e9793a5272df"
SIDELOAD_N_FILES = 11


def test_sideload_media_golden(spark, tmp_path):
    from wp_etl_migration_spark.sinks.media import sideload_media

    # defined in-test so cloudpickle ships it by VALUE (a test-module
    # global would pickle by reference to a module executors lack)
    def _fake_fetch(url: str, timeout_s: float) -> bytes:
        import hashlib as _h
        if "missing" in url:
            raise OSError(f"404: {url}")
        d = _h.md5(url.encode()).digest()
        return d * (1 + len(url) % 4)

    urls = ([(100 + i, f"http://cdn.example/assets/img-{i}.png?v={i%3}")
             for i in range(8)]
            + [(201, "http://cdn.example/a/hero.jpg"),
               (202, "http://cdn.example/b/hero.jpg"),  # same basename
               (203, "http://cdn.example/My Pic (2).jpg"),
               (204, "http://cdn.example/x/missing.gif")])
    dest = str(tmp_path / "media")
    out = sideload_media(spark.createDataFrame(urls, ["att_id", "url"]),
                         dest, fetcher=_fake_fetch,
                         max_retries=2, backoff_s=0.0)
    rows = {r.att_id: r for r in out.collect()}
    assert len(rows) == len(urls)
    # per-row protocol: bytes follow the fetcher arithmetic exactly;
    # same-basename rows keep distinct files via the att_id prefix
    assert rows[201].status == "downloaded" and rows[201].bytes == 32
    assert rows[202].status == "downloaded" and rows[202].bytes == 32
    assert rows[201].file == rows[202].file == "hero.jpg"
    assert rows[201].path != rows[202].path
    assert rows[203].file == "My-Pic-2-.jpg"
    assert rows[204].status == "failed" and rows[204].attempts == 2
    assert all(r.status == "downloaded" for i, r in rows.items()
               if 100 <= i < 200)

    def layout_hash():
        files = sorted(os.listdir(dest))
        layout = "|".join(
            f"{f}:{os.path.getsize(os.path.join(dest, f))}:"
            f"{hashlib.md5(open(os.path.join(dest, f), 'rb').read()).hexdigest()}"
            for f in files)
        return len(files), hashlib.md5(layout.encode()).hexdigest()

    n, h = layout_hash()
    assert (n, h) == (SIDELOAD_N_FILES, SIDELOAD_LAYOUT_HASH)
    # idempotent re-run: everything skips, layout bit-identical
    again = {r.att_id: r for r in sideload_media(
        spark.createDataFrame(urls, ["att_id", "url"]), dest,
        fetcher=_fake_fetch, max_retries=1, backoff_s=0.0).collect()}
    assert all(r.status == "skipped" for i, r in again.items()
               if i != 204)
    assert layout_hash() == (SIDELOAD_N_FILES, SIDELOAD_LAYOUT_HASH)
