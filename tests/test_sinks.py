"""Unit tests for the sinks layer: file writers, ledger lineage, and the
staged upsert loader chain (SURVEY §2.2). Upsert stages additionally get
idempotency checks — re-running a migration must update, not duplicate
(the reference's operational correctness contract, SURVEY §5)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from wp_etl_migration_spark.sinks import files as fsink
from wp_etl_migration_spark.sinks import ledger as lsink
from wp_etl_migration_spark.sinks.wordpress import (
    featured_image_stage, media_stage, meta_stage, post_upsert_stage,
    run_stages, term_upsert_stage, terms_stage, user_upsert_stage)


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ----------------------------------------------------------------- files

def test_write_json_prefix_filter(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "x")], ["post.id", "post.title", "ledger.src"])
    path = str(tmp_path / "out")
    fsink.write_json(df, path, prefix="post.")
    back = spark.read.json(path)
    assert sorted(back.columns) == ["id", "title"]


def test_write_json_single_pretty(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    path = str(tmp_path / "out.json")
    fsink.write_json(df, path, single_file=True, pretty=True)
    data = json.load(open(path))
    assert data == [{"id": 1, "name": "a"}]


def test_write_json_single_file_guard(spark, tmp_path):
    """single_file collects to the driver: over-limit frames must raise
    BEFORE collecting everything; under-limit frames round-trip."""
    import pytest

    df = spark.range(10).withColumnRenamed("id", "n")
    path = str(tmp_path / "guard.json")
    with pytest.raises(ValueError, match="max_rows"):
        fsink.write_json(df, path, single_file=True, max_rows=5)
    assert not (tmp_path / "guard.json").exists()
    fsink.write_json(df, path, single_file=True, max_rows=10)
    assert sorted(r["n"] for r in json.load(open(path))) == list(range(10))


def test_destination_naming(tmp_path):
    fixed = fsink.destination(str(tmp_path), "posts", "json", overwrite=True)
    assert fixed.endswith("posts.json")
    stamped = fsink.destination(str(tmp_path), "posts", "json",
                                overwrite=False)
    assert not stamped.endswith("posts.json") and "posts-" in stamped


def test_write_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    path = str(tmp_path / "csv")
    fsink.write_csv(df, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 2


# ---------------------------------------------------------------- ledger

def test_ledger_write_and_latest(spark, tmp_path):
    df = lsink.with_uid(spark.createDataFrame(
        [(1, "t1"), (2, "t2")], ["id", "ledger.title"]))
    d = str(tmp_path)
    p1 = lsink.write_ledger(df, d, "posts")
    p2 = lsink.write_ledger(df, d, "posts")
    assert lsink.latest_ledger_path(d, "posts") == max(p1, p2)
    back = lsink.read_latest_ledger(spark, d, "posts")
    assert sorted(back.columns) == ["title", "uid"]
    assert back.count() == 2
    assert back.select("uid").distinct().count() == 2
    assert lsink.read_latest_ledger(spark, d, "absent") is None


# ------------------------------------------------------------ post stage

def _post_state(spark):
    posts = spark.createDataFrame(
        [(1, "alpha", "post", "old A"), (2, "beta", "post", "old B")],
        ["ID", "post_name", "post_type", "post_title"])
    incoming = spark.createDataFrame(
        [(None, "beta", "post", "new B"),      # match by (name, type)
         (None, "gamma", "post", "new C")],    # insert
        "`post.ID` long, `post.post_name` string, "
        "`post.post_type` string, `post.post_title` string")
    return {"incoming": incoming, "posts": posts}


def test_post_upsert_updates_and_inserts(spark):
    out = run_stages(_post_state(spark), [post_upsert_stage()])
    posts = out["posts"]
    assert rows(posts, "ID", "post_name", "post_title") == [
        (1, "alpha", "old A"), (2, "beta", "new B"), (3, "gamma", "new C")]
    # Stream mutation: every incoming row now has a resolved post.ID.
    got = {r["post.post_name"]: r["post.ID"]
           for r in out["incoming"].collect()}
    assert got == {"beta": 2, "gamma": 3}


def test_post_upsert_idempotent(spark):
    once = run_stages(_post_state(spark), [post_upsert_stage()])
    twice = run_stages({**once, "incoming": _post_state(spark)["incoming"]},
                       [post_upsert_stage()])
    assert rows(twice["posts"], "ID", "post_name", "post_title") == \
        rows(once["posts"], "ID", "post_name", "post_title")


# ------------------------------------------------------------ meta stage

def test_meta_stage_add_vs_update(spark):
    meta = spark.createDataFrame(
        [(2, "color", "red"), (2, "size", "L")],
        ["post_id", "meta_key", "meta_value"])
    incoming = spark.createDataFrame(
        [(2, "blue", "note1"), (3, "green", "note2")],
        ["post.ID", "meta.color", "meta.note.add"])
    out = run_stages({"incoming": incoming, "postmeta": meta},
                     [meta_stage()])
    assert rows(out["postmeta"], "post_id", "meta_key", "meta_value") == [
        (2, "color", "blue"),      # updated in place
        (2, "note", "note1"),      # added
        (2, "size", "L"),          # untouched
        (3, "color", "green"),     # update-mode on absent key inserts
        (3, "note", "note2")]


# ----------------------------------------------------------- terms stage

def test_terms_stage_replace_semantics(spark):
    rel = spark.createDataFrame(
        [(1, "category", "old"), (1, "post_tag", "keep"),
         (9, "category", "other")],
        ["post_id", "taxonomy", "term"])
    incoming = spark.createDataFrame(
        [(1, ["news", "tech"], "solo")],
        ["post.ID", "tax.category", "tax.post_tag"])
    out = run_stages({"incoming": incoming, "term_relationships": rel},
                     [terms_stage()])
    assert rows(out["term_relationships"],
                "post_id", "taxonomy", "term") == [
        (1, "category", "news"), (1, "category", "tech"),
        (1, "post_tag", "solo"),      # scalar coerced; old row replaced
        (9, "category", "other")]     # untouched post


# ------------------------------------------------------------ user stage

def test_user_two_pass_match(spark):
    users = spark.createDataFrame(
        [(1, "a@x.com", "alice", "Alice"),
         (2, "b@x.com", "bob", "Bob")],
        ["ID", "user_email", "user_login", "display_name"])
    incoming = spark.createDataFrame(
        [("a@x.com", "newlogin", "Alice2"),    # email match wins
         (None, "bob", "Bob2"),                # login fallback
         ("c@x.com", "carol", "Carol")],       # insert
        "`user.user_email` string, `user.user_login` string, "
        "`user.display_name` string")
    out = run_stages({"incoming": incoming, "users": users},
                     [user_upsert_stage()])
    assert rows(out["users"], "ID", "user_login", "display_name") == [
        (1, "alice", "Alice2"), (2, "bob", "Bob2"), (3, "carol", "Carol")]


# ------------------------------------------------------------ term stage

def test_term_upsert_creates_missing_parent(spark):
    terms = spark.createDataFrame(
        [(1, "existing", "Existing", "category")],
        ["term_id", "slug", "name", "taxonomy"])
    incoming = spark.createDataFrame(
        [(None, None, "Child Term", "category", "ghost-parent"),
         (None, "existing", "Existing", "category", None)],
        "`term.term_id` long, `term.slug` string, `term.name` string, "
        "`term.taxonomy` string, `term.parent_slug` string")
    out = run_stages({"incoming": incoming, "terms": terms},
                     [term_upsert_stage()])
    got = rows(out["terms"], "term_id", "slug", "taxonomy")
    # ghost-parent placeholder created (id 2), child inserted (id 3),
    # existing matched by slug — no duplicate.
    assert got == [(1, "existing", "category"),
                   (2, "ghost-parent", "category"),
                   (3, "child-term", "category")]


# ----------------------------------------------------------- media stage

def test_media_stage_dedupe_and_substitution(spark):
    atts = spark.createDataFrame(
        [(10, "hero.jpg"), (11, "pic-1.png")],
        ["ID", "file"])
    incoming = spark.createDataFrame(
        [("http://cdn/x/hero.jpg?v=2", "see %%media.featured.attachment_id%%"),
         ("http://cdn/y/pic.png", "b"),     # matches pic-1.png variant
         ("http://cdn/z/new.gif", "c")],    # genuinely new
        ["media.featured.url", "body"])
    out = run_stages({"incoming": incoming, "attachments": atts},
                     [media_stage(subst_cols=["body"])])
    ids = {r["media.featured.url"]: r["media.featured.attachment_id"]
           for r in out["incoming"].collect()}
    assert ids == {"http://cdn/x/hero.jpg?v=2": 10,
                   "http://cdn/y/pic.png": 11,
                   "http://cdn/z/new.gif": 12}
    assert rows(out["attachments"], "ID", "file") == [
        (10, "hero.jpg"), (11, "pic-1.png"), (12, "new.gif")]
    body = {r["media.featured.url"]: r["body"]
            for r in out["incoming"].collect()}
    assert body["http://cdn/x/hero.jpg?v=2"] == "see 10"


def test_sideload_media_download_skip_fail(spark, tmp_path):
    """≙ WPMediaLoader.php:433-503: new media bytes are fetched with
    retry; re-runs are idempotent (finished files skip); failures are
    reported per-row, not raised."""
    from wp_etl_migration_spark.sinks.media import sideload_media
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jpg").write_bytes(b"AAAA")
    (src / "b.png").write_bytes(b"BB")
    dest = str(tmp_path / "media")
    new_media = spark.createDataFrame(
        [(21, f"file://{src}/a.jpg"),
         (22, f"file://{src}/b.png?v=3"),
         (23, f"file://{src}/missing.gif")],
        ["att_id", "url"])
    out = sideload_media(new_media, dest, max_retries=2, backoff_s=0.01)
    got = {r.att_id: r for r in out.collect()}
    assert got[21].status == "downloaded" and got[21].bytes == 4
    assert got[22].status == "downloaded" and got[22].file == "b.png"
    assert got[23].status == "failed" and got[23].attempts == 2
    assert "missing" in got[23].error or "Error" in got[23].error
    assert open(got[21].path, "rb").read() == b"AAAA"
    assert not os.path.exists(os.path.join(dest, "23-missing.gif"))
    # Idempotent re-run: finished files are skipped, bytes unchanged.
    again = {r.att_id: r for r in
             sideload_media(new_media, dest, max_retries=1,
                            backoff_s=0.01).collect()}
    assert again[21].status == "skipped" and again[21].bytes == 4
    assert again[22].status == "skipped"
    assert again[23].status == "failed"


def test_media_stage_downloads_only_new(spark, tmp_path):
    """download_dir wiring: only anti-join survivors (genuinely new
    media) reach the writer — existing attachments never refetch."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "hero.jpg").write_bytes(b"OLD")
    (src / "new.gif").write_bytes(b"NEWBYTES")
    dest = str(tmp_path / "media")
    atts = spark.createDataFrame([(10, "hero.jpg")], ["ID", "file"])
    incoming = spark.createDataFrame(
        [(f"file://{src}/hero.jpg",), (f"file://{src}/new.gif",)],
        ["media.featured.url"])
    out = run_stages({"incoming": incoming, "attachments": atts},
                     [media_stage(download_dir=dest)])
    dls = out["media_downloads"].collect()
    assert [(r.att_id, r.file, r.status, r.bytes) for r in dls] == [
        (11, "new.gif", "downloaded", 8)]
    assert open(dls[0].path, "rb").read() == b"NEWBYTES"


def test_media_filename_fallback():
    from wp_etl_migration_spark.sinks.media import media_filename
    assert media_filename("http://cdn/x/My Pic (1).jpg?v=2") == "My-Pic-1-.jpg"
    assert media_filename("http://cdn/a/b.png") == "b.png"
    fb = media_filename("http://cdn/dir/")
    assert fb.startswith("sideloaded-file-") and len(fb) > len("sideloaded-file-")


# ------------------------------------------------- full WP_Post_All chain

def test_wp_post_all_chain(spark):
    """≙ Load Orchestrator.php:125-135: media → post → meta → terms, with
    row mutation flowing through every stage."""
    state = {
        "incoming": spark.createDataFrame(
            [(None, "hello", "post", "Hello",
              "http://cdn/img.png", "img=%%media.featured.attachment_id%%",
              ["news"])],
            "`post.ID` long, `post.post_name` string, "
            "`post.post_type` string, `post.post_title` string, "
            "`media.featured.url` string, `meta.img_note` string, "
            "`tax.category` array<string>"),
        "posts": spark.createDataFrame(
            [(7, "other", "post", "Other")],
            ["ID", "post_name", "post_type", "post_title"]),
        "attachments": spark.createDataFrame([(3, "old.png")],
                                             ["ID", "file"]),
        "postmeta": spark.createDataFrame(
            [], "post_id long, meta_key string, meta_value string"),
        "term_relationships": spark.createDataFrame(
            [], "post_id long, taxonomy string, term string"),
    }
    out = run_stages(state, [
        media_stage(subst_cols=["meta.img_note"]),
        post_upsert_stage(),
        meta_stage(),
        terms_stage(),
    ])
    assert rows(out["posts"], "ID", "post_name") == [
        (7, "other"), (8, "hello")]
    assert rows(out["attachments"], "ID", "file") == [
        (3, "old.png"), (4, "img.png")]
    meta = rows(out["postmeta"], "post_id", "meta_key", "meta_value")
    assert (8, "img_note", "img=4") in meta
    assert rows(out["term_relationships"],
                "post_id", "taxonomy", "term") == [(8, "category", "news")]


def test_featured_image_stage_links_thumbnail(spark):
    """media → post → featured chain (≙ WordPressPostLoader.php:109-117
    set_post_thumbnail): the sideloaded attachment becomes the post's
    ``_thumbnail_id`` meta and ``post.featured_media``; posts without
    featured media are untouched; a re-run is idempotent."""
    state = {
        "incoming": spark.createDataFrame(
            [(None, "hello", "post", "Hello", "http://cdn/img.png"),
             (None, "plain", "post", "Plain", None)],
            "`post.ID` long, `post.post_name` string, "
            "`post.post_type` string, `post.post_title` string, "
            "`media.featured.url` string"),
        "posts": spark.createDataFrame(
            [(7, "other", "post", "Other")],
            ["ID", "post_name", "post_type", "post_title"]),
        "attachments": spark.createDataFrame([(3, "old.png")],
                                             ["ID", "file"]),
        "postmeta": spark.createDataFrame(
            [(7, "color", "red")],
            "post_id long, meta_key string, meta_value string"),
    }
    stages = [media_stage(), post_upsert_stage(), featured_image_stage()]
    out = run_stages(state, stages)
    inc = {r["post.post_name"]: r for r in out["incoming"].collect()}
    assert inc["hello"]["post.featured_media"] == 4   # minted att id
    assert inc["plain"]["post.featured_media"] is None
    meta = rows(out["postmeta"], "post_id", "meta_key", "meta_value")
    hello_id = inc["hello"]["post.ID"]
    assert (hello_id, "_thumbnail_id", "4") in meta
    assert (7, "color", "red") in meta                # untouched
    assert len([m for m in meta if m[1] == "_thumbnail_id"]) == 1
    # idempotent: running the chain again converges to the same rows
    again = run_stages(
        {**out, "incoming": state["incoming"]}, stages)
    meta2 = sorted(rows(again["postmeta"],
                        "post_id", "meta_key", "meta_value"))
    assert meta2 == sorted(meta)


def test_term_upsert_duplicate_new_slug_mints_once(spark):
    """Two incoming rows with the same NEW slug+taxonomy share ONE
    minted term (the reference's sequential probe creates then finds);
    the terms table gains a single row."""
    terms = spark.createDataFrame(
        [(1, "old", "Old", "category", None)],
        "term_id long, slug string, name string, taxonomy string, "
        "parent string")
    incoming = spark.createDataFrame(
        [("fresh", "Fresh", "category"), ("fresh", "Fresh", "category")],
        "`term.slug` string, `term.name` string, `term.taxonomy` string") \
        .withColumn("term.term_id", F.lit(None).cast("long")) \
        .withColumn("term.parent_slug", F.lit(None).cast("string"))
    out = run_stages({"incoming": incoming, "terms": terms},
                     [term_upsert_stage()])
    ids = [r["term.term_id"] for r in out["incoming"].collect()]
    assert len(ids) == 2 and len(set(ids)) == 1  # both rows, one term
    fresh = out["terms"].where(F.col("slug") == "fresh").collect()
    assert len(fresh) == 1 and fresh[0].term_id == ids[0]


def test_post_upsert_duplicate_new_name_mints_once(spark):
    """Two incoming rows with the same NEW (name, type) share one minted
    post; rows with NULL name mint per-row (never probe-findable)."""
    posts = spark.createDataFrame(
        [(1, "alpha", "post", "A")],
        ["ID", "post_name", "post_type", "post_title"])
    incoming = spark.createDataFrame(
        [(None, "dup", "post", "first"),
         (None, "dup", "post", "second"),
         (None, None, "post", "anon1"),
         (None, None, "post", "anon2")],
        "`post.ID` long, `post.post_name` string, "
        "`post.post_type` string, `post.post_title` string")
    out = run_stages({"incoming": incoming, "posts": posts},
                     [post_upsert_stage()])
    ids = {r["post.post_title"]: r["post.ID"]
           for r in out["incoming"].collect()}
    assert ids["first"] == ids["second"]          # shared minted post
    assert ids["anon1"] != ids["anon2"]           # null name: per-row
    assert out["posts"].where(F.col("post_name") == "dup").count() == 1


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """Shard dirs + manifest: every row lands in exactly one shard, the
    in-shard order equals the shuffle position order, counts add up,
    and a re-run is byte-identical in membership and order."""
    import json as _json
    from wp_etl_migration_spark.sinks.training import write_training_shards
    from pyspark.sql import functions as F
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tokens"))
    path = str(tmp_path / "shards")
    man = write_training_shards(df, path, "doc_id", n_shards=4,
                                salt="v1", tokens_col="n_tokens")
    assert man["n_rows"] == 500 and len(man["shards"]) == 4
    assert sum(s["rows"] for s in man["shards"].values()) == 500
    assert sum(s["tokens"] for s in man["shards"].values()) == \
        sum((i % 7) + 1 for i in range(500))
    on_disk = _json.load(open(f"{path}/_manifest.json"))
    assert on_disk["n_rows"] == 500

    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
    # in-shard parquet order follows pos (sortWithinPartitions)
    s0 = spark.read.parquet(f"{path}/shard=0").collect()
    poss = [r.pos for r in s0]
    assert poss == sorted(poss)

    # determinism: re-export to a different dir, same membership+order
    path2 = str(tmp_path / "shards2")
    man2 = write_training_shards(df, path2, "doc_id", n_shards=4,
                                 salt="v1", tokens_col="n_tokens")
    a = sorted(map(tuple, spark.read.parquet(path).collect()))
    b = sorted(map(tuple, spark.read.parquet(path2).collect()))
    assert a == b
    # ...and the manifests alone prove it (membership_hash per shard)
    assert man2 == man
    assert all("membership_hash" in s for s in man["shards"].values())
    # a different salt reshards: membership hashes must move
    man3 = write_training_shards(df, str(tmp_path / "shards3"),
                                 "doc_id", n_shards=4, salt="v2",
                                 tokens_col="n_tokens")
    assert {s["membership_hash"] for s in man3["shards"].values()} != \
        {s["membership_hash"] for s in man["shards"].values()}


def test_write_training_shards_jsonl_gzip(spark, tmp_path):
    """fmt='json' + gzip produces the JSONL(.gz) layout dataloader
    stacks stream: same shard membership/order/manifest as parquet,
    files gzip-compressed, rows JSON-parseable line by line."""
    import glob
    import gzip
    import json as _json
    from wp_etl_migration_spark.sinks.training import (
        write_training_shards)
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        (F.col("id") % 5 + 1).alias("n_tokens"))
    p_par = str(tmp_path / "par")
    p_jl = str(tmp_path / "jl")
    man_par = write_training_shards(df, p_par, "doc_id", n_shards=3,
                                    salt="v1", tokens_col="n_tokens")
    man_jl = write_training_shards(df, p_jl, "doc_id", n_shards=3,
                                   salt="v1", tokens_col="n_tokens",
                                   fmt="json", compression="gzip")
    assert man_jl == man_par

    back = spark.read.json(p_jl)
    a = sorted(map(tuple, spark.read.parquet(p_par)
                   .select("doc_id", "text", "n_tokens", "pos",
                           "shard").collect()))
    b = sorted(map(tuple, back
                   .select("doc_id", "text", "n_tokens", "pos",
                           "shard").collect()))
    assert a == b
    # a plain dataloader (no Spark) can stream a shard line by line
    files = sorted(glob.glob(f"{p_jl}/shard=0/*.json.gz"))
    assert files
    rows = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            rows += [_json.loads(line) for line in fh]
    assert rows and all(r["text"].startswith("doc ") for r in rows)
    assert [r["pos"] for r in rows] == sorted(r["pos"] for r in rows)


def test_verify_training_shards(spark, tmp_path):
    """Reader-side export verification: a clean export verifies ok; a
    tampered shard (rows removed behind the manifest's back) is
    pinpointed by shard with both the count and membership-hash
    deltas; a missing manifest fails loudly."""
    from wp_etl_migration_spark.sinks.training import (
        verify_training_shards, write_training_shards)
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3 + 1).alias("n_tokens"))
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=3, salt="v1",
                          tokens_col="n_tokens")
    res = verify_training_shards(spark, path, "doc_id")
    assert res["ok"] and not res["mismatches"]

    # tamper: rewrite shard 1 with a row dropped
    s1 = spark.read.parquet(f"{path}/shard=1")
    victim = s1.orderBy("pos").first().doc_id
    kept = s1.where(F.col("doc_id") != victim).collect()
    import shutil
    shutil.rmtree(f"{path}/shard=1")
    spark.createDataFrame(kept, s1.schema) \
        .write.parquet(f"{path}/shard=1")
    res2 = verify_training_shards(spark, path, "doc_id")
    assert not res2["ok"]
    assert list(res2["mismatches"]) == [1]
    assert "rows" in res2["mismatches"][1]
    assert "membership_hash" in res2["mismatches"][1]

    # no manifest
    res3 = verify_training_shards(spark, str(tmp_path / "nowhere"),
                                  "doc_id")
    assert not res3["ok"] and res3.get("error") == "no _manifest.json"


def test_prune_ledgers_retention(spark, tmp_path):
    """Ledger retention: old timestamped ledger dirs prune down to
    keep_last, the latest always survives (and still reads), and
    keep_last=0 is rejected."""
    import pytest as _pytest

    df = lsink.with_uid(spark.createDataFrame(
        [(1, "t1")], ["id", "ledger.title"]))
    d = str(tmp_path)
    paths = [lsink.write_ledger(df, d, "posts") for _ in range(5)]
    latest = lsink.latest_ledger_path(d, "posts")
    deleted = lsink.prune_ledgers(d, "posts", keep_last=2)
    assert len(deleted) == 3
    assert latest not in deleted
    assert lsink.latest_ledger_path(d, "posts") == latest
    assert lsink.read_latest_ledger(spark, d, "posts").count() == 1
    with _pytest.raises(ValueError, match="keep_last"):
        lsink.prune_ledgers(d, "posts", keep_last=0)
    # unknown job: no-op
    assert lsink.prune_ledgers(d, "ghost") == []


def test_prune_ledgers_hadoop_fs(spark, tmp_path):
    """With a SparkSession, listing/deletion go through the Hadoop
    FileSystem API (ADVICE r10: a remote ledger_dir made the local
    glob silently delete nothing) — same retention outcome, run
    paths resolve on the FS write_ledger used."""
    import os

    df = lsink.with_uid(spark.createDataFrame(
        [(1, "t1")], ["id", "ledger.title"]))
    d = str(tmp_path)
    for _ in range(4):
        lsink.write_ledger(df, d, "posts")
    latest_local = lsink.latest_ledger_path(d, "posts")
    latest_fs = lsink.latest_ledger_path(d, "posts", spark=spark)
    # Hadoop FS returns full URIs; must point at the same run dir
    assert latest_fs.endswith(os.path.basename(latest_local))
    deleted = lsink.prune_ledgers(d, "posts", keep_last=1, spark=spark)
    assert len(deleted) == 3
    assert not any(p.endswith(os.path.basename(latest_local))
                   for p in deleted)
    # the survivors really are pruned on disk, and the latest reads
    assert len([n for n in os.listdir(d)
                if n.startswith("posts-ledger-")]) == 1
    assert lsink.read_latest_ledger(spark, d, "posts").count() == 1
    assert lsink.prune_ledgers(d, "ghost", spark=spark) == []


def test_purge_training_shards_rewrites_only_affected(spark, tmp_path):
    """Right-to-be-forgotten purge of a written export: the affected
    shard set is computed from the ids alone (content-addressed
    membership), only those shard dirs are rewritten (mtimes of
    untouched shards don't move), the manifest is recomputed, and the
    export still passes verify_training_shards. Idempotent: a second
    purge of the same ids removes nothing further."""
    import os

    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, verify_training_shards,
        write_training_shards)
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5 + 1).alias("n_tokens"))
    path = str(tmp_path / "shards")
    man = write_training_shards(df, path, "doc_id", n_shards=4,
                                salt="v1", tokens_col="n_tokens")
    victims = [3, 57, 123]
    mtimes = {s: os.path.getmtime(f"{path}/shard={s}")
              for s in range(4)}
    res = purge_training_shards(spark, path, "doc_id", victims)
    assert res["rows_removed"] == 3
    untouched = set(range(4)) - set(res["affected_shards"])
    assert untouched, "fixture should leave at least one shard alone"
    for s in untouched:
        assert os.path.getmtime(f"{path}/shard={s}") == mtimes[s]

    back = spark.read.parquet(path)
    assert back.count() == 397
    assert back.where(F.col("doc_id").isin(victims)).count() == 0
    # surviving relative order preserved: pos strictly increasing
    # within each rewritten shard (gaps allowed)
    for s in res["affected_shards"]:
        poss = [r.pos for r in
                spark.read.parquet(f"{path}/shard={s}")
                .orderBy("pos").collect()]
        assert poss == sorted(set(poss))
    # manifest agrees with the bytes (rows + membership hashes + n_rows)
    v = verify_training_shards(spark, path, "doc_id")
    assert v["ok"], v
    assert res["manifest"]["n_rows"] == 397
    assert sum(int(e["tokens"]) for e in
               res["manifest"]["shards"].values()) == \
        sum((i % 5) + 1 for i in range(400)
            if i not in victims)

    # idempotent re-run
    res2 = purge_training_shards(spark, path, "doc_id", victims)
    assert res2["rows_removed"] == 0
    assert verify_training_shards(spark, path, "doc_id")["ok"]
    # ids as a DataFrame behave identically (one more victim)
    res3 = purge_training_shards(
        spark, path, "doc_id",
        spark.createDataFrame([(200,)], ["doc_id"]))
    assert res3["rows_removed"] == 1
    assert spark.read.parquet(path).count() == 396
    # empty id set is a structured no-op
    assert purge_training_shards(spark, path, "doc_id",
                                 [])["rows_removed"] == 0


def test_purge_training_shards_empties_a_shard(spark, tmp_path):
    """Purging EVERY id of one shard leaves a 0-row shard dir; the
    manifest records rows 0 and verify treats the absent group as
    consistent, not missing."""
    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, verify_training_shards,
        write_training_shards)
    df = spark.range(60).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=3, salt="s")
    s0_ids = [r.doc_id for r in
              spark.read.parquet(f"{path}/shard=0").collect()]
    assert s0_ids
    res = purge_training_shards(spark, path, "doc_id", s0_ids)
    assert res["rows_removed"] == len(s0_ids)
    entry = res["manifest"]["shards"].get("0",
                                          res["manifest"]["shards"]
                                          .get(0))
    assert int(entry["rows"]) == 0
    v = verify_training_shards(spark, path, "doc_id")
    assert v["ok"], v
    assert spark.read.parquet(path).count() == 60 - len(s0_ids)


def test_purge_grouped_path_matches_per_shard(spark, tmp_path):
    """The mass-takedown grouped path (one anti-join job + metadata
    swaps) produces byte-equivalent state to the per-shard path: same
    manifest, same survivors, verify green; untouched shards' mtimes
    don't move on either path."""
    import os

    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, verify_training_shards,
        write_training_shards)
    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tokens"))
    victims = [3, 57, 123, 250, 461]
    paths, manifests = {}, {}
    for mode, thresh in (("per_shard", 999), ("grouped", 1)):
        path = str(tmp_path / mode)
        write_training_shards(df, path, "doc_id", n_shards=6,
                              salt="v1", tokens_col="n_tokens")
        mtimes = {s: os.path.getmtime(f"{path}/shard={s}")
                  for s in range(6)}
        res = purge_training_shards(spark, path, "doc_id", victims,
                                    grouped_threshold=thresh)
        assert res["rows_removed"] == len(victims), mode
        for s in set(range(6)) - set(res["affected_shards"]):
            assert os.path.getmtime(f"{path}/shard={s}") == mtimes[s]
        assert verify_training_shards(spark, path, "doc_id")["ok"]
        assert not os.path.exists(f"{path}/._staging_purge")
        paths[mode], manifests[mode] = path, res["manifest"]
    assert manifests["grouped"] == manifests["per_shard"]
    a = spark.read.parquet(paths["grouped"]).orderBy("doc_id")
    b = spark.read.parquet(paths["per_shard"]).orderBy("doc_id")
    assert [r.asDict() for r in a.collect()] == \
        [r.asDict() for r in b.collect()]


def test_purge_grouped_empties_a_shard_and_rerun_converges(
        spark, tmp_path):
    """Grouped path: a fully-purged shard's dir disappears entirely
    (exactly like a recovered empty swap); a re-run over the now-stale
    shard set neither throws on the missing dir nor double-counts."""
    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, verify_training_shards,
        write_training_shards)
    df = spark.range(90).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=3, salt="s")
    s0 = [r.doc_id for r in
          spark.read.parquet(f"{path}/shard=0").collect()]
    res = purge_training_shards(spark, path, "doc_id", s0,
                                grouped_threshold=1)
    assert res["rows_removed"] == len(s0)
    assert verify_training_shards(spark, path, "doc_id")["ok"]
    res2 = purge_training_shards(spark, path, "doc_id", s0,
                                 grouped_threshold=1)
    assert res2["rows_removed"] == 0
    assert verify_training_shards(spark, path, "doc_id")["ok"]


def test_purge_ids_iterator_and_empty_generator(spark, tmp_path):
    """ids may be any iterable: a generator is materialized up front
    (a half-consumed iterator must not silently purge a subset), and
    an EMPTY generator is the documented graceful no-op — truthiness
    on the raw iterator used to route it into createDataFrame([]) and
    a schema-inference error (r13 ADVICE)."""
    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, write_training_shards)
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", n_shards=2, salt="s")
    res = purge_training_shards(spark, path, "doc_id",
                                (i for i in ()))
    assert res == {"affected_shards": [], "rows_removed": 0,
                   "manifest": res["manifest"]}
    res2 = purge_training_shards(spark, path, "doc_id",
                                 (i for i in (5, 6)))
    assert res2["rows_removed"] == 2
    assert spark.read.parquet(path).count() == 98


def test_purge_json_layout_including_emptied_shard(spark, tmp_path):
    """fmt='json' round-trip: rewrites pin the pre-purge schema (JSON
    inference would throw on a 0-row shard and can drift types across
    shards — r13 ADVICE); a fully-emptied JSON shard leaves no
    readable files, is recorded at rows 0, and the whole export stays
    readable."""
    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.training import (
        purge_training_shards, verify_training_shards,
        write_training_shards)
    df = spark.range(80).select(F.col("id").alias("doc_id"),
                                F.concat(F.lit("d"), F.col("id"))
                                .alias("text"))
    path = str(tmp_path / "jshards")
    write_training_shards(df, path, "doc_id", n_shards=3, salt="j",
                          fmt="json")
    s0 = [r.doc_id for r in
          spark.read.json(f"{path}/shard=0").collect()]
    res = purge_training_shards(spark, path, "doc_id", s0 + [999],
                                fmt="json")
    assert res["rows_removed"] == len(s0)
    entry = res["manifest"]["shards"].get(
        "0", res["manifest"]["shards"].get(0))
    assert int(entry["rows"]) == 0
    assert verify_training_shards(spark, path, "doc_id",
                                  fmt="json")["ok"]
    assert spark.read.json(path).count() == 80 - len(s0)
    # idempotent re-run over the emptied shard does not throw
    assert purge_training_shards(spark, path, "doc_id", s0,
                                 fmt="json")["rows_removed"] == 0
