"""Staged upsert loader chain (SURVEY §2.2 L5–L11, L13; §2.4 J4–J8).

The reference's ``SynchronousPipelineLoader`` (SynchronousPipelineLoader.php:
40-64) runs N loaders in order over each batch; loaders implementing
``RowMutator`` replace the batch (e.g. adding the freshly-assigned
``post.ID``) so downstream loaders observe enriched rows. Spark-first this
becomes explicit dataflow: each loader is a *stage* — a function
``state -> state`` over a dict of named DataFrames — composed sequentially
with a materialization barrier between stages so stage N+1 sees stage N's
generated IDs exactly once (no recompute nondeterminism).

ID assignment: the reference relies on DB autoincrement; here new rows get
``max(existing id) + dense row_number over a stable key order`` — a scalar
aggregate plus one window, deterministic and executor-side.

Stage inventory (→ reference):
- ``post_upsert_stage``   ≙ WordPressPostLoader.php:75-194 +
  WPPostsLoader.php:95-155 (existence probe by ID else (name, type);
  update vs insert split; row mutation with the new ID)
- ``meta_stage``          ≙ WPPostMetaLoader.php:86-141 (meta.* melt;
  ``add`` appends, ``update`` merges on (post_id, meta_key))
- ``terms_stage``         ≙ WPPostTermsLoader.php:86-155
  (tax.* explode; wp_set_object_terms replace semantics)
- ``user_upsert_stage``   ≙ WPUserLoader.php:51-132 (email→login two-pass)
- ``term_upsert_stage``   ≙ WPTermsLoader.php:86-221 (id→slug→name probe,
  ensure-parent-exists placeholder creation)
- ``media_stage``         ≙ WPMediaLoader.php:354-426 (filename-variant
  dedupe) + WordPressMediaLoader.php:96-148 (%%placeholder%% substitution)
- ``run_stages``          ≙ SynchronousPipelineLoader.php:40-64 +
  Load Orchestrator.php:125-135 (the WP_Post_All fan-out is
  ``[media_stage, post_upsert_stage, meta_stage, terms_stage]``)
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wp_etl_migration_spark.functions.templates import substitute_placeholders
from wp_etl_migration_spark.operators.melt import melt_meta
from wp_etl_migration_spark.operators.merge import cascaded_lookup

#: A loader stage: maps the pipeline state (named DataFrames — the
#: incoming stream plus every target table it may read or rewrite) to the
#: next state. Pure function; materialization happens between stages.
State = dict[str, DataFrame]
Stage = Callable[[State], State]


def run_stages(state: State, stages: Sequence[Stage],
               barrier: bool = True) -> State:
    """Compose loader stages sequentially (≙ L13).

    With ``barrier`` each stage's outputs are checkpointed so
    downstream stages (and the caller) observe ONE materialization of
    nondeterministic results (generated IDs) — the Spark translation of
    the reference's in-place row mutation. ``operators.checkpoint.pin``
    upgrades to reliable (fault-tolerant) checkpoints when the session
    has a checkpoint dir registered.
    """
    from wp_etl_migration_spark.operators.checkpoint import pin

    for stage in stages:
        out = stage(state)
        if barrier:
            out = {k: (pin(df, eager=False)
                       if df is not state.get(k) else df)
                   for k, df in out.items()}
        state = out
    return state


def _bt(name: str):
    return F.col("`" + name + "`")


def assign_new_ids(rows: DataFrame, id_col: str, start: int,
                   order_cols: Sequence[str]) -> DataFrame:
    """Deterministic surrogate IDs: start + global rank over a stable key
    order (documented per-stage ordering — SURVEY §7.4 risk 1).

    Scale path: a bare ``row_number() OVER (ORDER BY …)`` would move every
    row to ONE partition. Instead: range-repartition + sort (distributed),
    then per-partition row_number offset by the driver-collected partition
    counts (one tiny row per partition). The resulting id equals the
    global rank regardless of where the sampled range boundaries fall, so
    IDs stay deterministic for unique keys.

    Hot-key safe: the range partitioner alone sends every row that
    shares one ``order_cols`` value to a SINGLE partition (a 50k×
    duplicated slug = a 50k-row task, measured in the skew bed), so a
    full-row md5 tiebreaker joins the partition key and the rank order.
    Equal keys then split across range boundaries by hash while the
    rank stays the (cols, tiebreak) lexicographic position —
    deterministic for any multiset, identical ids to before whenever
    ``order_cols`` are unique. Rows identical in EVERY column still
    co-locate (no content left to split on); that residual case is the
    caller's dedup job, and `_assign_ids_per_key`'s distinct() does it
    for the upsert paths.
    """
    cols = [_bt(c) for c in order_cols]
    tie = F.md5(F.concat_ws(
        "\x1f", *[_bt(c).cast("string") for c in rows.columns]))
    ordered = (rows.withColumn("__tie", tie)
               .repartitionByRange(*cols, F.col("__tie"))
               .sortWithinPartitions(*cols, F.col("__tie"))
               .withColumn("__pid", F.spark_partition_id()))
    # Pin ONE materialization: the counts job below and the returned
    # frame must read identical partitions — if the upstream plan is
    # nondeterministic (uuid() columns, AQE re-planning, non-unique
    # order keys) a re-execution could move rows across the sampled
    # range boundaries and duplicate/skip IDs.
    from wp_etl_migration_spark.operators.checkpoint import pin

    ordered = pin(ordered)
    counts = dict(ordered.groupBy("__pid").count()
                  .select("__pid", "count").collect())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(counts)
                       for x in (pid, offsets[pid])]),
        F.col("__pid")) if counts else F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*cols, F.col("__tie"))
    return (ordered.withColumn(
        id_col,
        (F.lit(start - 1) + off + F.row_number().over(w)).cast("long"))
        .drop("__pid", "__tie"))


def _assign_ids_per_key(rows: DataFrame, out_col: str, start: int,
                        key_cols: Sequence[str]) -> DataFrame:
    """Fresh ids for unmatched rows, ONE per distinct key tuple.

    The reference's sequential loaders create a row for the first
    occurrence of a key and then *find* it for later occurrences
    (probe-before-insert), so N same-key rows share one created entity.
    Rows with any NULL key column can never be found by the probe and
    mint per-row, like repeated ``wp_insert_post`` calls without a name.
    """
    key_ok = functools.reduce(
        operator.and_, [F.col(c).isNotNull() for c in key_cols])
    named, anon = rows.where(key_ok), rows.where(~key_ok)
    keys = named.select(*key_cols).distinct()
    key_ids = assign_new_ids(keys, out_col, start, key_cols)
    n_named = key_ids.count()
    # The distinct() above pre-collapses a hot key before any id work;
    # the fan-back join re-expands it, so its one-row-per-key build
    # side is rebalance-hinted: with the id window fused into the join
    # stage AQE's skew rule can't match and a 10k× duplicated key rides
    # one reducer (see cascaded_lookup for the measured pattern).
    return (named.drop(out_col).join(key_ids.hint("rebalance"),
                                     on=list(key_cols))
            .unionByName(assign_new_ids(anon, out_col, start + n_named,
                                        key_cols)))


def _one_row_per_key(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Collapse duplicate-key rows to ONE deterministic winner.

    The reference's row-at-a-time loaders apply updates sequentially, so
    a table ends with a single row per key no matter how many incoming
    rows resolve to it (WPPostLoader/WPUserLoader update path); a plain
    inner join would instead emit one updated row per duplicate. Spark
    frames carry no input order, so the winner is picked by a
    deterministic total order over the non-key columns (struct compare,
    descending) — stable across retries and partitionings.
    """
    others = [c for c in df.columns if c not in key_cols]
    if not others:
        return df.dropDuplicates(list(key_cols))
    w = (Window.partitionBy(*[_bt(c) for c in key_cols])
         .orderBy(F.struct(*[_bt(c) for c in others]).desc()))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def post_upsert_stage(incoming_key: str = "incoming",
                      posts_key: str = "posts",
                      id_col: str = "ID",
                      name_col: str = "post_name",
                      type_col: str = "post_type",
                      update_cols: Sequence[str] | None = None) -> Stage:
    """L5/J4: probe by id else (name, type); update matched posts,
    insert the rest with fresh IDs; mutate the stream with ``post.ID``.

    The incoming stream carries ``post.*`` columns (dot namespace); the
    posts table has bare column names.
    """

    def stage(state: State) -> State:
        incoming, posts = state[incoming_key], state[posts_key]
        p = {c: f"post.{c}" for c in (id_col, name_col, type_col)}

        probe = cascaded_lookup(
            incoming.withColumn("__id", _bt(p[id_col]))
                    .withColumn("__name", _bt(p[name_col]))
                    .withColumn("__type", _bt(p[type_col])),
            posts.select(F.col(id_col).alias("__id"),
                         F.col(name_col).alias("__name"),
                         F.col(type_col).alias("__type")),
            "__id", [["__id"], ["__name", "__type"]],
            out_col="__matched")

        max_id = posts.agg(F.max(id_col)).first()[0] or 0
        inserts = _assign_ids_per_key(
            probe.where(F.col("__matched").isNull()),
            "__matched", max_id + 1, ["__name", "__type"])
        enriched = (probe.where(F.col("__matched").isNotNull())
                    .unionByName(inserts)
                    .withColumn(f"post.{id_col}", F.col("__matched"))
                    .drop("__id", "__name", "__type", "__matched"))

        post_cols = [c for c in enriched.columns if c.startswith("post.")]
        src = enriched.select(
            *[_bt(c).alias(c[len("post."):]) for c in post_cols])
        src = _one_row_per_key(src, [id_col])
        upd = (update_cols if update_cols is not None
               else [c for c in src.columns
                     if c in posts.columns and c != id_col])
        matched = (posts.alias("t")
                   .join(src.alias("s"), on=id_col, how="inner")
                   .select(F.col(id_col),
                           *[F.coalesce(F.col("s." + c),
                                        F.col("t." + c)).alias(c)
                             if c in upd else F.col("t." + c)
                             for c in posts.columns if c != id_col]))
        untouched = posts.join(src.select(id_col), on=id_col,
                               how="left_anti")
        new_rows = (src.join(posts.select(id_col), on=id_col,
                             how="left_anti")
                    .select(*[F.col(c) if c in src.columns
                              else F.lit(None).alias(c)
                              for c in posts.columns]))
        return {**state,
                incoming_key: enriched,
                posts_key: untouched.unionByName(matched)
                                    .unionByName(new_rows)}

    return stage


def meta_stage(incoming_key: str = "incoming",
               meta_key_: str = "postmeta",
               post_id_col: str = "post.ID") -> Stage:
    """L6: melt ``meta.*`` columns; ``add`` rows append, ``update`` rows
    merge on (post_id, meta_key)."""

    def stage(state: State) -> State:
        incoming, meta = state[incoming_key], state[meta_key_]
        long = (melt_meta(incoming.withColumn("__pid", _bt(post_id_col)),
                          ["__pid"])
                .withColumnRenamed("__pid", "post_id"))
        adds = long.where(F.col("mode") == "add") \
                   .select("post_id", "meta_key", "meta_value")
        upds = long.where(F.col("mode") == "update") \
                   .select("post_id", "meta_key", "meta_value")
        # ``update`` converges to ONE row per (post_id, meta_key) — the
        # reference's update_post_meta overwrites in place, so N incoming
        # duplicates end as a single row, not N appended rows.
        upds = _one_row_per_key(upds, ["post_id", "meta_key"])
        survivors = meta.join(upds.select("post_id", "meta_key"),
                              on=["post_id", "meta_key"], how="left_anti")
        return {**state,
                meta_key_: survivors.unionByName(upds)
                                    .unionByName(adds)}

    return stage


def terms_stage(incoming_key: str = "incoming",
                rel_key: str = "term_relationships",
                post_id_col: str = "post.ID",
                tax_prefix: str = "tax.") -> Stage:
    """L7: explode each ``tax.<taxonomy>`` array column into
    (post_id, taxonomy, term) rows; *replace* semantics per
    (post_id, taxonomy) — ≙ wp_set_object_terms."""

    def stage(state: State) -> State:
        incoming, rel = state[incoming_key], state[rel_key]
        tax_cols = [c for c in incoming.columns if c.startswith(tax_prefix)]
        pieces = []
        for c in tax_cols:
            taxonomy = c[len(tax_prefix):]
            # Scalars coerce to single-element arrays; empties drop
            # (≙ WPPostTermsLoader.php:113-126).
            col = _bt(c)
            arr = F.when(col.cast("string").isNotNull()
                         & (F.trim(col.cast("string")) != ""),
                         F.array(col.cast("string")))
            if dict(incoming.dtypes)[c].startswith("array"):
                arr = col.cast("array<string>")
            pieces.append(
                incoming.select(_bt(post_id_col).alias("post_id"),
                                F.lit(taxonomy).alias("taxonomy"),
                                F.explode(arr).alias("term"))
                .where(F.trim("term") != ""))
        if not pieces:
            return state
        new_rel = pieces[0]
        for p in pieces[1:]:
            new_rel = new_rel.unionByName(p)
        survivors = rel.join(new_rel.select("post_id", "taxonomy").distinct(),
                             on=["post_id", "taxonomy"], how="left_anti")
        return {**state, rel_key: survivors.unionByName(new_rel)}

    return stage


def user_upsert_stage(incoming_key: str = "incoming",
                      users_key: str = "users",
                      id_col: str = "ID",
                      email_col: str = "user_email",
                      login_col: str = "user_login",
                      sanitize: bool = True) -> Stage:
    """L9/J6: two-pass existence probe (email, then login), update/insert
    split, stream mutation with ``user.ID``.

    ``sanitize`` mirrors the reference's field scrub before the write
    (≙ WPUserLoader.php:166 esc_url_raw on user_url; :191,233 wp_kses on
    the description): applied to the incoming frame so both the probe
    and the written rows see clean values.
    """
    from wp_etl_migration_spark.functions.text import esc_url_raw, kses_post

    def stage(state: State) -> State:
        incoming, users = state[incoming_key], state[users_key]
        if sanitize:
            if "user.user_url" in incoming.columns:
                incoming = incoming.withColumn(
                    "user.user_url", esc_url_raw(_bt("user.user_url")))
            if "user.description" in incoming.columns:
                incoming = incoming.withColumn(
                    "user.description", kses_post(_bt("user.description")))
        probe = cascaded_lookup(
            incoming.withColumn("__email", _bt(f"user.{email_col}"))
                    .withColumn("__login", _bt(f"user.{login_col}")),
            users.select(F.col(id_col).alias("__uid"),
                         F.col(email_col).alias("__email"),
                         F.col(login_col).alias("__login")),
            "__uid", [["__email"], ["__login"]], out_col="__matched")
        max_id = users.agg(F.max(id_col)).first()[0] or 0
        inserts = _assign_ids_per_key(
            probe.where(F.col("__matched").isNull()),
            "__matched", max_id + 1, ["__login"])
        enriched = (probe.where(F.col("__matched").isNotNull())
                    .unionByName(inserts)
                    .withColumn(f"user.{id_col}", F.col("__matched"))
                    .drop("__email", "__login", "__matched"))

        user_cols = [c for c in enriched.columns if c.startswith("user.")]
        src = enriched.select(
            *[_bt(c).alias(c[len("user."):]) for c in user_cols])
        src = _one_row_per_key(src, [id_col])
        # user_login is immutable on update (wp_update_user ignores it) —
        # it only applies to inserts.
        upd = [c for c in src.columns
               if c in users.columns and c not in (id_col, login_col)]
        matched = (users.alias("t").join(src.alias("s"), on=id_col)
                   .select(F.col(id_col),
                           *[F.coalesce(F.col("s." + c),
                                        F.col("t." + c)).alias(c)
                             if c in upd else F.col("t." + c)
                             for c in users.columns if c != id_col]))
        untouched = users.join(src.select(id_col), on=id_col,
                               how="left_anti")
        new_rows = (src.join(users.select(id_col), on=id_col,
                             how="left_anti")
                    .select(*[F.col(c) if c in src.columns
                              else F.lit(None).alias(c)
                              for c in users.columns]))
        return {**state,
                incoming_key: enriched,
                users_key: untouched.unionByName(matched)
                                    .unionByName(new_rows)}

    return stage


def term_upsert_stage(incoming_key: str = "incoming",
                      terms_key: str = "terms",
                      id_col: str = "term_id",
                      slug_col: str = "slug",
                      name_col: str = "name",
                      tax_col: str = "taxonomy",
                      parent_col: str = "parent_slug") -> Stage:
    """L8/J5/J8: term upsert with ensure-parent-exists.

    Probe order id → (slug, taxonomy) → (name, taxonomy)
    (≙ WordPressTermLoader.php:118-145). Slug defaults to a slugified
    name (WPTermsLoader.php:101-109). Parents referenced by slug that do
    not exist — in the table or in the batch — are created first as
    placeholder rows (≙ WPTermsLoader.php:204-210), so one pass handles a
    full hierarchy level; deeper chains arrive level-by-level exactly as
    the reference's recursive ensure-parent does.
    """
    from wp_etl_migration_spark.functions.text import to_slug

    def stage(state: State) -> State:
        incoming, terms = state[incoming_key], state[terms_key]
        inc = (incoming
               .withColumn("__slug",
                           F.coalesce(_bt(f"term.{slug_col}"),
                                      to_slug(_bt(f"term.{name_col}"))))
               .withColumn("__name", _bt(f"term.{name_col}"))
               .withColumn("__tax", _bt(f"term.{tax_col}"))
               .withColumn("__id", _bt(f"term.{id_col}")))

        max_id = terms.agg(F.max(id_col)).first()[0] or 0

        # Placeholder parents: referenced slugs with no term row and no
        # incoming row of that slug+taxonomy.
        refs = (inc.where(_bt(f"term.{parent_col}").isNotNull())
                .select(_bt(f"term.{parent_col}").alias("__slug"),
                        F.col("__tax").alias("__tax2"))
                .distinct()
                .withColumnRenamed("__tax2", "__tax"))
        known = (terms.select(F.col(slug_col).alias("__slug"),
                              F.col(tax_col).alias("__tax"))
                 .unionByName(inc.select("__slug", "__tax")).distinct())
        missing = refs.join(known, on=["__slug", "__tax"], how="left_anti")
        placeholders = assign_new_ids(missing, id_col, max_id + 1,
                                      ["__tax", "__slug"])
        ph_rows = placeholders.select(
            *[F.col(id_col) if c == id_col
              else F.col("__slug").alias(c) if c in (slug_col, name_col)
              else F.col("__tax").alias(c) if c == tax_col
              else F.lit(None).alias(c)
              for c in terms.columns])
        terms2 = terms.unionByName(ph_rows)

        probe = _term_probe(inc, terms2, id_col, slug_col, name_col,
                            tax_col)

        start = max_id + 1 + placeholders.count()
        # One new term per distinct (taxonomy, slug), shared by every
        # incoming row of that key — the reference's sequential probe
        # creates the term once and finds it for later rows
        # (WPTermsLoader.php:118-145); assigning per ROW would mint
        # duplicate-slug terms.
        inserts = _assign_ids_per_key(
            probe.where(F.col("__matched").isNull()),
            "__matched", start, ["__tax", "__slug"])
        enriched = (probe.where(F.col("__matched").isNotNull())
                    .unionByName(inserts.select(
                        *[_bt(c) for c in probe.columns]))
                    .withColumn(f"term.{id_col}", F.col("__matched")))

        src = _one_row_per_key(
            enriched.select(
                F.col(f"`term.{id_col}`").alias(id_col),
                F.col("__slug").alias(slug_col),
                F.col("__name").alias(name_col),
                F.col("__tax").alias(tax_col)),
            [id_col])
        matched = (terms2.alias("t").join(src.alias("s"), on=id_col)
                   .select(F.col(id_col),
                           *[F.coalesce(F.col("s." + c),
                                        F.col("t." + c)).alias(c)
                             if c in src.columns else F.col("t." + c)
                             for c in terms2.columns if c != id_col]))
        untouched = terms2.join(src.select(id_col), on=id_col,
                                how="left_anti")
        new_rows = (src.join(terms2.select(id_col), on=id_col,
                             how="left_anti")
                    .select(*[F.col(c) if c in src.columns
                              else F.lit(None).alias(c)
                              for c in terms2.columns]))
        enriched = enriched.drop("__slug", "__name", "__tax", "__id",
                                 "__matched")
        return {**state,
                incoming_key: enriched,
                terms_key: untouched.unionByName(matched)
                                    .unionByName(new_rows)}

    return stage


def _term_probe(inc: DataFrame, terms: DataFrame, id_col: str,
                slug_col: str, name_col: str, tax_col: str) -> DataFrame:
    """Cascaded term existence probe: id → (slug, tax) → (name, tax)."""
    by_id = terms.groupBy(F.col(id_col).alias("__id")) \
                 .agg(F.min(id_col).alias("__h0"))
    by_slug = terms.groupBy(F.col(slug_col).alias("__slug"),
                            F.col(tax_col).alias("__tax")) \
                   .agg(F.min(id_col).alias("__h1"))
    by_name = terms.groupBy(F.col(name_col).alias("__name"),
                            F.col(tax_col).alias("__tax")) \
                   .agg(F.min(id_col).alias("__h2"))
    out = (inc.join(by_id, on="__id", how="left")
           .join(by_slug, on=["__slug", "__tax"], how="left")
           .join(by_name, on=["__name", "__tax"], how="left"))
    return (out.withColumn("__matched",
                           F.coalesce("__h0", "__h1", "__h2"))
            .drop("__h0", "__h1", "__h2"))


def filename_variants(col, n: int = 2):
    """Array of dedupe filename probes: base, base-1 … base-n before the
    extension (≙ WPMediaLoader.php:354-380's -N variants)."""
    base = F.regexp_replace(col, r"\.[^.]+$", "")
    ext = F.regexp_extract(col, r"(\.[^.]+)$", 1)
    return F.array(col, *[F.concat(base, F.lit(f"-{i}"), ext)
                          for i in range(1, n + 1)])


def media_stage(incoming_key: str = "incoming",
                attachments_key: str = "attachments",
                url_col: str = "media.featured.url",
                file_col: str = "file",
                att_id_col: str = "ID",
                subst_cols: Sequence[str] = (),
                download_dir: str | None = None,
                downloads_key: str = "media_downloads",
                fetcher=None) -> Stage:
    """L10/L11/J7: dedupe against existing attachments by filename
    variants, mint IDs for genuinely new media, download the new bytes,
    enrich the stream with ``media.featured.attachment_id``, then
    substitute ``%%…%%`` tokens.

    With ``download_dir`` set, genuinely-new media (the anti-join
    survivors only — existing attachments never refetch, matching the
    reference's probe-before-sideload order) are downloaded via
    ``sinks.media.sideload_media`` (≙ WPMediaLoader.php:433-503:
    ``download_url`` + ``media_handle_sideload``); the per-row status
    frame lands in ``state[downloads_key]`` for quarantine/retry.
    """

    def stage(state: State) -> State:
        incoming, atts = state[incoming_key], state[attachments_key]
        fname = F.regexp_extract(
            F.substring_index(_bt(url_col), "?", 1), r"([^/]+)$", 1)
        probe = incoming.withColumn("__fname", fname)
        # Existing match: first filename variant (probe order: base,
        # base-1, base-2 …) that equals an attachment file wins — the
        # reference checks variants sequentially and returns the first
        # hit (WPMediaLoader.php:354-380), so rank by variant index
        # before attachment id, not a global min over all variants.
        cand = (probe.select("__fname")
                .distinct()
                .select("__fname",
                        F.posexplode(filename_variants(F.col("__fname")))
                        .alias("__vidx", "__variant")))
        hit = (cand.join(atts.select(F.col(file_col).alias("__variant"),
                                     F.col(att_id_col).alias("__att_id")),
                         on="__variant")
               .groupBy("__fname")
               .agg(F.min(F.struct("__vidx", "__att_id")).alias("__m"))
               .select("__fname", F.col("__m.__att_id").alias("__att_id")))
        probe = probe.join(hit, on="__fname", how="left")

        max_id = atts.agg(F.max(att_id_col)).first()[0] or 0
        # Rows with no featured URL (null/empty filename) carry no
        # media: they must neither mint an attachment ID nor append a
        # null-file attachment row.
        news = assign_new_ids(
            probe.where(F.col("__att_id").isNull()
                        & F.col("__fname").isNotNull()
                        & (F.col("__fname") != ""))
                 .select("__fname").distinct(),
            "__new_id", max_id + 1, ["__fname"])
        probe = (probe.join(news, on="__fname", how="left")
                 .withColumn("__att_id", F.coalesce("__att_id", "__new_id"))
                 .drop("__new_id"))

        enriched = (probe
                    .withColumn("media.featured.attachment_id",
                                F.col("__att_id"))
                    .withColumn("__vals",
                                F.create_map(
                                    F.lit("media.featured.attachment_id"),
                                    F.col("__att_id").cast("string")))
                    .drop("__fname", "__att_id"))
        for c in subst_cols:
            enriched = enriched.withColumn(
                c, substitute_placeholders(
                    _bt(c), F.col("__vals"),
                    ["media.featured.attachment_id"]))
        enriched = enriched.drop("__vals")

        new_atts = (news.select(
            F.col("__new_id").alias(att_id_col),
            F.col("__fname").alias(file_col))
            .join(atts.select(att_id_col), on=att_id_col, how="left_anti"))
        filled = new_atts.select(
            *[F.col(c) if c in new_atts.columns else F.lit(None).alias(c)
              for c in atts.columns])
        out = {**state,
               incoming_key: enriched,
               attachments_key: atts.unionByName(filled)}
        if download_dir is not None:
            from wp_etl_migration_spark.sinks.media import sideload_media
            # One URL per new filename (min = deterministic pick when
            # several source URLs share a basename, like the reference's
            # first-seen-wins upload).
            urls = (incoming.select(
                        fname.alias("__fname"), _bt(url_col).alias("__url"))
                    .groupBy("__fname").agg(F.min("__url").alias("__url")))
            out[downloads_key] = sideload_media(
                news.join(urls, on="__fname"),
                download_dir, url_col="__url", id_col="__new_id",
                fetcher=fetcher)
        return out

    return stage


def featured_image_stage(incoming_key: str = "incoming",
                         meta_key_: str = "postmeta",
                         post_id_col: str = "post.ID",
                         att_id_col: str =
                         "media.featured.attachment_id") -> Stage:
    """Link each post's sideloaded featured media as its thumbnail
    (≙ WordPressPostLoader.php:109-117: ``sideload_media`` +
    ``set_post_thumbnail``, which writes the ``_thumbnail_id`` post
    meta, plus the ``post.featured_media`` row mutation).

    Compose in ``run_stages`` AFTER :func:`post_upsert_stage` (posts
    have IDs) and :func:`media_stage` (attachment IDs are minted /
    deduped): rows holding both IDs emit one ``_thumbnail_id`` meta
    row; rows without featured media are untouched.

    Idempotent: thumbnail links merge with ``update`` semantics on
    (post_id, ``_thumbnail_id``) — a re-run (or N duplicate incoming
    rows) converges to the same single meta row per post, exactly like
    repeated ``set_post_thumbnail`` calls.

    Scale: one equi-shuffle on (post_id, meta_key) for the merge; the
    incoming mutation is a pure projection.
    """

    def stage(state: State) -> State:
        incoming, meta = state[incoming_key], state[meta_key_]
        links = (incoming
                 .where(_bt(att_id_col).isNotNull()
                        & _bt(post_id_col).isNotNull())
                 .select(_bt(post_id_col).alias("post_id"),
                         F.lit("_thumbnail_id").alias("meta_key"),
                         _bt(att_id_col).cast("string")
                         .alias("meta_value")))
        links = _one_row_per_key(links, ["post_id", "meta_key"])
        survivors = meta.join(links.select("post_id", "meta_key"),
                              on=["post_id", "meta_key"],
                              how="left_anti")
        enriched = incoming.withColumn("post.featured_media",
                                       _bt(att_id_col))
        return {**state,
                incoming_key: enriched,
                meta_key_: survivors.unionByName(links)}

    return stage
