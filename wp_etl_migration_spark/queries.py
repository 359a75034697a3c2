"""Driver-facing query registry.

One named query per implemented operator family from SURVEY.md §2 plus the
LLM-pipeline extensions. Each entry pairs a PySpark callable
``(spark, sf_dir) -> DataFrame`` with an equivalent DuckDB oracle SQL
string (run against the same parquet tables, pre-registered views).

Exact-parity discipline (every query here hash-matches its oracle):
- session timezone pinned to UTC (``tune``) before building any plan;
- float aggregation goes through DECIMAL (order-independent, exact) and
  is cast back to DOUBLE — see ``functions.numbers``;
- every computed column is aliased identically on both sides;
- non-deterministic outputs (uuid/now) are excluded from oracle queries;
- LIMIT queries carry a unique-key tiebreak so the row set is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wp_etl_migration_spark.session import tune
from wp_etl_migration_spark.sources.tables import Tables
from wp_etl_migration_spark.functions.text import (
    to_slug, split_trim, nullif_value, sanitize_key)
from wp_etl_migration_spark.functions.numbers import dec_sum, dec_avg
from wp_etl_migration_spark.operators.prefix import prefix_all, select_prefix
from wp_etl_migration_spark.operators.rename import rename_snake_scrub
from wp_etl_migration_spark.operators.cleaning import string_to_null
from wp_etl_migration_spark.operators.melt import melt_meta
from wp_etl_migration_spark.operators.merge import (
    merge_upsert, cascaded_lookup)
from wp_etl_migration_spark.operators.hierarchy import resolve_paths
from wp_etl_migration_spark.operators.dedup import (
    MINHASH_A, MINHASH_B, MINHASH_P, exact_dedup, ngram_jaccard_pairs,
    minhash_signatures, minhash_lsh_pairs)
from wp_etl_migration_spark.operators.similarity import (
    cosine_topk, cosine_topk_lsh, embedding_near_dup,
    embedding_near_dup_lsh, ivf_topk, random_projection,
    seeded_planes)
from wp_etl_migration_spark.operators.simhash import (
    HEX, simhash_signatures, simhash_near_dup)
from wp_etl_migration_spark.operators.multimodal import (
    attach_binary, decode_media, extract_features, synthesize_media)
from wp_etl_migration_spark.operators import textstats as ts


def _t(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(tune(spark), sf_dir)


# ---------------------------------------------------------------- aggregates

def q_pricing_summary(spark, sf_dir):
    """Flagship TPC-H-Q1-style pricing summary (scan → filter → hash agg).

    Exercises: parquet scan w/ predicate pushdown, decimal-exact sums,
    map-side partial aggregation. ≙ the reference's analyze/count surface
    (SURVEY §2.6) generalized to real aggregation.
    """
    l = _t(spark, sf_dir).lineitem()
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)")
    tax = F.lit(1).cast("decimal(6,4)") + F.col("l_tax").cast("decimal(6,4)")
    return (l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dec_sum("l_quantity", 2).alias("sum_qty"),
                 dec_sum("l_extendedprice", 2).alias("sum_base_price"),
                 F.sum(ext * disc).cast("double").alias("sum_disc_price"),
                 F.sum(ext * disc * tax).cast("double").alias("sum_charge"),
                 dec_avg("l_quantity", 2).alias("avg_qty"),
                 dec_avg("l_extendedprice", 2).alias("avg_price"),
                 dec_avg("l_discount", 4).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE)
       AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE)
       AS sum_base_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
       * CAST(1 - CAST(l_discount AS DECIMAL(6,4)) AS DECIMAL(7,4)))
       AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
       * CAST(1 - CAST(l_discount AS DECIMAL(6,4)) AS DECIMAL(7,4))
       * CAST(1 + CAST(l_tax AS DECIMAL(6,4)) AS DECIMAL(7,4)))
       AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE)
       / count(l_quantity) AS avg_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE)
       / count(l_extendedprice) AS avg_price,
  CAST(CAST(sum(CAST(l_discount AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE)
       / count(l_discount) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------- scans/filters/limits

def q_scan_filter_sort_limit(spark, sf_dir):
    """S6/P7/S11: predicate + order pushdown + limit (top-100 open orders)."""
    o = _t(spark, sf_dir).orders()
    return (o.where((F.col("o_orderstatus") == "O")
                    & (F.col("o_totalprice") > 200000.0))
            .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
            .limit(100)
            .select("o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
                    .alias("order_date"),
                    "o_totalprice"))


ORACLE_SCAN = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date,
       o_totalprice
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
ORDER BY o_orderdate DESC, o_orderkey
LIMIT 100
"""


def q_union_merge(spark, sf_dir):
    """U1 multi-source merge: lazy unionByName of two event slices
    (≙ RSS multi-page merge, Extract Orchestrator.php:216-227 — without
    the reference's eager materialization)."""
    e = _t(spark, sf_dir).events()
    cut = F.lit("2024-01-15").cast("timestamp")
    page1 = (e.where(F.col("ts") < cut)
             .select("event_id", "event_type", F.lit(1).alias("page")))
    page2 = (e.where(F.col("ts") >= cut)
             .select("event_id", "event_type", F.lit(2).alias("page")))
    return page1.unionByName(page2)


ORACLE_UNION = """
SELECT event_id, event_type, 1 AS page FROM events
WHERE ts < TIMESTAMP '2024-01-15'
UNION ALL
SELECT event_id, event_type, 2 AS page FROM events
WHERE ts >= TIMESTAMP '2024-01-15'
"""


# --------------------------------------------------------- scalar functions

def q_slugify(spark, sf_dir):
    """F8 to_slug + F16 sanitize_key over part names."""
    p = _t(spark, sf_dir).part()
    return p.select("p_partkey",
                    to_slug("p_name").alias("slug"),
                    sanitize_key("p_name").alias("key"))


ORACLE_SLUG = """
SELECT p_partkey,
  regexp_replace(regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '-', 'g'),
                 '^-+|-+$', '', 'g') AS slug,
  regexp_replace(lower(p_name), '[^a-z0-9_-]', '', 'g') AS key
FROM part
"""


def q_split_trim(spark, sf_dir):
    """F9 to_explode (split + trim → array; joined for a stable digest)."""
    c = _t(spark, sf_dir).customer()
    parts = split_trim("c_name", "#")
    return c.select("c_custkey",
                    F.array_join(parts, "|").alias("name_parts"),
                    F.size(parts).cast("long").alias("n_parts"))


ORACLE_SPLIT = """
SELECT c_custkey,
  array_to_string(list_transform(string_split(c_name, '#'), x -> trim(x)), '|')
    AS name_parts,
  CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts
FROM customer
"""


def q_nullif_sentinel(spark, sf_dir):
    """F10 compare_set_null: 'F' status → NULL."""
    o = _t(spark, sf_dir).orders()
    return o.select("o_orderkey",
                    nullif_value("o_orderstatus", "F").alias("status_or_null"))


ORACLE_NULLIF = """
SELECT o_orderkey, NULLIF(o_orderstatus, 'F') AS status_or_null FROM orders
"""


def q_text_functions(spark, sf_dir):
    """Row-level scalar-function breadth in ONE pass over `part`:
    F8 to_slug + F16 sanitize_key + F9 split-trim + F10 compare_set_null
    (≙ StringFunctions.php to_slug/sanitize_key, ToExplode.php,
    CompareSetNull.php).  Consolidates the former slugify / split_trim /
    nullif_sentinel driver rows (still parity-tested individually via
    EXTRA_REGISTRY) so the 50-row driver gate covers every family."""
    p = _t(spark, sf_dir).part()
    parts = split_trim("p_name", " ")
    return p.select(
        "p_partkey",
        to_slug("p_name").alias("slug"),
        sanitize_key("p_name").alias("key"),
        F.array_join(parts, "|").alias("name_parts"),
        F.size(parts).cast("long").alias("n_parts"),
        nullif_value("p_type", "ECONOMY").alias("type_or_null"))


ORACLE_TEXT_FUNCTIONS = """
SELECT p_partkey,
  regexp_replace(regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '-', 'g'),
                 '^-+|-+$', '', 'g') AS slug,
  regexp_replace(lower(p_name), '[^a-z0-9_-]', '', 'g') AS key,
  array_to_string(list_transform(string_split(p_name, ' '), x -> trim(x)),
                  '|') AS name_parts,
  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_parts,
  NULLIF(p_type, 'ECONOMY') AS type_or_null
FROM part
"""


def q_string_to_null(spark, sf_dir):
    """F11 string_to_null: sentinel 'en' in lang column → NULL (frame-wide
    operator restricted to one column)."""
    d = _t(spark, sf_dir).documents()
    cleaned = string_to_null(d.select("doc_id", "lang", "source"),
                             "en", columns=["lang"])
    return cleaned


ORACLE_STR2NULL = """
SELECT doc_id, NULLIF(lang, 'en') AS lang, source FROM documents
"""


# ------------------------------------------------------ renames / prefixes

def q_prefix_pipeline(spark, sf_dir):
    """P5 prefix_all + P2 select_prefix round trip with a lit column
    (≙ legacy.* namespacing at Extract Orchestrator.php:125-130)."""
    c = _t(spark, sf_dir).customer()
    legacy = prefix_all(c, "legacy.")
    restored = select_prefix(legacy, "legacy.", strip=True)
    return restored.select("c_custkey", "c_name", "c_mktsegment",
                           F.lit("customer").alias("pipeline"))


ORACLE_PREFIX = """
SELECT c_custkey, c_name, c_mktsegment, 'customer' AS pipeline FROM customer
"""


def q_snake_scrub_rename(spark, sf_dir):
    """P4 renameAllStyle('snake') + control/non-ASCII scrub of names."""
    r = _t(spark, sf_dir).region()
    messy = r.toDF("R Regionkey", "R\x01 Nameÿ")
    return rename_snake_scrub(messy)


ORACLE_SNAKE = """
SELECT r_regionkey, r_name FROM region
"""


# ------------------------------------------------------------------- joins

def q_author_embed(spark, sf_dir):
    """J1 author embed: orders ⋈ customer (broadcast left join)."""
    t = _t(spark, sf_dir)
    o, c = t.orders(), t.customer()
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
            .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment"))


ORACLE_AUTHOR = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def q_meta_embed(spark, sf_dir):
    """J3 meta embed: group child rows to a deterministic per-key digest
    (collect_list → sort → join ≙ key→values map)."""
    l = _t(spark, sf_dir).lineitem()
    kv = F.concat_ws(":", F.col("l_linenumber").cast("string"),
                     F.col("l_partkey").cast("string"))
    return (l.groupBy("l_orderkey")
            .agg(F.array_join(F.array_sort(F.collect_list(kv)), ",")
                 .alias("line_parts"),
                 F.count("*").alias("n_lines")))


ORACLE_META_EMBED = """
SELECT l_orderkey,
  string_agg(CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR),
             ',' ORDER BY CAST(l_linenumber AS VARCHAR) || ':' ||
             CAST(l_partkey AS VARCHAR)) AS line_parts,
  count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


def q_window_funcs(spark, sf_dir):
    """§2.7 window functions: row_number + lag per customer order
    history (used for synthetic ID assignment in the merge sinks)."""
    o = _t(spark, sf_dir).orders()
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select("o_orderkey", "o_custkey",
                    F.row_number().over(w).cast("long").alias("rn"),
                    F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"))


ORACLE_WINDOW = """
SELECT o_orderkey, o_custkey,
  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    AS rn,
  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
"""


def q_rolling_window(spark, sf_dir):
    """Time-RANGE window frame: per user, trailing-30-minute event count
    and value sum at each event — the moving-aggregate family row
    windows can't express (frame bounds are seconds, not row counts).
    Spark rangeBetween on epoch MICROseconds ≡ DuckDB RANGE BETWEEN
    INTERVAL PRECEDING (the testdata timestamps carry sub-second
    precision, so the frame unit must be exact micros, not truncated
    seconds)."""
    e = _t(spark, sf_dir).events()
    w = (Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-1_800_000_000, 0))
    return (e.select("event_id", "user_id", "ts",
                     F.count("*").over(w).alias("n_30m"),
                     F.sum(F.col("value").cast("decimal(18,6)")).over(w)
                     .cast("string").alias("sum_30m"))
            .select("event_id", "user_id", "n_30m", "sum_30m"))


ORACLE_ROLLING = """
SELECT event_id, user_id,
  count(*) OVER w AS n_30m,
  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS sum_30m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
"""


# ----------------------------------------------------------- melt / upsert

def q_meta_melt(spark, sf_dir):
    """L6 meta melt: wide meta.* columns → EAV long rows with add/update
    mode parsing (≙ WPPostMetaLoader.php:86-141)."""
    l = _t(spark, sf_dir).lineitem()
    wide = l.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("decimal(18,2)").alias("meta.quantity"),
        F.col("l_extendedprice").cast("decimal(18,2)")
        .alias("meta.extendedprice"),
        F.col("l_returnflag").alias("meta.note.add"),
    )
    return melt_meta(wide, ["l_orderkey", "l_linenumber"])


ORACLE_MELT = """
SELECT l_orderkey, l_linenumber, 'quantity' AS meta_key, 'update' AS mode,
       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) AS meta_value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice', 'update',
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'note', 'add', l_returnflag
FROM lineitem
"""


def q_upsert_merge(spark, sf_dir):
    """L5/J4 join-based MERGE: source rows win on key match, unmatched
    target rows survive, unmatched source rows insert."""
    o = _t(spark, sf_dir).orders()
    target = (o.where(F.col("o_orderkey") % 3 != 0)
              .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    source = (o.where(F.col("o_orderkey") % 2 == 0)
              .select("o_orderkey",
                      F.lit("X").alias("o_orderstatus"),
                      (F.col("o_totalprice") * 2).alias("o_totalprice")))
    return merge_upsert(target, source, ["o_orderkey"])


ORACLE_UPSERT = """
WITH target AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey % 3 <> 0
), source AS (
  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT t.* FROM target t
WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
UNION ALL
SELECT * FROM source
"""


def q_cascaded_lookup(spark, sf_dir):
    """J5/J6 existence probe with key fallback (email→login pattern):
    probe by exact custkey, else by nation's min customer."""
    t = _t(spark, sf_dir)
    o, c = t.orders(), t.customer()
    incoming = o.select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 2 == 0, F.col("o_custkey"))
        .otherwise(F.col("o_custkey") + 10000000).alias("c_custkey"),
        (F.col("o_orderkey") % 25).cast("int").alias("c_nationkey"))
    out = cascaded_lookup(incoming, c, "c_custkey",
                          [["c_custkey"], ["c_nationkey"]])
    return out.select("o_orderkey", "matched_id")


ORACLE_CASCADE = """
WITH inc AS (
  SELECT o_orderkey,
    CASE WHEN o_custkey % 2 = 0 THEN o_custkey
         ELSE o_custkey + 10000000 END AS k1,
    CAST(o_orderkey % 25 AS INTEGER) AS k2
  FROM orders
), p1 AS (
  SELECT c_custkey AS k1, min(c_custkey) AS h1 FROM customer GROUP BY 1
), p2 AS (
  SELECT c_nationkey AS k2, min(c_custkey) AS h2 FROM customer GROUP BY 1
)
SELECT o_orderkey, coalesce(h1, h2) AS matched_id
FROM inc LEFT JOIN p1 USING (k1) LEFT JOIN p2 USING (k2)
"""


def q_hierarchy_resolve(spark, sf_dir):
    """J8 iterative parent-hierarchy resolution on a synthetic part tree
    (parent = ⌊key/2⌋; keys ≤ 1 are roots)."""
    p = _t(spark, sf_dir).part()
    nodes = p.select(
        "p_partkey",
        F.when(F.col("p_partkey") <= 1, F.lit(None).cast("long"))
        .otherwise(F.floor(F.col("p_partkey") / 2).cast("long"))
        .alias("parent"))
    return resolve_paths(nodes, "p_partkey", "parent")


ORACLE_HIERARCHY = """
WITH RECURSIVE h AS (
  SELECT p_partkey, p_partkey AS root_id, 0 AS depth
  FROM part WHERE p_partkey <= 1
  UNION ALL
  SELECT p.p_partkey, h.root_id, h.depth + 1
  FROM part p JOIN h ON p.p_partkey > 1 AND p.p_partkey // 2 = h.p_partkey
)
SELECT p_partkey, CAST(root_id AS BIGINT) AS root_id,
       CAST(depth AS INTEGER) AS depth
FROM h
"""


def q_placeholder_subst(spark, sf_dir):
    """F19 %%placeholder%% substitution from a per-row value map; missing
    keys replace with '' (≙ WordPressMediaLoader.php:96-148)."""
    from wp_etl_migration_spark.functions.templates import (
        substitute_placeholders)
    o = _t(spark, sf_dir).orders()
    tpl = F.concat(F.lit("order %%id%% status "), F.col("o_orderstatus"),
                   F.lit(" x%%missing%%y"))
    vals = F.create_map(F.lit("id"), F.col("o_orderkey").cast("string"))
    return o.select(
        "o_orderkey",
        substitute_placeholders(tpl, vals, ["id", "missing"])
        .alias("rendered"))


ORACLE_PLACEHOLDER = """
SELECT o_orderkey,
  replace(replace('order %%id%% status ' || o_orderstatus
                  || ' x%%missing%%y',
          '%%id%%', CAST(o_orderkey AS VARCHAR)),
          '%%missing%%', '') AS rendered
FROM orders
"""


def q_media_dedupe_lookup(spark, sf_dir):
    """J7 media dedupe probe: attachment match by filename variants
    (base, base-1, base-2 before the extension) — the anti-join side of
    the media stage (≙ WPMediaLoader.php:354-426). The reference probes
    variants IN ORDER and returns the first hit, so ranking is by
    (variant index, att_id), not a global min over all variants."""
    from wp_etl_migration_spark.sinks.wordpress import filename_variants
    from wp_etl_migration_spark.functions.text import to_slug
    p = _t(spark, sf_dir).part()
    incoming = p.select(
        "p_partkey",
        F.concat(to_slug("p_name"), F.lit(".jpg")).alias("fname"))
    atts = (p.where(F.col("p_partkey") % 7 == 0)
            .select(F.col("p_partkey").alias("att_id"),
                    F.concat(to_slug("p_name"),
                             F.when(F.col("p_partkey") % 2 == 0,
                                    F.lit("-1")).otherwise(F.lit("")),
                             F.lit(".jpg")).alias("file")))
    probes = incoming.select(
        "p_partkey",
        F.posexplode(filename_variants(F.col("fname")))
        .alias("vidx", "variant"))
    hits = (probes.join(atts, probes.variant == atts.file)
            .groupBy("p_partkey")
            .agg(F.min(F.struct("vidx", "att_id")).alias("m"))
            .select("p_partkey", F.col("m.att_id").alias("att_id")))
    return (incoming.join(hits, "p_partkey", "left")
            .select("p_partkey", "fname", "att_id"))


ORACLE_MEDIA_DEDUPE = """
WITH slugged AS (
  SELECT p_partkey,
    regexp_replace(regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '-',
                   'g'), '^-+|-+$', '', 'g') AS slug
  FROM part
), incoming AS (
  SELECT p_partkey, slug || '.jpg' AS fname FROM slugged
), atts AS (
  SELECT p_partkey AS att_id,
    slug || CASE WHEN p_partkey % 2 = 0 THEN '-1' ELSE '' END || '.jpg'
      AS file
  FROM slugged WHERE p_partkey % 7 = 0
), probes AS (
  SELECT p_partkey, 0 AS vidx, fname AS variant FROM incoming
  UNION ALL
  SELECT p_partkey, 1, regexp_replace(fname, '\\.[^.]+$', '') || '-1'
    || regexp_extract(fname, '(\\.[^.]+)$', 1) FROM incoming
  UNION ALL
  SELECT p_partkey, 2, regexp_replace(fname, '\\.[^.]+$', '') || '-2'
    || regexp_extract(fname, '(\\.[^.]+)$', 1) FROM incoming
), ranked AS (
  SELECT p.p_partkey, a.att_id,
    row_number() OVER (PARTITION BY p.p_partkey
                       ORDER BY p.vidx, a.att_id) AS rn
  FROM probes p JOIN atts a ON p.variant = a.file
), hits AS (
  SELECT p_partkey, att_id FROM ranked WHERE rn = 1
)
SELECT i.p_partkey, i.fname, h.att_id
FROM incoming i LEFT JOIN hits h ON i.p_partkey = h.p_partkey
"""


def q_unpack_roundtrip(spark, sf_dir):
    """P3 prefix-reduce + nested unpack: dotted suffixes become struct
    fields (≙ BaseLoader.php:109-177), flattened back for the compare."""
    from wp_etl_migration_spark.operators.prefix import unpack_prefixed
    c = _t(spark, sf_dir).customer()
    wide = c.select(F.col("c_custkey").alias("x.key"),
                    F.col("c_name").alias("x.person.name"),
                    F.col("c_mktsegment").alias("x.person.segment"))
    nested = unpack_prefixed(wide, "x.")  # → key, person{name, segment}
    return nested.select("key",
                         F.col("person.name").alias("name"),
                         F.col("person.segment").alias("segment"))


ORACLE_UNPACK = """
SELECT c_custkey AS key, c_name AS name, c_mktsegment AS segment
FROM customer
"""


def q_date_validate(spark, sf_dir):
    """F13/F14 date normalize + validate: exact format, else ISO-8601,
    else fallback; rendered as the ATOM string (≙ WPPostsLoader.php:
    254-269 + EntryNormalizer.php:18-29)."""
    from wp_etl_migration_spark.functions.dates import (
        normalize_datetime, validate_date)
    o = _t(spark, sf_dir).orders()
    raw = (F.when(F.col("o_orderkey") % 3 == 0,
                  F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
           .when(F.col("o_orderkey") % 3 == 1,
                 F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
           .otherwise(F.lit("not a date")))
    parsed = validate_date(raw, fallback=F.lit("2000-01-01 00:00:00")
                           .cast("timestamp"))
    return o.select("o_orderkey", raw.alias("raw"),
                    normalize_datetime(parsed).alias("normalized"))


ORACLE_DATE_VALIDATE = """
WITH raw AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 3 = 0
           THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
         WHEN o_orderkey % 3 = 1
           THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
         ELSE 'not a date' END AS raw
  FROM orders
)
SELECT o_orderkey, raw,
  strftime(coalesce(try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                    try_cast(raw AS TIMESTAMP),
                    TIMESTAMP '2000-01-01'),
           '%Y-%m-%dT%H:%M:%S+00:00') AS normalized
FROM raw
"""


def q_sanitize_chain(spark, sf_dir):
    """F16 sanitize family: strip tags, %XX octets, whitespace collapse;
    absint (≙ WPPostsLoader.php:163-246 sanitize_text_field / absint);
    wp_kses_post allow-list HTML (≙ WPPostsLoader.php:180-182 — keeps
    safe tags/attrs, drops script markup and event handlers, rejects
    javascript: URLs); esc_url_raw (≙ WPUserLoader.php:166).

    The kses/url inputs are built deterministically from part columns so
    the DuckDB oracle can mirror the EXPECTED output by string
    construction — the oracle is the spec of the allow-list behavior,
    not a second HTML parser.
    """
    from wp_etl_migration_spark.functions.text import (
        absint, esc_url_raw, kses_post, sanitize_text_field)
    p = _t(spark, sf_dir).part()
    messy = F.concat(F.lit("<b>"), F.col("p_name"),
                     F.lit("</b> %4A\tend  here"))
    kses_in = F.concat(
        F.lit('<p class="lead" onclick="steal()">'), F.col("p_name"),
        F.lit('</p><script>evil()</script>'
              '<a href="javascript:x()" title="t">l1</a>'
              '<a href="https://example.com/a?b=1" onmouseover="h()">l2</a>'
              '<img src="https://img.example/x.png" alt="a" data-x="1" />'
              '<marquee>old</marquee><em>ok</em>'))
    key_s = F.col("p_partkey").cast("string")
    url_in = (F.when(F.col("p_partkey") % 3 == 0,
                     F.concat(F.lit("https://example.com/x?id="), key_s))
              .when(F.col("p_partkey") % 3 == 1,
                    F.concat(F.lit("javascript:alert("), key_s, F.lit(")")))
              .otherwise(F.concat(F.lit("  /rel/path "), key_s,
                                  F.lit("<> "))))
    return p.select(
        "p_partkey",
        sanitize_text_field(messy).alias("clean"),
        absint(F.col("p_partkey") - 1000).alias("abs_id"),
        kses_post(kses_in).alias("kses_clean"),
        esc_url_raw(url_in).alias("url_clean"))


ORACLE_SANITIZE = r"""
SELECT p_partkey,
  trim(regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace('<b>' || p_name || '</b> %4A' || chr(9)
                       || 'end  here', '<[^>]*>', '', 'g'),
        '%[a-fA-F0-9]{2}', '', 'g'),
      '[\x00-\x1F\x7F]', '', 'g'),
    '[ \t]+', ' ', 'g')) AS clean,
  abs(p_partkey - 1000) AS abs_id,
  '<p class="lead">' || p_name || '</p>evil()<a title="t">l1</a>'
    || '<a href="https://example.com/a?b=1">l2</a>'
    || '<img src="https://img.example/x.png" alt="a" />old<em>ok</em>'
    AS kses_clean,
  CASE WHEN p_partkey % 3 = 0
         THEN 'https://example.com/x?id=' || CAST(p_partkey AS VARCHAR)
       WHEN p_partkey % 3 = 1 THEN NULL
       ELSE '/rel/path%20' || CAST(p_partkey AS VARCHAR) END AS url_clean
FROM part
"""


def q_top_customers(spark, sf_dir):
    """Multi-join aggregation: lineitem ⋈ orders (shuffle) ⋈ customer
    (broadcast), decimal-exact revenue, top-10 with key tiebreak —
    the canonical join+agg plan the upsert/embed operators rely on."""
    t = _t(spark, sf_dir)
    l, o, c = t.lineitem(), t.orders(), t.customer()
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(6,4)")
              - F.col("l_discount").cast("decimal(6,4)")))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(F.sum(rev).cast("decimal(30,6)").cast("string")
                 .alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy(F.col("revenue").cast("double").desc(), "c_custkey")
            .limit(10))


ORACLE_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))
    AS DECIMAL(30,6)) AS VARCHAR) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY CAST(revenue AS DOUBLE) DESC, c_custkey
LIMIT 10
"""


def q_entity_embed_full(spark, sf_dir):
    """S6 composite entity scan: the posts-with-embeds shape — author
    struct (J1) + child-rows-to-map meta embed (J2/J3) in ONE plan:
    broadcast dim join + one grouped child aggregation."""
    t = _t(spark, sf_dir)
    o, c, l = t.orders(), t.customer(), t.lineitem()
    per_line = (l.groupBy("l_orderkey", "l_linenumber")
                .agg(F.sum(F.col("l_quantity").cast("long")).alias("__q")))
    entry = F.struct(F.col("l_linenumber").cast("string").alias("k"),
                     F.col("__q").alias("v"))
    meta = (per_line.groupBy("l_orderkey")
            .agg(F.to_json(F.map_from_entries(
                F.sort_array(F.collect_list(entry)))).alias("meta_json")))
    author = F.struct(F.col("c_name").alias("name"),
                      F.col("c_mktsegment").alias("segment"))
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
            .withColumn("author", author)
            .join(meta, o.o_orderkey == meta.l_orderkey)
            .select("o_orderkey",
                    F.col("author.name").alias("author_name"),
                    F.col("author.segment").alias("author_segment"),
                    "meta_json"))


ORACLE_ENTITY_EMBED = """
WITH per_line AS (
  SELECT l_orderkey, l_linenumber,
         sum(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY 1, 2
)
SELECT o_orderkey, c_name AS author_name, c_mktsegment AS author_segment,
  '{' || string_agg('"' || CAST(l_linenumber AS VARCHAR) || '":'
                    || CAST(q AS VARCHAR),
                    ',' ORDER BY CAST(l_linenumber AS VARCHAR)) || '}'
    AS meta_json
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
JOIN per_line ON l_orderkey = o_orderkey
GROUP BY 1, 2, 3
"""


def q_numeric_preserve(spark, sf_dir):
    """F18 numeric type preservation: integral strings canonicalize as
    longs, float-form as doubles, non-numerics pass through
    (≙ WPPostMetaLoader.php:177-205)."""
    from wp_etl_migration_spark.functions.numbers import (
        preserve_numeric_type)
    o = _t(spark, sf_dir).orders()
    raw = (F.when(F.col("o_orderkey") % 4 == 0,
                  F.concat(F.lit("0"), F.col("o_orderkey").cast("string")))
           .when(F.col("o_orderkey") % 4 == 1,
                 F.concat(F.col("o_orderkey").cast("string"),
                          F.lit(".2500")))
           .when(F.col("o_orderkey") % 4 == 2, F.lit("n/a"))
           .otherwise(F.concat(F.lit("-"),
                               F.col("o_orderkey").cast("string"))))
    return o.select("o_orderkey", raw.alias("raw"),
                    preserve_numeric_type(raw).alias("canonical"))


ORACLE_NUMERIC_PRESERVE = r"""
WITH r AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 4 = 0 THEN '0' || CAST(o_orderkey AS VARCHAR)
         WHEN o_orderkey % 4 = 1 THEN CAST(o_orderkey AS VARCHAR) || '.2500'
         WHEN o_orderkey % 4 = 2 THEN 'n/a'
         ELSE '-' || CAST(o_orderkey AS VARCHAR) END AS raw
  FROM orders
)
SELECT o_orderkey, raw,
  CASE WHEN regexp_matches(raw, '^-?\d+$')
         THEN CAST(CAST(raw AS BIGINT) AS VARCHAR)
       WHEN regexp_matches(raw, '^-?\d*\.\d+$')
         THEN CAST(CAST(raw AS DOUBLE) AS VARCHAR)
       ELSE raw END AS canonical
FROM r
"""


def q_html_blocks(spark, sf_dir):
    """F20 HTML → Gutenberg blocks (Arrow-batched pandas UDF): paragraph
    + separator round trip over synthesized HTML."""
    from wp_etl_migration_spark.functions.html import html_to_blocks
    d = _t(spark, sf_dir).documents()
    html = F.concat(F.lit("<p>"), F.col("text"), F.lit("</p><hr>"))
    return d.select("doc_id", html_to_blocks(html).alias("blocks"))


ORACLE_HTML_BLOCKS = """
SELECT doc_id,
  '<!-- wp:paragraph --><p>' || text || '</p><!-- /wp:paragraph -->'
  || chr(10) || chr(10)
  || '<!-- wp:separator --><hr class="wp-block-separator"/>'
  || '<!-- /wp:separator -->' AS blocks
FROM documents
"""


def q_regional_revenue(spark, sf_dir):
    """Six-table join (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation
    ⋈ region) with co-nation constraint and decimal-exact revenue per
    region — the deepest join-ordering/broadcast-planning exercise in
    the registry (TPC-H Q5 shape)."""
    t = _t(spark, sf_dir)
    l, o, c = t.lineitem(), t.orders(), t.customer()
    s, n, r = t.supplier(), t.nation(), t.region()
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(6,4)")
              - F.col("l_discount").cast("decimal(6,4)")))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, (l.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.sum(rev).cast("decimal(30,6)").cast("string")
                 .alias("revenue"),
                 F.count("*").alias("n_items")))


ORACLE_REGIONAL = """
SELECT r_name,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))
    AS DECIMAL(30,6)) AS VARCHAR) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_rollup_status(spark, sf_dir):
    """ROLLUP aggregation (absent in the reference — SURVEY §2.6 lists it
    as free-from-Spark; this query proves it against the oracle)."""
    o = _t(spark, sf_dir).orders()
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 dec_sum("o_totalprice", 2).alias("total")))


ORACLE_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE)
    AS total
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


# ------------------------------------------------------------ LLM pipeline

def q_dedup_exact(spark, sf_dir):
    """Exact dedup: one surviving doc_id per md5(text) digest."""
    d = _t(spark, sf_dir).documents()
    return exact_dedup(d, "doc_id", ["text"])


ORACLE_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
"""


_DUCK_SHINGLES = r"""
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
)"""


#: DuckDB mirror of operators.dedup.minhash_signatures' universal-hash
#: family: one md5 per shingle split into four 32-bit words, then
#: h_s = (A[s]·w[s mod 4] + B[s]) mod P (1-based list indexing in SQL).
_A_SQL = "[" + ", ".join(map(str, MINHASH_A)) + "]"
_B_SQL = "[" + ", ".join(map(str, MINHASH_B)) + "]"
def _duck_minhash_sig(src: str = "sh", num_hashes: int = 16) -> str:
    """MinHash signature CTEs reading (doc_id, shingle) from ``src``."""
    return f"""mw AS (
  SELECT doc_id,
    [('0x' || substr(md5(shingle), 1, 8))::BIGINT,
     ('0x' || substr(md5(shingle), 9, 8))::BIGINT,
     ('0x' || substr(md5(shingle), 17, 8))::BIGINT,
     ('0x' || substr(md5(shingle), 25, 8))::BIGINT] AS w
  FROM {src}
), sig AS (
  SELECT doc_id, seed,
    min(({_A_SQL}[seed + 1] * w[(seed % 4) + 1]
         + {_B_SQL}[seed + 1]) % {MINHASH_P}) AS minhash
  FROM mw, UNNEST(range(0, {num_hashes})) AS s(seed)
  GROUP BY doc_id, seed
)"""


#: Hot-shingle document-frequency cap for the Jaccard headline.  Shingles
#: shared by more docs than this (stop phrases) are dropped before the
#: inverted-index self-join — without it a handful of hot shingles makes
#: the join fan-out quadratic at scale (operators/dedup.py docstring).
JACCARD_MAX_DOC_FREQ = 100


def q_ngram_jaccard_dedup(spark, sf_dir):
    """Near-dup pairs by exact trigram-shingle Jaccard ≥ 0.8, with the
    hot-shingle doc-frequency cap wired in (the scale guard)."""
    d = _t(spark, sf_dir).documents()
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8,
                               max_doc_freq=JACCARD_MAX_DOC_FREQ)


ORACLE_JACCARD = f"""
WITH {_DUCK_SHINGLES}, rare AS (
  SELECT doc_id, shingle FROM sh
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {JACCARD_MAX_DOC_FREQ}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM rare GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM rare a JOIN rare b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, common,
       sa.n AS total_a, sb.n AS total_b,
       CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE)
         AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.8
"""


def q_pii_scrub(spark, sf_dir):
    """PII redaction round-trip: deterministic PII strings appended to
    some docs, then counted and scrubbed (operators/pii.py). Counts are
    taken in masking order so they always agree with the redaction."""
    from wp_etl_migration_spark.operators.pii import pii_counts, scrub_pii
    d = _t(spark, sf_dir).documents()
    salted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" contact user@example.com or 192.168.1.99"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" ssn 123-45-6789 phone (555) 123-4567"))
            .otherwise(F.lit(""))).alias("text"))
    return (salted.select("doc_id",
                          pii_counts("text").alias("p"),
                          F.md5(scrub_pii("text")).alias("clean_md5"))
            .select("doc_id", "p.*", "clean_md5"))


ORACLE_PII = r"""
WITH s AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0
       THEN ' contact user@example.com or 192.168.1.99' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
       THEN ' ssn 123-45-6789 phone (555) 123-4567' ELSE '' END AS t
  FROM documents
), e AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
      AS n_email,
    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g') AS t
  FROM s
), i AS (
  SELECT doc_id, n_email,
    CAST(len(regexp_extract_all(t,
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
    regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                   '<IP>', 'g') AS t
  FROM e
), n AS (
  SELECT doc_id, n_email, n_ip,
    CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT)
      AS n_ssn,
    regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t
  FROM i
)
SELECT doc_id, n_email, n_ip, n_ssn,
  CAST(len(regexp_extract_all(t,
    '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}')) AS BIGINT) AS n_phone,
  md5(regexp_replace(t, '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}',
                     '<PHONE>', 'g')) AS clean_md5
FROM n
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher repetition filters: duplicate-line/word fractions plus the
    top-bigram mass fraction (operators/textstats.repetition_stats)."""
    d = _t(spark, sf_dir).documents()
    return ts.repetition_stats(d, "doc_id", "text")


ORACLE_REPETITION = r"""
WITH t AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines,
         string_split_regex(lower(trim(text)), '\s+') AS w
  FROM documents
), base AS (
  SELECT doc_id,
    1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
        / CAST(len(lines) AS DOUBLE) AS dup_line_frac,
    1.0 - CAST(len(list_distinct(w)) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS dup_word_frac
  FROM t
), g AS (
  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bigram
  FROM t, UNNEST(range(1, len(w))) AS r(i)
  WHERE len(w) >= 2
), gc AS (
  SELECT doc_id, bigram, count(*) AS c FROM g GROUP BY 1, 2
), top AS (
  SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
    AS top_bigram_frac
  FROM gc GROUP BY 1
)
SELECT b.doc_id, b.dup_line_frac, b.dup_word_frac, t2.top_bigram_frac
FROM base b LEFT JOIN top t2 ON b.doc_id = t2.doc_id
"""


def q_cluster_centroids(spark, sf_dir):
    """Representative vector per cluster: DECIMAL-routed elementwise
    mean embeddings (operators/similarity.cluster_centroids), exploded
    to (component, pos, val) for the oracle. Clusters come from the
    label column (the graph path is driver-gated via dedup_clusters)."""
    from pyspark.sql import Window
    from wp_etl_migration_spark.operators.similarity import (
        cluster_centroids)
    e = _t(spark, sf_dir).embeddings()
    comp = e.select(
        F.col("vec_id").alias("node"),
        F.min("vec_id").over(Window.partitionBy("label"))
        .alias("component"))
    cent = cluster_centroids(e, comp, "vec_id", "embedding")
    return cent.select("component",
                       F.posexplode("centroid").alias("pos", "val"))


ORACLE_CENTROIDS = """
WITH comp AS (
  SELECT vec_id, embedding,
         min(vec_id) OVER (PARTITION BY label) AS component
  FROM embeddings
)
SELECT component, CAST(i - 1 AS INTEGER) AS pos,
  CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(25,9)))
       AS DOUBLE) / count(*) AS val
FROM comp, UNNEST(range(1, 65)) AS r(i)
GROUP BY component, i
"""


def q_pack_sequences(spark, sf_dir):
    """Greedy contiguous sequence packing into 512-token bins, ordered
    by doc_id — distributed prefix sum via range partitions + partition
    offsets (operators/packing.py)."""
    from wp_etl_migration_spark.operators.packing import pack_sequences
    d = _t(spark, sf_dir).documents()
    with_tokens = d.select(
        "doc_id", ts.token_count("text").alias("n_tokens"))
    return pack_sequences(with_tokens, "doc_id", "n_tokens", seq_len=512)


ORACLE_PACK = r"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS before
  FROM t
)
SELECT doc_id, CAST(before // 512 AS BIGINT) AS bin_id,
       CAST(before % 512 AS BIGINT) AS bin_offset, n_tokens
FROM c
"""


def q_contamination(spark, sf_dir):
    """Benchmark-contamination sweep: docs sharing any 4-gram with the
    deterministic eval subset (doc_id % 29 == 0). Eval shingles are
    broadcast — the corpus side never shuffles (operators/dedup.py
    contamination). (mod 29 / n=4 chosen so the sf0.01 driver row has
    a few dozen matches — a substantive hash witness — instead of the
    1 row the original 97/5 parameters produced.)"""
    from wp_etl_migration_spark.operators.dedup import contamination
    d = _t(spark, sf_dir).documents()
    ev = d.where(F.col("doc_id") % 29 == 0)
    co = d.where(F.col("doc_id") % 29 != 0)
    return contamination(co, ev, "doc_id", "text", n=4)


ORACLE_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), sh4 AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS shingle
  FROM toks, UNNEST(range(1, len(t) - 2)) AS r(i)
  WHERE len(t) >= 4
), ev AS (
  SELECT DISTINCT shingle FROM sh4 WHERE doc_id % 29 = 0
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM sh4 s JOIN ev USING (shingle)
WHERE s.doc_id % 29 <> 0
GROUP BY 1
"""


def q_gopher_quality(spark, sf_dir):
    """Gopher/MassiveText quality-filter rules (Rae et al. 2021 §A1.1)
    as per-doc booleans + overall pass (operators/textstats.py;
    min_words lowered to 10 for the short synthetic docs)."""
    d = _t(spark, sf_dir).documents()
    return (d.select("doc_id",
                     ts.gopher_rules("text", min_words=10).alias("r"))
            .select("doc_id", "r.*"))


_GOPHER_SW_SQL = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"
ORACLE_GOPHER = rf"""
WITH g AS (
  SELECT doc_id,
    string_split_regex(lower(trim(text)), '\s+') AS toks,
    string_split(text, chr(10)) AS lines,
    CAST(length(trim(text)) AS BIGINT) AS n_chars,
    CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS BIGINT) AS symbols,
    CAST(len(regexp_extract_all(chr(10) || text, '\n\s*[-•*]')) AS BIGINT)
      AS bullet_lines
  FROM documents
), f AS (
  SELECT doc_id, n_chars, symbols, bullet_lines,
    CAST(len(toks) AS BIGINT) AS n_words,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines,
      ln -> regexp_matches(trim(ln), '(\.\.\.|…)$'))) AS BIGINT)
      AS ellipsis_lines,
    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS BIGINT)
      AS alpha_words,
    CAST(len(list_distinct(list_filter(toks,
      t -> list_contains({_GOPHER_SW_SQL}, t)))) AS BIGINT) AS stop_hits
  FROM g
)
SELECT doc_id,
  n_words >= 10 AND n_words <= 100000 AS word_count_ok,
  CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0
    AND CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE)
      <= 10.0 AS mean_word_len_ok,
  CAST(symbols AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1
    AS symbol_ratio_ok,
  CAST(bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.9
    AS bullet_ratio_ok,
  CAST(ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.3
    AS ellipsis_ratio_ok,
  CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8
    AS alpha_ratio_ok,
  stop_hits >= 2 AS stopword_ok,
  (n_words >= 10 AND n_words <= 100000)
    AND (CAST(n_chars - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE)
           BETWEEN 3.0 AND 10.0)
    AND CAST(symbols AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1
    AND CAST(bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.9
    AND CAST(ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.3
    AND CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8
    AND stop_hits >= 2 AS passes
FROM f
"""


def q_hash_sample(spark, sf_dir):
    """Deterministic stratified sampling keyed on doc_id (language
    rebalancing shape: keep all Spanish, half English, quarter rest).
    Content-addressed keep decision — reproducible on any engine/run
    (operators/sampling.py)."""
    from wp_etl_migration_spark.operators.sampling import (
        stratified_hash_sample)
    d = _t(spark, sf_dir).documents()
    return stratified_hash_sample(
        d.select("doc_id", "lang"), "doc_id", "lang",
        {"en": 0.5, "es": 1.0}, default=0.25, salt="bench")


ORACLE_HASH_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('bench' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
  < CASE lang WHEN 'en' THEN 2147483648
              WHEN 'es' THEN 4294967296
              ELSE 1073741824 END
"""


def q_incremental_lsh(spark, sf_dir):
    """Incremental dedup: documents with doc_id % 10 == 0 play the new
    crawl batch, the rest the already-indexed corpus. Only the batch is
    shingled/signed; the corpus contributes its stored (id, band,
    band_hash) index (operators/dedup.lsh_bands /
    incremental_lsh_pairs)."""
    from wp_etl_migration_spark.operators.dedup import (
        incremental_lsh_pairs, lsh_bands)
    d = _t(spark, sf_dir).documents()
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    idx = lsh_bands(corpus, "doc_id", "text", n=3, num_hashes=16,
                    rows_per_band=2)
    return incremental_lsh_pairs(new, idx, "doc_id", "text", n=3,
                                 num_hashes=16, rows_per_band=2)


ORACLE_INCREMENTAL_LSH = f"""
WITH {_DUCK_SHINGLES}, {_duck_minhash_sig()}, bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY minhash))
           AS band_hash
  FROM sig GROUP BY doc_id, band
)
SELECT a.doc_id AS id_new, b.doc_id AS id_other,
       b.doc_id % 10 = 0 AS other_is_new,
       count(*) AS agreeing_bands
FROM bands a JOIN bands b USING (band, band_hash)
WHERE a.doc_id % 10 = 0 AND a.doc_id <> b.doc_id
  AND (b.doc_id % 10 <> 0 OR a.doc_id < b.doc_id)
GROUP BY 1, 2, 3
"""


_PROFILE_COLS = ("o_orderkey", "o_orderstatus", "o_orderdate",
                 "o_orderpriority")


def q_table_profile(spark, sf_dir):
    """One-pass per-column profile of orders: rows, nulls, exact
    distincts, min/max rendered as strings
    (operators/profile.profile_table)."""
    from wp_etl_migration_spark.operators.profile import profile_table
    o = _t(spark, sf_dir).orders()
    return profile_table(o, list(_PROFILE_COLS))


ORACLE_TABLE_PROFILE = "\nUNION ALL\n".join(f"""
SELECT '{c}' AS col_name, count(*) AS n_rows,
  CAST(count(*) FILTER ({c} IS NULL) AS BIGINT) AS n_nulls,
  count(DISTINCT {c}) AS n_distinct,
  CAST(min({c}) AS VARCHAR) AS min_str,
  CAST(max({c}) AS VARCHAR) AS max_str
FROM orders""" for c in _PROFILE_COLS)


def q_key_skew(spark, sf_dir):
    """Hot-key shuffle diagnostic: top keys of orders.o_orderpriority by
    count with share and skew factor
    (operators/profile.key_skew_profile)."""
    from wp_etl_migration_spark.operators.profile import key_skew_profile
    o = _t(spark, sf_dir).orders()
    return key_skew_profile(o, "o_orderpriority", top_k=5)


ORACLE_KEY_SKEW = """
WITH counts AS (
  SELECT CAST(o_orderpriority AS VARCHAR) AS key, count(*) AS n
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(sum(n) AS DOUBLE) AS total, avg(n) AS mean FROM counts
)
SELECT key, n, n / total AS share, n / mean AS skew_factor
FROM counts, t
QUALIFY row_number() OVER (ORDER BY n DESC, key) <= 5
"""


def q_corpus_report(spark, sf_dir):
    """Integer contract of the one-row corpus health report
    (operators/profile.corpus_report): doc/token counts + the
    lang histogram, exploded to scalar rows. Float fields
    (avg_tokens, avg_quality) and the HLL distinct/dup-rate are
    diagnostics, not cross-engine contracts — excluded (VERDICT r5
    #8)."""
    from wp_etl_migration_spark.operators.profile import corpus_report
    d = _t(spark, sf_dir).documents()
    rep = corpus_report(d, "doc_id", "text", lang_col="lang")
    return (rep.select(
        "n_docs", "n_tokens",
        F.explode("langs").alias("lang", "lang_docs")))


ORACLE_CORPUS_REPORT = r"""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split_regex(lower(trim(text)), '\s+')))
              AS BIGINT) AS n_tokens
  FROM documents
), l AS (
  SELECT coalesce(CAST(lang AS VARCHAR), 'unknown') AS lang,
         CAST(count(*) AS BIGINT) AS lang_docs
  FROM documents GROUP BY 1
)
SELECT m.n_docs, m.n_tokens, l.lang, l.lang_docs FROM m, l
"""


def q_profile_diff(spark, sf_dir):
    """Snapshot drift report (operators/profile.profile_diff): the
    'after' extract drops a third of the rows, nulls lang on even
    ids, removes source and adds n_chars — exercising all four
    statuses (ok / drifted / removed / added). exact_distinct=True is
    the engine-portable contract mode (HLL stays the 100 TB default);
    null rates are single divisions of exact integers (VERDICT r5
    #8)."""
    from wp_etl_migration_spark.operators.profile import profile_diff
    d = _t(spark, sf_dir).documents()
    before = d.select("doc_id", "lang", "source")
    after = (d.where(F.col("doc_id") % 3 != 0)
             .select("doc_id",
                     F.when(F.col("doc_id") % 2 == 0,
                            F.col("lang")).alias("lang"),
                     "n_chars"))
    return profile_diff(before, after, exact_distinct=True)


ORACLE_PROFILE_DIFF = """
WITH b AS (SELECT doc_id, lang, source FROM documents),
a AS (SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN lang END AS lang,
             n_chars
      FROM documents WHERE doc_id % 3 != 0),
bp AS (
  SELECT 'doc_id' AS col_name,
    CAST(count(*) FILTER (doc_id IS NULL) AS DOUBLE)
      / CAST(count(*) AS DOUBLE) AS null_rate_before,
    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_before
  FROM b
  UNION ALL
  SELECT 'lang',
    CAST(count(*) FILTER (lang IS NULL) AS DOUBLE)
      / CAST(count(*) AS DOUBLE),
    CAST(count(DISTINCT lang) AS BIGINT) FROM b
  UNION ALL
  SELECT 'source',
    CAST(count(*) FILTER (source IS NULL) AS DOUBLE)
      / CAST(count(*) AS DOUBLE),
    CAST(count(DISTINCT source) AS BIGINT) FROM b
), ap AS (
  SELECT 'doc_id' AS col_name,
    CAST(count(*) FILTER (doc_id IS NULL) AS DOUBLE)
      / CAST(count(*) AS DOUBLE) AS null_rate_after,
    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_after
  FROM a
  UNION ALL
  SELECT 'lang',
    CAST(count(*) FILTER (lang IS NULL) AS DOUBLE)
      / CAST(count(*) AS DOUBLE),
    CAST(count(DISTINCT lang) AS BIGINT) FROM a
  UNION ALL
  SELECT 'n_chars',
    CAST(count(*) FILTER (n_chars IS NULL) AS DOUBLE)
      / CAST(count(*) AS DOUBLE),
    CAST(count(DISTINCT n_chars) AS BIGINT) FROM a
)
SELECT coalesce(bp.col_name, ap.col_name) AS col_name,
  CASE WHEN bp.col_name IS NULL THEN 'added'
       WHEN ap.col_name IS NULL THEN 'removed'
       WHEN abs(null_rate_after - null_rate_before) > 0.05
         OR abs(CAST(n_distinct_after AS DOUBLE)
                - CAST(n_distinct_before AS DOUBLE))
            > 0.5 * greatest(CAST(n_distinct_before AS DOUBLE), 1.0)
       THEN 'drifted' ELSE 'ok' END AS status,
  null_rate_before, null_rate_after,
  n_distinct_before, n_distinct_after
FROM bp FULL OUTER JOIN ap ON bp.col_name = ap.col_name
"""


def q_shared_gram_stats(spark, sf_dir):
    """Duplicate-passage tagging: per doc, the fraction of word 8-gram
    starts shared with at least one other document (hot grams capped at
    df 100) — the dup-tagging quality signal
    (operators/textstats.shared_gram_stats)."""
    from wp_etl_migration_spark.operators.textstats import (
        shared_gram_stats)
    d = _t(spark, sf_dir).documents()
    return shared_gram_stats(d, "doc_id", "text", k=8, max_doc_freq=100)


ORACLE_SHARED_GRAMS = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i)
  WHERE len(t) >= 8
), perdoc AS (
  SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1
), dfreq AS (
  SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1
), shared AS (
  SELECT gram FROM dfreq WHERE df >= 2 AND df <= 100
), dup AS (
  SELECT doc_id, count(*) AS n_dup FROM g JOIN shared USING (gram)
  GROUP BY 1
)
SELECT p.doc_id, p.n_grams,
       coalesce(d.n_dup, 0) AS n_dup_grams,
       CAST(coalesce(d.n_dup, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
         AS dup_fraction
FROM perdoc p LEFT JOIN dup d USING (doc_id)
"""


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic sampling: keep probability rises
    with document length (min(1, n_tokens/128)) — the importance-
    resampling step of a curation pipeline
    (operators/sampling.weighted_hash_sample)."""
    from wp_etl_migration_spark.operators.sampling import (
        weighted_hash_sample)
    d = _t(spark, sf_dir).documents()
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = toks.cast("double") / F.lit(128.0)
    return (weighted_hash_sample(d.select("doc_id", "text"), "doc_id",
                                 w, salt="wq")
            .select("doc_id"))


ORACLE_WEIGHTED_SAMPLE = r"""
SELECT doc_id FROM documents
WHERE CAST(('0x' || substr(md5('wq' || CAST(doc_id AS VARCHAR)), 1, 8))
             ::BIGINT AS DOUBLE)
  < least(greatest(CAST(len(string_split_regex(trim(text), '\s+'))
                        AS DOUBLE) / 128.0, 0.0), 1.0) * 4294967296.0
"""


def q_dedup_clusters(spark, sf_dir):
    """Dedup cluster resolution: exact-Jaccard near-dup pairs → connected
    components (min-label propagation, operators/graph.py) → one
    component label per clustered doc. The step between pair generation
    and the keep-list in a dedup pipeline."""
    from wp_etl_migration_spark.operators.graph import connected_components
    d = _t(spark, sf_dir).documents()
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8,
                                max_doc_freq=JACCARD_MAX_DOC_FREQ)
    return connected_components(pairs)


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_DUCK_SHINGLES}, rare AS (
  SELECT doc_id, shingle FROM sh
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {JACCARD_MAX_DOC_FREQ}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM rare GROUP BY 1
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM rare a JOIN rare b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), j AS (
  SELECT id_a, id_b FROM p
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.8
), edges AS (
  SELECT id_a AS u, id_b AS v FROM j
  UNION
  SELECT id_b, id_a FROM j
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
"""


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures: 16 universal-family hashes per doc from ONE
    md5 per shingle (operators/dedup.py minhash_signatures)."""
    d = _t(spark, sf_dir).documents()
    sig = minhash_signatures(d, "doc_id", "text", n=3, num_hashes=16)
    return sig.select("doc_id", F.col("seed").cast("int").alias("seed"),
                      "minhash")


ORACLE_MINHASH = f"""
WITH {_DUCK_SHINGLES}, {_duck_minhash_sig()}
SELECT doc_id, CAST(seed AS INTEGER) AS seed, minhash
FROM sig
"""


def q_token_stats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex pre-tokenizer) +
    document fingerprint + stopword hits + array-function breadth
    (distinct/sort/slice/contains) in ONE pass over `documents`.
    Consolidates the former bpe_token_stats / array_ops driver rows
    (still parity-tested via EXTRA_REGISTRY)."""
    d = _t(spark, sf_dir).documents()
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        ts.token_count("text").alias("n_tokens"),
        ts.bpe_token_count("text").alias("n_bpe"),
        ts.fingerprint("text").alias("fingerprint"),
        ts.stopword_hits("text", ts.LANG_STOPWORDS["en"]).alias("stop_hits"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.concat_ws(" ", F.slice(F.array_sort(F.array_distinct(toks)),
                                 1, 3)).alias("first3"),
        F.array_contains(toks, "the").cast("int").alias("has_the"))


ORACLE_TOKEN = r"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
    AS n_tokens,
  CAST(len(regexp_extract_all(lower(trim(text)),
       '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
  substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16)
    AS fingerprint,
  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
       t -> list_contains(['the','a','of','and','to'], t))) AS BIGINT)
    AS stop_hits,
  len(list_distinct(toks)) AS n_unique,
  array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS first3,
  CAST(list_contains(toks, 'the') AS INT) AS has_the
FROM t
"""


def q_text_quality(spark, sf_dir):
    """Language-ID + heuristic quality score in ONE pass over
    `documents` (consolidates the former lang_id / quality_score driver
    rows; still parity-tested individually via EXTRA_REGISTRY)."""
    d = _t(spark, sf_dir).documents()
    return d.select("doc_id",
                    ts.lang_id("text").alias("lang_pred"),
                    ts.quality_score("text").alias("quality"))


def q_quality_score(spark, sf_dir):
    """Heuristic quality scoring (length/word-length/stopword features)."""
    d = _t(spark, sf_dir).documents()
    return d.select("doc_id",
                    ts.quality_score("text").alias("quality"))


ORACLE_QUALITY = r"""
WITH f AS (
  SELECT doc_id,
    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_tok,
    CAST(length(trim(text)) AS BIGINT) AS n_chars,
    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
         t -> list_contains(['the','a','of','and','to'], t))) AS BIGINT)
      AS hits
  FROM documents
)
SELECT doc_id,
  (least(1.0, CAST(n_tok AS DOUBLE) / 64.0)
   + (CASE WHEN CAST(n_chars - (n_tok - 1) AS DOUBLE) / CAST(n_tok AS DOUBLE)
             >= 3.0
           AND CAST(n_chars - (n_tok - 1) AS DOUBLE) / CAST(n_tok AS DOUBLE)
             <= 10.0
      THEN 1.0 ELSE 0.0 END)
   + least(1.0, 4.0 * CAST(hits AS DOUBLE) / CAST(n_tok AS DOUBLE))) / 3.0
    AS quality
FROM f
"""


def q_lang_id(spark, sf_dir):
    """Stopword-hit language ID with deterministic tiebreak."""
    d = _t(spark, sf_dir).documents()
    return d.select("doc_id", ts.lang_id("text").alias("lang_pred"))


_HITS = (r"CAST(len(list_filter(string_split_regex(lower(trim(text)),"
         r" '\s+'), t -> list_contains({words}, t))) AS BIGINT)")

ORACLE_LANG = f"""
WITH h AS (
  SELECT doc_id,
    {_HITS.format(words="['der','die','das','und','ist']")} AS h_de,
    {_HITS.format(words="['the','a','of','and','to']")} AS h_en,
    {_HITS.format(words="['el','la','de','que','los']")} AS h_es,
    {_HITS.format(words="['le','la','les','des','et']")} AS h_fr
  FROM documents
)
SELECT doc_id,
  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM h
"""

ORACLE_TEXT_QUALITY = f"""
WITH h AS (
  SELECT doc_id,
    {_HITS.format(words="['der','die','das','und','ist']")} AS h_de,
    {_HITS.format(words="['the','a','of','and','to']")} AS h_en,
    {_HITS.format(words="['el','la','de','que','los']")} AS h_es,
    {_HITS.format(words="['le','la','les','des','et']")} AS h_fr,
    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
      AS n_tok,
    CAST(length(trim(text)) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id,
  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
       ELSE 'fr' END AS lang_pred,
  (least(1.0, CAST(n_tok AS DOUBLE) / 64.0)
   + (CASE WHEN CAST(n_chars - (n_tok - 1) AS DOUBLE) / CAST(n_tok AS DOUBLE)
             >= 3.0
           AND CAST(n_chars - (n_tok - 1) AS DOUBLE) / CAST(n_tok AS DOUBLE)
             <= 10.0
      THEN 1.0 ELSE 0.0 END)
   + least(1.0, 4.0 * CAST(h_en AS DOUBLE) / CAST(n_tok AS DOUBLE))) / 3.0
    AS quality
FROM h
"""


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors per vector (ANN baseline)."""
    e = _t(spark, sf_dir).embeddings()
    return cosine_topk(e, "vec_id", "embedding", k=5)


ORACLE_TOPK = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
      / (sqrt(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))
         * sqrt(list_sum(list_transform(range(1, 65), i -> b.e[i] * b.e[i]))))
      AS sim
  FROM v a, v b WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
      AS rank
  FROM sims
) WHERE rank <= 5
"""


def q_minhash_lsh_dedup(spark, sf_dir):
    """Banded MinHash LSH near-dup pipeline: hot-shingle DF cap → 16
    hashes, bands of 2 → candidate pairs by band-bucket equi-join →
    CANDIDATE-ONLY exact-Jaccard verify ≥ 0.7 (array_intersect over
    per-doc shingle sets — operators/dedup.py:minhash_lsh_pairs). The
    100 TB dedup path: linear signature pass + candidate-bounded verify,
    no inverted-index self-join anywhere in the plan."""
    d = _t(spark, sf_dir).documents()
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=16,
                             rows_per_band=2, verify_threshold=0.7,
                             max_doc_freq=JACCARD_MAX_DOC_FREQ)


# The oracle verifies candidates the same capped-shingle way; DuckDB at
# sf0.01 can afford per-candidate list_intersect directly.
ORACLE_LSH_DEDUP = f"""
WITH {_DUCK_SHINGLES}, shc AS (
  SELECT doc_id, shingle FROM sh
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {JACCARD_MAX_DOC_FREQ}
), {_duck_minhash_sig("shc")}, bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY minhash))
           AS band_hash
  FROM sig GROUP BY doc_id, band
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS agreeing_bands
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), sets AS (
  SELECT doc_id, list(shingle) AS s, count(*) AS n FROM shc GROUP BY 1
)
SELECT id_a, id_b, agreeing_bands,
  CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
    / CAST(sa.n + sb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE)
    AS jaccard
FROM cand
JOIN sets sa ON sa.doc_id = id_a
JOIN sets sb ON sb.doc_id = id_b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
    / CAST(sa.n + sb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.7
"""


def q_simhash_signatures(spark, sf_dir):
    """32-bit SimHash signature per document (portable md5-nibble votes)."""
    d = _t(spark, sf_dir).documents()
    return simhash_signatures(d, "doc_id", "text", bits=32)


def _simhash_duck_ctes(bits: int = 32) -> str:
    votes = ",\n    ".join(
        f"sum((((strpos('{HEX}', substring(h, {j // 4 + 1}, 1)) - 1)"
        f" // {2 ** (j % 4)}) % 2) * 2 - 1) AS s{j}"
        for j in range(bits))
    sig = " || ".join(f"CASE WHEN s{j} >= 0 THEN '1' ELSE '0' END"
                      for j in range(bits))
    return rf"""
stoks AS (
  SELECT doc_id,
    unnest(list_distinct(string_split_regex(lower(trim(text)), '\s+')))
      AS tok
  FROM documents
), th AS (
  SELECT doc_id, md5(tok) AS h FROM stoks
), votes AS (
  SELECT doc_id, {votes}
  FROM th GROUP BY doc_id
), sig AS (
  SELECT doc_id, {sig} AS simhash FROM votes
)"""


ORACLE_SIMHASH = f"WITH {_simhash_duck_ctes()} SELECT doc_id, simhash FROM sig"


def q_simhash_near_dup(spark, sf_dir):
    """SimHash near-dup pairs at 64 bits: 4-chunk candidate equi-join
    (complete for Hamming ≤ 3 by pigeonhole; 16-bit chunks keep bucket
    collisions ~N/65536) + XOR-popcount verify on candidates only."""
    d = _t(spark, sf_dir).documents()
    return simhash_near_dup(d, "doc_id", "text", bits=64, chunks=4,
                            max_hamming=3)


def _hamming_sql(bits: int = 32) -> str:
    return " + ".join(
        f"CASE WHEN substring(sa, {j + 1}, 1) <> substring(sb, {j + 1}, 1)"
        f" THEN 1 ELSE 0 END" for j in range(bits))


ORACLE_SIMHASH_PAIRS = f"""
WITH {_simhash_duck_ctes(64)}, ch AS (
  SELECT doc_id, simhash, c, substring(simhash, c * 16 + 1, 16) AS v
  FROM sig, UNNEST(range(0, 4)) AS r(c)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sa, b.simhash AS sb
  FROM ch a JOIN ch b ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM (
  SELECT id_a, id_b, CAST({_hamming_sql(64)} AS BIGINT) AS hamming
  FROM cand
) WHERE hamming <= 3
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (cos ≥ 0.35, exact kernel)."""
    e = _t(spark, sf_dir).embeddings()
    return embedding_near_dup(e, "vec_id", "embedding", threshold=0.35,
                              dims=64)


ORACLE_EMB_NEAR_DUP = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), n AS (
  SELECT vec_id, e,
    sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i]))) AS nm
  FROM v
)
SELECT id_a, id_b, cos_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
      / (a.nm * b.nm) AS cos_sim
  FROM n a, n b WHERE a.vec_id < b.vec_id
) WHERE cos_sim >= 0.35
"""


#: Fixed centroid count for the IVF headline — independent of corpus
#: size (the driver collect and broadcast are bounded by this, never N).
IVF_NUM_CENTROIDS = 64


def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN: coarse-quantize to a fixed-size hash-sampled centroid set
    (md5-of-id top-K; broadcast N×C assignment), then top-5 within the
    cell (nprobe=1)."""
    e = _t(spark, sf_dir).embeddings()
    return ivf_topk(e, "vec_id", "embedding", k=5,
                    num_centroids=IVF_NUM_CENTROIDS)


ORACLE_IVF = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), n AS (
  SELECT vec_id, e,
    sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i]))) AS nm
  FROM v
), c AS (
  SELECT vec_id AS cid, e AS ce, nm AS cnm FROM n
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {IVF_NUM_CENTROIDS}
), assign AS (
  SELECT vec_id, e, nm, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY
      list_sum(list_transform(range(1, 65), i -> e[i] * ce[i]))
        / (nm * cnm) DESC, cid) AS rn
  FROM n, c
), cell AS (
  SELECT vec_id, e, nm, cid FROM assign WHERE rn = 1
), sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
      / (a.nm * b.nm) AS sim
  FROM cell a JOIN cell b USING (cid)
  WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
      AS rank
  FROM sims
) WHERE rank <= 5
"""


def q_kmeans_centroids(spark, sf_dir):
    """Distributed Lloyd's k-means fit (8 clusters, 2 iterations,
    deterministic md5 hash-sample init) — the production centroid
    provider for the IVF path (operators/similarity.kmeans_centroids).
    Oracle unrolls both iterations in SQL with the same decimal-sum
    means and smallest-id tiebreaks.

    Output is posexploded to scalar rows (cluster_id, dim, value,
    n_members): the driver's canonicalizer hash-sorts column values and
    cannot hash an array<double> cell, and per-element scalars also obey
    the parity float rules (each value is one decimal-sum/count
    division, never a re-summed double)."""
    from wp_etl_migration_spark.operators.similarity import (
        kmeans_centroids)
    e = _t(spark, sf_dir).embeddings()
    cents = kmeans_centroids(e, "vec_id", "embedding", k=8, iters=2)
    return cents.select(
        "cluster_id",
        F.posexplode("centroid").alias("dim", "value"),
        "n_members")


def _kmeans_iter_sql(prev: str, a: str, m: str, nxt: str) -> str:
    """One unrolled Lloyd iteration: assign to argmax dot/|c| (cid
    tiebreak) → per-dim decimal means → empty cells keep prev centroid."""
    return f"""{a} AS (
  SELECT vec_id, e, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY
      list_sum(list_transform(range(1, 65), i -> e[i] * ce[i]))
        / sqrt(list_sum(list_transform(range(1, 65), i -> ce[i] * ce[i])))
        DESC, cid) AS rn
  FROM v, {prev}
), {m} AS (
  SELECT cid, i,
    CAST(sum(CAST(e[i] AS DECIMAL(25,9))) AS DOUBLE) / count(*) AS mu,
    count(*) AS n
  FROM (SELECT e, cid FROM {a} WHERE rn = 1), UNNEST(range(1, 65)) AS r(i)
  GROUP BY cid, i
), {nxt} AS (
  SELECT p.cid,
    coalesce(g.ce, p.ce) AS ce,
    coalesce(g.n, 0) AS n
  FROM {prev} p LEFT JOIN (
    SELECT cid, list(mu ORDER BY i) AS ce, min(n) AS n
    FROM {m} GROUP BY cid) g USING (cid)
)"""


ORACLE_KMEANS = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), c0 AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           - 1 AS cid,
         e AS ce, 0 AS n
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
), {_kmeans_iter_sql('c0', 'a1', 'm1', 'c1')},
{_kmeans_iter_sql('c1', 'a2', 'm2', 'c2')}
SELECT CAST(cid AS INTEGER) AS cluster_id,
       CAST(i - 1 AS INTEGER) AS dim,
       ce[i] AS value,
       CAST(n AS BIGINT) AS n_members
FROM c2, UNNEST(range(1, 65)) AS r(i)
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup keep-list: k-means cells (8
    clusters, 2 iterations) → cell-local cosine near-dup pairs ≥ 0.35 →
    connected components → min-id representative per cluster
    (operators/similarity.semantic_dedup). The oracle replays the
    entire pipeline — unrolled Lloyd fit, assignment, pair join, and a
    recursive-CTE component closure — in SQL."""
    from wp_etl_migration_spark.operators.similarity import semantic_dedup
    e = _t(spark, sf_dir).embeddings()
    return semantic_dedup(e, "vec_id", "embedding", k=8, iters=2,
                          threshold=0.35)


ORACLE_SEMANTIC_DEDUP = f"""
WITH RECURSIVE v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), c0 AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           - 1 AS cid,
         e AS ce, 0 AS n
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
), {_kmeans_iter_sql('c0', 'a1', 'm1', 'c1')},
{_kmeans_iter_sql('c1', 'a2', 'm2', 'c2')}, a3 AS (
  SELECT vec_id, e, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY
      list_sum(list_transform(range(1, 65), i -> e[i] * ce[i]))
        / sqrt(list_sum(list_transform(range(1, 65), i -> ce[i] * ce[i])))
        DESC, cid) AS rn
  FROM v, c2
), cell AS (
  SELECT vec_id, e, cid,
    sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i]))) AS nm
  FROM a3 WHERE rn = 1
), prs AS (
  SELECT a.vec_id AS u, b.vec_id AS w
  FROM cell a JOIN cell b USING (cid)
  WHERE a.vec_id < b.vec_id
    AND list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
          / (a.nm * b.nm) >= 0.35
), edges AS (
  SELECT u, w FROM prs UNION SELECT w, u FROM prs
), reach AS (
  SELECT u, w FROM edges
  UNION
  SELECT r.u, e2.w FROM reach r JOIN edges e2 ON r.w = e2.u
), comp AS (
  SELECT u AS node, least(u, min(w)) AS component FROM reach GROUP BY u
)
SELECT vec_id FROM v
WHERE vec_id NOT IN (SELECT node FROM comp WHERE node <> component)
"""


#: Fixed, seeded hyperplanes for the LSH ANN query — generated by a pure
#: formula so Spark and the oracle embed bit-identical double literals.
#: r12: swapped the phase-shifted sinusoid family (rank 2 — every
#: plane in one 2-D span, ≤ 8 sign regions from 4 "planes"; see
#: operators.similarity.seeded_planes for the full trap) for the
#: full-rank sin-hash family: 4 planes now cut the full 16 buckets,
#: halving per-bucket occupancy and Σ bucket² on these two rows.
ANN_PLANES = seeded_planes(4, 64)


def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH ANN: top-5 within sign-pattern buckets (the scale
    path for corpus×corpus similarity — recall < 1 by construction)."""
    e = _t(spark, sf_dir).embeddings()
    return cosine_topk_lsh(e, "vec_id", "embedding", planes=ANN_PLANES,
                           k=5, dims=64)


def _plane_sql(p: list[float]) -> str:
    lits = ", ".join(repr(x) for x in p)
    return (f"CASE WHEN list_sum(list_transform(range(1, 65),"
            f" i -> e[i] * (CAST([{lits}] AS DOUBLE[]))[i])) >= 0"
            f" THEN '1' ELSE '0' END")


ORACLE_ANN_LSH = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), n AS (
  SELECT vec_id, e,
    sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i]))) AS nm,
    {" || ".join(_plane_sql(p) for p in ANN_PLANES)} AS bucket
  FROM v
), sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
      / (a.nm * b.nm) AS sim
  FROM n a JOIN n b USING (bucket)
  WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
      AS rank
  FROM sims
) WHERE rank <= 5
"""


def q_embedding_near_dup_lsh(spark, sf_dir):
    """LSH-bucketed embedding near-dup (threshold 0.3 within buckets) —
    the corpus-scale variant of embedding_near_dup; recall < 1 by
    construction, candidates bucket-local."""
    e = _t(spark, sf_dir).embeddings()
    return embedding_near_dup_lsh(e, "vec_id", "embedding",
                                  planes=ANN_PLANES, threshold=0.3,
                                  dims=64)


ORACLE_EMB_LSH_NEAR_DUP = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), n AS (
  SELECT vec_id, e,
    sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i]))) AS nm,
    {" || ".join(_plane_sql(p) for p in ANN_PLANES)} AS bucket
  FROM v
)
SELECT id_a, id_b, cos_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
      / (a.nm * b.nm) AS cos_sim
  FROM n a JOIN n b USING (bucket)
  WHERE a.vec_id < b.vec_id
) WHERE cos_sim >= 0.3
"""


#: Johnson-Lindenstrauss projection family (r13): 8 full-rank lanes
#: over the 64-d embeddings, independent seed from the ANN tables'.
PROJ_PLANES = seeded_planes(8, 64, seed=4.717)


def q_random_projection(spark, sf_dir):
    """JL random projection (operators/similarity.random_projection):
    the 64-d embedding column reduced to 8 lanes, lane p =
    dot(e, plane_p)/sqrt(8) — the map-only dimensionality-reduction
    step ahead of the similarity family at 100 TB (every downstream
    scan/shuffle/cache shrinks by the dim ratio; JL bounds the
    pairwise-distance distortion).

    Lanes are emitted as scalar columns p0..p7 (the driver's
    canonicalizer cannot hash array cells) in the operator's
    ``fixed_point=12`` BIGINT view: per-term rounding is identical on
    every engine and integer sums commute exactly, where a 64-term
    float fold's total depends on the engine's summation order
    (measured ~1e-16 drift vs DuckDB's list_sum — the pagerank
    integer discipline applied to projections). The float path is
    pytest-proven against numpy."""
    e = _t(spark, sf_dir).embeddings()
    proj = random_projection(e, "vec_id", "embedding", PROJ_PLANES,
                             fixed_point=12)
    return proj.select(
        "vec_id",
        *[F.element_at("projected", i + 1).alias(f"p{i}")
          for i in range(len(PROJ_PLANES))])


def _proj_lane_sql(p: list[float]) -> str:
    lits = ", ".join(repr(x) for x in p)
    # outer CAST: duckdb's list_sum(BIGINT) silently widens to
    # HUGEINT (→ decimal128 under Arrow), which the driver hashes as
    # a different dtype
    return (f"CAST(list_sum(list_transform(range(1, 65), i -> "
            f"CAST(round(e[i] * (CAST([{lits}] AS DOUBLE[]))[i] "
            f"* 1000000000000.0 / sqrt(8.0)) AS BIGINT))) AS BIGINT)")


ORACLE_RANDOM_PROJECTION = f"""
SELECT vec_id,
  {", ".join(f"{_proj_lane_sql(p)} AS p{i}"
             for i, p in enumerate(PROJ_PLANES))}
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
"""


#: Pinned quality-classifier model (r14, VERDICT r13 #3): weights a
#: real training run COULD produce, frozen as literals so the driver
#: row is reproducible — the q_random_projection ANN_PLANES pattern
#: applied to operators/classifier. The oracle joins on the raw TOKEN
#: because DuckDB has no Spark-murmur3; the Spark side scores through
#: the REAL hashed-feature path with _CLF_IDX (each token's
#: pmod(hash(token), 32768), computed with Spark at authoring time).
#: The two are exactly equivalent iff (a) _CLF_IDX matches Spark's
#: hash and (b) no other corpus token collides into a weighted index
#: — both machine-verified every round by
#: tests/test_classifier.py::test_pinned_model_hash_and_no_collisions
#: (the full 31-token test-corpus vocab is injective under N=2^15).
_CLF_TOKEN_W = {
    "data": 0.8, "query": 0.7, "join": 0.6, "hash": 0.55,
    "vector": 0.5, "stream": 0.45, "spark": 0.4, "column": 0.35,
    "filter": 0.2, "sort": 0.15, "big": -0.25, "small": -0.3,
    "dup": -0.55, "slow": -0.6, "a": -0.85, "the": -0.9,
}
_CLF_IDX = {
    "data": 29663, "query": 10026, "join": 5864, "hash": 29206,
    "vector": 17550, "stream": 29074, "spark": 5281, "column": 5361,
    "filter": 21400, "sort": 12696, "big": 30006, "small": 31054,
    "dup": 22441, "slow": 27707, "a": 30802, "the": 5534,
}
_CLF_INTERCEPT = -0.2
_CLF_FP = 6  # micro-units: w_fp = round(w * 1e6), margin pure BIGINT
PINNED_QUALITY_MODEL = {
    "weights": {_CLF_IDX[t]: w for t, w in _CLF_TOKEN_W.items()},
    "intercept": _CLF_INTERCEPT,
    "num_features": 2 ** 15,
}


def q_classifier_score(spark, sf_dir):
    """Trained-classifier corpus scoring
    (operators/classifier.classifier_margin_fixed_point): every
    document's margin under PINNED_QUALITY_MODEL in the engine-exact
    BIGINT view — weights quantized driver-side to micro-units, so
    margin_fp = Σ tf·w_fp is pure integer arithmetic on both engines
    (no float fold anywhere; the random_projection fixed-point
    discipline, strengthened because tf is integral). ``keep`` is the
    curation gate users act on: margin_fp + intercept_fp > 0. Plan:
    codegen tokenize → hashed feature → broadcast weight join → one
    uniform (doc_id) shuffle — the 100 TB scoring shape."""
    from wp_etl_migration_spark.operators.classifier import (
        classifier_margin_fixed_point)
    d = _t(spark, sf_dir).documents()
    b_fp = int(round(_CLF_INTERCEPT * 10 ** _CLF_FP))
    m = classifier_margin_fixed_point(d, "doc_id", "text",
                                      PINNED_QUALITY_MODEL,
                                      fixed_point=_CLF_FP)
    return m.select("doc_id", "margin_fp", "n_hits",
                    (F.col("margin_fp") + F.lit(b_fp) > 0)
                    .alias("keep"))


ORACLE_CLASSIFIER_SCORE = f"""
WITH tf AS (
  SELECT doc_id, t, count(*) AS tf FROM (
    SELECT doc_id, unnest(list_filter(string_split_regex(
      lower(text), '[^\\p{{L}}\\p{{N}}]+'), x -> x <> '')) AS t
    FROM documents)
  GROUP BY 1, 2
), w(t, w_fp) AS (VALUES {", ".join(
    f"('{t}', {int(round(wt * 10 ** _CLF_FP))})"
    for t, wt in sorted(_CLF_TOKEN_W.items()))}
), m AS (
  SELECT doc_id, CAST(sum(tf * w_fp) AS BIGINT) AS margin_fp,
         CAST(sum(tf) AS BIGINT) AS n_hits
  FROM tf JOIN w USING (t) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(m.margin_fp, 0) AS margin_fp,
       COALESCE(m.n_hits, 0) AS n_hits,
       COALESCE(m.margin_fp, 0)
         + {int(round(_CLF_INTERCEPT * 10 ** _CLF_FP))} > 0 AS keep
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN m USING (doc_id)
"""


def q_set_ops(spark, sf_dir):
    """INTERSECT/EXCEPT (absent in the reference — SURVEY §2.5 notes
    them free-from-Spark; proven here): customers in AUTOMOBILE minus
    those with open orders, plus the intersection count marker."""
    t = _t(spark, sf_dir)
    c, o = t.customer(), t.orders()
    auto = c.where(F.col("c_mktsegment") == "AUTOMOBILE") \
            .select("c_custkey")
    open_cust = o.where(F.col("o_orderstatus") == "O") \
                 .select(F.col("o_custkey").alias("c_custkey"))
    return (auto.exceptAll(auto.intersect(open_cust))
            .select("c_custkey"))


ORACLE_SET_OPS = """
WITH auto AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
), open_cust AS (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
)
SELECT c_custkey FROM auto
EXCEPT ALL
SELECT c_custkey FROM (SELECT * FROM auto INTERSECT
                       SELECT * FROM open_cust)
"""


def q_cube_agg(spark, sf_dir):
    """CUBE aggregation over (status, priority) — all 4 grouping sets."""
    o = _t(spark, sf_dir).orders()
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n")))


ORACLE_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: binary payload column + metadata struct →
    Arrow-batched mapInPandas feature extraction (deterministic stand-in
    for a media decode; see operators.multimodal)."""
    d = _t(spark, sf_dir).documents()
    binary = attach_binary(d, "doc_id", "text", mime="text/plain")
    return extract_features(binary, "doc_id", "payload")


ORACLE_MULTIMODAL = f"""
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS digest,
  CAST((strpos('{HEX}', substring(md5(text), 1, 1)) - 1) * 16
     + (strpos('{HEX}', substring(md5(text), 2, 1)) - 1) AS BIGINT)
    AS fake_width,
  CAST((strpos('{HEX}', substring(md5(text), 3, 1)) - 1) * 16
     + (strpos('{HEX}', substring(md5(text), 4, 1)) - 1) AS BIGINT)
    AS fake_height
FROM documents
"""


def q_media_decode(spark, sf_dir):
    """Real (dependency-free) media decode round-trip: deterministic
    BMP/WAV payloads built per document id, then header-parsed back by
    ``decode_media``'s default decoder. The oracle states the
    analytically-known encode parameters, so any drift in either the
    encoder or the decoder breaks parity."""
    d = _t(spark, sf_dir).documents()
    payloads = synthesize_media(d.select("doc_id"))
    return decode_media(payloads, id_col="doc_id")


ORACLE_MEDIA_DECODE = """
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 64 + 1 AS BIGINT) END
    AS width,
  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id // 2) % 64 + 1 AS BIGINT) END
    AS height,
  CASE WHEN doc_id % 2 = 1 THEN CAST(1 + (doc_id // 2) % 2 AS BIGINT) END
    AS channels,
  CASE WHEN doc_id % 2 = 1 THEN CAST(8000 * (1 + doc_id % 4) AS BIGINT) END
    AS sample_rate,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 16 END AS BIGINT)
    AS bits_per_sample,
  CASE WHEN doc_id % 2 = 1 THEN CAST(100 + doc_id % 50 AS BIGINT) END
    AS n_samples,
  CASE WHEN doc_id % 2 = 1 THEN CAST((100 + doc_id % 50) * 1000
    // (8000 * (1 + doc_id % 4)) AS BIGINT) END AS duration_ms
FROM documents
"""


def q_bpe_token_stats(spark, sf_dir):
    """BPE-ish regex pre-tokenizer count vs whitespace word count."""
    d = _t(spark, sf_dir).documents()
    return d.select("doc_id",
                    ts.bpe_token_count("text").alias("n_bpe"),
                    ts.token_count("text").alias("n_words"))


ORACLE_BPE = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(lower(trim(text)),
       '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
    AS n_words
FROM documents
"""


def q_event_window_agg(spark, sf_dir):
    """Tumbling 1-hour event-time window aggregation (batch semantics of
    the streaming rollup; the streaming variant shares this plan)."""
    e = _t(spark, sf_dir).events()
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 dec_sum("value", 2).alias("sum_value"))
            .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "event_type", "n_events", "sum_value"))


ORACLE_EVENT_WINDOW = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE)
         AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_sessionization(spark, sf_dir):
    """Gap-based sessionization, batch form (the streaming operator's
    semantic twin — streaming/sessions.sessionize_batch): 30-min gaps
    split per-user sessions; lag + cumulative window, one shuffle."""
    from wp_etl_migration_spark.streaming.sessions import sessionize_batch
    e = _t(spark, sf_dir).events()
    out = sessionize_batch(e.select("user_id", "ts", "value"))
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSS")
        .alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSS")
        .alias("session_end"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"))


ORACLE_SESSIONIZATION = """
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%g') AS session_start,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%g') AS session_end,
  count(*) AS n_events,
  round(sum(value), 4) AS sum_value
FROM numbered
GROUP BY user_id, sid
"""


def q_asof_join(spark, sf_dir):
    """As-of join (operators/temporal.asof_join): attribute each purchase
    to the same user's most recent prior-or-equal click.  No temporal
    joins exist in the reference (SURVEY §2.4); this is the
    training-pipeline event-attribution primitive, planned as one
    shuffle + window scan instead of an inequality nested-loop join."""
    from wp_etl_migration_spark.operators.temporal import asof_join
    e = _t(spark, sf_dir).events()
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    out = asof_join(purchases, clicks, on=["user_id"],
                    payload=["click_id", "click_ts"])
    return out.select(
        "event_id", "user_id", "click_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"))


ORACLE_ASOF = """
SELECT p.event_id, p.user_id, c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_asof_nearest(spark, sf_dir):
    """As-of join, nearest direction: attribute each purchase to the
    same user's CLOSEST click on either side (backward wins exact
    ties). One key exchange, two window sorts
    (operators/temporal.asof_join direction='nearest'). The oracle
    builds nearest from two DuckDB ASOF joins — forward expressed as
    backward over negated epoch micros — and the same closer-wins CASE.
    Right side is pre-deduped per (user, ts) so tie resolution is
    engine-independent."""
    from wp_etl_migration_spark.operators.temporal import asof_join
    e = _t(spark, sf_dir).events()
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (e.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id"))
              .withColumn("click_ts", F.col("ts")))
    out = asof_join(purchases, clicks, on=["user_id"],
                    payload=["click_id", "click_ts"],
                    direction="nearest")
    return out.select(
        "event_id", "user_id", "click_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"))


ORACLE_ASOF_NEAREST = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), b AS (
  SELECT p.event_id, c.click_id AS b_id, c.ts AS b_ts
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
), f AS (
  SELECT pn.event_id, cn.click_id AS f_id, cn.ts AS f_ts
  FROM (SELECT event_id, user_id, -epoch_us(ts) AS nts FROM p) pn
  ASOF LEFT JOIN (SELECT user_id, ts, click_id, -epoch_us(ts) AS nts
                  FROM c) cn
    ON pn.user_id = cn.user_id AND pn.nts >= cn.nts
), chosen AS (
  SELECT p.event_id, p.user_id, p.ts,
    CASE WHEN b_ts IS NULL THEN f_id
         WHEN f_ts IS NULL THEN b_id
         WHEN epoch_us(p.ts) - epoch_us(b_ts)
              <= epoch_us(f_ts) - epoch_us(p.ts) THEN b_id
         ELSE f_id END AS click_id,
    CASE WHEN b_ts IS NULL THEN f_ts
         WHEN f_ts IS NULL THEN b_ts
         WHEN epoch_us(p.ts) - epoch_us(b_ts)
              <= epoch_us(f_ts) - epoch_us(p.ts) THEN b_ts
         ELSE f_ts END AS chosen_ts
  FROM p JOIN b USING (event_id) JOIN f USING (event_id)
)
SELECT event_id, user_id, click_id,
       epoch_us(ts) - epoch_us(chosen_ts) AS gap_us
FROM chosen
"""


def q_range_join(spark, sf_dir):
    """Point-in-interval join (operators/temporal.range_join): count
    error events in the hour before each purchase.  Bucketed band join —
    equi-join on (user, hour-bucket) + refine — so Catalyst plans a hash
    join, not a cartesian with filter."""
    from wp_etl_migration_spark.operators.temporal import range_join
    e = _t(spark, sf_dir).events()
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"), "user_id",
                         (F.col("ts") - F.expr("INTERVAL 1 HOUR"))
                         .alias("w_start"),
                         F.col("ts").alias("w_end")))
    errors = (e.filter(F.col("event_type") == "error")
              .select("user_id", F.col("ts").alias("err_ts"),
                      F.col("event_id").alias("err_id")))
    joined = range_join(errors, purchases, on=["user_id"],
                        point_ts="err_ts", start="w_start", end="w_end",
                        bucket_width="1 HOUR", how="left")
    return joined.groupBy("purchase_id").agg(
        F.count("err_id").alias("n_errors"))


ORACLE_RANGE_JOIN = """
SELECT p.event_id AS purchase_id, count(e.event_id) AS n_errors
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.ts > p.ts - INTERVAL 1 HOUR AND e.ts <= p.ts
GROUP BY 1
"""


def q_pivot_wide(spark, sf_dir):
    """Pivot long→wide (absent in the reference; Spark-native
    ``groupBy().pivot()`` with explicit value list so the plan is a
    single pass, no second distinct-values job)."""
    li = _t(spark, sf_dir).lineitem()
    out = (li.groupBy("l_returnflag")
           .pivot("l_linestatus", ["F", "O"])
           .agg(dec_sum("l_quantity", 2)))
    return out.select("l_returnflag",
                      F.col("F").alias("qty_f"),
                      F.col("O").alias("qty_o"))


ORACLE_PIVOT = """
SELECT l_returnflag,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,2)))
       FILTER (WHERE l_linestatus = 'F') AS VARCHAR) AS DOUBLE) AS qty_f,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,2)))
       FILTER (WHERE l_linestatus = 'O') AS VARCHAR) AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS aggregation (SQL surface; rollup/cube's general
    form).  Same shuffle count as a plain groupBy — Spark expands the
    sets map-side."""
    t = _t(spark, sf_dir)
    t.lineitem().createOrReplaceTempView("__gs_lineitem")
    return t.spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               grouping(l_returnflag) AS g_flag
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
    """)


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(grouping(l_returnflag) AS TINYINT) AS g_flag
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                        (l_returnflag, l_linestatus))
"""


def q_percentile_stats(spark, sf_dir):
    """Exact interpolated percentiles per group (absent in the
    reference).  Spark ``percentile`` is a sort-based exact aggregate;
    at cluster scale swap for ``percentile_approx`` (t-digest, one
    pass, mergeable) when exactness isn't contractual."""
    o = _t(spark, sf_dir).orders()
    return (o.groupBy("o_orderstatus")
            .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
                 F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
                 F.expr("median(o_totalprice)").alias("med")))


ORACLE_PERCENTILE = """
SELECT o_orderstatus,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.9) AS p90,
  median(o_totalprice) AS med
FROM orders GROUP BY o_orderstatus
"""


def q_sketch_distinct(spark, sf_dir):
    """Mergeable-sketch aggregates — the 100 TB cardinality/quantile
    path: Apache DataSketches HLL (`hll_sketch_agg`, partials merge
    across executors with `hll_union_agg`) and the GK quantile sketch
    (`percentile_approx`), both single-pass and bounded-memory, unlike
    exact countDistinct/percentile which shuffle the full value set.

    Oracle-exact at gate scale by construction: HLL in sparse mode
    (cardinality ≪ 2^lgK=16384) stores exact hashes, and GK with
    default accuracy 10000 is exact below 10k rows/group — so the
    sketch estimates equal DuckDB's exact count(DISTINCT)/
    quantile_disc.  At full scale the same plan degrades gracefully to
    ±~0.5% error instead of a full-width shuffle."""
    d = _t(spark, sf_dir).documents()
    return (d.groupBy("source")
            .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(text, 14))")
                 .alias("n_distinct"),
                 F.percentile_approx("n_chars", 0.5).alias("med_chars")))


ORACLE_SKETCH = """
SELECT source, count(DISTINCT text) AS n_distinct,
       quantile_disc(n_chars, 0.5) AS med_chars
FROM documents GROUP BY source
"""


def q_json_extract(spark, sf_dir):
    """Typed JSON extraction (`from_json` with an explicit schema — the
    vectorized JVM path; schema-on-read instead of per-row parsing) over
    the events ``props`` payload, rolled up per event type."""
    e = _t(spark, sf_dir).events()
    k = F.from_json("props", "k BIGINT")["k"]
    return (e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.sum("k").alias("sum_k"),
                 F.count(F.when(F.col("k") >= 50, True)).alias("n_hi"),
                 F.max("k").alias("max_k")))


ORACLE_JSON = """
SELECT event_type,
       -- DuckDB sum(BIGINT) widens to HUGEINT (int128); Spark stays LONG.
       -- Cast back so the driver's typed hash compares equal.
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       count(*) FILTER (CAST(json_extract_string(props, '$.k') AS BIGINT)
                        >= 50) AS n_hi,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def q_date_parts(spark, sf_dir):
    """Calendar/date-function breadth: part extraction, ISO week,
    month boundaries, date arithmetic — all codegen'd built-ins."""
    o = _t(spark, sf_dir).orders()
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.last_day("o_orderdate").alias("month_end"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("age_days"))


ORACLE_DATE_PARTS = """
SELECT o_orderkey,
  year(o_orderdate) AS y,
  quarter(o_orderdate) AS q,
  month(o_orderdate) AS m,
  day(o_orderdate) AS d,
  week(o_orderdate) AS iso_week,
  last_day(o_orderdate) AS month_end,
  CAST(o_orderdate AS DATE) + 30 AS plus30,
  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
    AS age_days
FROM orders
"""


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective filters on both join sides, 3-way join,
    revenue agg, top-10 with a deterministic tiebreak.  The customer
    side broadcasts; lineitem⋈orders shuffles once on the order key."""
    t = _t(spark, sf_dir)
    cutoff = F.lit("1998-01-01").cast("timestamp")
    c = t.customer().filter(F.col("c_nationkey") < 5) \
        .select("c_custkey")
    o = t.orders().filter(F.col("o_orderdate") < cutoff)
    li = t.lineitem().filter(F.col("l_shipdate") >= cutoff)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(dec_sum(rev, 4).alias("revenue"))
            .orderBy(F.desc("revenue"), "l_orderkey")
            .limit(10)
            .select("l_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    "o_orderpriority", "revenue"))


ORACLE_SHIPPING = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey < 5
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate >= TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_array_ops(spark, sf_dir):
    """Array-function breadth over tokenized text — all codegen'd
    built-ins (size/distinct/sort/slice/contains), no UDF."""
    d = _t(spark, sf_dir).documents()
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.concat_ws(" ", F.slice(F.array_sort(F.array_distinct(toks)),
                                 1, 3)).alias("first3"),
        F.array_contains(toks, "the").cast("int").alias("has_the"))


ORACLE_ARRAY_OPS = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id, len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique,
       array_to_string(list_sort(list_distinct(toks))[1:3], ' ')
         AS first3,
       CAST(list_contains(toks, 'the') AS INT) AS has_the
FROM t
"""


def q_topk_per_group(spark, sf_dir):
    """Per-group top-k (rank-filter pattern).  Catalyst rewrites the
    ``row_number() <= k`` filter into WindowGroupLimit: each map task
    keeps only k rows per group *before* the exchange, so at 100 TB the
    shuffle carries O(groups × k), not the full table."""
    e = _t(spark, sf_dir).events()
    w = Window.partitionBy("event_type").orderBy(F.desc("value"),
                                                 "event_id")
    return (e.select("event_type", "event_id", "user_id", "value",
                     F.row_number().over(w).cast("long").alias("rk"))
            .filter(F.col("rk") <= 3))


ORACLE_TOPK_GROUP = """
SELECT * FROM (
  SELECT event_type, event_id, user_id, value,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY value DESC, event_id) AS rk
  FROM events) WHERE rk <= 3
"""


def q_bigram_lm_score(spark, sf_dir):
    """CCNet-style LM quality filter: train a bigram LM on the trusted
    slice (doc_id % 5 != 0), score the held-out slice. Projects the
    exact-integer columns (hit_rate is one division of BIGINTs) — the
    engine-float avg_logprob column is covered by tests/test_lm.py
    (operators/lm.py)."""
    from wp_etl_migration_spark.operators.lm import bigram_counts, lm_score
    d = _t(spark, sf_dir).documents()
    lm = bigram_counts(d.where(F.col("doc_id") % 5 != 0), "text")
    return lm_score(d.where(F.col("doc_id") % 5 == 0), lm,
                    "doc_id", "text") \
        .select("doc_id", "n_bigrams", "n_hits", "hit_rate")


_DUCK_BIGRAMS = r"""
btoks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM btoks, UNNEST(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
)"""

ORACLE_BIGRAM_LM = f"""
WITH {_DUCK_BIGRAMS}, lm AS (
  SELECT w1, w2, count(*) AS n FROM bg
  WHERE doc_id % 5 != 0 GROUP BY 1, 2
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(count(lm.n) AS BIGINT) AS n_hits,
       CAST(count(lm.n) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS hit_rate
FROM bg LEFT JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
WHERE bg.doc_id % 5 = 0
GROUP BY bg.doc_id
"""


def q_cross_corpus_dedup(spark, sf_dir):
    """Cross-snapshot exact dedup: the doc_id % 7 == 0 slice plays the
    new crawl, the rest the already-ingested corpus; survivors are new
    docs whose text no corpus doc (nor an earlier new doc) already has
    (operators/dedup.py cross_corpus_exact_dedup)."""
    from wp_etl_migration_spark.operators.dedup import (
        cross_corpus_exact_dedup)
    d = _t(spark, sf_dir).documents()
    new = d.where(F.col("doc_id") % 7 == 0)
    corpus = d.where(F.col("doc_id") % 7 != 0)
    return (cross_corpus_exact_dedup(new, corpus, "doc_id", ["text"])
            .select("doc_id",
                    F.col("__digest").alias("content_digest")))


ORACLE_CROSS_CORPUS = """
WITH dg AS (
  SELECT doc_id, md5(CAST(text AS VARCHAR)) AS content_digest
  FROM documents
), nw AS (SELECT * FROM dg WHERE doc_id % 7 = 0)
SELECT min(doc_id) AS doc_id, content_digest
FROM nw
WHERE NOT EXISTS (SELECT 1 FROM dg c
                  WHERE c.doc_id % 7 != 0
                    AND c.content_digest = nw.content_digest)
GROUP BY content_digest
"""


def q_global_shuffle_shards(spark, sf_dir):
    """Deterministic pre-training shuffle: shard + in-shard position per
    document, content-addressed on doc_id (operators/sampling.py
    global_shuffle) — one uniform-keyed shuffle, no global sort."""
    from wp_etl_migration_spark.operators.sampling import global_shuffle
    d = _t(spark, sf_dir).documents()
    return global_shuffle(d.select("doc_id", "lang"), "doc_id",
                          n_shards=16, salt="bench")


ORACLE_GLOBAL_SHUFFLE = """
WITH h AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5('bench' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      AS hh
  FROM documents
)
SELECT doc_id, lang, CAST(hh % 16 AS INT) AS shard,
  CAST(row_number() OVER (PARTITION BY hh % 16 ORDER BY hh, doc_id)
       AS BIGINT) AS pos
FROM h
"""


def q_vocab_topk(spark, sf_dir):
    """Top-200 token vocabulary with cumulative corpus coverage — the
    tokenizer-training frequency table (operators/textstats.py
    vocab_build). cum_share is a single division of exact BIGINTs."""
    from wp_etl_migration_spark.operators.textstats import vocab_build
    d = _t(spark, sf_dir).documents()
    return vocab_build(d, "text", top_k=200)


ORACLE_VOCAB = r"""
WITH vt AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*) AS n FROM vt GROUP BY 1
), ranked AS (
  SELECT token, CAST(n AS BIGINT) AS n,
    CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank,
    CAST(sum(n) OVER (ORDER BY n DESC, token
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum,
    CAST(sum(n) OVER () AS BIGINT) AS total
  FROM counts
)
SELECT token, n, rank,
       CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
FROM ranked WHERE rank <= 200
"""


def q_line_dedup(spark, sf_dir):
    """C4-style corpus-level line dedup: segments occurring in ≥3
    distinct documents are boilerplate and removed from every doc, text
    rebuilt in original order (operators/dedup.py line_dedup). The
    synthetic docs are single-line, so ' table ' plays the line
    delimiter to exercise multi-segment splitting both engines."""
    from wp_etl_migration_spark.operators.dedup import line_dedup
    d = _t(spark, sf_dir).documents()
    return line_dedup(d, "doc_id", "text", max_line_df=3,
                      delimiter=" table ")


ORACLE_LINE_DEDUP = """
WITH seg AS (
  SELECT doc_id, string_split(text, ' table ') AS ls FROM documents
), ln AS (
  SELECT doc_id, ls[i] AS line, i AS pos
  FROM seg, UNNEST(range(1, len(ls) + 1)) AS r(i)
), hot AS (
  SELECT line FROM (
    SELECT DISTINCT doc_id, line FROM ln WHERE len(trim(line)) >= 1)
  GROUP BY line HAVING count(*) >= 3
), kept AS (
  SELECT doc_id, pos, line FROM ln
  WHERE NOT (len(trim(line)) >= 1 AND line IN (SELECT line FROM hot))
), rb AS (
  SELECT doc_id, string_agg(line, ' table ' ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(rb.text, '') AS text,
  CAST(len(string_split(d.text, ' table ')) AS BIGINT) AS n_lines,
  CAST(len(string_split(d.text, ' table ')) - coalesce(rb.n_kept, 0)
       AS BIGINT) AS n_removed
FROM documents d LEFT JOIN rb ON d.doc_id = rb.doc_id
"""


def q_quantize_embeddings(spark, sf_dir):
    """int8 symmetric scalar quantization of the embedding column with
    the per-vector reconstruction-error audit
    (operators/similarity.py quantize_embeddings).

    Output is posexploded to scalar rows (vec_id, dim, q, scale,
    max_abs_err): the driver's canonicalizer cannot hash array cells,
    and per-element int codes obey the parity float rules exactly."""
    from wp_etl_migration_spark.operators.similarity import (
        quantize_embeddings)
    e = _t(spark, sf_dir).embeddings()
    qdf = quantize_embeddings(e, "vec_id", "embedding")
    return qdf.select("vec_id",
                      F.posexplode("qvec").alias("dim", "q"),
                      "scale", "max_abs_err")


ORACLE_QUANTIZE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, v,
    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM v
), q AS (
  SELECT vec_id, v, scale,
    CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
         ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
    END AS qvec
  FROM s
), w AS (
  SELECT vec_id, qvec, scale,
    list_max(list_transform(list_zip(v, qvec),
      z -> abs(z[1] - CAST(z[2] AS DOUBLE) * scale))) AS max_abs_err
  FROM q
)
SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
       CAST(qvec[i] AS INTEGER) AS q, scale, max_abs_err
FROM w, UNNEST(range(1, 65)) AS r(i)
"""


def q_passage_removal(spark, sf_dir):
    """ExactSubstr span removal (Lee et al. 2022): tokens covered by a
    word 8-gram shared across ≥2 docs are cut, text rebuilt from the
    unique remainder (operators/textstats.py remove_shared_passages)."""
    from wp_etl_migration_spark.operators.textstats import (
        remove_shared_passages)
    d = _t(spark, sf_dir).documents()
    return remove_shared_passages(d, "doc_id", "text", k=8)


ORACLE_PASSAGE_REMOVAL = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), g AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM t, UNNEST(range(1, len(t) - 6)) AS r(i)
  WHERE len(t) >= 8
), shared AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
  GROUP BY gram HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT doc_id, pos + j AS cp
  FROM g, UNNEST(range(0, 8)) AS r(j)
  WHERE gram IN (SELECT gram FROM shared)
), tok AS (
  SELECT doc_id, i AS tp, t[i] AS tok
  FROM t, UNNEST(range(1, len(t) + 1)) AS r(i)
), kept AS (
  SELECT tok.doc_id, tp, tok FROM tok
  WHERE NOT EXISTS (SELECT 1 FROM cov
                    WHERE cov.doc_id = tok.doc_id AND cov.cp = tok.tp)
), rb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(rb.text, '') AS text,
  CAST(len(string_split_regex(lower(trim(d.text)), '\s+')) AS BIGINT)
    AS n_tokens,
  CAST(len(string_split_regex(lower(trim(d.text)), '\s+'))
       - coalesce(rb.n_kept, 0) AS BIGINT) AS n_removed_tokens
FROM documents d LEFT JOIN rb ON d.doc_id = rb.doc_id
"""


def q_fuzzy_match(spark, sf_dir):
    """Edit-distance-2 key matching via depth-2 FastSS
    deletion-neighborhood indexing — equi-join candidates +
    levenshtein verify, never a cross join (operators/fuzzy.py).

    Keys are realistic sparse identifiers with planted typos: every 3
    consecutive custkeys share a 10-hex md5 base, mutated by 0/1/2
    leading 'Z' substitutions — guaranteed ED-1 and ED-2 pairs inside
    each triple, near-zero accidental pairs across triples. (The raw
    ``Customer#0000NNNNN`` names are NOT used: 15k sequential
    zero-padded numbers are maximally dense in depth-2 edit space —
    ~17M true pairs at sf0.1 — which benchmarks the data shape, not
    the operator.) Oracle is the brute-force levenshtein cross-check.
    """
    from wp_etl_migration_spark.operators.fuzzy import fuzzy_self_join
    c = _t(spark, sf_dir).customer()
    base = F.substring(
        F.md5(F.floor(F.col("c_custkey") / 3).cast("long")
              .cast("string")), 1, 10)
    key = (F.when(F.col("c_custkey") % 3 == 0, base)
           .when(F.col("c_custkey") % 3 == 1,
                 F.concat(F.lit("Z"), F.expr("substring(__b, 2)")))
           .otherwise(F.concat(F.lit("ZZ"),
                               F.expr("substring(__b, 3)"))))
    keyed = (c.select("c_custkey", base.alias("__b"))
             .select("c_custkey", key.alias("key")))
    return fuzzy_self_join(keyed, "c_custkey", "key", max_distance=2)


ORACLE_FUZZY = """
WITH k AS (
  SELECT c_custkey,
    CASE CAST(c_custkey % 3 AS INT)
      WHEN 0 THEN __b
      WHEN 1 THEN 'Z' || substr(__b, 2)
      ELSE 'ZZ' || substr(__b, 3) END AS key
  FROM (SELECT c_custkey,
               substr(md5(CAST(c_custkey // 3 AS VARCHAR)), 1, 10)
                 AS __b
        FROM customer)
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.key AS key_a, b.key AS key_b,
       CAST(levenshtein(a.key, b.key) AS INT) AS distance
FROM k a JOIN k b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.key, b.key) <= 2
"""


def q_trigram_lm_score(spark, sf_dir):
    """Order-3 LM scoring (the generalized n-gram path; CCNet uses
    order 5): train on the doc_id % 5 != 0 slice, score the held-out
    slice (operators/lm.py ngram_counts / lm_score_ngram)."""
    from wp_etl_migration_spark.operators.lm import (
        lm_score_ngram, ngram_counts)
    d = _t(spark, sf_dir).documents()
    lm = ngram_counts(d.where(F.col("doc_id") % 5 != 0), "text", n=3)
    return lm_score_ngram(d.where(F.col("doc_id") % 5 == 0), lm,
                          "doc_id", "text", n=3) \
        .select("doc_id", "n_ngrams", "n_hits", "hit_rate")


ORACLE_TRIGRAM_LM = r"""
WITH t3 AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS ctx, t[i + 2] AS w
  FROM t3, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
), lm AS (
  SELECT ctx, w, count(*) AS n_gram FROM g
  WHERE doc_id % 5 != 0 GROUP BY 1, 2
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(count(lm.n_gram) AS BIGINT) AS n_hits,
       CAST(count(lm.n_gram) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS hit_rate
FROM g LEFT JOIN lm ON g.ctx = lm.ctx AND g.w = lm.w
WHERE g.doc_id % 5 = 0
GROUP BY g.doc_id
"""


def q_trigram_lm_pruned(spark, sf_dir):
    """Count-pruned trigram LM TABLE (VERDICT r8 #4): min_count=2
    with prune='pre_total', so the filter runs straight after the
    first (ctx, w) aggregation and the context-totals shuffle + join
    carry only survivors; n_ctx renormalizes over the pruned set.
    All columns exact (strings + BIGINTs) — fully value-hashable,
    unlike the engine-float logprob the scoring row excludes."""
    from wp_etl_migration_spark.operators.lm import ngram_counts
    d = _t(spark, sf_dir).documents()
    return ngram_counts(d.where(F.col("doc_id") % 5 != 0), "text",
                        n=3, min_count=2, prune="pre_total")


ORACLE_TRIGRAM_LM_PRUNED = r"""
WITH t3 AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS ctx, t[i + 2] AS w
  FROM t3, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
), c AS (
  SELECT ctx, w, count(*) AS n_gram FROM g
  WHERE doc_id % 5 != 0 GROUP BY 1, 2
  HAVING count(*) >= 2
), tot AS (
  SELECT ctx, sum(n_gram) AS n_ctx FROM c GROUP BY 1
)
SELECT c.ctx, c.w, CAST(n_gram AS BIGINT) AS n_gram,
       CAST(n_ctx AS BIGINT) AS n_ctx
FROM c JOIN tot USING (ctx)
"""


def q_chunk_documents(spark, sf_dir):
    """RAG/embedding chunking: 16-token windows with 4-token overlap
    (operators/textstats.py chunk_documents) — codegen generator, no
    shuffle."""
    from wp_etl_migration_spark.operators.textstats import chunk_documents
    d = _t(spark, sf_dir).documents()
    return chunk_documents(d, "doc_id", "text", chunk_tokens=16,
                           overlap=4)


ORACLE_CHUNKS = r"""
WITH ct AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
)
SELECT doc_id,
  CAST((s - 1) // 12 AS INT) AS chunk_id,
  array_to_string(t[s:s+15], ' ') AS chunk_text,
  CAST(len(t[s:s+15]) AS BIGINT) AS n_tokens
FROM ct, UNNEST(range(1, greatest(len(t) - 4, 1) + 1, 12)) AS r(s)
"""


def q_keywords(spark, sf_dir):
    """Per-doc keyword extraction: top-5 terms by (tf DESC, df ASC,
    token) with evidence-based stopword exclusion
    (operators/textstats.py extract_keywords)."""
    from wp_etl_migration_spark.operators.textstats import extract_keywords
    d = _t(spark, sf_dir).documents()
    return extract_keywords(d, "doc_id", "text", top_k=5,
                            max_doc_freq_share=0.5)


ORACLE_KEYWORDS = r"""
WITH kt AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+'))
    AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM kt GROUP BY 1, 2
), docfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
  HAVING count(*) <= (SELECT CAST(floor(count(*) * 0.5) AS BIGINT)
                      FROM documents)
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
       CAST(df AS BIGINT) AS df, CAST(rank AS INT) AS rank
FROM (
  SELECT doc_id, token, tf, df,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY tf DESC, df ASC, token) AS rank
  FROM tf JOIN docfreq USING (token))
WHERE rank <= 5
"""


def q_train_val_test(spark, sf_dir):
    """Content-addressed train/val/test assignment (80/10/10, disjoint
    + exhaustive by construction — operators/sampling.py
    assign_splits)."""
    from wp_etl_migration_spark.operators.sampling import assign_splits
    d = _t(spark, sf_dir).documents()
    return assign_splits(d.select("doc_id", "lang"), "doc_id",
                         {"train": 0.8, "val": 0.1, "test": 0.1},
                         salt="bench")


#: sorted-name order: test [0, .1), train [.1, .9), val [.9, 1)
ORACLE_SPLITS = """
SELECT doc_id, lang,
  CASE WHEN h < 429496729 THEN 'test'
       WHEN h < 3865470566 THEN 'train'
       ELSE 'val' END AS split
FROM (SELECT doc_id, lang,
        ('0x' || substr(md5('bench' || CAST(doc_id AS VARCHAR)), 1, 8))
          ::BIGINT AS h
      FROM documents)
"""


def q_token_budget(spark, sf_dir):
    """Token-budget corpus selection (operators/sampling.py
    select_token_budget): take documents in priority order until the
    cumulative token count crosses 40k — the 'best N tokens'
    truncation every pretraining mix ends with, as a two-phase
    distributed prefix sum (no single-reducer global window).
    Priority is a synthetic deterministic score (doc_id % 97) so the
    oracle replays the exact order; ties break on doc_id."""
    from wp_etl_migration_spark.operators import textstats as ts
    from wp_etl_migration_spark.operators.sampling import (
        select_token_budget)
    d = _t(spark, sf_dir).documents() \
        .withColumn("__n", ts.token_count("text")) \
        .withColumn("__q", (F.col("doc_id") % 97).cast("double"))
    return select_token_budget(d, "doc_id", "__n", 40_000,
                               priority_col="__q")


ORACLE_TOKEN_BUDGET = r"""
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_tokens,
    CAST(doc_id % 97 AS DOUBLE) AS q
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    COALESCE(sum(n_tokens) OVER (
      ORDER BY q DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
  FROM t
)
SELECT doc_id, n_tokens, CAST(b + n_tokens AS BIGINT) AS cum_tokens
FROM c WHERE b < 40000
"""


def q_dedup_pipeline(spark, sf_dir):
    """The one-call dedup recipe end-to-end (exact → verified
    MinHash-LSH → transitive keep-list — operators/dedup.py
    dedup_documents), proven against a FULL-PIPELINE SQL oracle:
    exact-dedup CTE → signature/band CTEs → candidate verify →
    recursive-CTE connected components → keep-list semi-join."""
    from wp_etl_migration_spark.operators.dedup import dedup_documents
    d = _t(spark, sf_dir).documents()
    return dedup_documents(d, "doc_id", "text") \
        .select("doc_id", "lang")


ORACLE_DEDUP_PIPELINE = rf"""
WITH RECURSIVE ex AS (
  SELECT min(doc_id) AS doc_id FROM documents
  GROUP BY md5(CAST(text AS VARCHAR))
), base AS (
  SELECT d.doc_id, d.text, d.lang FROM documents d JOIN ex USING (doc_id)
), ptoks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM base
), psh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM ptoks, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
), shc AS (
  SELECT doc_id, shingle FROM psh
  QUALIFY count(*) OVER (PARTITION BY shingle) <= {JACCARD_MAX_DOC_FREQ}
), {_duck_minhash_sig("shc")}, bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY minhash))
           AS band_hash
  FROM sig GROUP BY doc_id, band
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), sets AS (
  SELECT doc_id, list(shingle) AS s, count(*) AS n FROM shc GROUP BY 1
), ver AS (
  SELECT id_a, id_b FROM cand
  JOIN sets sa ON sa.doc_id = id_a
  JOIN sets sb ON sb.doc_id = id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / CAST(sa.n + sb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      >= 0.7
), edges AS (
  SELECT id_a AS u, id_b AS v FROM ver
  UNION
  SELECT id_b, id_a FROM ver
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
), keepc AS (
  SELECT min(node) AS doc_id FROM comp GROUP BY component
)
SELECT b.doc_id, b.lang FROM base b
WHERE b.doc_id NOT IN (SELECT node FROM comp)
   OR b.doc_id IN (SELECT doc_id FROM keepc)
"""


def q_quantile_band(spark, sf_dir):
    """Per-source quality tail trim: keep the middle (0.1, 0.9] of
    each source's n_chars rank distribution — rank-based (engine-exact
    integer-division fractions), not a quantile sketch
    (operators/sampling.py quantile_band_filter)."""
    from wp_etl_migration_spark.operators.sampling import (
        quantile_band_filter)
    d = _t(spark, sf_dir).documents()
    return quantile_band_filter(d.select("doc_id", "source", "n_chars"),
                                "doc_id", "n_chars", lo=0.1, hi=0.9,
                                group_col="source")


ORACLE_QUANTILE_BAND = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
    CAST(row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS DOUBLE)
      / CAST(count(*) OVER (PARTITION BY source) AS DOUBLE) AS rf
  FROM documents)
WHERE rf > 0.1 AND rf <= 0.9
"""


#: Fixed hyperplanes for the stored-ANN-index parity row (seeded
#: integers so the SQL literal is tidy and products are float-exact).
ANN_INDEX_PLANES = [
    [-1, -1, 3, 3, -2, 3, -2, 3, -2, -2, 3, 3, -2, -2, -3, 2, -2, 3,
     -1, -3, 1, -2, 3, 2, -3, -1, -2, -3, -1, 1, 3, 1, -2, -1, -1, -2,
     1, 2, 2, 1, 3, -1, 1, 3, -1, 3, -3, -1, 2, 3, -1, 3, 1, 2, 2, 3,
     -2, 1, 3, 3, 1, 2, -2, -1],
    [-2, -2, 2, -1, -1, -1, 1, -1, 2, -1, 1, -2, 2, 1, 2, -2, 2, -2,
     -2, 3, -1, -2, -3, 1, 3, 3, 1, 1, -3, 3, 1, -3, -2, -2, 1, 3, 1,
     3, -1, -2, 3, 1, 3, -1, -1, -2, 3, 3, -1, 2, 3, 3, -2, 3, 2, -2,
     3, 1, -2, 2, -3, 2, 3, 2],
]


def q_ann_index_topk(spark, sf_dir):
    """Stored quantized ANN index end-to-end: build (bucket + int8)
    then query the same embeddings for top-5 against the DEQUANTIZED
    index (operators/similarity.py build_ann_index/query_ann_index).
    Ranks only — sims are engine-float like embedding_topk. The
    expression-based rescore is chosen for bit-exact oracle parity
    and suits bounded incremental batches; corpus-scale self-query
    uses the BLAS cosine_topk family instead (see bench.py note)."""
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    e = _t(spark, sf_dir).embeddings()
    idx = build_ann_index(e, "vec_id", "embedding", ANN_INDEX_PLANES)
    return query_ann_index(e, idx, "vec_id", "embedding",
                           ANN_INDEX_PLANES, k=5, rescore="expr") \
        .select("query_id", "neighbor_id",
                F.col("rank").cast("int").alias("rank"))


_PLANES_VALUES = ", ".join(
    f"({i}, [" + ", ".join(str(x) for x in p) + "])"
    for i, p in enumerate(ANN_INDEX_PLANES))


ORACLE_ANN_INDEX = f"""
WITH pv AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), pl AS (
  SELECT * FROM (VALUES {_PLANES_VALUES}) AS t(rowid, p)
), bk AS (
  SELECT vec_id, e,
    string_agg(CASE WHEN list_sum(list_transform(range(1, 65),
                 i -> CAST(p[i] AS DOUBLE) * e[i])) >= 0
               THEN '1' ELSE '0' END, '' ORDER BY rowid) AS bucket
  FROM pv, pl
  GROUP BY vec_id, e
), qz AS (
  SELECT vec_id,
    list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale, e
  FROM pv
), dq AS (
  SELECT vec_id,
    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS DOUBLE))
         ELSE list_transform(e,
           x -> CAST(CAST(floor(x / scale + 0.5) AS INT) AS DOUBLE)
                * scale)
    END AS dv
  FROM qz
), sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, 65), i -> qa.e[i] * db.dv[i]))
      / (sqrt(list_sum(list_transform(range(1, 65),
               i -> qa.e[i] * qa.e[i])))
         * sqrt(list_sum(list_transform(range(1, 65),
                 i -> db.dv[i] * db.dv[i])))) AS sim
  FROM bk a JOIN bk b ON a.bucket = b.bucket
                     AND a.vec_id <> b.vec_id
  JOIN pv qa ON qa.vec_id = a.vec_id
  JOIN dq db ON db.vec_id = b.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims) WHERE rank <= 5
"""


#: Second independent table for the multi-table ANN row: integer
#: planes from a fixed residue formula (deterministic, SQL-embeddable
#: like ANN_INDEX_PLANES).
ANN_MT_TABLES = [
    ANN_INDEX_PLANES,
    [[((3 * i + 11 * p + 5) % 7) - 3 for i in range(64)]
     for p in range(2)],
]


def q_ann_multi_topk(spark, sf_dir):
    """Multi-table stored ANN (VERDICT r8 #7): TWO independent plane
    sets side by side, candidates unioned across tables and deduped
    before one global rank — the recall regime single-set multi-probe
    plateaus in (neighbors >= 2 sign flips away in one table usually
    share a bucket in the other). Ranks only, expression rescore for
    bit-exact oracle parity (see q_ann_index_topk)."""
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    e = _t(spark, sf_dir).embeddings()
    idx = build_ann_index(e, "vec_id", "embedding", ANN_MT_TABLES,
                          tables=2)
    return query_ann_index(e, idx, "vec_id", "embedding",
                           ANN_MT_TABLES, k=5, rescore="expr",
                           tables=2) \
        .select("query_id", "neighbor_id",
                F.col("rank").cast("int").alias("rank"))


def _mt_bucket_sql(planes: list) -> str:
    return " || ".join(
        "CASE WHEN list_sum(list_transform(range(1, 65),"
        f" i -> e[i] * (CAST([{', '.join(str(float(x)) for x in p)}]"
        " AS DOUBLE[]))[i])) >= 0 THEN '1' ELSE '0' END"
        for p in planes)


def _oracle_ann_multi(qmax: float) -> str:
    """Two-table stored-ANN oracle, parameterized on the quantizer
    half-range (127 = int8, 32767 = int16) — the ONLY thing that
    differs between the ann_multi_topk and ann_index16_topk rows."""
    return f"""
WITH pv AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), bk AS (
  SELECT vec_id, {_mt_bucket_sql(ANN_MT_TABLES[0])} AS b0,
         {_mt_bucket_sql(ANN_MT_TABLES[1])} AS b1
  FROM pv
), qz AS (
  SELECT vec_id,
    list_max(list_transform(e, x -> abs(x))) / {qmax} AS scale, e
  FROM pv
), dq AS (
  SELECT vec_id,
    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS DOUBLE))
         ELSE list_transform(e,
           x -> CAST(CAST(floor(x / scale + 0.5) AS INT) AS DOUBLE)
                * scale)
    END AS dv
  FROM qz
), sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_sum(list_transform(range(1, 65), i -> qa.e[i] * db.dv[i]))
      / (sqrt(list_sum(list_transform(range(1, 65),
               i -> qa.e[i] * qa.e[i])))
         * sqrt(list_sum(list_transform(range(1, 65),
                 i -> db.dv[i] * db.dv[i])))) AS sim
  FROM bk a JOIN bk b ON (a.b0 = b.b0 OR a.b1 = b.b1)
                     AND a.vec_id <> b.vec_id
  JOIN pv qa ON qa.vec_id = a.vec_id
  JOIN dq db ON db.vec_id = b.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims) WHERE rank <= 5
"""


ORACLE_ANN_MULTI = _oracle_ann_multi(127.0)
ORACLE_ANN_INDEX16 = _oracle_ann_multi(32767.0)


def q_ann_index16_topk(spark, sf_dir):
    """The headline stored-ANN recipe (VERDICT r9 #6), pinned
    bit-exactly end to end: TWO independent plane tables × int16
    rescore — the configuration measured at >= 0.99 recall@5 on the
    50k rig (BASELINE.md §r9; int8's rescore ceiling is 0.969).
    build(bits=16) → (table, bucket) candidate join → dequantized
    expression rescore; ranks only (see q_ann_index_topk)."""
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    e = _t(spark, sf_dir).embeddings()
    idx = build_ann_index(e, "vec_id", "embedding", ANN_MT_TABLES,
                          tables=2, bits=16)
    return query_ann_index(e, idx, "vec_id", "embedding",
                           ANN_MT_TABLES, k=5, rescore="expr",
                           tables=2) \
        .select("query_id", "neighbor_id",
                F.col("rank").cast("int").alias("rank"))


def q_script_fractions(spark, sf_dir):
    """Unicode script tagger over documents: latin fraction + letter
    count (operators/textstats.py script_fractions; fractions are
    single divisions of exact counts — oracle-portable)."""
    from wp_etl_migration_spark.operators.textstats import (
        script_fractions)
    d = _t(spark, sf_dir).documents()
    return (d.withColumn("__s", script_fractions("text"))
            .select("doc_id",
                    F.col("__s.latin").alias("latin_frac"),
                    F.col("__s.other").alias("other_frac"),
                    F.col("__s.n_letters").alias("n_letters")))


ORACLE_SCRIPTS_FRAC = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\p{Latin}')) AS DOUBLE)
    / CAST(greatest(len(regexp_extract_all(text, '\pL')), 1) AS DOUBLE)
    AS latin_frac,
  CAST(len(regexp_extract_all(text, '\pL'))
       - len(regexp_extract_all(text, '\p{Latin}'))
       - len(regexp_extract_all(text, '\p{Cyrillic}'))
       - len(regexp_extract_all(text, '\p{Han}'))
       - len(regexp_extract_all(text, '\p{Arabic}'))
       - len(regexp_extract_all(text, '\p{Devanagari}')) AS DOUBLE)
    / CAST(greatest(len(regexp_extract_all(text, '\pL')), 1) AS DOUBLE)
    AS other_frac,
  CAST(len(regexp_extract_all(text, '\pL')) AS BIGINT) AS n_letters
FROM documents
"""


def q_domain_cap(spark, sf_dir):
    """Per-source document cap (the web-corpus domain-cap mixture
    rule): at most 15 docs per source survive, chosen by the
    content-addressed (md5(salt|id), id) draw
    (operators/sampling.cap_per_key). Oracle replays the identical
    window rank in SQL."""
    from wp_etl_migration_spark.operators.sampling import cap_per_key
    d = _t(spark, sf_dir).documents()
    return cap_per_key(d.select("doc_id", "source"), "doc_id",
                       "source", max_per_key=15, salt="cap|")


ORACLE_DOMAIN_CAP = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source
      ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents) WHERE rk <= 15
"""


def q_wp_post_preset(spark, sf_dir):
    """The canned post preset's full column chain (plans/presets.py
    WordPressPostPipeline ≙ WordPressPostPipeline.php:121-310): title
    sanitize + defaulting, slug-from-title, legacy status mapping,
    content/excerpt/author defaults, pinned-now() date + fixed-offset
    GMT chain, etl_pipeline stamp. The oracle replays every rule in
    SQL. tz is a fixed offset (GMT-05:00) so the oracle's GMT shift is
    a plain interval, engine-independent."""
    from wp_etl_migration_spark.plans.presets import (
        wordpress_post_pipeline)
    p = _t(spark, sf_dir).part()
    src = p.select(
        F.col("p_partkey").alias("meta.legacy_id"),
        F.concat(F.lit("<b>"), F.col("p_name"),
                 F.lit("</b>")).alias("post.post_title"),
        F.when(F.col("p_partkey") % 3 == 0, "Published")
         .when(F.col("p_partkey") % 3 == 1, "Draft")
         .otherwise("weird").alias("post.post_status"),
        F.to_timestamp(F.date_add(
            F.lit("1995-01-01").cast("date"),
            (F.col("p_partkey") % 1000).cast("int")))
        .alias("post.post_date"))
    pipe = wordpress_post_pipeline(
        now=F.lit("2025-01-01 00:00:00").cast("timestamp"),
        tz="GMT-05:00")
    out = pipe(src)
    return out.select(
        F.col("`meta.legacy_id`").alias("legacy_id"),
        F.col("`post.post_type`").alias("post_type"),
        F.col("`post.post_title`").alias("post_title"),
        F.col("`post.post_name`").alias("post_name"),
        F.col("`post.post_status`").alias("post_status"),
        F.col("`post.post_content`").alias("post_content"),
        F.col("`post.post_excerpt`").alias("post_excerpt"),
        F.col("`post.post_author`").alias("post_author"),
        F.col("`post.post_date`").alias("post_date"),
        F.col("`post.post_date_gmt`").alias("post_date_gmt"),
        F.col("`post.post_modified_date`").alias("post_modified"),
        F.col("`meta.etl_pipeline`").alias("etl_pipeline"))


ORACLE_WP_POST_PRESET = r"""
WITH s AS (
  SELECT p_partkey AS legacy_id,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace('<b>' || p_name || '</b>',
                         '<[^>]*>', '', 'g'),
          '%[a-fA-F0-9]{2}', '', 'g'),
        '[\x00-\x1F\x7F]', '', 'g'),
      '[ \t]+', ' ', 'g')) AS post_title,
    CASE lower(trim(CASE WHEN p_partkey % 3 = 0 THEN 'Published'
                         WHEN p_partkey % 3 = 1 THEN 'Draft'
                         ELSE 'weird' END))
      WHEN 'published' THEN 'publish'
      WHEN 'draft' THEN 'draft'
      ELSE 'draft' END AS post_status,
    CAST(DATE '1995-01-01'
         + (p_partkey % 1000) * INTERVAL 1 DAY AS TIMESTAMP)
      AS post_date
  FROM part
)
SELECT legacy_id,
  'post' AS post_type,
  post_title,
  regexp_replace(regexp_replace(lower(trim(post_title)),
                                '[^a-z0-9]+', '-', 'g'),
                 '^-+|-+$', '', 'g') AS post_name,
  post_status,
  'Default post content' AS post_content,
  '' AS post_excerpt,
  CAST(1 AS BIGINT) AS post_author,
  post_date,
  post_date + INTERVAL 5 HOUR AS post_date_gmt,
  post_date AS post_modified,
  'WordPressPostPipeline' AS etl_pipeline
FROM s
"""


def _wp_post_all_prepare_csv(spark, sf_dir) -> str:
    """One-time scratch CSV derived from ``part`` — the legacy export
    the composed journey ingests. Cached per scale factor (prep is
    not part of the measured pipeline). The cache key embeds a hash
    of THIS function's source (ADVICE r6): editing the generation
    logic changes the path, so existing checkouts regenerate instead
    of serving a stale fixture that keeps goldens green locally while
    fresh environments diverge."""
    import hashlib
    import inspect
    import os
    fingerprint = hashlib.md5(
        inspect.getsource(_wp_post_all_prepare_csv).encode()
    ).hexdigest()[:8]
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "wp_post_all_" + os.path.basename(os.path.normpath(sf_dir)))
    csv_dir = os.path.join(base, "legacy_csv_" + fingerprint)
    if not os.path.exists(os.path.join(csv_dir, "_SUCCESS")):
        p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
        legacy = p.select(
            F.col("p_partkey").alias("id"),
            F.col("p_name").alias("title"),
            F.concat(F.lit('<p class="lead" onclick="x()">'),
                     F.col("p_name"),
                     F.lit('</p><script>evil()</script>')).alias("body"),
            F.when(F.col("p_partkey") % 3 == 0, "Published")
             .when(F.col("p_partkey") % 3 == 1, "Draft")
             .otherwise("weird").alias("status"),
            F.col("p_brand").alias("category"),
            F.regexp_replace(F.col("p_type"), " ", ",").alias("tags"),
            F.concat(F.lit("https://img.example/p"),
                     (F.col("p_partkey") % 500).cast("string"),
                     F.lit(".png")).alias("featured_url"),
            F.when(F.col("p_partkey") % 7 == 0, F.lit("not a date"))
             .otherwise(F.concat(
                 F.lit("1995-01-"),
                 F.lpad(((F.col("p_partkey") % 28) + 1).cast("string"),
                        2, "0"),
                 F.lit(" 10:30:00"))).alias("published"))
        legacy.write.mode("overwrite").option("header", True) \
            .option("quote", '"').option("escape", '"').csv(csv_dir)
    return csv_dir


def _wp_post_all_incoming(spark, sf_dir):
    """The journey's transform half: legacy CSV scan → kses/date
    transforms → the canned post preset chain. Shared by the parquet
    journey (q_wp_post_all) and the JDBC-targets journey test
    (tests/test_jdbc.py), which must produce the identical ledger
    golden from WP state served over a real JDBC relation."""
    from wp_etl_migration_spark.functions.dates import validate_date
    from wp_etl_migration_spark.functions.text import kses_post
    from wp_etl_migration_spark.plans.presets import (
        wordpress_post_pipeline)
    raw = (spark.read.option("header", True).option("quote", '"')
           .option("escape", '"')
           .csv(_wp_post_all_prepare_csv(spark, sf_dir)))
    mapped = raw.select(
        F.lit(None).cast("long").alias("post.ID"),
        F.col("title").alias("post.post_title"),
        kses_post(F.col("body")).alias("post.post_content"),
        F.col("status").alias("post.post_status"),
        validate_date(
            F.col("published"),
            fallback=F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .alias("post.post_date"),
        F.col("id").cast("long").alias("meta.legacy_id"),
        F.col("category").alias("tax.category"),
        F.split("tags", ",").alias("tax.post_tag"),
        F.col("featured_url").alias("media.featured.url"),
        F.col("id").cast("long").alias("ledger.source_id"),
    )
    return wordpress_post_pipeline(
        now=F.lit("2025-01-01 00:00:00").cast("timestamp"),
        tz="GMT-05:00")(mapped)


def _wp_post_all_targets(spark, sf_dir):
    """Deterministic pre-existing WP targets derived from the part
    table: every 10th part is already a post (upsert updates), half
    the featured files are already attachments (media dedupe hits).
    Returns (posts, attachments) — the same rows the JDBC journey
    test loads into Derby to model the live-WP `$wpdb` topology."""
    import os

    from wp_etl_migration_spark.functions.text import to_slug
    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    posts = p.where(F.col("p_partkey") % 10 == 0).select(
        (F.col("p_partkey") / 10).cast("long").alias("ID"),
        to_slug(F.col("p_name")).alias("post_name"),
        F.lit("post").alias("post_type"),
        F.col("p_name").alias("post_title"),
        F.lit("publish").alias("post_status"))
    attachments = spark.range(250).select(
        (F.col("id") + 1).alias("ID"),
        F.concat(F.lit("p"), (F.col("id") * 2).cast("string"),
                 F.lit(".png")).alias("file"))
    return posts, attachments


def q_wp_post_all(spark, sf_dir):
    """The reference's composed user journey as ONE tracked wall time
    (VERDICT r5 #3; ≙ ProcessCommand.php + the WP_Post_All loader
    fan-out, Orchestrator.php:125-135): legacy CSV scan → kses/date
    transforms + the canned post preset chain → staged loader fan-out
    (media dedupe/mint → post upsert → postmeta melt → terms replace
    → featured-image link) → sink tables + ledger lineage write.

    Sinks land under a fixed per-scale-factor .scratch run dir,
    overwritten each call so repeated bench/test runs occupy bounded
    disk (writes ARE part of the measured journey); returns the
    written ledger read back so the bench materializes it. No single
    SQL oracle is natural for a multi-sink pipeline — the golden
    contract (ledger row count + content hash + sink table counts,
    sf0.01) is pinned in tests/test_wp_post_all.py."""
    import os
    import shutil

    from wp_etl_migration_spark.sinks import ledger as lsink
    from wp_etl_migration_spark.sinks.wordpress import (
        featured_image_stage, media_stage, meta_stage,
        post_upsert_stage, run_stages, terms_stage)

    incoming = _wp_post_all_incoming(spark, sf_dir)
    posts, attachments = _wp_post_all_targets(spark, sf_dir)
    empty_meta = spark.createDataFrame(
        [], "post_id long, meta_key string, meta_value string")
    empty_rel = spark.createDataFrame(
        [], "post_id long, taxonomy string, term string")

    state = run_stages(
        {"incoming": incoming, "posts": posts,
         "attachments": attachments, "postmeta": empty_meta,
         "term_relationships": empty_rel},
        [media_stage(), post_upsert_stage(), meta_stage(),
         terms_stage(), featured_image_stage()])

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "wp_post_all_run_"
        + os.path.basename(os.path.normpath(sf_dir)))
    for tbl in ("posts", "postmeta", "term_relationships",
                "attachments"):
        state[tbl].write.mode("overwrite").parquet(
            os.path.join(out, tbl))
    stream = lsink.with_uid(
        state["incoming"]
        .withColumn("ledger.post_id", F.col("`post.ID`"))
        .withColumn("ledger.slug", F.col("`post.post_name`")))
    # write_ledger mints a timestamped run dir per call; clear prior
    # runs so repeated bench/test invocations occupy bounded disk.
    shutil.rmtree(os.path.join(out, "ledger"), ignore_errors=True)
    path = lsink.write_ledger(stream, os.path.join(out, "ledger"),
                              "wp-post-all")
    return spark.read.json(path)


def _synthetic_urls(spark, sf_dir):
    """Deterministic URL column over documents (the testdata carries no
    URLs): subdomain/suffix/port/query variants cycle on doc_id so the
    URL operators see mixed-case schemes, multi-label public suffixes,
    default and explicit ports, tracking and real params, fragments.
    The oracles rebuild the identical string with CASE arms."""
    d = _t(spark, sf_dir).documents()
    m = lambda k: F.col("doc_id") % k  # noqa: E731
    return d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.when(m(3) == 0, "WWW.").when(m(3) == 1, "")
            .otherwise("cdn."),
            F.col("source"),
            F.when(m(4) == 0, ".com").when(m(4) == 1, ".co.uk")
            .when(m(4) == 2, ".org").otherwise(".com.au"),
            F.when(m(5) == 0, ":443").when(m(5) == 1, ":8080")
            .otherwise(""),
            F.lit("/p/"), F.col("doc_id").cast("string"),
            F.when(m(2) == 0, "?a=1&utm_source=feed&b=2")
            .otherwise("?utm_campaign=x"),
            F.lit("#s")).alias("url"))


#: The URL construction above, verbatim in SQL (shared by both URL
#: oracles).
_SQL_URLS = """
  SELECT doc_id,
    'HTTPS://'
    || CASE WHEN doc_id % 3 = 0 THEN 'WWW.'
            WHEN doc_id % 3 = 1 THEN '' ELSE 'cdn.' END
    || source
    || CASE WHEN doc_id % 4 = 0 THEN '.com'
            WHEN doc_id % 4 = 1 THEN '.co.uk'
            WHEN doc_id % 4 = 2 THEN '.org' ELSE '.com.au' END
    || CASE WHEN doc_id % 5 = 0 THEN ':443'
            WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END
    || '/p/' || CAST(doc_id AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '?a=1&utm_source=feed&b=2'
            ELSE '?utm_campaign=x' END
    || '#s' AS url
  FROM documents
"""

#: registered_domain in SQL over a ``host`` column (DuckDB list
#: negative indexing ≙ element_at(-k)); suffix list must stay in sync
#: with operators.urls.TWO_LABEL_SUFFIXES (tests assert the Spark
#: side; the parity run catches drift).
_SQL_REG_DOMAIN = """
  CASE WHEN len(string_split(host, '.')) >= 3
        AND (string_split(host, '.')[-2] || '.'
             || string_split(host, '.')[-1]) IN
            ('co.uk','org.uk','ac.uk','gov.uk','me.uk','com.au',
             'net.au','org.au','co.nz','co.jp','ne.jp','or.jp',
             'ac.jp','com.br','com.cn','com.mx','com.ar','com.tr',
             'com.sg','co.in','co.kr','co.za','co.id','com.hk',
             'com.tw')
       THEN string_split(host, '.')[-3] || '.'
            || string_split(host, '.')[-2] || '.'
            || string_split(host, '.')[-1]
       WHEN len(string_split(host, '.')) >= 2
       THEN string_split(host, '.')[-2] || '.'
            || string_split(host, '.')[-1]
       ELSE host END
"""


def q_url_normalize(spark, sf_dir):
    """URL parsing + canonicalization over synthetic per-document URLs
    (operators/urls.py — the pre-dedup normalization every web corpus
    runs): scheme/host lower-cased, default ports dropped, tracking
    params stripped with order preserved, fragment dropped, registered
    domain extracted through the multi-label public-suffix rule. The
    oracle reimplements the full rule chain in SQL over the identical
    synthetic URLs."""
    from wp_etl_migration_spark.operators.urls import (
        normalize_url, registered_domain, strip_tracking_params,
        url_host, url_path, url_query)
    u = _synthetic_urls(spark, sf_dir)
    host = url_host("url")
    return u.select(
        "doc_id",
        normalize_url("url").alias("norm_url"),
        host.alias("host"),
        registered_domain(host).alias("domain"),
        url_path("url").alias("path_part"),
        strip_tracking_params(url_query("url")).alias("query_kept"))


ORACLE_URL_NORMALIZE = rf"""
WITH u AS ({_SQL_URLS}),
parts AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
      AS scheme,
    lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
    regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path_part,
    regexp_extract(regexp_extract(url, '^([^#]*)', 1),
                   '\?([^#]*)', 1) AS q
  FROM u),
norm AS (
  SELECT doc_id, scheme,
    regexp_extract(string_split(hostport, '@')[-1],
                   '^(\[[^\]]*\]|[^:]*)', 1) AS host,
    regexp_extract(hostport, ':([0-9]+)$', 1) AS port, path_part,
    coalesce(array_to_string(list_filter(string_split(q, '&'),
      p -> NOT regexp_matches(p,
        '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref|igshid)=')
        AND p <> ''), '&'), '') AS query_kept
  FROM parts)
SELECT doc_id,
  scheme || '://' || host
  || CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
           OR (scheme = 'https' AND port = '443'))
          THEN ':' || port ELSE '' END
  || CASE WHEN path_part = '' THEN '/' ELSE path_part END
  || CASE WHEN query_kept = '' THEN ''
          ELSE '?' || query_kept END AS norm_url,
  host, {_SQL_REG_DOMAIN} AS domain, path_part, query_kept
FROM norm
"""


def q_domain_stats(spark, sf_dir):
    """Per-registered-domain corpus composition (operators/urls.py
    domain_stats — the input to domain-cap/mixture decisions): doc
    counts and exact-ratio corpus share, grand total via broadcast
    one-row cross join (never a single-reducer window). ``psl=False``
    pins the expression path the DuckDB oracle replicates — a
    $SPARK_GRAFT_PSL_PATH set where the driver gate runs must not
    change this query's results."""
    from wp_etl_migration_spark.operators.urls import domain_stats
    return domain_stats(_synthetic_urls(spark, sf_dir), "url",
                        psl=False)


ORACLE_DOMAIN_STATS = rf"""
WITH u AS ({_SQL_URLS}),
hosts AS (
  SELECT regexp_extract(
      string_split(lower(regexp_extract(url,
        '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)), '@')[-1],
      '^(\[[^\]]*\]|[^:]*)', 1) AS host
  FROM u),
counts AS (
  SELECT {_SQL_REG_DOMAIN} AS domain, COUNT(*) AS n_docs
  FROM hosts GROUP BY 1)
SELECT domain, n_docs,
  CAST(n_docs AS DOUBLE)
    / CAST((SELECT SUM(n_docs) FROM counts) AS DOUBLE) AS share
FROM counts
"""


def q_pagerank(spark, sf_dir):
    """Fixed-point integer PageRank (operators/graph.pagerank — the
    domain-quality-weighting rank of web-corpus curation) over the
    undirected customer↔supplier interaction graph (supplier ids
    offset into their own node range), 3 power steps. Integer
    arithmetic makes every rank an exact BIGINT, so the oracle is a
    bit-exact unrolled-CTE power iteration."""
    from wp_etl_migration_spark.operators.graph import pagerank
    t = _t(spark, sf_dir)
    edges = (t.lineitem().join(
        t.orders(),
        F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("src"),
                (F.col("l_suppkey") + 1000000).alias("dst")))
    return pagerank(edges, iterations=3, undirected=True)


def _pagerank_oracle(iterations: int) -> str:
    """Unrolled power-iteration SQL mirroring pagerank()'s integer
    contract (scale 1e9, damping 85/100, undirected customer↔supplier
    edges)."""
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""
s{i} AS (SELECT e.v AS node, SUM({prev}.r // g.d) AS s
  FROM ed e JOIN {prev} ON {prev}.node = e.u
  JOIN deg g ON g.u = e.u GROUP BY e.v),
r{i} AS (SELECT n.node,
  CAST(150000000 + (85 * COALESCE(s{i}.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN s{i} ON s{i}.node = n.node)""")
        prev = f"r{i}"
    return f"""
WITH raw AS (
  SELECT o_custkey AS u, l_suppkey + 1000000 AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ed AS (SELECT DISTINCT u, v FROM (
  SELECT u, v FROM raw UNION ALL SELECT v AS u, u AS v FROM raw)),
deg AS (SELECT u, COUNT(*) AS d FROM ed GROUP BY u),
nodes AS (SELECT DISTINCT u AS node FROM ed),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
{",".join(steps)}
SELECT node, r AS rank FROM {prev}
"""


ORACLE_PAGERANK = _pagerank_oracle(3)


def q_pagerank_redistribute(spark, sf_dir):
    """Classical (mass-conserving) integer PageRank
    (operators/graph.pagerank dangling="redistribute", VERDICT r6 #4)
    over the DIRECTED customer→supplier graph — suppliers have no
    out-edges, so every iteration redistributes their summed rank
    uniformly: rank += num·(D div N) div den, all integer, making the
    result bit-exact against the unrolled-CTE oracle extended with a
    per-step dangling scalar subquery."""
    from wp_etl_migration_spark.operators.graph import pagerank
    t = _t(spark, sf_dir)
    edges = (t.lineitem().join(
        t.orders(),
        F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("src"),
                (F.col("l_suppkey") + 1000000).alias("dst")))
    return pagerank(edges, iterations=3, dangling="redistribute")


def _pagerank_redistribute_oracle(iterations: int) -> str:
    """The unrolled oracle with the dangling term: per step, the
    summed rank of no-out-edge nodes divides by the node count and
    damps into every node's base — mirroring pagerank()'s
    ``(num * (D div N)) div den`` integer order of operations."""
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""
d{i} AS (SELECT COALESCE(SUM(r), 0) AS dm FROM {prev}
  WHERE node NOT IN (SELECT u FROM deg)),
s{i} AS (SELECT e.v AS node, SUM({prev}.r // g.d) AS s
  FROM ed e JOIN {prev} ON {prev}.node = e.u
  JOIN deg g ON g.u = e.u GROUP BY e.v),
r{i} AS (SELECT n.node,
  CAST(150000000
       + (85 * ((SELECT dm FROM d{i})
                // (SELECT nc FROM ncount))) // 100
       + (85 * COALESCE(s{i}.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN s{i} ON s{i}.node = n.node)""")
        prev = f"r{i}"
    return f"""
WITH ed AS (
  SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
deg AS (SELECT u, COUNT(*) AS d FROM ed GROUP BY u),
nodes AS (SELECT DISTINCT node FROM (
  SELECT u AS node FROM ed UNION ALL SELECT v AS node FROM ed)),
ncount AS (SELECT COUNT(*) AS nc FROM nodes),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
{",".join(steps)}
SELECT node, r AS rank FROM {prev}
"""


ORACLE_PAGERANK_REDIST = _pagerank_redistribute_oracle(3)


def q_training_prep_all(spark, sf_dir):
    """The composed LLM training-data preparation journey as ONE run —
    the pretraining twin of q_wp_post_all: quality gates (observed
    drop counts) → one-call dedup recipe (exact → MinHash-LSH verify →
    components) → sequence packing at 512 tokens → deterministic
    shuffled shard write with token manifest → read-back verification.

    Returns the per-shard summary (shard, n_rows, n_tokens) read back
    from the WRITTEN shards, cross-checked against the manifest — the
    stable, content-addressed contract a downstream loader sees. No
    single SQL oracle (multi-stage + filesystem sink); the golden
    witness lives in tests/test_training_prep_all.py."""
    import os
    import shutil

    from wp_etl_migration_spark.operators.dedup import dedup_documents
    from wp_etl_migration_spark.operators.gates import apply_gates
    from wp_etl_migration_spark.operators.packing import pack_sequences
    from wp_etl_migration_spark.operators.textstats import (
        quality_score, token_count)
    from wp_etl_migration_spark.sinks.training import (
        write_training_shards)

    docs = _t(spark, sf_dir).documents()
    gated, obs = apply_gates(docs, {
        "lang": F.col("lang").isin("en", "de", "fr"),
        "min_tokens": token_count("text") >= F.lit(8),
        "quality": quality_score("text") >= F.lit(0.25),
    })
    from wp_etl_migration_spark.operators.checkpoint import pin
    # pin: the dedup recipe's lineage (signatures, band join, verify,
    # components) feeds BOTH the packing input and the text join-back
    # below — without the pin it would execute twice.
    deduped = pin(dedup_documents(gated, "doc_id", "text",
                                  num_hashes=8, rows_per_band=2,
                                  verify_threshold=0.7,
                                  max_doc_freq=100))
    packed = pack_sequences(
        deduped.select("doc_id", token_count("text").alias("n_tokens")),
        "doc_id", "n_tokens", seq_len=512)
    rows = (deduped.select("doc_id", "text", "lang")
            .join(packed, "doc_id"))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "training_prep_run_"
        + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out, ignore_errors=True)
    manifest = write_training_shards(rows, out, "doc_id", n_shards=8,
                                     salt="prep|",
                                     tokens_col="n_tokens")
    # gate observability resolved by the shard write's action
    assert obs.get["total"] >= obs.get["kept"]

    back = (spark.read.parquet(out)
            .groupBy(F.col("shard").cast("int").alias("shard"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum("n_tokens").cast("long").alias("n_tokens")))
    # the read-back MUST agree with the manifest the writer minted
    got = {r.shard: (r.n_rows, r.n_tokens) for r in back.collect()}
    want = {s: (m["rows"], m["tokens"])
            for s, m in manifest["shards"].items()}
    if got != want:
        raise AssertionError(
            f"shard read-back disagrees with manifest: {got} != {want}")
    return back


def q_training_prep_contract(spark, sf_dir):
    """Driver-witnessable terminal contract of the composed
    training-prep journey (VERDICT r7 #6): runs the FULL
    q_training_prep_all journey — gates, dedup recipe, packing, shard
    WRITE, manifest cross-check — and returns the per-shard summary
    read back from the written shards. The oracle reproduces the
    terminal projection end-to-end in SQL (quality gates → exact →
    MinHash-LSH verify → recursive-CTE components → content-addressed
    shard assignment), so a green hash row witnesses the whole
    composed path, not just its stages. (Packing assigns bins but
    neither drops nor duplicates docs, so the shard summary is
    invariant to it — the oracle needs no packing CTE; packing itself
    is hash-checked by the pack_sequences row.)"""
    return q_training_prep_all(spark, sf_dir)


ORACLE_TRAINING_PREP = rf"""
WITH RECURSIVE q AS (
  SELECT doc_id, text, lang,
    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
      AS n_tok,
    CAST(length(trim(text)) AS BIGINT) AS n_chars,
    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
         t -> list_contains(['the','a','of','and','to'], t))) AS BIGINT)
      AS hits
  FROM documents
), g AS (
  SELECT doc_id, text, n_tok FROM q
  WHERE lang IN ('en', 'de', 'fr') AND n_tok >= 8
    AND (least(1.0, CAST(n_tok AS DOUBLE) / 64.0)
         + (CASE WHEN CAST(n_chars - (n_tok - 1) AS DOUBLE)
                      / CAST(n_tok AS DOUBLE) >= 3.0
                  AND CAST(n_chars - (n_tok - 1) AS DOUBLE)
                      / CAST(n_tok AS DOUBLE) <= 10.0
            THEN 1.0 ELSE 0.0 END)
         + least(1.0, 4.0 * CAST(hits AS DOUBLE)
                 / CAST(n_tok AS DOUBLE))) / 3.0 >= 0.25
), ex AS (
  SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(CAST(text AS VARCHAR))
), base AS (
  SELECT g.doc_id, g.text, g.n_tok FROM g JOIN ex USING (doc_id)
), ptoks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM base
), psh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM ptoks, UNNEST(range(1, len(t) - 1)) AS r(i)
  WHERE len(t) >= 3
), shc AS (
  SELECT doc_id, shingle FROM psh
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 100
), {_duck_minhash_sig("shc", num_hashes=8)}, bands AS (
  SELECT doc_id, seed // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY minhash))
           AS band_hash
  FROM sig GROUP BY doc_id, band
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), sets AS (
  SELECT doc_id, list(shingle) AS s, count(*) AS n FROM shc GROUP BY 1
), ver AS (
  SELECT id_a, id_b FROM cand
  JOIN sets sa ON sa.doc_id = id_a
  JOIN sets sb ON sb.doc_id = id_b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / CAST(sa.n + sb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      >= 0.7
), edges AS (
  SELECT id_a AS u, id_b AS v FROM ver
  UNION
  SELECT id_b, id_a FROM ver
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
), keepc AS (
  SELECT min(node) AS doc_id FROM comp GROUP BY component
), kept AS (
  SELECT b.doc_id, b.n_tok FROM base b
  WHERE b.doc_id NOT IN (SELECT node FROM comp)
     OR b.doc_id IN (SELECT doc_id FROM keepc)
)
SELECT CAST(('0x' || substr(md5('prep|' || CAST(doc_id AS VARCHAR)),
                            1, 8))::BIGINT % 8 AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM kept GROUP BY 1
"""


def q_wp_post_all_contract(spark, sf_dir):
    """Driver-witnessable terminal contract of the composed WP journey
    (VERDICT r7 #6, the wp twin of q_training_prep_contract): runs the
    FULL q_wp_post_all journey — CSV scan, preset chain, media
    dedupe/mint, post upsert with slug-collision collapse and id
    minting, meta melt+merge, terms replace, featured-image link,
    ledger write — then reads the written sink tables back and
    returns one row per FINAL post: (ID, post_name, post_title,
    post_status, n_meta, n_terms, legacy_id). The oracle reproduces
    the projection from the `part` table: the legacy-CSV derivation,
    slug/status/title transforms, min-id slug probe, deterministic
    id minting (max existing id + rank over unmatched slugs), the
    one-row-per-key winner (status DESC — publish beats draft), the
    melt's update-mode collapse (legacy_id = max-string source id per
    group), and the terms explode count. The kses/date/GMT transforms
    flow through the journey but land only in the ledger, witnessed
    by their own hash rows (sanitize_chain, date_validate) and the
    pinned journey goldens; the _thumbnail_id VALUE (media mint) is
    counted here and value-witnessed by media_dedupe_lookup."""
    import os
    q_wp_post_all(spark, sf_dir)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "wp_post_all_run_" + os.path.basename(os.path.normpath(sf_dir)))
    posts = spark.read.parquet(os.path.join(out, "posts"))
    meta = spark.read.parquet(os.path.join(out, "postmeta"))
    rel = spark.read.parquet(os.path.join(out, "term_relationships"))
    n_meta = meta.groupBy("post_id").agg(
        F.count("*").cast("long").alias("n_meta"))
    n_terms = rel.groupBy("post_id").agg(
        F.count("*").cast("long").alias("n_terms"))
    legacy = (meta.where(F.col("meta_key") == "legacy_id")
              .select("post_id",
                      F.col("meta_value").alias("legacy_id")))
    return (posts
            .join(n_meta, posts["ID"] == n_meta["post_id"], "left")
            .drop("post_id")
            .join(n_terms, posts["ID"] == n_terms["post_id"], "left")
            .drop("post_id")
            .join(legacy, posts["ID"] == legacy["post_id"], "left")
            .drop("post_id")
            .select(F.col("ID").cast("long").alias("post_id"),
                    "post_name", "post_title", "post_status",
                    F.coalesce("n_meta", F.lit(0)).cast("long")
                    .alias("n_meta"),
                    F.coalesce("n_terms", F.lit(0)).cast("long")
                    .alias("n_terms"),
                    "legacy_id"))


ORACLE_WP_POST_CONTRACT = """
WITH src AS (
  SELECT p_partkey AS pk, p_name, p_type,
    regexp_replace(regexp_replace(lower(trim(p_name)),
                                  '[^a-z0-9]+', '-', 'g'),
                   '^-+|-+$', '', 'g') AS slug
  FROM part
), existing AS (
  SELECT pk // 10 AS id, slug, p_name AS title FROM src
  WHERE pk % 10 = 0
), hit AS (
  SELECT slug, min(id) AS hit_id FROM existing GROUP BY slug
), groups AS (
  SELECT slug,
    any_value(p_name) AS title,
    CASE WHEN bool_or(pk % 3 = 0) THEN 'publish' ELSE 'draft' END
      AS status,
    max(CAST(pk AS VARCHAR)) AS legacy_id,
    CAST(sum(1 + len(string_split(replace(p_type, ' ', ','), ',')))
         AS BIGINT) AS n_terms
  FROM src GROUP BY slug
), minted AS (
  SELECT g.slug,
    (SELECT COALESCE(max(id), 0) FROM existing)
      + CAST(dense_rank() OVER (ORDER BY g.slug) AS BIGINT) AS new_id
  FROM groups g LEFT JOIN hit USING (slug)
  WHERE hit.hit_id IS NULL
), touched AS (
  SELECT COALESCE(hit.hit_id, minted.new_id) AS post_id,
         g.slug AS post_name, g.title AS post_title,
         g.status AS post_status,
         CAST(3 AS BIGINT) AS n_meta, g.n_terms, g.legacy_id
  FROM groups g
  LEFT JOIN hit USING (slug)
  LEFT JOIN minted USING (slug)
), untouched AS (
  SELECT e.id AS post_id, e.slug AS post_name, e.title AS post_title,
         'publish' AS post_status, CAST(0 AS BIGINT) AS n_meta,
         CAST(0 AS BIGINT) AS n_terms, NULL AS legacy_id
  FROM existing e LEFT JOIN hit ON e.slug = hit.slug
                                AND e.id = hit.hit_id
  WHERE hit.hit_id IS NULL
)
SELECT * FROM touched UNION ALL SELECT * FROM untouched
"""


# ------------------------------------------------------------------ registry

#: The full query surface: every oracled query the engine ships, one
#: (callable, DuckDB-oracle-SQL) pair per name. REGISTRY /
#: EXTRA_REGISTRY below are VIEWS of this dict — rotation is an edit
#: to _DRIVER_ROWS only, so a query can never be dropped by a rotation
#: mistake (tests/test_oracle_parity.py iterates the union = this
#: whole dict; a None oracle marks the two composed multi-sink
#: journeys, parity-checked through their *_contract twins instead).
_ALL_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame],
                              str | None]] = {
    "ann_index16_topk": (q_ann_index16_topk, ORACLE_ANN_INDEX16),
    "ann_index_topk": (q_ann_index_topk, ORACLE_ANN_INDEX),
    "ann_lsh_topk": (q_ann_lsh_topk, ORACLE_ANN_LSH),
    "ann_multi_topk": (q_ann_multi_topk, ORACLE_ANN_MULTI),
    "array_ops": (q_array_ops, ORACLE_ARRAY_OPS),
    "asof_join": (q_asof_join, ORACLE_ASOF),
    "asof_nearest": (q_asof_nearest, ORACLE_ASOF_NEAREST),
    "author_embed": (q_author_embed, ORACLE_AUTHOR),
    "bigram_lm_score": (q_bigram_lm_score, ORACLE_BIGRAM_LM),
    "bpe_token_stats": (q_bpe_token_stats, ORACLE_BPE),
    "cascaded_lookup": (q_cascaded_lookup, ORACLE_CASCADE),
    "chunk_documents": (q_chunk_documents, ORACLE_CHUNKS),
    "classifier_score": (q_classifier_score, ORACLE_CLASSIFIER_SCORE),
    "cluster_centroids": (q_cluster_centroids, ORACLE_CENTROIDS),
    "contamination": (q_contamination, ORACLE_CONTAMINATION),
    "corpus_report": (q_corpus_report, ORACLE_CORPUS_REPORT),
    "cross_corpus_dedup": (q_cross_corpus_dedup, ORACLE_CROSS_CORPUS),
    "cube_agg": (q_cube_agg, ORACLE_CUBE),
    "date_parts": (q_date_parts, ORACLE_DATE_PARTS),
    "date_validate": (q_date_validate, ORACLE_DATE_VALIDATE),
    "dedup_clusters": (q_dedup_clusters, ORACLE_DEDUP_CLUSTERS),
    "dedup_exact": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_pipeline": (q_dedup_pipeline, ORACLE_DEDUP_PIPELINE),
    "domain_cap": (q_domain_cap, ORACLE_DOMAIN_CAP),
    "domain_stats": (q_domain_stats, ORACLE_DOMAIN_STATS),
    "embedding_near_dup": (q_embedding_near_dup, ORACLE_EMB_NEAR_DUP),
    "embedding_near_dup_lsh": (q_embedding_near_dup_lsh,
                               ORACLE_EMB_LSH_NEAR_DUP),
    "embedding_topk": (q_embedding_topk, ORACLE_TOPK),
    "entity_embed_full": (q_entity_embed_full, ORACLE_ENTITY_EMBED),
    "event_window_agg": (q_event_window_agg, ORACLE_EVENT_WINDOW),
    "fuzzy_match": (q_fuzzy_match, ORACLE_FUZZY),
    "global_shuffle_shards": (q_global_shuffle_shards,
                              ORACLE_GLOBAL_SHUFFLE),
    "gopher_quality": (q_gopher_quality, ORACLE_GOPHER),
    "grouping_sets": (q_grouping_sets, ORACLE_GROUPING_SETS),
    "hash_sample": (q_hash_sample, ORACLE_HASH_SAMPLE),
    "hierarchy_resolve": (q_hierarchy_resolve, ORACLE_HIERARCHY),
    "html_blocks": (q_html_blocks, ORACLE_HTML_BLOCKS),
    "incremental_lsh": (q_incremental_lsh, ORACLE_INCREMENTAL_LSH),
    "ivf_ann_topk": (q_ivf_ann_topk, ORACLE_IVF),
    "json_extract": (q_json_extract, ORACLE_JSON),
    "key_skew": (q_key_skew, ORACLE_KEY_SKEW),
    "keywords": (q_keywords, ORACLE_KEYWORDS),
    "kmeans_centroids": (q_kmeans_centroids, ORACLE_KMEANS),
    "lang_id": (q_lang_id, ORACLE_LANG),
    "line_dedup": (q_line_dedup, ORACLE_LINE_DEDUP),
    "media_decode": (q_media_decode, ORACLE_MEDIA_DECODE),
    "media_dedupe_lookup": (q_media_dedupe_lookup, ORACLE_MEDIA_DEDUPE),
    "meta_embed": (q_meta_embed, ORACLE_META_EMBED),
    "meta_melt": (q_meta_melt, ORACLE_MELT),
    "minhash_lsh_dedup": (q_minhash_lsh_dedup, ORACLE_LSH_DEDUP),
    "minhash_signatures": (q_minhash_signatures, ORACLE_MINHASH),
    "multimodal_features": (q_multimodal_features, ORACLE_MULTIMODAL),
    "ngram_jaccard_dedup": (q_ngram_jaccard_dedup, ORACLE_JACCARD),
    "nullif_sentinel": (q_nullif_sentinel, ORACLE_NULLIF),
    "numeric_preserve": (q_numeric_preserve, ORACLE_NUMERIC_PRESERVE),
    "pack_sequences": (q_pack_sequences, ORACLE_PACK),
    "pagerank": (q_pagerank, ORACLE_PAGERANK),
    "pagerank_redistribute": (q_pagerank_redistribute,
                              ORACLE_PAGERANK_REDIST),
    "passage_removal": (q_passage_removal, ORACLE_PASSAGE_REMOVAL),
    "percentile_stats": (q_percentile_stats, ORACLE_PERCENTILE),
    "pii_scrub": (q_pii_scrub, ORACLE_PII),
    "pivot_wide": (q_pivot_wide, ORACLE_PIVOT),
    "placeholder_subst": (q_placeholder_subst, ORACLE_PLACEHOLDER),
    "prefix_pipeline": (q_prefix_pipeline, ORACLE_PREFIX),
    "pricing_summary": (q_pricing_summary, ORACLE_PRICING),
    "profile_diff": (q_profile_diff, ORACLE_PROFILE_DIFF),
    "quality_score": (q_quality_score, ORACLE_QUALITY),
    "quantile_band": (q_quantile_band, ORACLE_QUANTILE_BAND),
    "quantize_embeddings": (q_quantize_embeddings, ORACLE_QUANTIZE),
    "random_projection": (q_random_projection,
                          ORACLE_RANDOM_PROJECTION),
    "range_join": (q_range_join, ORACLE_RANGE_JOIN),
    "regional_revenue": (q_regional_revenue, ORACLE_REGIONAL),
    "repetition_stats": (q_repetition_stats, ORACLE_REPETITION),
    "rolling_window": (q_rolling_window, ORACLE_ROLLING),
    "rollup_status": (q_rollup_status, ORACLE_ROLLUP),
    "sanitize_chain": (q_sanitize_chain, ORACLE_SANITIZE),
    "scan_filter_sort_limit": (q_scan_filter_sort_limit, ORACLE_SCAN),
    "script_fractions": (q_script_fractions, ORACLE_SCRIPTS_FRAC),
    "semantic_dedup": (q_semantic_dedup, ORACLE_SEMANTIC_DEDUP),
    "sessionization": (q_sessionization, ORACLE_SESSIONIZATION),
    "set_ops": (q_set_ops, ORACLE_SET_OPS),
    "shared_gram_stats": (q_shared_gram_stats, ORACLE_SHARED_GRAMS),
    "shipping_priority": (q_shipping_priority, ORACLE_SHIPPING),
    "simhash_near_dup": (q_simhash_near_dup, ORACLE_SIMHASH_PAIRS),
    "simhash_signatures": (q_simhash_signatures, ORACLE_SIMHASH),
    "sketch_distinct": (q_sketch_distinct, ORACLE_SKETCH),
    "slugify": (q_slugify, ORACLE_SLUG),
    "snake_scrub_rename": (q_snake_scrub_rename, ORACLE_SNAKE),
    "split_trim": (q_split_trim, ORACLE_SPLIT),
    "string_to_null": (q_string_to_null, ORACLE_STR2NULL),
    "table_profile": (q_table_profile, ORACLE_TABLE_PROFILE),
    "text_functions": (q_text_functions, ORACLE_TEXT_FUNCTIONS),
    "text_quality": (q_text_quality, ORACLE_TEXT_QUALITY),
    "token_budget": (q_token_budget, ORACLE_TOKEN_BUDGET),
    "token_stats": (q_token_stats, ORACLE_TOKEN),
    "top_customers": (q_top_customers, ORACLE_TOP_CUSTOMERS),
    "topk_per_group": (q_topk_per_group, ORACLE_TOPK_GROUP),
    "train_val_test": (q_train_val_test, ORACLE_SPLITS),
    "training_prep_all": (q_training_prep_all, None),
    "training_prep_contract": (q_training_prep_contract,
                               ORACLE_TRAINING_PREP),
    "trigram_lm_pruned": (q_trigram_lm_pruned, ORACLE_TRIGRAM_LM_PRUNED),
    "trigram_lm_score": (q_trigram_lm_score, ORACLE_TRIGRAM_LM),
    "union_merge": (q_union_merge, ORACLE_UNION),
    "unpack_roundtrip": (q_unpack_roundtrip, ORACLE_UNPACK),
    "upsert_merge": (q_upsert_merge, ORACLE_UPSERT),
    "url_normalize": (q_url_normalize, ORACLE_URL_NORMALIZE),
    "vocab_topk": (q_vocab_topk, ORACLE_VOCAB),
    "weighted_sample": (q_weighted_sample, ORACLE_WEIGHTED_SAMPLE),
    "window_funcs": (q_window_funcs, ORACLE_WINDOW),
    "wp_post_all": (q_wp_post_all, None),
    "wp_post_all_contract": (q_wp_post_all_contract,
                             ORACLE_WP_POST_CONTRACT),
    "wp_post_preset": (q_wp_post_preset, ORACLE_WP_POST_PRESET),
}

#: r14 driver rotation (r13 verdict #1, machine-audited by
#: tools/rotation_debt.py — the suite fails when this list would let
#: any query's driver-witness age exceed 2): the NINE r11-witnessed
#: rows at the age limit (cube_agg, domain_stats, keywords, lang_id,
#: percentile_stats, pivot_wide, rollup_status, set_ops,
#: sketch_distinct) rotate IN as planned in r13's comment, plus the
#: brand-new (never-witnessed => mandatory) classifier_score and 40
#: of the 50 r12-witnessed rows. The TEN r12 rows deferred to r15
#: (html_blocks, nullif_sentinel, numeric_preserve,
#: placeholder_subst, prefix_pipeline, slugify, snake_scrub_rename,
#: split_trim, string_to_null, text_functions — cheap
#: expression/rename checks) sit exactly at age 2 after this round
#: and lead the r15 window, followed by the 50 r13-witnessed rows;
#: steady-state is "witness the oldest 50 each round".
_DRIVER_ROWS: list[str] = [
    # the nine age-limit r11 rows (mandatory this round)
    "cube_agg",
    "domain_stats",
    "keywords",
    "lang_id",
    "percentile_stats",
    "pivot_wide",
    "rollup_status",
    "set_ops",
    "sketch_distinct",
    # new this round (never driver-witnessed => mandatory)
    "classifier_score",
    # 40 of the 50 r12-witnessed rows
    "ann_index16_topk",
    "ann_index_topk",
    "ann_lsh_topk",
    "asof_join",
    "asof_nearest",
    "author_embed",
    "cluster_centroids",
    "contamination",
    "corpus_report",
    "cross_corpus_dedup",
    "domain_cap",
    "embedding_near_dup",
    "entity_embed_full",
    "event_window_agg",
    "fuzzy_match",
    "gopher_quality",
    "hierarchy_resolve",
    "key_skew",
    "line_dedup",
    "media_dedupe_lookup",
    "multimodal_features",
    "pack_sequences",
    "pagerank",
    "passage_removal",
    "pii_scrub",
    "profile_diff",
    "range_join",
    "repetition_stats",
    "sanitize_chain",
    "scan_filter_sort_limit",
    "script_fractions",
    "shared_gram_stats",
    "shipping_priority",
    "simhash_near_dup",
    "table_profile",
    "trigram_lm_score",
    "upsert_merge",
    "vocab_topk",
    "weighted_sample",
    "wp_post_preset",
]

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame],
                          str | None]] = {
    name: _ALL_QUERIES[name] for name in _DRIVER_ROWS
}

#: Local-only parity coverage (everything not in this round's driver
#: window): the driver CORRECTNESS gate records at most 50 rows, so
#: the rest live here; tests/test_oracle_parity.py runs the union, so
#: every query still gets the strict Spark-vs-DuckDB value + dtype
#: check each round.
EXTRA_REGISTRY: dict[str, tuple[Callable[[SparkSession, str],
                                         DataFrame], str | None]] = {
    name: t for name, t in _ALL_QUERIES.items() if name not in REGISTRY
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-contract view of REGISTRY: name → (spark, sf_dir) →
    DataFrame."""
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """The matching DuckDB oracle SQL per driver query (identical
    column aliases — the hash-compare contract)."""
    return {name: sql for name, (_, sql) in REGISTRY.items()
            if sql is not None}
