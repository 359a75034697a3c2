"""WordPress-entity sources with embed joins (SURVEY §2.1 S6–S8).

≙ the reference's extractor builders:
- ``WPPostsSource``  ≙ WPPostsExtractor.php:37-229 (`from_wp_posts` +
  withPostType/withPostStatus/withOrderBy/withOrder/withMeta/
  withTaxonomies/withExpandedAuthorData; meta embed :58-60, taxonomy
  embed :120-145, author embed :147-167)
- ``WPTermsSource``  ≙ WPTermExtractor.php:42-156 (taxonomy filter,
  hide_empty, meta embed, parent→slug resolution :111)
- ``WPUsersSource``  ≙ WPUserExtractor.php:48-187 (role/include/exclude
  filters, search, meta + capabilities embeds)

Spark-first: every ``with_*`` filter becomes a Column predicate Catalyst
pushes into the scan; every embed is one grouped child aggregation or a
broadcast dim join — the reference's per-row ``get_post_meta``/
``get_terms`` lookups become set operations. Pagination (``paged``/
``offset`` loops) disappears: partitioned reads already bound memory.

Meta is WP-shaped: key → LIST of values (``get_post_meta`` returns
arrays), hence ``map<string, array<string>>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _meta_map(meta: DataFrame, fk: str) -> DataFrame:
    """EAV rows → (fk, meta: map<key, array<value>>)."""
    per_key = (meta.groupBy(fk, "meta_key")
               .agg(F.sort_array(F.collect_list(
                   F.col("meta_value").cast("string"))).alias("__vals")))
    return (per_key.groupBy(fk)
            .agg(F.map_from_entries(
                F.sort_array(F.collect_list(
                    F.struct("meta_key", "__vals")))).alias("meta")))


class WPPostsSource:
    """Builder-style posts scan with optional embeds."""

    def __init__(self, posts: DataFrame, meta: DataFrame | None = None,
                 terms: DataFrame | None = None,
                 relationships: DataFrame | None = None,
                 users: DataFrame | None = None):
        self._posts = posts
        self._meta = meta
        self._terms = terms
        self._rels = relationships
        self._users = users
        self._pred = []
        self._order = None
        self._limit = None
        self._with_meta = False
        self._with_tax = False
        self._with_author = False

    def with_post_type(self, *types: str) -> "WPPostsSource":
        self._pred.append(F.col("post_type").isin(*types))
        return self

    def with_post_status(self, *statuses: str) -> "WPPostsSource":
        self._pred.append(F.col("post_status").isin(*statuses))
        return self

    def with_order_by(self, col: str, desc: bool = False) -> "WPPostsSource":
        self._order = F.col(col).desc() if desc else F.col(col).asc()
        return self

    def with_limit(self, n: int) -> "WPPostsSource":
        self._limit = n
        return self

    def with_meta(self) -> "WPPostsSource":
        self._with_meta = True
        return self

    def with_taxonomies(self) -> "WPPostsSource":
        self._with_tax = True
        return self

    def with_author(self) -> "WPPostsSource":
        self._with_author = True
        return self

    def load(self) -> DataFrame:
        df = self._posts
        for p in self._pred:
            df = df.where(p)
        if self._order is not None:
            df = df.orderBy(self._order, F.col("ID"))
        if self._limit is not None:
            df = df.limit(self._limit)
        if self._with_meta:
            if self._meta is None:
                raise ValueError("meta table not provided")
            df = df.join(_meta_map(self._meta.withColumnRenamed(
                "post_id", "__fk"), "__fk"),
                df.ID == F.col("__fk"), "left").drop("__fk")
        if self._with_tax:
            if self._rels is None or self._terms is None:
                raise ValueError("terms/relationships tables not provided")
            # posts ⋈ rels ⋈ terms → map taxonomy → sorted term structs
            # (≙ WPPostsExtractor.php:120-145).
            t = (self._rels.join(self._terms, on="term_id")
                 .groupBy("post_id", "taxonomy")
                 .agg(F.sort_array(F.collect_list(F.struct(
                     "term_id", "name", "slug"))).alias("__terms")))
            tax = (t.groupBy("post_id")
                   .agg(F.map_from_entries(F.sort_array(F.collect_list(
                       F.struct("taxonomy", "__terms"))))
                       .alias("taxonomies")))
            df = df.join(tax.withColumnRenamed("post_id", "__fk"),
                         df.ID == F.col("__fk"), "left").drop("__fk")
        if self._with_author:
            if self._users is None:
                raise ValueError("users table not provided")
            author = self._users.select(
                F.col("ID").alias("__uid"),
                F.struct(F.col("ID").alias("id"),
                         F.col("user_login").alias("login"),
                         F.col("display_name").alias("display_name"))
                .alias("author"))
            df = df.join(F.broadcast(author),
                         df.post_author == F.col("__uid"), "left") \
                   .drop("__uid")
        return df


class WPTermsSource:
    """Terms scan: taxonomy filter, hide_empty, meta embed, parent slug."""

    def __init__(self, terms: DataFrame, meta: DataFrame | None = None,
                 relationships: DataFrame | None = None):
        self._terms = terms
        self._meta = meta
        self._rels = relationships
        self._pred = []
        self._hide_empty = False
        self._with_meta = False
        self._with_parent_slug = False

    def with_taxonomy(self, *tax: str) -> "WPTermsSource":
        self._pred.append(F.col("taxonomy").isin(*tax))
        return self

    def with_hide_empty(self) -> "WPTermsSource":
        self._hide_empty = True
        return self

    def with_meta(self) -> "WPTermsSource":
        self._with_meta = True
        return self

    def with_parent_slug(self) -> "WPTermsSource":
        self._with_parent_slug = True
        return self

    def load(self) -> DataFrame:
        df = self._terms
        for p in self._pred:
            df = df.where(p)
        if self._hide_empty:
            if self._rels is None:
                raise ValueError("relationships table not provided")
            used = self._rels.select("term_id").distinct()
            df = df.join(used, on="term_id", how="left_semi")
        if self._with_meta:
            if self._meta is None:
                raise ValueError("term meta table not provided")
            df = df.join(_meta_map(self._meta.withColumnRenamed(
                "term_id", "__fk"), "__fk"),
                df.term_id == F.col("__fk"), "left").drop("__fk")
        if self._with_parent_slug:
            # parent id → parent slug via self-join
            # (≙ WPTermExtractor.php:111).
            parents = self._terms.select(
                F.col("term_id").alias("parent"),
                F.col("slug").alias("parent_slug"))
            df = df.join(F.broadcast(parents), on="parent", how="left")
        return df


class WPUsersSource:
    """Users scan: role / include / exclude / search filters + embeds."""

    def __init__(self, users: DataFrame, meta: DataFrame | None = None):
        self._users = users
        self._meta = meta
        self._pred = []
        self._with_meta = False

    def with_role(self, *roles: str) -> "WPUsersSource":
        self._pred.append(F.col("role").isin(*roles))
        return self

    def with_role_not_in(self, *roles: str) -> "WPUsersSource":
        self._pred.append(~F.col("role").isin(*roles))
        return self

    def with_include(self, ids: list[int]) -> "WPUsersSource":
        self._pred.append(F.col("ID").isin(ids))
        return self

    def with_exclude(self, ids: list[int]) -> "WPUsersSource":
        self._pred.append(~F.col("ID").isin(ids))
        return self

    def with_search(self, needle: str) -> "WPUsersSource":
        self._pred.append(
            F.col("user_login").contains(needle)
            | F.col("user_email").contains(needle)
            | F.col("display_name").contains(needle))
        return self

    def with_meta(self) -> "WPUsersSource":
        self._with_meta = True
        return self

    def load(self) -> DataFrame:
        df = self._users
        for p in self._pred:
            df = df.where(p)
        if self._with_meta:
            if self._meta is None:
                raise ValueError("user meta table not provided")
            df = df.join(_meta_map(self._meta.withColumnRenamed(
                "user_id", "__fk"), "__fk"),
                df.ID == F.col("__fk"), "left").drop("__fk")
        return df
