"""Canned per-entity transform pipelines — the reference's ready-made
field chains as library presets.

The reference ships one named pipeline per WordPress entity
(``lib/Classes/Transform/TransformationPipelines/``):

- ``WordPressPostPipeline.php:121-310``  — post_type / title / slug /
  author / status / content / excerpt / date / modified chain with a
  ``defaults`` map, plus hook methods (attachments, post_meta,
  tax_terms, ledger_records) subclasses override.
- ``WordPressTermPipeline.php:104-207``  — taxonomy / name / slug /
  parent / description / alias_of chain (defaults: parent 0).
- ``WordPressUserPipeline.php:43-179``   — login / pass / email /
  display_name / first / last / registered(now) / role('subscriber')
  / user_meta chain.
- ``WordPressMediaPipeline.php:50-110``  — post pipeline with
  post_type 'attachment' plus remote_url / local_path / media_meta.

Each preset is a :class:`~wp_etl_migration_spark.plans.runner.
TransformPipeline` (same prepare → run → finalize lifecycle as
``BaseTransformationPipeline.php:24-88``) whose ``run`` applies the
reference's chain to the engine's prefixed-column convention
(``post.*`` / ``term.*`` / ``user.*`` / ``meta.*``). Every field step
is its own overridable method, mirroring the reference's
template-method design, so a migration subclasses a preset and
overrides only the fields its source actually maps.

Semantics note (deliberate deviation, documented): the reference's
base methods ``withEntry(col, lit(default))`` — they *clobber*,
because subclasses are expected to override every mapped field. A
Spark job normally maps source columns *before* the preset runs, so
these presets DEFAULT instead of clobber: a missing column is created
with the default, a present column is null/''-coalesced to it. A
subclass that wants reference-literal clobbering overrides the field
method with ``df.withColumn(self.core('post_status'),
F.lit('draft'))``.

All chains are pure Catalyst column expressions — the whole preset
fuses into the enclosing stage's single whole-stage-codegen pass; no
shuffle, no UDF, scale-free at any corpus size.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wp_etl_migration_spark.functions.dates import local_to_gmt
from wp_etl_migration_spark.functions.text import (
    sanitize_email, sanitize_text_field, to_slug)
from wp_etl_migration_spark.plans.runner import (
    TransformPipeline, register_pipeline)

#: Legacy → WP post-status mapping (the "status chain": WP statuses
#: pass through, common CMS spellings normalize, anything else falls
#: to the pipeline default).
POST_STATUS_MAP = {
    "publish": "publish", "published": "publish", "live": "publish",
    "draft": "draft", "pending": "pending", "review": "pending",
    "private": "private", "trash": "trash", "future": "future",
    "inherit": "inherit",
}


def _qcol(name: str) -> Column:
    return F.col("`" + name + "`")


class _PrefixedPipeline(TransformPipeline):
    """Shared prefix helpers (≙ the core()/meta()/tax()/ledger()
    accessors, WordPressPostPipeline.php:80-112)."""

    core_prefix = "post"
    meta_prefix = "meta"
    tax_prefix = "tax"
    ledger_prefix = "ledger"
    #: subclasses override with their preset defaults; declared here so
    #: a subclass without one still accepts the ``defaults=`` kwarg.
    defaults: dict[str, Any] = {}

    def __init__(self, job_config: dict[str, Any] | None = None, *,
                 defaults: dict[str, Any] | None = None,
                 tz: str = "UTC", now: Column | None = None):
        super().__init__(job_config)
        if defaults:
            self.defaults = {**self.defaults, **defaults}
        self.tz = tz
        #: injectable "now" so tests/parity rows can pin it; the
        #: reference's now() is wall-clock (DSL now()).
        self._now = now if now is not None else F.current_timestamp()

    def core(self, column: str) -> str:
        return f"{self.core_prefix}.{column}"

    def meta(self, key: str) -> str:
        return f"{self.meta_prefix}.{key}"

    def tax(self, name: str) -> str:
        return f"{self.tax_prefix}.{name}"

    def ledger(self, column: str) -> str:
        return f"{self.ledger_prefix}.{column}"

    # --- field plumbing -------------------------------------------
    def _default(self, df: DataFrame, name: str, default: Column,
                 blank_is_missing: bool = True) -> DataFrame:
        """Create ``name`` = default if absent; else coalesce nulls
        (and, for strings, '') to the default."""
        if name not in df.columns:
            return df.withColumn(name, default)
        if blank_is_missing:
            missing = F.nullif(_qcol(name).cast("string"),
                               F.lit("")).isNull()
            cur = F.when(missing, default).otherwise(_qcol(name))
        else:
            cur = F.coalesce(_qcol(name), default)
        return df.withColumn(name, cur)


@register_pipeline("wordpress_post")
class WordPressPostPipeline(_PrefixedPipeline):
    """Post preset (≙ WordPressPostPipeline.php:121-310 run chain).

    Chain (reference order, php:121-140): post_type → post_title →
    post_name → post_author → post_status → post_content →
    post_excerpt → post_date → post_modified → attachments →
    etl_post_meta → post_meta → ledger_records → tax_terms.

    Adds the GMT pair the WP post table requires
    (``WPPostsLoader.php:221-227`` get_gmt_from_date): post_date_gmt /
    post_modified_gmt via ``local_to_gmt(tz)``.
    """

    post_type = "post"
    defaults = {
        "post_title": "Default post title",
        "post_name": "default-post-name",
        "post_status": "draft",
        "post_content": "Default post content",
        "post_author": 1,
    }

    def __init__(self, job_config: dict[str, Any] | None = None, *,
                 post_type: str | None = None, **kw):
        super().__init__(job_config, **kw)
        if post_type is not None:
            self.post_type = post_type

    def run(self, df: DataFrame) -> DataFrame:
        for step in (self.set_post_type, self.set_post_title,
                     self.set_post_name, self.set_post_author,
                     self.set_post_status, self.set_post_content,
                     self.set_post_excerpt, self.set_post_date,
                     self.set_post_modified, self.attachments,
                     self.etl_post_meta, self.post_meta,
                     self.ledger_records, self.tax_terms):
            df = step(df)
        return df

    def set_post_type(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.core("post_type"),
                             F.lit(self.post_type))

    def set_post_title(self, df: DataFrame) -> DataFrame:
        name = self.core("post_title")
        df = self._default(df, name, F.lit(self.defaults["post_title"]))
        return df.withColumn(name, sanitize_text_field(_qcol(name)))

    def set_post_name(self, df: DataFrame) -> DataFrame:
        """Slug defaulting: missing/blank slugs derive from the (already
        defaulted) title; provided slugs are normalized through
        ``to_slug`` (WP sanitize_title)."""
        name = self.core("post_name")
        title_slug = to_slug(_qcol(self.core("post_title")))
        df = self._default(df, name, title_slug)
        return df.withColumn(name, to_slug(_qcol(name)))

    def set_post_author(self, df: DataFrame) -> DataFrame:
        return self._default(
            df, self.core("post_author"),
            F.lit(self.defaults["post_author"]).cast("long"),
            blank_is_missing=False)

    def set_post_status(self, df: DataFrame) -> DataFrame:
        """Status mapping: legacy spellings normalize via
        POST_STATUS_MAP; unknown/missing fall to the default."""
        name = self.core("post_status")
        fallback = F.lit(self.defaults["post_status"])
        if name not in df.columns:
            return df.withColumn(name, fallback)
        mapped = F.lower(F.trim(_qcol(name).cast("string")))
        expr = None
        for legacy, wp in POST_STATUS_MAP.items():
            cond = mapped == legacy
            expr = (F.when(cond, wp) if expr is None
                    else expr.when(cond, wp))
        return df.withColumn(name, expr.otherwise(fallback))

    def set_post_content(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("post_content"),
                             F.lit(self.defaults["post_content"]))

    def set_post_excerpt(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("post_excerpt"), F.lit(""))

    def set_post_date(self, df: DataFrame) -> DataFrame:
        name = self.core("post_date")
        df = self._default(df, name, self._now, blank_is_missing=False)
        return df.withColumn(self.core("post_date_gmt"),
                             local_to_gmt(_qcol(name), self.tz))

    def set_post_modified(self, df: DataFrame) -> DataFrame:
        name = self.core("post_modified_date")
        df = self._default(df, name, _qcol(self.core("post_date")),
                           blank_is_missing=False)
        return df.withColumn(self.core("post_modified_date_gmt"),
                             local_to_gmt(_qcol(name), self.tz))

    def etl_post_meta(self, df: DataFrame) -> DataFrame:
        """≙ etl_post_meta (php:274-282): stamp which pipeline made
        the row."""
        return df.withColumn(self.meta("etl_pipeline"),
                             F.lit(type(self).__name__))

    # --- subclass hooks (reference php:265-300, intentionally no-op)
    def attachments(self, df: DataFrame) -> DataFrame:
        return df

    def post_meta(self, df: DataFrame) -> DataFrame:
        return df

    def tax_terms(self, df: DataFrame) -> DataFrame:
        return df

    def ledger_records(self, df: DataFrame) -> DataFrame:
        return df


@register_pipeline("wordpress_term")
class WordPressTermPipeline(_PrefixedPipeline):
    """Term preset (≙ WordPressTermPipeline.php:104-207 run chain):
    taxonomy → name → slug → parent → description → alias_of →
    term_meta → ledger_records."""

    core_prefix = "term"
    taxonomy = "category"
    defaults = {
        "term_name": "",
        "slug": "",
        "parent": 0,
        "description": "",
        "alias_of": "",
    }

    def __init__(self, job_config: dict[str, Any] | None = None, *,
                 taxonomy: str | None = None, **kw):
        super().__init__(job_config, **kw)
        if taxonomy is not None:
            self.taxonomy = taxonomy

    def term(self, field: str) -> str:
        return self.core(field)

    def run(self, df: DataFrame) -> DataFrame:
        for step in (self.set_taxonomy, self.set_name, self.set_slug,
                     self.set_parent, self.set_description,
                     self.set_alias_of, self.term_meta,
                     self.ledger_records):
            df = step(df)
        return df

    def set_taxonomy(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.term("taxonomy"),
                             F.lit(self.taxonomy))

    def set_name(self, df: DataFrame) -> DataFrame:
        name = self.term("name")
        df = self._default(df, name, F.lit(self.defaults["term_name"]))
        return df.withColumn(name, sanitize_text_field(_qcol(name)))

    def set_slug(self, df: DataFrame) -> DataFrame:
        """Slug defaulting from the term name, as term upserts key on
        (taxonomy, slug)."""
        name = self.term("slug")
        df = self._default(df, name, to_slug(_qcol(self.term("name"))))
        return df.withColumn(name, to_slug(_qcol(name)))

    def set_parent(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.term("parent"),
                             F.lit(self.defaults["parent"]).cast("long"),
                             blank_is_missing=False)

    def set_description(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.term("description"),
                             F.lit(self.defaults["description"]))

    def set_alias_of(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.term("alias_of"),
                             F.lit(self.defaults["alias_of"]))

    def term_meta(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.meta("etl_pipeline"),
                             F.lit(type(self).__name__))

    def ledger_records(self, df: DataFrame) -> DataFrame:
        return df


@register_pipeline("wordpress_user")
class WordPressUserPipeline(_PrefixedPipeline):
    """User preset (≙ WordPressUserPipeline.php:43-179 run chain):
    login → pass → email → display_name → first → last →
    registered(now) → role → user_meta.

    The reference prefixes user fields ``wp.`` (php:76); this engine's
    user sink reads ``user.*``, so that is the default
    ``core_prefix`` — pass ``core_prefix='wp'`` for reference-literal
    naming."""

    core_prefix = "user"
    defaults = {"role": "subscriber"}

    def __init__(self, job_config: dict[str, Any] | None = None, *,
                 core_prefix: str | None = None, **kw):
        super().__init__(job_config, **kw)
        if core_prefix is not None:
            self.core_prefix = core_prefix

    def run(self, df: DataFrame) -> DataFrame:
        for step in (self.set_user_login, self.set_user_pass,
                     self.set_user_email, self.set_display_name,
                     self.set_first_name, self.set_last_name,
                     self.set_user_registered, self.set_role,
                     self.user_meta):
            df = step(df)
        return df

    def set_user_login(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("user_login"), F.lit(""))

    def set_user_pass(self, df: DataFrame) -> DataFrame:
        """≙ user_pass (php:86-88): intentionally untouched — WP
        generates passwords on insert."""
        return df

    def set_user_email(self, df: DataFrame) -> DataFrame:
        name = self.core("user_email")
        if name not in df.columns:
            return df.withColumn(name, F.lit(""))
        return df.withColumn(
            name, F.coalesce(sanitize_email(_qcol(name)), F.lit("")))

    def set_display_name(self, df: DataFrame) -> DataFrame:
        """Display name falls back to login (the useful default; the
        reference's base sets '' and expects an override)."""
        return self._default(df, self.core("display_name"),
                             _qcol(self.core("user_login")))

    def set_first_name(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("first_name"), F.lit(""))

    def set_last_name(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("last_name"), F.lit(""))

    def set_user_registered(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("user_registered"),
                             self._now, blank_is_missing=False)

    def set_role(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("role"),
                             F.lit(self.defaults["role"]))

    def user_meta(self, df: DataFrame) -> DataFrame:
        """≙ user_meta (php:167-179): the etl_pipeline stamp."""
        return df.withColumn(self.meta("etl_pipeline"),
                             F.lit(type(self).__name__))


@register_pipeline("wordpress_media")
class WordPressMediaPipeline(WordPressPostPipeline):
    """Media preset (≙ WordPressMediaPipeline.php:24-110): the post
    chain with post_type 'attachment', minus post_author (the
    reference drops it from defaults), plus remote_url / local_path /
    media_meta. ``media.remote_url`` feeds the engine's sideload sink
    (sinks/media.py) and ``media_dedupe`` lookup."""

    post_type = "attachment"
    media_prefix = "media"
    defaults = {
        "post_title": "Default post title",
        "post_name": "default-post-name",
        "post_status": "draft",
        "post_content": "Default post content",
        "post_author": 1,   # engine keeps the post chain intact
    }

    def media(self, field: str) -> str:
        return f"{self.media_prefix}.{field}"

    def run(self, df: DataFrame) -> DataFrame:
        df = super().run(df)
        for step in (self.set_remote_url, self.set_local_path,
                     self.media_meta):
            df = step(df)
        return df

    def set_remote_url(self, df: DataFrame) -> DataFrame:
        name = self.media("remote_url")
        if name not in df.columns:
            return df.withColumn(
                name, F.lit(None).cast("array<string>"))
        return df

    def set_local_path(self, df: DataFrame) -> DataFrame:
        return self._default(df, self.core("local_path"), F.lit(""))

    def media_meta(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.meta("etl_pipeline"),
                             F.lit(type(self).__name__))


# ------------------------------------------------------------ factories

def wordpress_post_pipeline(**kw) -> WordPressPostPipeline:
    """Ready-made post field chain; see :class:`WordPressPostPipeline`."""
    return WordPressPostPipeline(**kw)


def wordpress_term_pipeline(**kw) -> WordPressTermPipeline:
    """Ready-made term field chain; see :class:`WordPressTermPipeline`."""
    return WordPressTermPipeline(**kw)


def wordpress_user_pipeline(**kw) -> WordPressUserPipeline:
    """Ready-made user field chain; see :class:`WordPressUserPipeline`."""
    return WordPressUserPipeline(**kw)


def wordpress_media_pipeline(**kw) -> WordPressMediaPipeline:
    """Ready-made media field chain; see
    :class:`WordPressMediaPipeline`."""
    return WordPressMediaPipeline(**kw)
