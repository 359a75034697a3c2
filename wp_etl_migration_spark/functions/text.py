"""Text/string scalar functions (reference: SURVEY §2.8).

Re-expressions of the reference's transform + sanitize family as native
Column expressions (JVM-side, codegen-friendly — no Python in the hot
path):

- ``to_slug``        ≙ ToSlug.php:34-46 (WP ``sanitize_title``)
- ``split_trim``     ≙ Explode.php:37-49 (``to_explode`` DSL fn — returns
                       the array; no row fan-out)
- ``nullif_value``   ≙ CompareSetNull.php:38-50
- ``string_to_null`` ≙ StringToNullTransformer.php:43-55 (DataFrame-level,
                       see operators.cleaning)
- sanitize family    ≙ WPPostsLoader.php:163-246 / WPUserLoader.php:140-216 /
                       WPTermsLoader.php:229-291 (WP sanitize_* semantics)
- ``utf8_scrub``     ≙ WPTermsLoader.php:242 (iconv //IGNORE)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_slug(col: Column | str) -> Column:
    """Slugify: lowercase, non-alphanumeric runs → '-', trim '-'.

    Matches WP ``sanitize_title`` for ASCII input; accent folding for
    non-ASCII is approximated by dropping non-alphanumerics (the reference
    strips accents via ``remove_accents`` — for the synthetic ASCII data
    the two agree).
    """
    c = F.col(col) if isinstance(col, str) else col
    slug = F.regexp_replace(F.lower(F.trim(c)), r"[^a-z0-9]+", "-")
    return F.regexp_replace(slug, r"^-+|-+$", "")


def split_trim(col: Column | str, delim: str = ",") -> Column:
    """Split on a literal delimiter and trim each piece → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    # F.split takes a regex; escape the literal delimiter.
    import re as _re

    return F.transform(F.split(c, _re.escape(delim)), lambda x: F.trim(x))


def nullif_value(col: Column | str, value) -> Column:
    """value-equal cells → NULL, everything else unchanged (NULLIF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(value))


def sanitize_key(col: Column | str) -> Column:
    """WP ``sanitize_key``: lowercase, keep only ``[a-z0-9_-]``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"[^a-z0-9_\-]", "")


def sanitize_title(col: Column | str) -> Column:
    """Alias of :func:`to_slug` (WP uses sanitize_title for slugs)."""
    return to_slug(col)


def strip_all_tags(col: Column | str) -> Column:
    """WP ``wp_strip_all_tags``: drop <script>/<style> blocks, strip tags,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    no_blocks = F.regexp_replace(
        c, r"(?is)<(script|style)[^>]*>.*?</\1>", "")
    no_tags = F.regexp_replace(no_blocks, r"<[^>]*>", "")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def sanitize_text_field(col: Column | str) -> Column:
    """WP ``sanitize_text_field``: strip tags, octets, control chars,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    no_tags = F.regexp_replace(c, r"<[^>]*>", "")
    no_octets = F.regexp_replace(no_tags, r"%[a-fA-F0-9]{2}", "")
    no_ctrl = F.regexp_replace(no_octets, r"[\x00-\x1F\x7F]", "")
    return F.trim(F.regexp_replace(no_ctrl, r"[ \t]+", " "))


def sanitize_email(col: Column | str) -> Column:
    """WP ``sanitize_email`` (subset): strip characters not legal in an
    email; null out values that do not look like ``local@domain.tld``."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, r"[^a-zA-Z0-9.!#$%&'*+/=?^_`{|}~@\-]", "")
    ok = cleaned.rlike(r"^[^@]+@[^@]+\.[^@]{2,}$")
    return F.when(ok, cleaned).otherwise(F.lit(None))


def absint(col: Column | str) -> Column:
    """WP ``absint``: absolute integer value (non-numeric → 0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.abs(F.coalesce(c.try_cast("long"), F.lit(0)))


#: ``wp_kses_post`` allow-list (subset of WP's ``$allowedposttags`` —
#: the tags/attrs the reference's post/user sanitize path keeps,
#: ≙ WPPostsLoader.php:180-182 / WPUserLoader.php:191,233).
KSES_POST_TAGS: dict[str, frozenset] = {
    "a": frozenset({"href", "rel", "target", "name"}),
    "abbr": frozenset(), "acronym": frozenset(), "b": frozenset(),
    "big": frozenset(), "blockquote": frozenset({"cite"}),
    "br": frozenset(), "caption": frozenset(), "cite": frozenset(),
    "code": frozenset(), "dd": frozenset(),
    "del": frozenset({"datetime"}), "div": frozenset({"align"}),
    "dl": frozenset(), "dt": frozenset(), "em": frozenset(),
    "figcaption": frozenset(), "figure": frozenset(),
    "h1": frozenset({"align"}), "h2": frozenset({"align"}),
    "h3": frozenset({"align"}), "h4": frozenset({"align"}),
    "h5": frozenset({"align"}), "h6": frozenset({"align"}),
    "hr": frozenset(), "i": frozenset(),
    "img": frozenset({"src", "alt", "width", "height", "srcset",
                      "sizes", "loading"}),
    "ins": frozenset({"datetime", "cite"}), "li": frozenset({"value"}),
    "ol": frozenset({"start", "type", "reversed"}),
    "p": frozenset({"align"}), "pre": frozenset(),
    "q": frozenset({"cite"}), "s": frozenset(), "small": frozenset(),
    "span": frozenset({"align"}), "strike": frozenset(),
    "strong": frozenset(), "sub": frozenset(), "sup": frozenset(),
    "table": frozenset({"align", "border", "cellpadding", "cellspacing",
                        "width"}),
    "tbody": frozenset(),
    "td": frozenset({"colspan", "rowspan", "align", "width"}),
    "tfoot": frozenset(),
    "th": frozenset({"colspan", "rowspan", "align", "width", "scope"}),
    "thead": frozenset(), "tr": frozenset({"align"}), "u": frozenset(),
    "ul": frozenset({"type"}),
}
_KSES_GLOBAL_ATTRS = frozenset({"class", "id", "title", "dir", "lang"})
_KSES_URL_ATTRS = frozenset({"href", "src", "cite"})
_KSES_VOID = frozenset({"br", "hr", "img"})
#: Schemes ``esc_url_raw`` / kses URL attrs accept (WP
#: ``wp_allowed_protocols`` subset; relative URLs always pass).
OK_URL_SCHEMES = frozenset({"http", "https", "ftp", "ftps", "mailto",
                            "tel", "news", "irc"})


def _url_scheme_ok(url: str) -> bool:
    """Scheme allow-list check with WP ``wp_kses_bad_protocol`` semantics.

    Control/whitespace chars ``[\\x00-\\x20]`` are stripped from the WHOLE
    value before the scheme match: browsers drop ASCII tab/newline when
    parsing URLs, so ``jav\\tascript:`` (or the entity-encoded
    ``jav&#x09;ascript:`` — HTMLParser decodes charrefs in attribute
    values) must be judged as ``javascript:``, not as scheme-less.
    """
    import re as _re

    stripped = _re.sub(r"[\x00-\x20]", "", url)
    m = _re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):", stripped)
    return m is None or m.group(1).lower() in OK_URL_SCHEMES


class _Kses:
    """Streaming re-serializer behind :func:`kses_post_str`.

    Disallowed tags lose their MARKUP but keep their inner text — the
    wp_kses quirk (``<script>x</script>`` → ``x``), unlike
    :func:`strip_all_tags` which drops script/style bodies. Comments are
    dropped; attrs not on the tag's allow-list (event handlers included)
    are removed; URL-bearing attrs must pass the scheme check.

    Text data has ``<`` escaped to ``&lt;``: rawtext elements (script/
    style) switch HTMLParser into CDATA mode where their CONTENT arrives
    as data, so without the escape ``<script><script></script>`` would
    re-emit working markup (found by the property suite). Escaping in
    data position is idempotent — a second pass sees ``&lt;`` as an
    entity ref and passes it through.
    """

    def __init__(self) -> None:
        from html.parser import HTMLParser

        out: list[str] = []
        self.out = out

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                _Kses.emit_tag(out, tag, attrs, self_closing=False)

            def handle_startendtag(self, tag, attrs):
                _Kses.emit_tag(out, tag, attrs, self_closing=True)

            def handle_endtag(self, tag):
                if tag in KSES_POST_TAGS and tag not in _KSES_VOID:
                    out.append(f"</{tag}>")

            def handle_data(self, data):
                out.append(data.replace("<", "&lt;"))

            def handle_entityref(self, name):
                out.append(f"&{name};")

            def handle_charref(self, name):
                out.append(f"&#{name};")

        self.parser = P(convert_charrefs=False)

    @staticmethod
    def emit_tag(out: list[str], tag: str, attrs, self_closing: bool):
        allowed = KSES_POST_TAGS.get(tag)
        if allowed is None:
            return
        kept = []
        for k, v in attrs:
            if k not in allowed and k not in _KSES_GLOBAL_ATTRS:
                continue
            if v is not None and k in _KSES_URL_ATTRS \
                    and not _url_scheme_ok(v):
                continue
            if v is None:
                kept.append(k)
            else:
                esc = v.replace("&", "&amp;").replace('"', "&quot;")
                kept.append(f'{k}="{esc}"')
        attr_s = (" " + " ".join(kept)) if kept else ""
        close = " /" if (self_closing or tag in _KSES_VOID) else ""
        out.append(f"<{tag}{attr_s}{close}>")


def kses_post_str(html: str | None) -> str | None:
    """``wp_kses_post``-equivalent allow-list sanitize (pure Python)."""
    if html is None:
        return None
    k = _Kses()
    k.parser.feed(html)
    k.parser.close()
    return "".join(k.out)


def kses_post(col: Column | str) -> Column:
    """Column form of :func:`kses_post_str` (Arrow-batched pandas UDF —
    an HTML parse can't be a codegen expression; batching amortizes the
    interpreter like the html_to_blocks converter)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def conv(s: pd.Series) -> pd.Series:
        return s.map(kses_post_str, na_action="ignore")

    return conv(F.col(col) if isinstance(col, str) else col)


def esc_url_raw(col: Column | str) -> Column:
    """WP ``esc_url_raw`` (≙ WPUserLoader.php:166): strip characters not
    legal in a URL, then require a relative URL or an allow-listed
    scheme — rejected URLs become NULL (the engine's idiom for "WP
    returns ''"; composes with required-field backfill). Pure Column
    expressions, JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    # WP percent-encodes interior spaces as %20 (it does not delete them,
    # which would glue adjacent tokens together: '/a b' → '/a%20b').
    spaced = F.regexp_replace(F.trim(c), " ", "%20")
    cleaned = F.regexp_replace(
        spaced, r"[^a-zA-Z0-9\-._~:/?#\[\]@!$&'()*+,;=%]", "")
    scheme_re = "^(?i)(" + "|".join(sorted(OK_URL_SCHEMES)) + "):"
    has_scheme = cleaned.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")
    ok = (~has_scheme & (F.length(cleaned) > 0)) | cleaned.rlike(scheme_re)
    return F.when(ok, cleaned).otherwise(F.lit(None))


def utf8_scrub(col: Column | str) -> Column:
    """Drop bytes that are not valid UTF-8 (iconv //IGNORE semantics).

    Spark strings are already UTF-16 internally; invalid source bytes
    surface as U+FFFD after decode — strip those plus raw control bytes.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[�\x00-\x08\x0b\x0c\x0e-\x1f]", "")
