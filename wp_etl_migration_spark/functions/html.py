"""HTML → Gutenberg block conversion + block patterns (SURVEY §2.8
F20/F21).

≙ lib/Utils/WithSimpleHtmlBlockConverter.php:21-236 — DOM-parse simple
HTML; map ``p``/``h1..h6``/``ul``/``ol``/``blockquote``/``img``/``hr`` to
Gutenberg blocks; wrap anything else in a classic (freeform) block — and
lib/Utils/WithBlockPatterns.php:28-48 (registered-pattern lookup).

The converter is necessarily Python (an HTML parser); it runs as an
Arrow-batched pandas UDF so the per-batch interpreter cost is amortized —
the one sanctioned UDF hot path in the function library (SURVEY §7.3).
The pattern lookup stays JVM-side as a literal map column.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SIMPLE = {"p": "paragraph", "blockquote": "quote", "ul": "list",
           "ol": "list", "h1": "heading", "h2": "heading", "h3": "heading",
           "h4": "heading", "h5": "heading", "h6": "heading"}


class _TopLevel(HTMLParser):
    """Collect top-level elements (tag, attrs, raw inner+outer HTML)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.out: list[tuple[str, dict, str]] = []
        self._tag: str | None = None
        self._depth = 0
        self._buf: list[str] = []
        self._attrs: dict = {}

    def handle_starttag(self, tag, attrs):
        if self._tag is None:
            if tag in ("hr", "img"):       # void elements close instantly
                self.out.append((tag, dict(attrs), ""))
                return
            self._tag, self._attrs, self._depth = tag, dict(attrs), 1
            self._buf = [self.get_starttag_text()]
        else:
            self._buf.append(self.get_starttag_text())
            if tag == self._tag:
                self._depth += 1

    def handle_startendtag(self, tag, attrs):
        if self._tag is None:
            self.out.append((tag, dict(attrs), ""))
        else:
            self._buf.append(self.get_starttag_text())

    def handle_endtag(self, tag):
        if self._tag is None:
            return
        self._buf.append(f"</{tag}>")
        if tag == self._tag:
            self._depth -= 1
            if self._depth == 0:
                self.out.append((self._tag, self._attrs,
                                 "".join(self._buf)))
                self._tag = None

    def handle_data(self, data):
        if self._tag is not None:
            self._buf.append(data)
        elif data.strip():
            self.out.append(("#text", {}, data.strip()))

    def handle_entityref(self, name):
        if self._tag is not None:
            self._buf.append(f"&{name};")

    def handle_charref(self, name):
        if self._tag is not None:
            self._buf.append(f"&#{name};")


def html_to_blocks_str(html: str | None) -> str | None:
    """Serialize simple HTML into Gutenberg block markup (pure Python).

    Known tags → typed blocks; bare text → paragraph; anything else →
    classic (freeform) block, matching the reference's fallback
    (WithSimpleHtmlBlockConverter.php:62-94).
    """
    if html is None:
        return None
    parser = _TopLevel()
    parser.feed(html)
    parser.close()
    blocks = []
    for tag, attrs, outer in parser.out:
        if tag == "hr":
            blocks.append("<!-- wp:separator -->"
                          "<hr class=\"wp-block-separator\"/>"
                          "<!-- /wp:separator -->")
        elif tag == "img":
            src = attrs.get("src", "")
            alt = attrs.get("alt", "")
            blocks.append(
                f"<!-- wp:image --><figure class=\"wp-block-image\">"
                f"<img src=\"{src}\" alt=\"{alt}\"/></figure>"
                f"<!-- /wp:image -->")
        elif tag == "#text":
            blocks.append(f"<!-- wp:paragraph --><p>{outer}</p>"
                          f"<!-- /wp:paragraph -->")
        elif tag in _SIMPLE:
            kind = _SIMPLE[tag]
            attr = ""
            if kind == "heading":
                level = int(tag[1])
                attr = "" if level == 2 else f' {{"level":{level}}}'
            elif tag == "ol":
                attr = ' {"ordered":true}'
            blocks.append(f"<!-- wp:{kind}{attr} -->{outer}"
                          f"<!-- /wp:{kind} -->")
        else:
            blocks.append(f"<!-- wp:freeform -->{outer}"
                          f"<!-- /wp:freeform -->")
    return "\n\n".join(blocks)


def html_to_blocks(col: Column | str) -> Column:
    """Column form of :func:`html_to_blocks_str` (Arrow-batched UDF)."""

    @pandas_udf("string")
    def conv(s: pd.Series) -> pd.Series:
        return s.map(html_to_blocks_str, na_action="ignore")

    return conv(F.col(col) if isinstance(col, str) else col)


def block_pattern_lookup(col: Column | str,
                         patterns: dict[str, str]) -> Column:
    """Pattern-name → registered content lookup (≙ WithBlockPatterns.php:
    28-48): a literal map column, broadcast to executors by the plan —
    unknown names yield NULL."""
    m = F.create_map(*[F.lit(x) for kv in patterns.items() for x in kv])
    c = F.col(col) if isinstance(col, str) else col
    return m.getItem(c)
