"""YAML job configuration (SURVEY §3).

≙ lib/Classes/Config/YamlWithIncludes.php:41-65 (``!include`` tag,
resolved relative to the including file) and GlobalConfig.php:90-107
(top-level merge of included fragments) with WithPropertyAccess.php:41-48
(dot-path reads).

The YAML shape mirrors the reference's ``migration:`` document:

    name: my-migration
    migration:
      - name: posts
        depends_on: other-job        # optional
        skip: false                  # optional
        extract:
          adapter: csv               # csv|json|xml|parquet|memory
          source: fixtures/posts.csv
          options: {rowTag: item}    # adapter options
          prefix: legacy.            # namespace prefix (default legacy.)
        transform:
          - slugify: {column: legacy.title, into: post.post_name}
          - ...
        load:
          - adapter: json
            destination: out/posts
            prefix: post.
          - adapter: ledger
"""

from __future__ import annotations

import os
from typing import Any

import yaml


class _IncludeLoader(yaml.SafeLoader):
    """SafeLoader + ``!include`` resolved relative to the current file."""


def _include(loader: _IncludeLoader, node: yaml.Node) -> Any:
    rel = loader.construct_scalar(node)
    base = os.path.dirname(getattr(loader, "_filename", "."))
    return load_yaml(os.path.join(base, rel))


_IncludeLoader.add_constructor("!include", _include)


def load_yaml(path: str) -> Any:
    """Parse a YAML file with ``!include`` support."""
    with open(path, encoding="utf-8") as f:
        loader = _IncludeLoader(f)
        loader._filename = path
        try:
            return loader.get_single_data()
        finally:
            loader.dispose()


def dot_get(config: Any, path: str, default: Any = None) -> Any:
    """Dot-path read (``a.b.0.c``) ≙ Symfony PropertyAccess usage."""
    cur = config
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        elif isinstance(cur, list) and part.isdigit() and int(part) < len(cur):
            cur = cur[int(part)]
        else:
            return default
    return cur
