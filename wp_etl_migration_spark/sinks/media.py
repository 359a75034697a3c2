"""Media byte sideload (SURVEY §2.2 L10 — the download half).

≙ WPMediaLoader.php:433-503: ``download_url()`` pulls the source URL to
a temp file, ``media_handle_sideload()`` moves it into the media
library, and the new attachment records its origin in ``_source_url``
meta. Spark-first, the download is a partition-level writer over the
NEW-media frame (the anti-join output of ``media_stage`` — already
deduped against existing attachments), not a driver loop:

- ``mapInPandas`` streams Arrow batches through executor-side Python;
  each row is one fetch with bounded retry + exponential backoff.
- Idempotent against re-runs (task retries, speculative execution,
  whole-job restarts): the target path is deterministic
  (``<attachment id>-<sanitized name>``), bytes land in a unique
  ``.part`` temp file and are atomically renamed into place — a rerun
  sees the finished file and reports ``skipped`` without refetching.
- Returns a STATUS frame rather than using a fire-and-forget
  ``foreachPartition``: downstream joins failures back for quarantine /
  retry, mirroring the reference's per-row ``WP_Error`` propagation.

At cluster scale the download parallelism is the partition count of the
input — ``repartition(n)`` the new-media frame to bound concurrent
connections against the origin server; rows within a partition fetch
sequentially.
"""

from __future__ import annotations

import hashlib
import os
import posixpath
import re
import time
import urllib.parse
import urllib.request
import uuid
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fetcher(url, timeout_s) -> bytes. The default handles file:// and
#: http(s):// via urllib; tests inject file:// URLs or a fake.
Fetcher = Callable[[str, float], bytes]

SIDELOAD_SCHEMA = T.StructType([
    T.StructField("att_id", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("file", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("status", T.StringType()),   # downloaded|skipped|failed
    T.StructField("error", T.StringType()),
    T.StructField("bytes", T.LongType()),
    T.StructField("attempts", T.IntegerType()),
])


def _urllib_fetch(url: str, timeout_s: float) -> bytes:
    if url.startswith("file:"):
        # file URLs carry no query semantics — a trailing cache-buster
        # (?v=2) would read as part of the filename.
        url = url.split("?", 1)[0]
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return resp.read()


def sanitize_file_name(name: str) -> str:
    """Python-side mirror of WP ``sanitize_file_name``: strip characters
    outside ``[A-Za-z0-9._-]`` to dashes, collapse runs, trim edges."""
    name = re.sub(r"[^A-Za-z0-9._-]+", "-", name)
    name = re.sub(r"-{2,}", "-", name)
    return name.strip("-.")


def media_filename(url: str) -> str:
    """Filename for a sideloaded URL (≙ WPMediaLoader.php:453-463):
    basename of the path before any query string; when that is empty or
    ``.``/``..``, fall back to ``sideloaded-file-<md5(url)[:8]><ext>``."""
    base = posixpath.basename(url.split("?", 1)[0])
    if not base or base in (".", ".."):
        path = urllib.parse.urlparse(url).path or ""
        ext = posixpath.splitext(path)[1]
        base = "sideloaded-file-" + hashlib.md5(url.encode()).hexdigest()[:8] + ext
    return sanitize_file_name(base)


def sideload_media(new_media: DataFrame,
                   dest_dir: str,
                   url_col: str = "url",
                   id_col: str = "att_id",
                   fetcher: Fetcher | None = None,
                   max_retries: int = 3,
                   backoff_s: float = 0.05,
                   timeout_s: float = 30.0) -> DataFrame:
    """Download each new-media row's URL into ``dest_dir`` and return a
    per-row status frame (SIDELOAD_SCHEMA).

    ``new_media`` should be the post-dedupe frame — one row per minted
    attachment (``id_col``, ``url_col``); existing attachments never
    reach the writer, matching the reference's probe-before-sideload
    order. ``dest_dir`` must be a directory path visible to every
    executor (shared filesystem / fuse mount at cluster scale).
    """
    fetch = fetcher or _urllib_fetch
    retries, backoff, timeout = int(max_retries), float(backoff_s), float(timeout_s)

    src = new_media.select(F.col(id_col).cast("long").alias("att_id"),
                           F.col(url_col).cast("string").alias("url"))

    def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        os.makedirs(dest_dir, exist_ok=True)
        for batch in batches:
            out = []
            for att_id, url in zip(batch["att_id"], batch["url"]):
                fname = media_filename(url)
                target = os.path.join(dest_dir, f"{int(att_id)}-{fname}")
                row = {"att_id": int(att_id), "url": url, "file": fname,
                       "path": target, "status": None, "error": None,
                       "bytes": 0, "attempts": 0}
                if os.path.exists(target):
                    row["status"] = "skipped"
                    row["bytes"] = os.path.getsize(target)
                    out.append(row)
                    continue
                err = None
                for attempt in range(1, retries + 1):
                    row["attempts"] = attempt
                    tmp = None
                    try:
                        data = fetch(url, timeout)
                        tmp = f"{target}.part-{uuid.uuid4().hex}"
                        with open(tmp, "wb") as fh:
                            fh.write(data)
                        os.replace(tmp, target)  # atomic publish
                        tmp = None               # published — nothing to reap
                        row["status"] = "downloaded"
                        row["bytes"] = len(data)
                        err = None
                        break
                    except Exception as exc:  # noqa: BLE001 — per-row quarantine
                        err = f"{type(exc).__name__}: {exc}"
                        if attempt < retries:
                            time.sleep(backoff * (2 ** (attempt - 1)))
                    finally:
                        # A failed write/rename must not strand its
                        # .part file — retries mint fresh uuids and the
                        # garbage would accumulate unbounded.
                        if tmp is not None:
                            try:
                                os.unlink(tmp)
                            except OSError:
                                pass
                if err is not None:
                    row["status"] = "failed"
                    row["error"] = err
                out.append(row)
            yield pd.DataFrame(
                out, columns=[f.name for f in SIDELOAD_SCHEMA.fields])

    return src.mapInPandas(part, schema=SIDELOAD_SCHEMA)
