"""Per-row error isolation as dataflow (SURVEY §4, §7.4 risk 3).

≙ SynchronousPipelineLoader.php:42-48 + WordPressPostLoader.php:83-101:
the reference try/catches each row/loader, logs, and continues — one bad
row never kills the job. Spark-native that becomes an explicit *split*:
validation rules annotate rows with their failures, the stream forks
into a clean side and a quarantine side (the corrupt-record-column
pattern), and the quarantine is persisted for replay instead of logged
and lost.

Everything is Column expressions — the checks run inside codegen at scan
speed; the fork is two filters over one cached/checkpointed frame, not
two recomputations.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERRORS_COL = "__errors"


def with_error_flags(df: DataFrame, checks: Mapping[str, Column],
                     errors_col: str = ERRORS_COL) -> DataFrame:
    """Annotate rows with the names of every failed check.

    ``checks`` maps rule name → boolean Column that is True when the row
    PASSES. A NULL verdict counts as failure (WP-style strictness).
    """
    failed = [F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
              for name, cond in checks.items()]
    arr = F.array_compact(F.array(*failed)) if failed else F.array()
    return df.withColumn(errors_col, arr)


def split_quarantine(df: DataFrame, checks: Mapping[str, Column],
                     errors_col: str = ERRORS_COL
                     ) -> tuple[DataFrame, DataFrame]:
    """Fork into (clean, quarantined): clean rows drop the error column,
    quarantined rows keep it (for triage/replay). Both sides derive from
    one flagged frame so the checks evaluate once per row."""
    flagged = with_error_flags(df, checks, errors_col)
    clean = flagged.where(F.size(errors_col) == 0).drop(errors_col)
    bad = flagged.where(F.size(errors_col) > 0)
    return clean, bad


def quarantine_stage(df: DataFrame, checks: Mapping[str, Column],
                     quarantine_path: str | None = None,
                     fmt: str = "parquet") -> DataFrame:
    """Loader-chain form: write the quarantine side out (append), return
    the clean side — drop-in guard in front of any sink stage."""
    clean, bad = split_quarantine(df, checks)
    if quarantine_path is not None:
        bad.write.mode("append").format(fmt).save(quarantine_path)
    return clean
