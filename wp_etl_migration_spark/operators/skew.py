"""Skew + shuffle-locality tools: salted joins and bucketed tables.

Neither exists in the reference (single-threaded, no shuffles — SURVEY
§4); both are core to running its workloads at 100 TB:

- ``salted_join``: a hot key (one customer with millions of orders, one
  taxonomy with most terms) lands an entire shuffle partition on one
  task. Salting splits each hot key into ``salt`` sub-keys: the fact
  side gets a deterministic salt from its row content, the dimension
  side is exploded ×salt so every sub-key still finds its match. AQE's
  skew-join handles moderate skew automatically; salting is the
  explicit tool for the pathological keys AQE can't split (single-key
  partitions).

- ``write_bucketed`` / co-located joins: pre-hash-partition both tables
  into the same bucket layout so repeated joins on the bucket key need
  NO exchange at read time — the per-query shuffle is paid once at
  write time. The test asserts the join plan is exchange-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(facts: DataFrame, dim: DataFrame, keys: Sequence[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Join with per-key salting to split skewed shuffle partitions.

    ``facts`` (the skewed, large side) gets ``__salt`` derived from a
    hash of the whole row — deterministic, uniform; ``dim`` is exploded
    ×``salt``. Output equals the unsalted join (salt columns dropped);
    the shuffle key becomes (keys…, salt) so one hot key spreads over
    ``salt`` tasks.
    """
    keys = list(keys)
    fact_salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]),
                       F.lit(salt)).cast("int")
    salted_facts = facts.withColumn("__salt", fact_salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = salted_facts.join(salted_dim, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   buckets: int = 16) -> None:
    """Persist as a bucketed+sorted managed table (co-location layout).

    Subsequent equi-joins between tables bucketed the same way on the
    same keys read bucket-aligned and skip the exchange entirely.
    """
    keys = list(keys)
    (df.write.mode("overwrite")
       .bucketBy(buckets, keys[0], *keys[1:])
       .sortBy(keys[0], *keys[1:])
       .format("parquet")
       .saveAsTable(table))
