"""SimHash near-duplicate detection (LLM-pipeline extension).

Charikar SimHash over word tokens: each token votes ±1 on ``bits``
signature positions according to its hash; the signature bit is the sign
of the vote sum. Near-duplicates differ in few bits (small Hamming
distance).

Scale design (100 TB):
- signature computation is one shuffle (groupBy doc) with ``bits``
  map-side-combinable SUM aggregates — columnar, whole-stage codegen,
  no UDFs, linear in token count;
- candidate generation uses the standard chunk trick: a ``bits``-bit
  signature split into ``chunks`` equal chunks; by pigeonhole, any pair
  with Hamming distance < ``chunks`` shares at least one identical chunk,
  so an equi-join on (chunk_index, chunk_value) finds ALL pairs with
  distance ≤ chunks-1 — no quadratic all-pairs compare, one shuffle on
  the chunk value;
- Hamming verification runs only on candidates.

Hashing is engine-portable: per-token md5 hex nibbles (same trick as
``operators.dedup``), so the DuckDB oracle reproduces signatures exactly.

No counterpart in the reference (it has no dedup surface); cf. SURVEY §2
"beyond-parity" scope.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       bits: int = 32) -> DataFrame:
    """(id, simhash) — simhash as a ``bits``-char '0'/'1' string.

    Distinct word tokens per doc each vote on every bit; one shuffle,
    ``bits`` SUM aggregates (map-side combinable), string assembly after
    the agg. Each hex nibble of the token hash is decoded once in a
    projection (bit j lives in nibble j//4 at in-nibble position j%4 —
    pure integer arithmetic, engine-portable), so the per-token cost is
    ``bits/4`` instr calls, not ``bits``.
    """
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))),
                                    r"\s+"))
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        # Single-row-group inputs otherwise shingle on one core.
        df = df.repartition(sc.defaultParallelism)
    exploded = (df.select(F.col(id_col), toks.alias("__toks"))
                .where(F.size("__toks") >= 1)
                .select(F.col(id_col), F.explode("__toks").alias("__tok"))
                .withColumn("__h", F.md5(F.col("__tok"))))
    nibbles = exploded.select(
        F.col(id_col),
        *[F.expr(f"instr('{HEX}', substring(__h, {q + 1}, 1)) - 1")
          .alias(f"__n{q}") for q in range(bits // 4)])
    vote = [F.expr(f"(((__n{j // 4} div {2 ** (j % 4)}) % 2) * 2 - 1)")
            for j in range(bits)]
    sums = nibbles.groupBy(id_col).agg(
        *[F.sum(vote[j]).alias(f"__s{j}") for j in range(bits)])
    sig = F.concat(*[F.when(F.col(f"__s{j}") >= 0, "1").otherwise("0")
                     for j in range(bits)])
    return sums.select(F.col(id_col), sig.alias("simhash"))


def hamming(a: Column, b: Column, bits: int) -> Column:
    """Hamming distance between two '0'/'1' signature strings."""
    terms = [F.when(F.substring(a, j + 1, 1) != F.substring(b, j + 1, 1), 1)
             .otherwise(0) for j in range(bits)]
    return functools.reduce(operator.add, terms).cast("long")


def simhash_near_dup(df: DataFrame, id_col: str, text_col: str,
                     bits: int = 32, chunks: int = 4,
                     max_hamming: int | None = None) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) via the chunk equi-join.

    Complete for ``hamming ≤ chunks - 1`` (pigeonhole); ``max_hamming``
    defaults to that bound. One shuffle on chunk value; Hamming check on
    candidates only.
    """
    if bits % chunks:
        raise ValueError("bits must divide evenly into chunks")
    if max_hamming is None:
        max_hamming = chunks - 1
    width = bits // chunks
    sig = simhash_signatures(df, id_col, text_col, bits)
    # Pack the signature into a long once: Hamming becomes
    # bit_count(a XOR b) — one integer op per candidate instead of
    # ``bits`` substring compares, and the candidate distinct dedupes
    # fixed-width longs, not 32-char strings.
    packed = sig.withColumn("__si", F.conv("simhash", 2, 10).cast("long"))
    chunked = packed.select(
        F.col(id_col), F.col("__si"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.substring("simhash", c * width + 1, width)
                     .alias("v"))
            for c in range(chunks)])).alias("__ch"))
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (a.join(b, on=[F.col("a.__ch") == F.col("b.__ch")])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.__si").alias("__sa"),
                    F.col("b.__si").alias("__sb"))
            .distinct())
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("long")
    return (cand.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
