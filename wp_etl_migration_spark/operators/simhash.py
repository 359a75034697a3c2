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

from pyspark.sql import DataFrame
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
    from wp_etl_migration_spark.operators.dedup import spread_thin_input
    # Single-row-group inputs otherwise tokenize on one core.
    df = spread_thin_input(df)
    exploded = (df.select(F.col(id_col), toks.alias("__toks"))
                .where(F.size("__toks") >= 1)
                .select(F.col(id_col), F.explode("__toks").alias("__tok"))
                .withColumn("__h", F.md5(F.col("__tok"))))
    nibbles = exploded.select(
        F.col(id_col),
        *[F.expr(f"instr('{HEX}', substring(__h, {q + 1}, 1)) - 1")
          .alias(f"__n{q}") for q in range(bits // 4)])
    # Lane packing: the 4 one-bit votes of each nibble occupy 16-bit
    # lanes of ONE long, so the shuffle aggregates bits/4 SUMs + a
    # count, not ``bits`` SUMs (4× fewer accumulators and a much
    # smaller codegen). ones_j ≥ half the tokens ⟺ the ±1 vote sum is
    # ≥ 0. Lane width bounds docs at 65k distinct tokens.
    lane = [F.expr(
        f"(__n{q} % 2) + ((__n{q} div 2) % 2) * 65536"
        f" + ((__n{q} div 4) % 2) * 4294967296"
        f" + ((__n{q} div 8) % 2) * 281474976710656")
        for q in range(bits // 4)]
    sums = nibbles.groupBy(id_col).agg(
        F.count("*").alias("__cnt"),
        *[F.sum(lane[q]).alias(f"__L{q}") for q in range(bits // 4)])
    ones = [F.expr(f"(__L{j // 4} div {2 ** (16 * (j % 4))}) % 65536")
            for j in range(bits)]
    sig = F.concat(*[
        F.when(ones[j] * 2 >= F.col("__cnt"), "1").otherwise("0")
        for j in range(bits)])
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dup(df: DataFrame, id_col: str, text_col: str,
                     bits: int = 32, chunks: int = 4,
                     max_hamming: int | None = None,
                     max_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) via the chunk equi-join.

    Complete for ``hamming ≤ chunks - 1`` (pigeonhole); ``max_hamming``
    defaults to that bound. One shuffle on chunk value; Hamming check on
    candidates only.

    **Size the chunk width to the corpus.** Expected random bucket
    occupancy is ``n / 2^(bits/chunks)``: candidate pairs grow with
    occupancy SQUARED, so a width that is comfortable at one scale
    goes quadratic a decade later. The r14 sf10 study measured it:
    ``bits=32, chunks=4`` (8-bit chunks, 256 values) ran the 500k-doc
    corpus into a ~2000-deep-bucket candidate join that had to be
    killed, while ``bits=64, chunks=4`` (16-bit chunks) keeps random
    occupancy ≈ n/65536 and scales cleanly — 64-bit signatures are
    the production configuration beyond ~10⁵ docs (more bits also
    sharpen the Hamming radius, Charikar's actual regime).

    ``max_bucket`` is the guard for the residual hot buckets width
    cannot fix (mass-identical signatures: boilerplate families,
    adversarial spam): (chunk, value) buckets holding more rows are
    dropped before the join — the same cap-and-tradeoff as the LSH
    band caps and the FastSS variant cap. Recall cost: a true pair is
    lost only if EVERY chunk the two signatures share is over the cap
    (pairs within an n-deep identical-signature family share all
    chunks, and such families are exactly what the cap is for — their
    n² candidate pairs are near-duplicate CLUSTERS better resolved by
    exact dedup upstream).
    """
    if bits % chunks:
        raise ValueError("bits must divide evenly into chunks")
    if max_hamming is None:
        max_hamming = chunks - 1
    width = bits // chunks
    sig = simhash_signatures(df, id_col, text_col, bits)
    # Pack the signature into 32-bit words once: Hamming becomes
    # Σ bit_count(a XOR b) — a few integer ops per candidate instead of
    # ``bits`` substring compares, and the candidate distinct dedupes
    # fixed-width longs, not bit strings. (Word size 32 keeps conv()'s
    # signed-long parse safe at any ``bits``.)
    n_words = (bits + 31) // 32
    words = [F.conv(F.substring("simhash", w * 32 + 1,
                                min(32, bits - w * 32)), 2, 10)
             .cast("long").alias(f"__si{w}") for w in range(n_words)]
    # Cache the per-doc packed signatures (r14): the chunk self-join
    # references this frame twice, and with a broadcast build side
    # there is no Exchange for ReusedExchange to dedupe — without the
    # cache the whole tokenize → md5 → vote-aggregation subtree
    # executes once per side. One row per doc (id + bits-char string +
    # n_words longs), so the cache is corpus-card-sized, never
    # token-sized.
    packed = sig.select(F.col(id_col), F.col("simhash"), *words).cache()
    chunked = packed.select(
        F.col(id_col), *[F.col(f"__si{w}") for w in range(n_words)],
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.substring("simhash", c * width + 1, width)
                     .alias("v"))
            for c in range(chunks)])).alias("__ch"))
    if max_bucket is not None:
        cool = (chunked.groupBy("__ch")
                .agg(F.count("*").alias("__n"))
                .where(F.col("__n") <= max_bucket).select("__ch"))
        chunked = chunked.join(cool, "__ch", "left_semi")
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (a.join(b, on=[F.col("a.__ch") == F.col("b.__ch")])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    *[F.col(f"a.__si{w}").alias(f"__sa{w}")
                      for w in range(n_words)],
                    *[F.col(f"b.__si{w}").alias(f"__sb{w}")
                      for w in range(n_words)])
            .distinct())
    ham = functools.reduce(operator.add, [
        F.bit_count(F.col(f"__sa{w}").bitwiseXOR(F.col(f"__sb{w}")))
        for w in range(n_words)]).cast("long")
    return (cand.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
