"""BPE tokenizer training and encoding (LLM-pipeline extension).

Byte-pair encoding per Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units" — public): start from
characters, repeatedly merge the most frequent adjacent symbol pair.
``textstats.bpe_token_count`` approximates token counts with the
GPT-style pre-tokenizer regex; this module TRAINS real merges on the
corpus and encodes with them.

Scale design — the key fact is that BPE training operates on the WORD
FREQUENCY table, not the corpus: one corpus-sized aggregation builds
(word, freq), and everything after runs on the vocabulary, which
grows ~O(corpus^0.5) (Heaps' law). Each merge round is one
vocabulary-sized pair aggregation (map-side combinable, weighted by
word freq) + one Arrow-batched merge application; the only
driver-side data is the single winning pair per round. Encoding
streams the corpus once through an Arrow UDF with the merge ranks
broadcast — the standard implementation shape (no built-in expresses
iterative pair merging).

Determinism: the winning pair each round is (count DESC, pair
lexicographic ASC) — fully deterministic, so two engines training on
the same corpus learn the identical merge sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker (distinguishes "est</w>" the suffix from "est"
#: mid-word — the paper's construction).
EOW = "</w>"


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (df.select(F.explode(toks).alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word").agg(F.count("*").alias("freq")))


def _merge_pair_in(symbols: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a \
                and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def select_disjoint_batch(top: list[tuple[str, str, int]],
                          k: int) -> list[tuple[str, str]]:
    """Greedy batch selection over a (count desc, a, b)-ordered pair
    list: accept up to ``k`` pairs that share NO symbol with any
    earlier-accepted pair. Disjoint pairs' counts are invariant under
    each other's merges, so applying the batch sequentially is
    well-defined; skipped (overlapping) pairs stay in the table and
    compete again next pass. Driver-side, vocabulary-independent."""
    batch: list[tuple[str, str]] = []
    used: set[str] = set()
    for a, b, _n in top:
        if len(batch) == k:
            break
        if a in used or b in used:
            continue
        batch.append((a, b))
        used.update((a, b, a + b))
    return batch


def train_bpe(df: DataFrame, text_col: str, num_merges: int,
              min_pair_count: int = 2,
              batch_k: int = 1) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus; returns
    the ordered merge list [(a, b), ...] (rank = list position).
    Stops early when no pair reaches ``min_pair_count``.

    Each pass: vocabulary-sized weighted pair count → the top
    ``4·batch_k`` pairs to the driver (a few KB) → greedy selection of
    up to ``batch_k`` symbol-disjoint winners
    (:func:`select_disjoint_batch`) → ONE Arrow-batched application of
    the whole batch over the vocabulary, lineage pinned per pass
    (``checkpoint.pin``). At a real 32k-merge vocabulary this cuts the
    driver round-trips / Spark jobs from 32k to ~32k/batch_k.

    ``batch_k=1`` (default) is EXACTLY classic sequential BPE
    (Sennrich et al.). With ``batch_k>1`` the pass freezes its
    selection before seeing pairs CREATED by the pass's own earlier
    merges, so the learned sequence can deviate from classic BPE when
    a newly-created pair (count ≤ its parent's) would outrank a later
    batch member; skipped overlapping pairs are never lost — they
    re-compete next pass. The batched sequence is itself fully
    deterministic ((count desc, pair lex asc) order throughout) and is
    parity-tested against a pure-Python implementation of the same
    batched algorithm (tests/test_bpe.py).
    """
    import pandas as pd

    from wp_etl_migration_spark.operators.checkpoint import pin

    chars = F.filter(F.split(F.col("word"), ""),
                     lambda c: c != F.lit(""))
    vocab = pin(_word_freqs(df, text_col).select(
        F.concat(chars, F.array(F.lit(EOW))).alias("symbols"),
        F.col("freq")))

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        k = min(batch_k, num_merges - len(merges))
        cnt = F.size("symbols") - 1
        z = F.arrays_zip(F.slice("symbols", 1, cnt),
                         F.slice("symbols", 2, cnt))
        top = (vocab.where(F.size("symbols") >= 2)
               .select(F.explode(z).alias("__p"), "freq")
               .groupBy(F.col("__p")["0"].alias("a"),
                        F.col("__p")["1"].alias("b"))
               .agg(F.sum("freq").alias("n"))
               .where(F.col("n") >= min_pair_count)
               .orderBy(F.desc("n"), "a", "b")
               .limit(max(4 * k, 4)).collect())
        if not top:
            break
        batch = select_disjoint_batch(
            [(r["a"], r["b"], r["n"]) for r in top], k)
        merges.extend(batch)

        def apply_batch(batches, pairs=tuple(batch)):
            for pdf in batches:
                def app(s):
                    s = list(s)
                    for a, b in pairs:
                        s = _merge_pair_in(s, a, b)
                    return s
                pdf["symbols"] = pdf["symbols"].map(app)
                yield pdf

        vocab = pin(vocab.mapInPandas(
            apply_batch, schema="symbols array<string>, freq long"))
    return merges


def encode_bpe(df: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """Encode documents with learned merges: (id, tokens array<string>,
    n_tokens). One Arrow-batched pass over the corpus; the merge-rank
    dict is broadcast (vocabulary-sized). Greedy lowest-rank-first
    application per word — the standard BPE encoder."""
    import pandas as pd

    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    def encode_word(word: str, rank: dict) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            syms = _merge_pair_in(syms, *best)
        return syms

    def run(batches):
        rank = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").lower().strip().split():
                    if w not in cache:
                        cache[w] = encode_word(w, rank)
                    toks.extend(cache[w])
                toks_col.append(toks)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "tokens": toks_col,
                                "n_tokens": [len(t) for t in toks_col]})

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, tokens array<string>, "
                    "n_tokens long")
