"""BPE tokenizer training/encoding (operators/bpe.py) vs a literal
pure-Python re-implementation of Sennrich et al. 2016."""

from __future__ import annotations

from collections import Counter

from wp_etl_migration_spark.operators.bpe import (
    EOW, encode_bpe, train_bpe, _merge_pair_in)


def _python_bpe(texts, num_merges, min_pair_count=2):
    freqs = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                freqs[w] += 1
    vocab = {tuple(list(w) + [EOW]): n for w, n in freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # (count desc, pair lexicographic asc) — the engine's tiebreak
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {tuple(_merge_pair_in(list(s), a, b)): n
                 for s, n in vocab.items()}
    return merges


def test_train_bpe_matches_python_reference(spark):
    texts = ["low lower lowest", "new newer newest", "low low new",
             "wider wide wide"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               ["doc_id", "text"])
    got = train_bpe(df, "text", num_merges=12)
    want = _python_bpe(texts, 12)
    assert got == want
    assert len(got) >= 6              # enough signal to merge


def test_encode_bpe_rebuilds_words_and_compresses(spark):
    texts = ["low lower lowest low low", "newest newer new"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               ["doc_id", "text"])
    merges = train_bpe(df, "text", num_merges=20)
    enc = {r.doc_id: r for r in
           encode_bpe(df, "doc_id", "text", merges).collect()}
    for i, t in enumerate(texts):
        # concatenating tokens reproduces the normalized words exactly
        joined = "".join(enc[i].tokens).replace(EOW, " ").strip()
        assert joined == " ".join(t.lower().split())
        # frequent words compress below character length
        assert enc[i].n_tokens < sum(len(w) + 1 for w in t.split())
    # 'low' is frequent enough to become a single token + EOW merge
    assert any("low" in "".join(m) for m in merges)


def test_encode_with_no_merges_is_characters(spark):
    df = spark.createDataFrame([(1, "ab c")], ["doc_id", "text"])
    r = encode_bpe(df, "doc_id", "text", []).first()
    assert r.tokens == ["a", "b", EOW, "c", EOW]
