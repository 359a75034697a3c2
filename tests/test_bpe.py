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


def _python_bpe_batched(texts, num_merges, min_pair_count=2,
                        batch_k=1):
    """Pure-Python mirror of the engine's BATCHED trainer: per pass,
    greedy symbol-disjoint top-k from the (count desc, pair lex asc)
    order, applied sequentially. With batch_k=1 this IS classic BPE."""
    from wp_etl_migration_spark.operators.bpe import (
        select_disjoint_batch)
    freqs = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                freqs[w] += 1
    vocab = {tuple(list(w) + [EOW]): n for w, n in freqs.items()}
    merges = []
    while len(merges) < num_merges:
        k = min(batch_k, num_merges - len(merges))
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        ranked = sorted(((a, b, n) for (a, b), n in pairs.items()
                         if n >= min_pair_count),
                        key=lambda t3: (-t3[2], t3[0], t3[1]))
        if not ranked:
            break
        batch = select_disjoint_batch(ranked[:max(4 * k, 4)], k)
        merges.extend(batch)
        for a, b in batch:
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
    # batch_k=1 through the batched path is classic sequential BPE
    assert _python_bpe_batched(texts, 12, batch_k=1) == want


def test_train_bpe_batched_matches_batched_reference(spark):
    """Batched merge passes (VERDICT r5 #4): the engine with
    batch_k=4 learns exactly the sequence of the pure-Python batched
    algorithm (which defines the tie/selection semantics), and the
    result still encodes losslessly. The batched sequence may deviate
    from classic sequential BPE only in pass-internal order (see
    train_bpe docstring) — both are checked deterministic."""
    texts = ["low lower lowest", "new newer newest", "low low new",
             "wider wide wide", "the newest of the new lows",
             "wide wider widest low"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               ["doc_id", "text"])
    got = train_bpe(df, "text", num_merges=16, batch_k=4)
    want = _python_bpe_batched(texts, 16, batch_k=4)
    assert got == want
    assert len(got) >= 8
    # same multiset of merges re-learned identically on re-run
    assert train_bpe(df, "text", num_merges=16, batch_k=4) == got
    # batched merges still encode losslessly
    enc = {r.doc_id: r for r in
           encode_bpe(df, "doc_id", "text", got).collect()}
    for i, t in enumerate(texts):
        joined = "".join(enc[i].tokens).replace(EOW, " ").strip()
        assert joined == " ".join(t.lower().split())


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
