"""BPE tokenizer training: merges match the classic collections-based
reference implementation; the wrapped-symbol representation keeps string
replace greedy-left-to-right (the 'b b b b' overlap trap)."""

from __future__ import annotations

import collections
import re


def _reference_bpe(texts: list[str], num_merges: int):
    words = collections.Counter()
    for t in texts:
        for w in [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]:
            words[w] += 1
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, cnt))
        new_vocab: dict = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


def test_train_bpe_matches_reference(spark):
    from spikex_spark.operators.bpe import train_bpe

    texts = ["low lower lowest low low", "new newer newest new",
             "low new wider wide"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "id long, text string")
    got = train_bpe(docs, "text", num_merges=6)
    ref, _ = _reference_bpe(texts, 6)
    assert got == ref


def test_train_bpe_greedy_overlap(spark):
    """'aaaa' under merge (a,a) must become (aa)(aa), not (aa)(a)(a) —
    the shared-boundary failure of space-separated sequence forms."""
    from spikex_spark.operators.bpe import bpe_encode, train_bpe

    texts = ["aaaa aaaa aaaa"]
    docs = spark.createDataFrame([(0, texts[0])], "id long, text string")
    merges = train_bpe(docs, "text", num_merges=2)
    ref, vocab = _reference_bpe(texts, 2)
    assert merges == ref
    assert merges[0][:2] == ("a", "a")
    # after (a,a) then (aa,aa): 'aaaa' is ONE symbol
    enc = bpe_encode(docs, "id", "text", merges).collect()[0]
    expect = sum(len(sym) * f for sym, f in vocab.items())
    assert enc["n_bpe_tokens"] == expect == 3


def test_bpe_encode_counts(spark):
    from spikex_spark.operators.bpe import bpe_encode, train_bpe

    texts = ["low lower lowest low low", "new newer newest new",
             "low new wider wide", "???"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "id long, text string")
    merges = train_bpe(docs, "text", num_merges=6)
    _, vocab = _reference_bpe(texts, 6)
    # reference per-word symbol counts
    wlen = {"".join(sym): len(sym) for sym in vocab}
    got = {r["id"]: r["n_bpe_tokens"] for r in
           bpe_encode(docs, "id", "text", merges).collect()}
    for i, t in enumerate(texts):
        words = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        assert got[i] == sum(wlen[w] for w in words), (i, t)
    assert got[3] == 0                        # all-punct doc
