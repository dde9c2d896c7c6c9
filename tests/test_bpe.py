"""BPE trainer/segmenter vs an independent Sennrich-algorithm reference."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from bop_consus_importing_rdf_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_frequencies,
)


def _ref_bpe(texts: list[str], n: int):
    """Straight Sennrich et al. (ACL 2016) §3.2: greedy left-to-right
    merge of the most frequent adjacent pair over the word-frequency
    table; ties broken by (lhs, rhs) ascending."""
    wf = Counter(w for t in texts for w in t.split())
    vocab = {w: tuple(w) for w in wf}
    merges = []
    for rank in range(1, n + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges, vocab


def test_bpe_train_textbook_corpus(spark):
    rows = [
        ("d1", "low lower lowest low low"),
        ("d2", "new newer newest new lower"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
    ref, _ = _ref_bpe([t for _, t in rows], 6)
    assert got == ref


@pytest.mark.parametrize("seed,n_part", [(7, 1), (21, 5), (77, 32)])
def test_bpe_train_randomized_vs_reference(spark, seed, n_part):
    rng = random.Random(seed)
    vocab = ["spark", "sparse", "parse", "parquet", "part", "spar", "aa",
             "a", "repeat", "repeats", "", "xyz"]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(0, 12))).strip())
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id long, text string").repartition(
        n_part
    )
    got = [tuple(r) for r in bpe_train(df, "text", n_merges=10).collect()]
    ref, ref_vocab = _ref_bpe([t for _, t in rows], 10)
    assert got == ref
    # segmenting with the learned merges reproduces the reference's final
    # symbol sequences (greedy replay in rank order)
    merges = [(a, b) for _, a, b, _ in got]
    seg = {
        r["id"]: r["bpe_tokens"]
        for r in bpe_segment(df, merges, "text").collect()
    }
    for i, t in rows:
        expect = [s for w in t.split() for s in ref_vocab.get(w, tuple(w))]
        assert seg[i] == expect, (i, t)


def test_bpe_word_frequencies_and_marker_guard(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "  "), (3, "b")], "id long, text string"
    )
    got = {
        (r["word"], r["cnt"])
        for r in word_frequencies(df, "text").collect()
    }
    assert got == {("a", 2), ("b", 2)}
    bad = spark.createDataFrame([(1, "ok \x02evil\x03")], "id long, text string")
    with pytest.raises(Exception, match="wrap marker"):
        word_frequencies(bad, "text").collect()
