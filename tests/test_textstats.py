"""Text analysis: lang-id, quality features, token counts, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.operators.textstats import (
    bpe_token_count,
    fingerprints,
    lang_id,
    quality_features,
    whitespace_token_count,
)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der Hund und die Katze ist da",),
            ("el perro y la casa es con los gatos",),
            ("xyz qqq zzz",),
        ],
        "text string",
    )
    got = [r.l for r in df.select(lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "es", "und"]


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world, it's 42 now",), ("",), ("   ",)], "text string"
    )
    ws = [r.n for r in df.select(whitespace_token_count(F.col("text")).alias("n")).collect()]
    assert ws == [5, 0, 0]
    bpe = [r.n for r in df.select(bpe_token_count(F.col("text")).alias("n")).collect()]
    # hello|world|,|it|'|s|42|now = 8
    assert bpe[0] == 8


def test_quality_features(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox is with the dog and cat of today",),
            ("!!! ??? ;;; ###",),
        ],
        "text string",
    )
    out = quality_features(df).collect()
    good, bad = out[0], out[1]
    assert good.quality_score > bad.quality_score
    assert bad.punct_ratio > 0.5
    assert good.stopword_ratio > 0


def test_fingerprints_overlap_tracks_similarity(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "a totally unrelated sentence with zero common substrings"),
        ],
        "id long, text string",
    )
    fp = fingerprints(df, "id", "text").cache()
    sets = {
        i: {r.fingerprint for r in fp.filter(F.col("id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert sets[1] == sets[2]
    assert len(sets[1] & sets[3]) / len(sets[1] | sets[3]) < 0.1


def test_clean_corpus_chain(spark):
    from bop_consus_importing_rdf_spark.operators.textstats import (
        clean_corpus,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then walks home "
        "with a friend of the family to have dinner and talk about things "
        "that happened in the town during the long warm summer evening"
    )
    rows = [
        (1, good),
        (2, good),                 # exact duplicate — only doc 1 survives
        (3, "!!! ??? ### $$$ %%%"),  # punctuation soup — quality gate
        (4, "le chat et le chien sont dans la maison avec les amis et "
            "ils mangent le pain dans la cuisine pendant que la famille "
            "regarde les oiseaux dans le jardin " * 2),  # French — lang gate
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = clean_corpus(docs)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1}
    assert got[1].lang_pred == "en"
    assert got[1].quality_score >= 0.6


def test_fingerprints_match_pure_python_winnowing(spark):
    """Property: the vectorized numpy Karp-Rabin winnowing == a direct
    pure-Python-int reference (independent arithmetic — catches numpy
    overflow/alignment bugs) over adversarial texts incl. unicode,
    whitespace runs, short and empty documents."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import re

    M, B1, B2 = (1 << 31) - 1, 257, 263
    K, W = 7, 4

    def ref(text):
        t = re.sub(r"\s+", " ", text, flags=re.ASCII).lower()
        if not t:
            return {0}
        kk = min(K, len(t))
        grams = [t[i:i + kk] for i in range(len(t) - kk + 1)]

        def h(g):
            a1 = a2 = 0
            for ch in g:
                c = ord(ch)
                a1, a2 = (a1 * B1 + c) % M, (a2 * B2 + c) % M
            # Horner seeded by the first char (no leading-zero mult)
            return ((a1 % M) << 31) + a2

        hs = [h(g) for g in grams]
        return {min(hs[i:i + W]) for i in range(len(hs))}

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=40,
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=20, deadline=None)
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "id long, text string"
        )
        got = {}
        for r in fingerprints(df, "id", "text").collect():
            got.setdefault(r.id, set()).add(r.fingerprint)
        for i, t in enumerate(texts):
            assert got[i] == ref(t), (i, repr(t))

    check()


def test_tfidf_topk_matches_python_reference(spark):
    from collections import Counter
    import math

    from bop_consus_importing_rdf_spark.operators.textstats import tfidf_topk

    rows = [
        (1, "spark spark shuffle join"),
        (2, "spark join window"),
        (3, "window window tumble"),
        (4, "spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["id"], r["rk"], r["term"], r["tf"], r["score_q"])
        for r in tfidf_topk(df, "doc_id", "text", k=2).collect()
    ]

    # independent reference with the same integer quantization
    scale = 10**6
    tf = {i: Counter(t.split()) for i, t in rows}
    dfc = Counter(term for c in tf.values() for term in c)
    n = len(rows)
    want = []
    for i in sorted(tf):
        scored = [
            (c * math.floor(scale * math.log(n / dfc[term])), term, c)
            for term, c in tf[i].items()
        ]
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rk, (s, term, c) in enumerate(scored[:2], 1):
            want.append((i, rk, term, c, s))
    assert sorted(got) == sorted(want)
    # 'spark' appears in 3 of 4 docs -> low idf; doc 3's top term must be
    # the rarer 'tumble'... but 'window' has tf 2: check determinism only
    by_doc = {(i, rk): term for i, rk, term, *_ in got}
    assert by_doc[(1, 1)] == "shuffle"  # tf 1 * ln(4/1) beats spark tf 2 * ln(4/3)


def test_tfidf_topk_ubiquitous_term_scores_zero(spark):
    from bop_consus_importing_rdf_spark.operators.textstats import tfidf_topk

    df = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta")], "doc_id long, text string"
    )
    rows = {
        (r["id"], r["term"]): r["score_q"]
        for r in tfidf_topk(df, "doc_id", "text", k=5).collect()
    }
    assert rows[(1, "common")] == 0 and rows[(2, "common")] == 0
    assert rows[(1, "alpha")] > 0 and rows[(2, "beta")] > 0
