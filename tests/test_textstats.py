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
