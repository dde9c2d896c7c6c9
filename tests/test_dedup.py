"""Dedup family: exact, MinHash+LSH, SimHash, n-gram shingling."""

from __future__ import annotations

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.operators.dedup import (
    char_shingles,
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signature,
    simhash32,
    simhash_near_pairs,
    word_ngrams,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup of 1
        (4, "completely different text about spark pipelines"),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), "id", "text")
    reps = {r.id: r.rep_id for r in out.collect()}
    assert reps[1] == 1 and reps[2] == 1  # dup group collapses to min id
    assert reps[3] == 3 and reps[4] == 4 and reps[5] == 5


def test_char_shingles_short_text(spark):
    sh = char_shingles(_docs(spark), "id", "text", n=5)
    got = {r.shingle for r in sh.filter(F.col("id") == 5).collect()}
    assert got == {"short"}


def test_word_ngrams(spark):
    df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    got = sorted(r.shingle for r in word_ngrams(df, "id", "text", 2).collect())
    assert got == ["a b", "b c", "c d"]


def test_minhash_identical_docs_share_signature(spark):
    sig = minhash_signature(char_shingles(_docs(spark), "id", "text", 5), k=8)
    rows = {r.id: tuple(r[f"mh{i}"] for i in range(8)) for r in sig.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]


def test_lsh_hot_bucket_cap(spark):
    """A boilerplate clique (identical docs → identical signatures → one
    giant band bucket) is skipped when the bucket exceeds max_bucket; the
    genuinely small buckets still pair. Guards the quadratic blowup the
    sf1 probe measured (13.3M candidates / 2,556 true pairs)."""
    clique = [(i, "same boilerplate text everywhere") for i in range(100, 140)]
    pair = [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps")]
    docs = spark.createDataFrame(clique + pair, "id long, text string")
    sig = minhash_signature(char_shingles(docs, "id", "text", 5), k=8)

    capped = lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(1, 2)}  # clique buckets (size 40) skipped entirely

    uncapped = lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=None)
    assert uncapped.count() == 1 + 40 * 39 // 2


def test_minhash_dedup_clusters(spark):
    out = minhash_dedup(
        _docs(spark), "id", "text", shingle_n=5, k=8, bands=4, threshold=0.6
    )
    reps = {r.id: r.rep_id for r in out.collect()}
    assert reps[1] == reps[2] == 1
    assert reps[3] == 1  # near-dup joins the cluster (jaccard ≈ 0.8)
    assert reps[4] == 4 and reps[5] == 5


def test_jaccard_exactness(spark):
    docs = spark.createDataFrame(
        [(1, "ab bc"), (2, "ab bc"), (3, "zz yy")], "id long, text string"
    )
    sh = word_ngrams(docs, "id", "text", 1)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(pairs, sh, 0.0).collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) not in got  # zero intersection never materializes


def test_simhash64_near_pairs(spark):
    from bop_consus_importing_rdf_spark.operators.dedup import (
        simhash64,
        simhash_near_pairs64,
    )

    out = simhash64(_docs(spark), "id", "text")
    rows = {r.id: (r.simhash_hi, r.simhash_lo) for r in out.collect()}
    # both halves stay below 2^32 (two-halves representation invariant)
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in rows.values())
    assert rows[1] == rows[2]  # identical docs → identical 64-bit hash
    pairs = simhash_near_pairs64(out, max_hamming=16)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0
    # unrelated docs never surface below the hamming cut
    assert all({a, b} != {4, 5} for a, b in got)


def test_simhash_near_pairs(spark):
    out = simhash32(_docs(spark), "id", "text")
    hashes = {r.id: r.simhash for r in out.collect()}
    assert hashes[1] == hashes[2]
    pairs = simhash_near_pairs(
        spark.createDataFrame(
            [(k, v) for k, v in hashes.items()], "id long, simhash long"
        ),
        max_hamming=8,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all({a, b} != {4, 5} for a, b in got)


def test_containment_subset_doc(spark):
    """A short document fully quoted inside a long one has containment 1.0
    but tiny Jaccard — the asymmetric case MinHash misses by construction
    (Schleimer et al. copy detection vs similarity)."""
    from bop_consus_importing_rdf_spark.operators.dedup import (
        containment_pairs,
    )

    # synthetic fingerprint sets: doc 1 = {a..j} (10 fps), doc 2 = {a,b,c}
    # (subset), doc 3 = {x,y,z} (disjoint)
    fps = [(1, f"fp{i}") for i in range(10)]
    fps += [(2, "fp0"), (2, "fp1"), (2, "fp2")]
    fps += [(3, "qx"), (3, "qy"), (3, "qz")]
    df = spark.createDataFrame(fps, "id long, fingerprint string")

    out = {
        (r.id_a, r.id_b): (r.n_shared, r.containment)
        for r in containment_pairs(df, threshold=0.5).collect()
    }
    assert out == {(1, 2): (3, 1.0)}  # jaccard would be 3/10 = 0.3

    # hot-fingerprint cap drops the shared gram entirely (selectivity
    # guard), but denominators still count the full sets
    capped = containment_pairs(df, threshold=0.0, max_bucket=1)
    assert capped.count() == 0


def test_containment_matches_set_reference(spark):
    """Property: containment_pairs == pure-Python set arithmetic over
    hypothesis-generated fingerprint sets (tiny alphabet → dense
    overlaps)."""
    from itertools import combinations

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bop_consus_importing_rdf_spark.operators.dedup import (
        containment_pairs,
    )

    @given(
        docs=st.lists(
            st.sets(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
            min_size=1, max_size=8,
        ),
        threshold=st.sampled_from([0.3, 0.5, 1.0]),
    )
    @settings(max_examples=15, deadline=None)
    def check(docs, threshold):
        rows = [(i, fp) for i, s in enumerate(docs) for fp in sorted(s)]
        df = spark.createDataFrame(rows, "id long, fingerprint string")
        got = {
            (r.id_a, r.id_b): (r.n_shared, r.containment)
            for r in containment_pairs(df, threshold=threshold).collect()
        }
        want = {}
        for a, b in combinations(range(len(docs)), 2):
            inter = len(docs[a] & docs[b])
            if inter == 0:
                continue
            c = inter / min(len(docs[a]), len(docs[b]))
            if c >= threshold:
                want[(a, b)] = (inter, c)
        assert got == want

    check()


def test_line_dedup_keep_first_and_reassembly(spark):
    from bop_consus_importing_rdf_spark.operators.dedup import line_dedup

    rows = [
        # doc 1: "boiler" repeats inside the doc too — the SECOND internal
        # occurrence must also be dropped (keep-first is corpus-global,
        # (id, pos)-ordered)
        (1, "boiler\nalpha\nboiler\nbeta"),
        # doc 2: all lines already seen in doc 1 → fully dropped
        (2, "boiler\nalpha"),
        # doc 3: one seen line + one fresh line → partially stripped,
        # surviving lines keep original order
        (3, "gamma\nboiler\ndelta"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in line_dedup(df, "id", "text").collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["text"] == "boiler\nalpha\nbeta"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (4, 3)
    assert out[3]["text"] == "gamma\ndelta"
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (3, 2)


def test_line_dedup_single_line_docs_equal_exact_dedup_keepers(spark):
    # with one line per doc, line_dedup's survivors == exact_dedup's
    # representatives (same keep-min-id semantics)
    from bop_consus_importing_rdf_spark.operators.dedup import line_dedup

    docs = _docs(spark)
    survivors = {
        r["id"] for r in line_dedup(docs, "id", "text").collect()
    }
    reps = {
        r["rep_id"]
        for r in exact_dedup(docs, "id", "text").select("rep_id").collect()
    }
    assert survivors == reps


def _py_line_dedup(rows, delim="\n"):
    """Independent keep-first reference for line_dedup."""
    docs = {i: text.split(delim) for i, text in rows}
    keep = {}
    for i in sorted(docs):
        for p, ln in enumerate(docs[i]):
            keep.setdefault(ln, (i, p))
    out = {}
    for i in sorted(docs):
        kept = [ln for p, ln in enumerate(docs[i]) if keep[ln] == (i, p)]
        if kept:
            out[i] = (delim.join(kept), len(docs[i]), len(kept))
    return out


import pytest as _pytest


@_pytest.mark.parametrize("seed,n_part", [(3, 1), (11, 7), (42, 32)])
def test_line_dedup_randomized_vs_reference(spark, seed, n_part):
    # seeded word-soup corpus with heavy line collisions; also proves
    # partition invariance (keep-first is (id, pos)-defined, never
    # arrival-order-defined)
    import random

    from bop_consus_importing_rdf_spark.operators.dedup import line_dedup

    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(6)]
    rows = [
        (
            i,
            "\n".join(
                " ".join(rng.choices(vocab, k=3))
                for _ in range(rng.randint(1, 8))
            ),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, text string").repartition(
        n_part
    )
    got = {
        r["id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(df, "id", "text").collect()
    }
    assert got == _py_line_dedup(rows)


def test_lsh_match_index_candidates_and_estimator(spark):
    from bop_consus_importing_rdf_spark.operators.dedup import (
        lsh_match_index,
        minhash_signature,
        word_ngrams,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely unrelated sentence about engines"),
            (10, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (20, "another unrelated one about parquet files"),
        ],
        "id long, text string",
    )
    sig = minhash_signature(word_ngrams(docs, "id", "text", 3), k=8)
    new = sig.filter("id >= 10")
    idx = sig.filter("id < 10")
    got = {
        (r["new_id"], r["index_id"]): r["n_agree"]
        for r in lsh_match_index(new, idx, k=8).collect()
    }
    # the exact copy collides and agrees on ALL 8 components; candidates
    # are strictly new x index (no index-internal or new-internal pairs)
    assert got == {(10, 1): 8}


def test_lsh_match_index_hot_bucket_cap(spark):
    from bop_consus_importing_rdf_spark.operators.dedup import (
        lsh_match_index,
        minhash_signature,
        word_ngrams,
    )

    # every doc identical -> one hot bucket per band covering all rows
    docs = spark.createDataFrame(
        [(i, "same same same same") for i in range(30)],
        "id long, text string",
    )
    sig = minhash_signature(word_ngrams(docs, "id", "text", 3), k=8)
    new = sig.filter("id >= 20")
    idx = sig.filter("id < 20")
    capped = lsh_match_index(new, idx, k=8, max_bucket=10)
    assert capped.count() == 0  # bucket of 30 band rows > cap -> skipped
    uncapped = lsh_match_index(new, idx, k=8, max_bucket=None)
    assert uncapped.count() == 10 * 20


def _py_substring_dedup(rows, window):
    """Independent reference: token-window ExactSubstr over (id, text)."""
    toks = {i: t.split() for i, t in rows}
    from collections import Counter

    counts = Counter()
    for ts in toks.values():
        for j in range(len(ts) - window + 1):
            counts[" ".join(ts[j:j + window])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for j in range(len(ts) - window + 1):
            if counts[" ".join(ts[j:j + window])] > 1:
                covered.update(range(j, j + window))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def test_substring_dedup_hand_cases(spark):
    from bop_consus_importing_rdf_spark.operators.dedup import substring_dedup

    rows = [
        ("a", "one two three four five six seven eight alpha beta"),
        # shares the 8-token run one..eight with doc a
        ("b", "zero one two three four five six seven eight gamma"),
        ("c", "totally unique words here nothing repeats at all ok"),
        # WITHIN-document repetition is duplication too (the paper counts
        # occurrences, not documents)
        ("d", "rep rep rep rep rep rep rep rep rep rep rep rep"),
        ("e", "   "),  # whitespace-only → zero tokens, survives as ''
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in substring_dedup(df, window=8).collect()
    }
    assert got == {
        "a": ("alpha beta", 10, 8),
        "b": ("zero gamma", 10, 8),
        "c": ("totally unique words here nothing repeats at all ok", 9, 0),
        "d": ("", 12, 12),  # fully duplicated docs survive with empty text
        "e": ("", 0, 0),
    }


@_pytest.mark.parametrize("seed,n_part", [(5, 1), (13, 7), (99, 32)])
def test_substring_dedup_randomized_vs_reference(spark, seed, n_part):
    # seeded word soup with heavy window collisions (tiny vocab, short
    # window); partition invariance: coverage is corpus-defined, never
    # arrival-order-defined
    import random

    from bop_consus_importing_rdf_spark.operators.dedup import substring_dedup

    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(4)]
    window = 3
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(0, 14))).strip())
        for i in range(100)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in rows], "id long, text string"
    ).repartition(n_part)
    got = {
        r["id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in substring_dedup(df, "id", "text", window=window).collect()
    }
    ref_rows = [(i, t) for i, t in rows]
    assert got == _py_substring_dedup(ref_rows, window)


def test_line_dedup_normalized_key_keeps_verbatim_text(spark):
    from bop_consus_importing_rdf_spark.operators.dedup import line_dedup
    from bop_consus_importing_rdf_spark.operators.textstats import (
        ccnet_normalize,
    )

    rows = [
        # same boilerplate modulo case / digits / curly quotes / ws runs
        (1, "Visit  “our” site 2024\nunique one"),
        (2, "visit  “our” SITE 1999\nunique two"),
        (3, "clean line\nclean line"),  # within-doc dup still dedups
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(df, "id", "text", normalize=ccnet_normalize)
        .collect()
    }
    # doc 1's VERBATIM boilerplate survives (keep-first), doc 2's copy is
    # dropped despite differing in case, digits, quote glyphs and spacing
    assert got == {
        1: ("Visit  “our” site 2024\nunique one", 2, 2),
        2: ("unique two", 2, 1),
        3: ("clean line", 2, 1),
    }
    # sanity on the normalizer itself
    from pyspark.sql import functions as F

    out = (
        spark.range(1)
        .select(
            ccnet_normalize(
                F.lit(" A“B” 12 – x…  y ")
            ).alias("n")
        )
        .head()["n"]
    )
    assert out == 'a"b" 00 - x. y'


@_pytest.mark.parametrize("seed,pct,n_part", [(9, 60, 1), (31, 50, 7),
                                              (71, 80, 32)])
def test_prefix_jaccard_join_equals_brute_force(spark, seed, pct, n_part):
    # lossless-ness IS the contract: prefix filtering must emit exactly
    # the brute-force pair set at every threshold/partitioning
    import random
    from itertools import combinations

    from bop_consus_importing_rdf_spark.operators.dedup import (
        prefix_jaccard_join,
    )

    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(40)]
    rows, i = [], 0
    for base in range(20):
        t = " ".join(rng.choices(vocab, k=14))
        rows.append((i, t)); i += 1
        if base % 2 == 0:  # planted near-dup
            rows.append((i, t + " " + rng.choice(vocab))); i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(n_part)
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.n_a, r.n_b)
        for r in prefix_jaccard_join(df, threshold_pct=pct, n=2).collect()
    }

    def grams(t, n=2):
        toks = t.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}

    gs = {i: grams(t) for i, t in rows}
    ref = {}
    for a, b in combinations(sorted(gs), 2):
        inter = len(gs[a] & gs[b])
        union = len(gs[a] | gs[b])
        if inter and 100 * inter >= pct * union:
            ref[(a, b)] = (inter, len(gs[a]), len(gs[b]))
    assert got == ref
