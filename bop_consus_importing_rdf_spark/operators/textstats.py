"""Text analysis for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (winnowing over rolling k-gram hashes).

Everything is built-in column expressions — JVM-side, codegen'd, no Python in
the hot path — and every statistic has exact DuckDB-SQL-equivalent semantics
so the driver oracle can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic.
# chosen to be disjoint; all-lowercase, matched as whole words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "mit"],
    "es": ["el", "la", "los", "es", "con"],
    "fr": ["le", "la", "les", "est", "avec"],
}

# BPE-ish token pattern: letter runs | digit runs | single non-space symbol
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: unicode punctuation → ASCII fold used by :func:`ccnet_normalize`
#: (curly quotes, guillemets, dashes, ellipsis, NBSP). ``F.translate`` /
#: DuckDB ``translate`` share per-codepoint semantics, so the fold is
#: engine-exact by construction.
CCNET_PUNCT_FROM = "\u201c\u201d\u2018\u2019\u00ab\u00bb\u2013\u2014\u2026\u00a0"
CCNET_PUNCT_TO = "\"\"''\"\"--. "


def ccnet_normalize(text: Column) -> Column:
    """CCNet-style text normalization (Wenzek et al., LREC 2020 §4.2):
    lowercase, every digit → ``0``, unicode punctuation folded to ASCII,
    whitespace runs collapsed, trimmed. CCNet applies this before hashing
    lines for dedup so near-identical boilerplate (dates, counters,
    typographic quotes) collides — the surviving TEXT stays verbatim;
    only the hash sees the normalized form (see :func:`~.dedup.line_dedup`
    ``normalize=``). Accent stripping (CCNet's optional unidecode pass)
    is out of scope: no engine-exact twin exists across Spark/DuckDB.
    """
    t = F.lower(text)
    t = F.regexp_replace(t, "[0-9]", "0")
    t = F.translate(t, CCNET_PUNCT_FROM, CCNET_PUNCT_TO)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Occurrences of any marker word, via padded substring counts."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0)
    for w in words:
        needle = f" {w} "
        count = (
            F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))
        ) / len(needle)
        total = total + count
    return total.cast("int")


def lang_id(text: Column) -> Column:
    """Argmax language over marker-word hit counts; 'und' when all zero.

    Deterministic tie-break: language code ascending. Expressed as an
    explicit CASE chain — ``code_i`` wins iff its hits ≥ max(hits of every
    later code, 1) — the exact shape the DuckDB oracle uses, so both
    engines agree by construction.
    """
    codes = sorted(LANG_MARKERS)
    hits = {c: _marker_hits(text, LANG_MARKERS[c]) for c in codes}
    expr = F.lit("und")
    for i in range(len(codes) - 1, -1, -1):
        rest = [hits[c] for c in codes[i + 1 :]] + [F.lit(1)]
        cond = hits[codes[i]] >= (
            F.greatest(*rest) if len(rest) > 1 else rest[0]
        )
        expr = F.when(cond, F.lit(codes[i])).otherwise(expr)
    return expr


def whitespace_token_count(text: Column) -> Column:
    """Tokens by whitespace split (empty string → 0)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features + a composite [0,1] score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = whitespace_token_count(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_hits = _marker_hits(t, LANG_MARKERS["en"])
    mean_wlen = F.when(n_tokens > 0, (F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens)).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    # composite: long enough, not punctuation soup, some function words,
    # word lengths in a natural band
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.25
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.25
        + F.when((mean_wlen >= 3) & (mean_wlen <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.25
    )
    return (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("mean_word_len", mean_wlen.cast("double"))
        .withColumn("quality_score", score.cast("double"))
    )


def fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 7,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003 §4 — the
    paper's actual Karp-Rabin rolling-hash formulation).

    Per char position a k-gram hash; per sliding window of ``window``
    consecutive grams keep the minimum; a document's fingerprint set =
    the distinct selected hashes. Shared fingerprints ⇒ shared
    substrings — the standard plagiarism / near-dup localizer.

    Returns ``(id, fingerprint)`` with ``fingerprint`` a 62-bit BIGINT:
    two independent 31-bit Horner hashes (bases 257/263 over codepoints,
    mod 2³¹−1) packed as ``h1·2³¹ + h2`` — collision space 2⁶², integer
    arithmetic exactly reproducible in any engine (the DuckDB oracle
    recomputes it with ``list_reduce``). Windows truncate at the
    document tail; documents shorter than ``k`` hash their whole text;
    empty text → fingerprint 0.

    Scale shape — ZERO shuffles and ZERO per-gram JVM expression
    evaluation: the selection is per-document, so everything is
    row-local. The two rejected spellings, both measured: explode every
    char position → per-id window-min → global distinct shuffles ~530
    (id, pos, hash) rows PER DOCUMENT twice (>570s at 1M docs); the
    higher-order-function ``transform`` spelling is shuffle-free but
    interpreted per element — ~31s per 100k docs REGARDLESS of hash
    function (md5 33.6s / xxhash64 30.6s / crc32 31.1s — the HOF
    machinery dominates, not the hash). Arrow-batched numpy computes the
    same thing vectorized: the k-1 Horner steps and window minima are
    whole-array ops, ~10 numpy kernels per document.
    """
    from .parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df, multiplier=200)
    id_type = df.schema[id_col].dataType.simpleString()
    mod, b1, b2 = (1 << 31) - 1, 257, 263

    def winnow(batches):
        import re as _re

        import numpy as np
        import pandas as pd

        # ASCII \s: Java (old JVM spelling) and RE2 (DuckDB oracle)
        # whitespace classes are ASCII-only; Python's default is not
        ws = _re.compile(r"\s+", _re.ASCII)
        for pdf in batches:
            ids = pdf[id_col].values
            counts = np.empty(len(ids), dtype=np.int64)
            chunks = []
            for row_i, raw in enumerate(pdf[text_col].values):
                t = ws.sub(" ", raw or "").lower()
                cp = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = cp.size
                if n == 0:
                    fps = np.zeros(1, dtype=np.int64)
                else:
                    kk = k if n >= k else n
                    m = n - kk + 1
                    h1 = cp[:m].copy()
                    h2 = cp[:m].copy()
                    for j in range(1, kk):
                        c = cp[j:j + m]
                        h1 *= b1
                        h1 += c
                        h1 %= mod
                        h2 *= b2
                        h2 += c
                        h2 %= mod
                    gh = (h1 << 31) + h2
                    mins = gh.copy()
                    for s in range(1, window):
                        if s >= m:
                            break
                        np.minimum(mins[: m - s], gh[s:], out=mins[: m - s])
                    fps = np.unique(mins)
                counts[row_i] = fps.size
                chunks.append(fps)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, counts),
                    "fingerprint": (
                        np.concatenate(chunks)
                        if chunks
                        else np.array([], dtype=np.int64)
                    ),
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        winnow, f"id {id_type}, fingerprint long"
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, Table A1):
    the fraction of tokens that are repeats, and the fraction of n-grams
    claimed by the single most frequent n-gram (n = 2, 3). Boilerplate /
    generated spam scores high on all three; the published cuts drop
    documents past ~0.2-0.6 depending on n.

    Returns ``(doc_id, dup_token_frac, top_bigram_frac, top_trigram_frac)``
    for every document with ≥1 token; a document shorter than n tokens has
    NULL for that n's fraction (no grams to measure).

    Plan shape at scale: these are PER-DOCUMENT statistics — no
    cross-document aggregation exists, so no shuffle should either.
    Tokenization stays JVM-side (:func:`_lower_tokens`, so the token
    semantics are identical to the filter-chain spelling by
    construction); the mode counting runs as ONE Arrow-batched numpy
    stage. Three spellings measured at 1M docs (BENCH/BASELINE.md):
    explode + two map-side-combinable aggs shuffled ~3× the corpus
    tokens (89.3s); the zero-shuffle JVM higher-order-function
    sort_array + run-length fold (kept as
    :func:`repetition_stats_columns` for the gopher filter chain) is
    interpreted per element (40.6s); this Arrow path is 16.0s —
    value-exact equal to both.
    """
    base = (
        df.select(
            F.col(id_col).alias(id_col),
            _lower_tokens(F.col(text_col)).alias("toks"),
        )
        .filter(F.size(F.col("toks")) >= 1)
    )
    id_type = df.schema[id_col].dataType.simpleString()

    def stats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n_rows = len(pdf)
            dup = np.empty(n_rows)
            big = pd.array([pd.NA] * n_rows, dtype="Float64")
            tri = pd.array([pd.NA] * n_rows, dtype="Float64")
            for r, tl in enumerate(pdf["toks"].values):
                t = list(tl)
                n = len(t)
                dup[r] = 1.0 - len(set(t)) / n
                if n >= 2:
                    g = [t[i] + " " + t[i + 1] for i in range(n - 1)]
                    _, c = np.unique(g, return_counts=True)
                    big[r] = int(c.max()) / (n - 1)
                if n >= 3:
                    g = [
                        t[i] + " " + t[i + 1] + " " + t[i + 2]
                        for i in range(n - 2)
                    ]
                    _, c = np.unique(g, return_counts=True)
                    tri[r] = int(c.max()) / (n - 2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "dup_token_frac": dup,
                    "top_bigram_frac": big,
                    "top_trigram_frac": tri,
                }
            )

    return base.mapInPandas(
        stats,
        f"{id_col} {id_type}, dup_token_frac double, "
        "top_bigram_frac double, top_trigram_frac double",
    )


def repetition_stats_columns(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The pure-column-expression spelling of :func:`repetition_stats`
    (sort_array + O(n) run-length fold). Kept because the SAME column
    functions (:func:`dup_token_frac` / :func:`top_ngram_frac`) compose
    into :func:`clean_corpus_gopher`'s zero-extra-exchange filter chain,
    where a mapInPandas stage cannot; proven value-equal to the Arrow
    path by test + the 20k-slice A/B (BENCH/BASELINE.md)."""
    toks = _lower_tokens(F.col(text_col))
    return df.select(F.col(id_col).alias(id_col), toks.alias("toks")).filter(
        F.size(F.col("toks")) >= 1
    ).select(
        id_col,
        dup_token_frac(F.col("toks")).alias("dup_token_frac"),
        top_ngram_frac(F.col("toks"), 2).alias("top_bigram_frac"),
        top_ngram_frac(F.col("toks"), 3).alias("top_trigram_frac"),
    )


def _lower_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens; empty/blank text → [] (a bare split
    of '' yields [''])."""
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(F.trim(text)), r"\s+")
    )


def _ngrams(toks: Column, n: int) -> Column:
    # guard: sequence(1, size-n+1) DESCENDS when size < n — emit []
    seq = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(seq, lambda i: F.array_join(F.slice(toks, i, n), " "))


def _max_run(arr: Column) -> Column:
    """Longest run in a SORTED array == count of its most frequent
    element. One O(n) fold; null-safe start (prev=null ≠ first)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.sort_array(arr), zero, step, lambda acc: acc["best"])


def dup_token_frac(toks: Column) -> Column:
    """Fraction of tokens that repeat an earlier token (row-local)."""
    return (F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks)).cast("double")


def top_ngram_frac(toks: Column, n: int) -> Column:
    """Fraction of n-grams claimed by the single most frequent n-gram;
    NULL when the document is shorter than n tokens (row-local)."""
    grams = _ngrams(toks, n)
    return F.when(F.size(toks) >= n, (_max_run(grams) / F.size(grams))).cast("double")


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.6,
    lang: str = "en",
) -> DataFrame:
    """The canonical pre-training corpus filter chain, composed from the
    operators above: exact-content dedup (min-id representative survives)
    → quality gate → language gate.

    Plan shape at scale: one map-side-combinable md5 groupBy + one semi
    join for the dedup, then pure codegen'd column expressions — no
    additional shuffle for scoring or language id. Returns surviving
    ``(id_col, lang_pred, n_tokens, quality_score)`` rows.
    """
    from .dedup import exact_dedup

    reps = (
        exact_dedup(df, id_col, text_col)
        .filter(F.col("id") == F.col("rep_id"))
        .select(F.col("id").alias(id_col))
    )
    kept = df.join(reps, id_col, "left_semi")
    scored = quality_features(kept, text_col).withColumn(
        "lang_pred", lang_id(F.col(text_col))
    )
    return scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("lang_pred") == lang)
    ).select(id_col, "lang_pred", "n_tokens", "quality_score")


def clean_corpus_gopher(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.6,
    lang: str = "en",
    max_dup_token_frac: float = 0.6,
    max_top_bigram_frac: float = 0.05,
    max_top_trigram_frac: float = 0.04,
) -> DataFrame:
    """:func:`clean_corpus` extended with the Gopher repetition gates
    (Rae et al. 2021): drop documents whose duplicate-token or top-2/3-gram
    fractions exceed the cuts.

    The repetition fractions are row-local column expressions (see
    :func:`repetition_stats`), so the composed chain costs NOTHING extra
    at scale: still exactly one md5 groupBy + one semi join (the dedup);
    scoring, language id, and all three repetition gates evaluate in the
    same projection. A document too short to measure an n-gram fraction
    (NULL) passes that gate — shortness is not repetition.
    """
    from .dedup import exact_dedup

    reps = (
        exact_dedup(df, id_col, text_col)
        .filter(F.col("id") == F.col("rep_id"))
        .select(F.col("id").alias(id_col))
    )
    kept = df.join(reps, id_col, "left_semi")
    toks = _lower_tokens(F.col(text_col))
    scored = (
        quality_features(kept, text_col)
        .withColumn("lang_pred", lang_id(F.col(text_col)))
        .withColumn("dup_token_frac", dup_token_frac(toks))
        .withColumn("top_bigram_frac", top_ngram_frac(toks, 2))
        .withColumn("top_trigram_frac", top_ngram_frac(toks, 3))
    )
    return scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("lang_pred") == lang)
        & (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)) <= max_top_bigram_frac)
        & (F.coalesce(F.col("top_trigram_frac"), F.lit(0.0)) <= max_top_trigram_frac)
    ).select(
        id_col,
        "lang_pred",
        "n_tokens",
        "quality_score",
        "dup_token_frac",
        "top_bigram_frac",
        "top_trigram_frac",
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    scale: int = 10**6,
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF (Spärck Jones 1972 idf form
    ``ln(N/df)`` — the classic keyword-extraction/relevance signal a
    corpus-analysis pipeline runs to profile domains and build indexes).

    Returns ``(id, rk, term, tf, score_q)`` — the ``k`` highest-scoring
    terms per document, ``rk`` 1-based, ties broken by term ASC so the
    result is total-order deterministic. ``score_q = tf ·
    floor(scale · ln(N/df))`` keeps the ranking integer-exact across
    engines: the double ``ln`` is evaluated once per distinct term from
    identical inputs in both engines (the dsir_weights discipline), and
    everything after it is BIGINT arithmetic. Terms appearing in every
    document get ``ln(N/N) = 0`` — rank floor, as idf intends.

    Scale shape: one ``(id, term)`` count (map-side combinable), one
    ``term`` document-frequency count over the distinct-by-construction
    tf table (also combinable — hot terms collapse before the shuffle),
    the single-row corpus count broadcast via crossJoin, the df table
    joined back on ``term``, and a per-document window for the top-k
    (partitioned by doc — no global sort). The df table is O(vocabulary);
    at web scale it broadcasts or bucket-joins, never the corpus.
    """
    from .parallelism import ensure_min_parallelism

    base = ensure_min_parallelism(df, multiplier=30)
    toks = base.select(
        F.col(id_col).alias("id"),
        F.explode(_lower_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    # corpus size = docs contributing >=1 token == docs with non-blank
    # text (the _lower_tokens [] condition) — a column-pruned count scan,
    # NOT a second evaluation of the token explode
    n_docs = base.filter(F.trim(F.col(text_col)) != "").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            (
                F.col("tf")
                * F.floor(
                    F.lit(scale)
                    * F.log(
                        F.col("_n").cast("double") / F.col("_df").cast("double")
                    )
                ).cast("long")
            ).alias("score_q"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_q").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("id", F.col("rk").cast("long").alias("rk"), "term", "tf", "score_q")
    )
