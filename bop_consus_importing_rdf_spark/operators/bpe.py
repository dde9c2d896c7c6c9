"""BPE tokenizer training over a document corpus.

Byte-pair encoding merge learning (Sennrich, Haddow & Birch, *Neural
Machine Translation of Rare Words with Subword Units*, ACL 2016 §3.2):
collapse the corpus to a word-frequency table, represent each word as a
symbol sequence (initially characters), and repeatedly merge the
corpus-wide most frequent adjacent symbol pair. The reference repo has no
tokenizer surface — this is LLM-pipeline extension scope (SURVEY §2.8):
the merge table IS the tokenizer a pre-training pipeline ships.

Scale shape: the corpus is read ONCE — the word-frequency groupBy is
map-side combinable, and every merge iteration runs over the VOCABULARY
table (|V| rows — millions at web scale, never the token stream). Each
iteration is one combinable pair-count aggregation plus one row-local
string rewrite; the winning pair (a single row) is read to the driver as
a bounded dimension read (the IVF-centroid discipline) and embedded as a
literal so plan lineage stays flat, with a ``localCheckpoint`` per
iteration truncating it.

Merge application is EXACT greedy left-to-right, engine-portably: each
symbol is wrapped ``\\x02sym\\x03``, so one adjacent pair occurrence is
the literal string ``\\x02a\\x03\\x02b\\x03`` — occurrences are disjoint
(no shared separator) and a plain non-regex ``replace`` IS the BPE merge.
A whitespace-split token that itself contains the marker bytes raises
loudly rather than mis-merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: symbol wrap markers (STX/ETX — cannot appear in sane text; guarded)
SYM_OPEN = "\x02"
SYM_CLOSE = "\x03"


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(word, cnt)`` — corpus word-frequency table (trim + ``\\s+``
    split, the corpus tokenization convention; blank docs contribute
    nothing). One map-side-combinable groupBy; loud guard on words
    carrying the wrap markers."""
    toks = F.explode(
        F.when(
            F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    ).alias("word")
    words = df.select(toks)
    guarded = F.when(
        F.col("word").contains(SYM_OPEN) | F.col("word").contains(SYM_CLOSE),
        F.raise_error(
            F.concat(
                F.lit("word contains BPE wrap marker bytes (0x02/0x03): "),
                F.col("word"),
            )
        ),
    ).otherwise(F.col("word"))
    return (
        words.select(guarded.alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _wrapped_chars(word) -> "F.Column":
    """Initial symbol sequence: every character wrapped
    ``\\x02c\\x03``."""
    return F.concat_ws(
        "",
        F.transform(
            # per-codepoint extraction: F.split keeps a trailing "" (Java
            # split limit -1), which would inject an empty symbol
            F.regexp_extract_all(word, F.lit("."), 0),
            lambda c: F.concat(F.lit(SYM_OPEN), c, F.lit(SYM_CLOSE)),
        ),
    )


def _symbols(repr_col: str) -> "F.Column":
    """Wrapped representation → symbol array (empty repr → empty)."""
    r = F.col(repr_col)
    body = r.substr(F.lit(2), F.length(r) - 2)
    return F.when(r == "", F.array().cast("array<string>")).otherwise(
        F.split(body, SYM_CLOSE + SYM_OPEN)
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol table:
    ``(lhs, rhs, c)``."""
    syms = _symbols("repr")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda j: F.struct(
                F.element_at(syms, j).alias("lhs"),
                F.element_at(syms, j + 1).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        vocab.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").alias("c"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    ``(rank, lhs, rhs, c)`` — rank 1 = first (most frequent) merge, ``c``
    its weighted pair count at selection time. Ties break
    deterministically by ``(lhs, rhs)`` ascending, so the table is
    reproducible under any partitioning. Stops early (fewer rows) when no
    adjacent pair remains."""
    spark = df.sparkSession
    vocab = (
        word_frequencies(df, text_col)
        .select("word", "cnt", _wrapped_chars(F.col("word")).alias("repr"))
        .localCheckpoint()
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("lhs"), F.col("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], top[0]["c"]
        merges.append((rank, lhs, rhs, c))
        old = SYM_OPEN + lhs + SYM_CLOSE + SYM_OPEN + rhs + SYM_CLOSE
        new = SYM_OPEN + lhs + rhs + SYM_CLOSE
        vocab = vocab.select(
            "word", "cnt",
            F.replace(F.col("repr"), F.lit(old), F.lit(new)).alias("repr"),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, c bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per word, replay the
    merges in rank order (the standard BPE encoder) and emit the symbol
    sequence per document as ``array<string>`` (space-joined words'
    symbols concatenated in order). Row-local — no shuffle."""
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))

    def apply_merges(word):
        r = _wrapped_chars(word)
        for lhs, rhs in merges:
            old = SYM_OPEN + lhs + SYM_CLOSE + SYM_OPEN + rhs + SYM_CLOSE
            new = SYM_OPEN + lhs + rhs + SYM_CLOSE
            r = F.replace(r, F.lit(old), F.lit(new))
        return r

    reprs = F.transform(toks, apply_merges)
    segmented = F.flatten(
        F.transform(
            reprs,
            lambda r: F.when(r == "", F.array().cast("array<string>"))
            .otherwise(
                F.split(
                    r.substr(F.lit(2), F.length(r) - 2),
                    SYM_CLOSE + SYM_OPEN,
                )
            ),
        )
    )
    return df.withColumn(out_col, segmented)
