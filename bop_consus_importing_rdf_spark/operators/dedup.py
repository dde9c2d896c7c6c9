"""Deduplication family for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — all as pure DataFrame compositions. The MinHash
implementation is the generic blocking machinery the KG canonicalizer reuses
for entity similarity.

Hash choice: md5-of-salted-string, minimum taken LEXICOGRAPHICALLY over hex
digests. md5 is available and byte-identical in Spark and DuckDB, making
every stage oracle-checkable; a lexicographic min over a salted cryptographic
hash is a valid min-wise family. At raw 100 TB scale swap the hex strings
for ``xxhash64`` longs (8 bytes vs 32) — same plan shape.

Scale notes:
- shingling explodes ~|text| rows per doc; the heavy shuffle is the
  ``groupBy(id, shingle)`` dedup and the band self-join. Band keys are
  ~uniform (hash values), so the self-join is skew-free by construction;
  pathological duplicate-heavy buckets are split by AQE skew handling.
- the pair space never materializes beyond bucket-local candidates — that is
  the whole point of LSH at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import minhash_hex


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def char_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Distinct lowercase character n-grams per document: ``(id, shingle)``."""
    from .parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df, multiplier=200)
    norm = F.lower(F.col(text_col))
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            norm.alias("_t"),
            F.explode(positions).alias("_p"),
        )
        .select("id", F.expr(f"substring(_t, _p, {n})").alias("shingle"))
        .distinct()
    )


def word_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-grams per document: ``(id, shingle)``.

    The token array MUST be materialized in its own projection before the
    ``transform`` that slices it: written inline, Catalyst substitutes the
    ``split`` expression into the lambda body, where it re-evaluates per
    n-gram — O(tokens²) regex splits per document. Measured at 50k docs /
    2.6M n-grams (sf1): 32s inlined vs 3.4s with the two-step projection,
    a 9.4× difference that grows with document length.

    Per-document dedup is ``array_distinct`` BEFORE the explode, not a
    global ``.distinct()`` after it: a document's grams all live in one
    row, so the set is row-local — the global spelling shuffles the
    entire exploded n-gram stream (corpus-token-count × n bytes) for a
    dedup that never crosses a row. Requires ``id_col`` to be unique per
    input row (true for every corpus table here; duplicate ids would
    need the global distinct back).
    """
    from .parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df, multiplier=200)
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    t = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return df.select(F.col(id_col).alias("id"), toks.alias("_toks")).select(
        "id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-content dedup: keep the min-id representative per md5(text).

    Returns ``(id, rep_id, content_md5)`` for every row, so callers can
    either filter ``id == rep_id`` (keep one) or audit duplicate groups.
    """
    with_h = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_md5")
    )
    reps = with_h.groupBy("content_md5").agg(F.min("id").alias("rep_id"))
    return with_h.join(reps, "content_md5").select("id", "rep_id", "content_md5")


# ---------------------------------------------------------------------------
# line-level exact dedup (CCNet-style)
# ---------------------------------------------------------------------------

def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    normalize=None,
) -> DataFrame:
    """Corpus-global line/paragraph-level exact dedup, keep-first.

    The CCNet pre-deduplication step (Wenzek et al., *CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data*, LREC 2020,
    §4.2 "Deduplication"): split every document into lines/paragraphs on
    ``delim``, hash each line, and keep only the FIRST occurrence of each
    distinct line across the whole corpus — boilerplate (nav bars, cookie
    banners, license footers) repeats across pages, so dropping repeated
    lines removes it without a trained model. Documents are then
    re-assembled from their surviving lines in original order.

    Keep-first is defined on ``(id, pos)``: the instance with the
    lexicographically smallest (document id, line position) survives.
    ``normalize`` (a ``Column → Column`` function, e.g.
    ``textstats.ccnet_normalize``) is applied to each line BEFORE hashing
    only — CCNet's actual discipline: typographically-divergent copies of
    the same boilerplate collide, while the surviving text stays the
    verbatim input. ``None`` hashes the line as-is.

    Returns one row per document that keeps ≥1 line:
    ``(id, text, n_lines, n_kept)`` — original line count vs survivors.
    Documents whose every line was seen earlier vanish from the output
    (CCNet drops them); ``n_kept < n_lines`` marks partially-stripped
    docs.

    Scale shape (the 100 TB property this buys): exactly TWO exchanges
    and the corpus is read ONCE. The keep-first winner per line is a
    ``groupBy(md5(line)).agg(min(struct(id, pos, line, n_lines)))`` —
    a map-side-combinable partial aggregation, so a line duplicated
    10⁹ times (the empty-footer pathology) collapses to one row per map
    task BEFORE the shuffle; no join back against the line stream, no
    skewed window. The second exchange is the per-document re-assembly
    groupBy. Reference scope: the reference dedups whole catalogue
    records only (duplicate-id warnings, Flows.kt:106-112); line-grain
    dedup is the LLM-pipeline extension surface (SURVEY §2.8).
    """
    from .parallelism import ensure_min_parallelism

    # the explode fans each doc into ~n_lines rows; modest vs shingling
    df = ensure_min_parallelism(df, multiplier=8)
    lines = exploded_lines(df, id_col, text_col, delim)
    key = F.col("line") if normalize is None else normalize(F.col("line"))
    # min(struct) — (id, pos) is unique, so the trailing fields never
    # tie-break; they just ride along to avoid a join back to the stream
    kept = (
        lines.groupBy(F.md5(key).alias("_h"))
        .agg(F.min(F.struct("id", "pos", "line", "n_lines")).alias("_k"))
        .select("_k.id", "_k.pos", "_k.line", "_k.n_lines")
    )
    return kept.groupBy("id").agg(*reassemble_lines_aggs(delim))


def exploded_lines(
    df: DataFrame, id_col: str, text_col: str, delim: str
) -> DataFrame:
    """``(id, n_lines, pos, line)`` — one row per line of every document.

    Shared by :func:`line_dedup` and the streaming twin so the split
    spelling can never drift between them. ``delim`` is a LITERAL
    delimiter: it is regex-escaped before ``F.split`` (which takes a Java
    regex) so that split and the re-join in :func:`reassemble_lines_aggs`
    (a literal ``array_join``) are symmetric for any delimiter —
    ``delim="."`` or ``"|"`` would otherwise split on every position.
    """
    import re

    pattern = re.escape(delim)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), pattern)).alias("n_lines"),
        F.posexplode(F.split(F.col(text_col), pattern)).alias("pos", "line"),
    )


def reassemble_lines_aggs(delim: str) -> list[Column]:
    """The per-document reassembly aggregates over ``(pos, line,
    n_lines)`` rows: surviving lines re-joined in original order, plus
    the original/kept line counts. Shared batch/stream (see
    :func:`exploded_lines`)."""
    return [
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            delim,
        ).alias("text"),
        F.max("n_lines").alias("n_lines"),
        F.count(F.lit(1)).alias("n_kept"),
    ]


# ---------------------------------------------------------------------------
# duplicated-substring removal (ExactSubstr-style)
# ---------------------------------------------------------------------------

def substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Remove duplicated substrings from every document (token-level
    ExactSubstr, Lee et al., *Deduplicating Training Data Makes Language
    Models Better*, ACL 2022, §4.1).

    The paper finds all substrings ≥50 tokens that occur more than once
    in the corpus (suffix array) and removes EVERY occurrence. This is
    the token-window formulation of the same contract: a ``window``-token
    gram occurring >1 time anywhere in the corpus (across documents OR
    repeated within one) marks its token span duplicated; the union of
    marked spans is cut from each document and the survivors are
    re-joined in order. Any duplicated run of ≥ ``window`` tokens is
    covered exactly (every window inside it repeats); runs shorter than
    ``window`` are kept — the paper's length threshold, expressed as the
    window size. Tokenization is the corpus convention (``trim`` +
    whitespace split, see ``textstats``), so reassembly normalizes
    whitespace runs to single spaces.

    Returns one row per input document:
    ``(id, clean_text, n_tokens, n_removed)`` — fully-duplicated
    documents survive with ``clean_text = ''`` (callers drop/audit them;
    unlike :func:`line_dedup` nothing silently vanishes).

    Scale shape: the corpus is scanned twice (gram stream, token stream)
    and never driver-collected. The duplicated-gram set is ONE
    map-side-combinable ``groupBy(md5(gram))`` — the pathological
    boilerplate gram repeated 10⁹ times collapses in the combiners —
    followed by a semi join back on the 32-byte hash (AQE handles the
    hot-hash skew). Coverage is LINEAR: duplicated starts equi-join the
    token stream on ``(id, pos)`` and a per-document running
    ``max(start)`` over the previous ``window`` rows decides each token
    (a start within the last ``window`` positions covers it) — the
    first-cut spelling exploded each start into ``window`` covered
    positions and anti-joined, and the 1M-doc probe killed it: Catalyst
    planned the 712M-row exploded side as the anti join's BROADCAST
    build (explodes defeat size estimation) and died on the broadcast
    row cap; the ×window integer fan-out was also a needless 20× stream.
    The window partitions by document (bounded) and its sort is reused
    by the reassembly groupBy. The token array is materialized in its
    own projection before the gram ``transform`` (the
    :func:`word_ngrams` O(tokens²) Catalyst-substitution trap).
    """
    from pyspark.sql import Window

    from .parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df, multiplier=50)
    t = F.col("_toks")
    base = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_toks"),
    )
    grams = base.select(
        "id",
        F.posexplode(
            F.when(
                F.size(t) >= window,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (window - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, window))),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("p0", "h"),
    ).select("id", (F.col("p0") + 1).alias("start"), "h")
    dup = (
        grams.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    # (id, start) is unique (one gram per position) — no distinct needed
    starts = grams.join(dup, "h", "left_semi").select(
        "id", F.col("start").alias("pos"), F.lit(True).alias("_dup")
    )
    tok_rows = base.select(
        "id", F.posexplode(t).alias("p0", "tok")
    ).select("id", (F.col("p0") + 1).alias("pos"), "tok")
    # positions are dense per document, so a ROWS frame of the previous
    # window-1 rows is exactly the positions (pos-window, pos]
    w = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    marked = tok_rows.join(starts, ["id", "pos"], "left").withColumn(
        "_covered",
        F.max(F.when(F.col("_dup"), F.col("pos"))).over(w).isNotNull(),
    )
    kept = marked.filter(~F.col("_covered"))
    reasm = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("id", F.size(t).alias("n_tokens"))
        .join(reasm, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(shingles: DataFrame, k: int = 8) -> DataFrame:
    """``(id, mh0..mh{k-1})`` — k independent min-wise hashes per doc."""
    aggs = [
        F.min(minhash_hex(F.col("shingle"), p)).alias(f"mh{p}") for p in range(k)
    ]
    return shingles.groupBy("id").agg(*aggs)


def band_signatures(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """``(id, band_idx, band_key)`` — one row per (doc, band); the shared
    banding spelling for the self-join, star, and index-match paths."""
    band_structs = []
    for b in range(bands):
        cols = [
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws("|", *cols).alias("band_key"),
            )
        )
    return signatures.select(
        "id", F.explode(F.array(*band_structs)).alias("band")
    ).select("id", "band.band_idx", "band.band_key")


def lsh_match_index(
    new_sigs: DataFrame,
    index_sigs: DataFrame,
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Incremental near-dup: match a NEW batch against an EXISTING
    signature index — the production ingestion shape, where the corpus's
    MinHash signatures are landed once (ideally bucketed by band key,
    ``sources/bucketed.py``) and each arriving batch only joins its own
    bands against the index instead of re-shingling 100 TB per delta.

    Returns ``(new_id, index_id, n_agree)`` for every candidate pair
    colliding on ≥1 band, where ``n_agree`` = number of agreeing minhash
    components out of ``k`` — the standard unbiased Jaccard estimator
    (Broder 1997), ``est_jaccard = n_agree / k``; an integer, so the
    DuckDB oracle matches exactly. Callers wanting exact Jaccard join
    document text by id for the verify pass (the index stores 32-byte
    signatures, not shingle sets).

    ``max_bucket`` defaults ON (4096): this is a clustering-style
    ingestion path where a hot band bucket (boilerplate) must not go
    quadratic — the cap counts BOTH sides' band rows, the same degenerate-
    shingle rationale as :func:`minhash_dedup`.
    """
    nb = band_signatures(new_sigs, bands, rows_per_band)
    ib = band_signatures(index_sigs, bands, rows_per_band)
    if max_bucket is not None:
        counts = (
            nb.unionByName(ib)
            .groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
        nb = nb.join(counts, ["band_idx", "band_key"], "left_semi")
    cand = (
        nb.select("band_idx", "band_key", F.col("id").alias("new_id"))
        .join(
            ib.select("band_idx", "band_key", F.col("id").alias("index_id")),
            ["band_idx", "band_key"],
        )
        .select("new_id", "index_id")
        .distinct()
    )
    n_agree = sum(
        F.when(F.col(f"_n_mh{p}") == F.col(f"_i_mh{p}"), 1).otherwise(0)
        for p in range(k)
    )
    new_ren = new_sigs.select(
        F.col("id").alias("new_id"),
        *[F.col(f"mh{p}").alias(f"_n_mh{p}") for p in range(k)],
    )
    idx_ren = index_sigs.select(
        F.col("id").alias("index_id"),
        *[F.col(f"mh{p}").alias(f"_i_mh{p}") for p in range(k)],
    )
    return (
        cand.join(new_ren, "new_id")
        .join(idx_ren, "index_id")
        .select(
            "new_id", "index_id", n_agree.cast("long").alias("n_agree")
        )
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature and self-join on band key → candidate ``(id_a, id_b)``.

    Docs agreeing on ALL rows of ≥1 band become candidates. The join key is
    ``(band_idx, band_key)`` — uniformly distributed, shuffle-friendly.

    ``max_bucket`` caps the bucket size of the self-join: buckets larger
    than it are SKIPPED — a deliberate recall trade, so the default here is
    ``None``: this is the exhaustive pair-LISTING API, and silently
    dropping a pair whose only collision falls in a hot bucket would
    violate its contract (ADVICE r3). The clustering paths
    (:func:`lsh_candidate_star_pairs`, :func:`minhash_dedup`) keep the cap
    on by default, where connectivity — not pair completeness — is the
    contract. Rationale for capping there: a band bucket of size B
    contributes B²/2 candidate pairs, so one boilerplate-driven hot bucket
    (shared template tokens inflating n-gram overlap — a real failure mode:
    the sf1 scale probe measured 13.3M candidates from 50k docs, of which
    2,556 were true pairs, 57× wall-clock) turns the linear LSH plan
    quadratic, and a 4096+ bucket at a sane banding config is evidence of
    degenerate shingles, not near-duplicates. When a caller does pass a
    cap here, the DuckDB oracle twins apply the identical cap.
    """
    banded = band_signatures(signatures, bands, rows_per_band)
    if max_bucket is not None:
        # map-side-combinable count per bucket, then a semi-join that keeps
        # only rows of sane buckets — the shuffle carries one row per
        # bucket, not per member
        ok = (
            banded.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
        banded = banded.join(ok, ["band_idx", "band_key"], "left_semi")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def lsh_candidate_star_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Bucket-star candidates for CLUSTERING dedup: each bucket member
    pairs with the bucket's min-id representative only — ``B-1`` edges per
    bucket instead of ``B²/2``, with identical bucket CONNECTIVITY (a star
    spans its clique), which is all connected-components needs.

    This is the standard large-scale minhash-dedup shape (verify members
    against a representative, not all-pairs): the round-3 sf1 probe
    measured the all-pairs form at 78M candidate pairs from 50k documents
    on a high-overlap corpus — it filled the machine's spill disk — while
    the star form emits ~bands × docs edges worst-case. The semantic
    difference vs all-pairs sits in the verification step: an edge is kept
    only if the member verifies against the REPRESENTATIVE, so a member
    similar to other bucket members but not to the rep can stay unmerged —
    acceptable for dedup clustering, wrong for exhaustive pair LISTING
    (use :func:`lsh_candidate_pairs` there).
    """
    banded = band_signatures(signatures, bands, rows_per_band)
    if max_bucket is not None:
        ok = (
            banded.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
        banded = banded.join(ok, ["band_idx", "band_key"], "left_semi")
    reps = banded.groupBy("band_idx", "band_key").agg(
        F.min("id").alias("id_a")
    )
    return (
        banded.join(reps, ["band_idx", "band_key"])
        .filter(F.col("id") != F.col("id_a"))
        .select("id_a", F.col("id").alias("id_b"))
        .distinct()
    )


def prefix_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_pct: int = 80,
    n: int = 3,
) -> DataFrame:
    """EXACT all-pairs Jaccard ≥ threshold join via prefix filtering
    (Bayardo, Ma & Srikant, *Scaling Up All Pairs Similarity Search*,
    WWW 2007; Chaudhuri et al. ICDE 2006) — the LOSSLESS counterpart to
    the MinHash/SimHash paths: every qualifying pair is emitted, no
    probabilistic recall.

    Prefix filter: with each document's n-gram set sorted by global
    rarity, two sets with Jaccard ≥ t MUST share a token within each
    other's first ``|x| − ⌈t·|x|⌉ + 1`` tokens — so candidates come from
    a self-join on PREFIX tokens only, and rare-first ordering keeps
    those join keys low-frequency (the hot boilerplate token lands in
    nobody's prefix). No global integer rank is materialized: the sort
    key is the ``(frequency, token)`` pair itself, so there is no
    single-partition ranking window to bottleneck at scale.

    ``threshold_pct`` is an integer percent and the filter is integer
    arithmetic (``100·|A∩B| ≥ pct·|A∪B|``) — engine-exact by
    construction. Returns ``(id_a, id_b, n_inter, n_a, n_b)``.
    """
    shingles = word_ngrams(df, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        shingles.join(freq, "shingle")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("c", "shingle"))
            ).alias("_toks"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    prefix_len = (
        F.col("sz")
        - F.ceil(F.col("sz") * threshold_pct / F.lit(100)).cast("long")
        + 1
    )
    prefix = per_doc.select(
        "id",
        F.explode(
            F.transform(
                F.slice(F.col("_toks"), F.lit(1), prefix_len),
                lambda s: s["shingle"],
            )
        ).alias("shingle"),
    )
    cand = (
        prefix.alias("l")
        .join(
            prefix.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("_n"))
    out = (
        _intersections(cand, shingles)
        .join(sizes.select(F.col("id").alias("id_a"),
                           F.col("_n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"),
                           F.col("_n").alias("n_b")), "id_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return out.filter(
        F.col("n_inter") * 100 >= F.lit(threshold_pct) * union
    ).select(
        "id_a", "id_b",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    )


def _intersections(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    sh_a = shingles.select(F.col("id").alias("id_a"), "shingle")
    sh_b = shingles.select(F.col("id").alias("id_b"), "shingle")
    return (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )


def jaccard_pairs(
    pairs: DataFrame, shingles: DataFrame, threshold: float = 0.6
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs, filtered to ≥ threshold."""
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = _intersections(pairs, shingles)
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    fps: DataFrame,
    threshold: float = 0.5,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Asymmetric near-dup detection over winnowing fingerprints: pairs
    where the SMALLER document's fingerprint set is largely shared —
    ``containment = |A∩B| / min(|A|, |B|)`` — the quote/subset case
    (Schleimer et al., SIGMOD 2003 §2: copy detection, not similarity).
    Jaccard-based MinHash misses these by construction: a short document
    fully contained in a long one has near-zero Jaccard but containment 1.

    Input is ``(id, fingerprint)`` distinct (:func:`...textstats.fingerprints`).
    Candidates are pairs sharing ≥1 fingerprint — the standard
    copy-detection index join. Fingerprint selectivity is what bounds the
    bucket join on real text (high-entropy k-grams); ``max_bucket`` drops
    stop-gram-like fingerprints shared by more than that many documents
    (the same linearity guard as :func:`lsh_candidate_pairs`; a
    fingerprint half the corpus shares identifies nothing anyway).

    Returns ``(id_a, id_b, n_shared, containment)`` with id_a < id_b,
    filtered to ≥ threshold.
    """
    sizes = fps.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    b = fps
    if max_bucket is not None:
        ok = (
            fps.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") <= max_bucket)
            .select("fingerprint")
        )
        b = fps.join(ok, "fingerprint")
    lhs = b.select("fingerprint", F.col("id").alias("id_a"))
    rhs = b.select("fingerprint", F.col("id").alias("id_b"))
    shared = (
        lhs.join(rhs, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "containment",
            (F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b"))).cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.col("n_shared").cast("long").alias("n_shared"), "containment")
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Near-dup clustering: ``(id, rep_id)`` — rep = min id of the near-dup
    cluster (connected component over the similarity edges).

    Candidates come from :func:`lsh_candidate_star_pairs` (bucket-star):
    clustering needs bucket connectivity, not the bucket clique, so the
    candidate count is linear in corpus size even on high-overlap corpora
    where the all-pairs form goes quadratic (78M pairs / disk-full at 50k
    docs in the sf1 probe). The DuckDB twin mirrors the star shape."""
    from ..kg.cc import connected_components

    sh = char_shingles(df, id_col, text_col, shingle_n)
    sig = minhash_signature(sh, k)
    cand = lsh_candidate_star_pairs(sig, bands, k // bands, max_bucket)
    edges = jaccard_pairs(cand, sh, threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(edges)
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(
        comp.withColumnRenamed("node", "id"), "id", "left"
    ).select(
        "id", F.coalesce("component", F.col("id")).alias("rep_id")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document: ``(id, simhash)``.

    Token hash = first 8 hex chars of md5 (portable); per-bit majority vote
    over tokens. Pure column ops: tokens × 32 bit-rows explode, two
    aggregations. Near-dups then pair on small hamming distance.
    """
    from .parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df, multiplier=200)
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    )
    bits = toks.select(
        "id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit")
    ).withColumn(
        "vote",
        F.when(F.expr("shiftright(h, bit)").bitwiseAND(1) == 1, 1).otherwise(-1),
    )
    return (
        bits.groupBy("id", "bit")
        .agg(F.sum("vote").alias("v"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(0)
            ).alias("simhash")
        )
    )


def simhash_near_pairs(simhashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """32-bit variant — small corpora only; see :func:`simhash_near_pairs64`.

    At ~10⁵+ docs a 32-bit hash saturates (birthday collisions → false
    merges) and 8-bit blocks give only 256 distinct keys per block, so the
    per-block self-join degenerates quadratically. The 64-bit/16-bit-block
    variant below is the scale path.
    """
    blocks = simhashes.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * 8)
                        .bitwiseAND(255)
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", "b.blk", "b.key")
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash as TWO 32-bit halves: ``(id, simhash_hi, simhash_lo)``.

    Token hash = md5 hex chars 1-8 (hi) and 9-16 (lo) — portable and
    oracle-checkable; per-bit majority vote over tokens. Carrying the hash
    as two sub-2³² longs sidesteps every engine's signed-64-bit overflow
    dialect (``1<<63``) while keeping the full 64-bit discrimination the
    32-bit variant lacks at corpus scale.
    """
    from .parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df, multiplier=200)
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn(
            "h_hi", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        )
        .withColumn(
            "h_lo", F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long")
        )
    )
    bits = toks.select(
        "id", "h_hi", "h_lo",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
    ).withColumn(
        "vote",
        F.when(
            F.when(
                F.col("bit") < 32, F.expr("shiftright(h_lo, bit)")
            ).otherwise(F.expr("shiftright(h_hi, bit - 32)")).bitwiseAND(1)
            == 1,
            1,
        ).otherwise(-1),
    )
    return (
        bits.groupBy("id", "bit")
        .agg(F.sum("vote").alias("v"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(
                    (F.col("v") > 0) & (F.col("bit") >= 32),
                    F.expr("shiftleft(1L, bit - 32)"),
                ).otherwise(0)
            ).alias("simhash_hi"),
            F.sum(
                F.when(
                    (F.col("v") > 0) & (F.col("bit") < 32),
                    F.expr("shiftleft(1L, bit)"),
                ).otherwise(0)
            ).alias("simhash_lo"),
        )
    )


def simhash_near_pairs64(
    simhashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near pairs via 4×16-bit block LSH over the 64-bit hash.

    Pigeonhole: ≤3 flipped bits leave ≥1 of the 4 blocks identical. 16-bit
    keys give 65 536 buckets per block — expected bucket size N/65 536, so
    the per-block self-join stays near-linear far beyond the 8-bit variant's
    256-bucket ceiling. Exact hamming = popcount over both halves.
    """
    blocks = simhashes.select(
        "id",
        "simhash_hi",
        "simhash_lo",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("blk"),
                         F.shiftright("simhash_hi", 16).alias("key")),
                F.struct(F.lit(1).alias("blk"),
                         F.col("simhash_hi").bitwiseAND(65535).alias("key")),
                F.struct(F.lit(2).alias("blk"),
                         F.shiftright("simhash_lo", 16).alias("key")),
                F.struct(F.lit(3).alias("blk"),
                         F.col("simhash_lo").bitwiseAND(65535).alias("key")),
            )
        ).alias("b"),
    ).select("id", "simhash_hi", "simhash_lo", "b.blk", "b.key")
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            (
                F.bit_count(
                    F.col("l.simhash_hi").bitwiseXOR(F.col("r.simhash_hi"))
                )
                + F.bit_count(
                    F.col("l.simhash_lo").bitwiseXOR(F.col("r.simhash_lo"))
                )
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (semantic dedup)
# ---------------------------------------------------------------------------

def embedding_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 96,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int | None = 512,
    quantized: bool = False,
) -> DataFrame:
    """Semantic (embedding-cosine) near-dup clustering: ``(id, rep_id)`` —
    rep = min id of the cosine-near-dup cluster (connected component over
    ``cosine >= threshold`` edges).

    The SemDeDup shape (Abbas et al. 2023, arXiv:2303.09540) re-expressed
    with the repo's LSH machinery: candidate buckets come from
    random-hyperplane band keys (:func:`.similarity.rhp_signature` —
    deterministic ±1 planes, engine-reproducible) instead of k-means
    cells. Unlike the minhash star (where bucket membership itself implies
    probable similarity), a coarse RHP bucket is just a partition — a
    star against its min-id member would test near-dup edges against a
    RANDOM representative and lose them. So dedup banding must be
    HIGH-SELECTIVITY: ``n_planes // bands`` bits per band (default 24 →
    2^24 keys per band) makes shared buckets near-dup evidence and keeps
    buckets singleton-ish up to ~10^8 rows, and candidates are the
    within-bucket CLIQUE (tiny B, so B² is linear overall), capped by
    ``max_bucket`` against degenerate mass-duplicate buckets (same
    contract as :func:`minhash_dedup`'s cap). ``bands`` is the recall
    knob: P(candidate) = 1-(1-(1-θ/π)^bits)^bands — ~1.0 for exact/scaled
    copies, ~0.8 at cosine 0.99, falling toward the threshold boundary;
    more bands buy recall linearly in signature cost.

    ``quantized=True`` floors each float to ``floor(x*1000)`` long before
    BOTH the signature and the cosine (exact integer dot products
    accumulated in double, single final sqrt-of-product division) — every
    stage byte-identical to the DuckDB twin, same trick as
    ``rhp_ann_topk``.

    Scale: signature cost is ``n_planes × dim`` multiply-adds per row
    (one array-literal ``transform``); the bucket self-join shuffles on
    the band key (uniform by plane construction) and carries ONLY
    ``(band_key, id)`` — candidate pairs are deduplicated as bare 16-byte
    id pairs and the vectors re-attached by two id-joins just before the
    cosine, so the pair shuffle never carries ``2 × dim`` floats per row
    (a 1M-row probe with degenerate near-cap buckets spilled >60 GB in
    the vector-carrying spelling). ``max_bucket`` bounds per-bucket pair
    fan-out at ``max_bucket²/2``; at 24-bit band selectivity an over-full
    bucket means mass near-identical vectors — run exact dedup first,
    the same contract as :func:`minhash_dedup`'s cap. The cap bounds but
    does not eliminate the quadratic term: a corpus whose duplicates
    cluster JUST UNDER the cap still emits up to ``n_buckets·cap²/2``
    candidates (a 1M-vector probe with 500-wide exact-dup clusters under
    the 512 cap OOM'd on ~10⁹ pairs — that input is the run-exact-dedup-
    first case, not a near-dup workload). No stage is super-linear in
    corpus size for corpora that honor that contract.
    """
    from ..kg.cc import connected_components
    from .similarity import _dot, cosine, rademacher_planes, rhp_signature_np

    planes = rademacher_planes(n_planes, dim, seed)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
    if quantized:
        v = v.withColumn(
            "_v",
            F.transform(
                F.col("_v"),
                lambda x: F.floor(x.cast("double") * 1000).cast("long"),
            ),
        )
    # numpy signature (23× the HOF expression at this plane count) is a
    # Python producer with THREE downstream consumers (cap agg, semi-join
    # probe, pair self-join) — localCheckpoint so ArrowEvalPython runs
    # once and the self-join reads a materialized exchange-free source.
    banded = v.select(
        "id",
        F.explode(
            rhp_signature_np(planes, bands, quantized)(F.col("_v"))
        ).alias("band_key"),
    ).localCheckpoint(eager=False)
    if max_bucket is not None:
        ok = (
            banded.groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
        banded = banded.join(ok, "band_key", "left_semi")
    pairs = (
        banded.select("band_key", F.col("id").alias("id_a"))
        .join(banded.select("band_key", F.col("id").alias("id_b")), "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        pairs.join(
            v.select(F.col("id").alias("id_a"), F.col("_v").alias("_va")),
            "id_a",
        )
        .join(
            v.select(F.col("id").alias("id_b"), F.col("_v").alias("_vb")),
            "id_b",
        )
    )
    if quantized:
        sim = _dot(F.col("_va"), F.col("_vb")) / F.sqrt(
            _dot(F.col("_va"), F.col("_va")) * _dot(F.col("_vb"), F.col("_vb"))
        )
    else:
        sim = cosine(F.col("_va"), F.col("_vb"))
    edges = (
        cand.select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(edges)
    all_ids = vectors.select(F.col(id_col).alias("id"))
    return all_ids.join(
        comp.withColumnRenamed("node", "id"), "id", "left"
    ).select("id", F.coalesce("component", F.col("id")).alias("rep_id"))
