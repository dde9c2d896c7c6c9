"""Pre-training corpus preparation operators beyond filtering/dedup.

Three pipeline stages every large-scale training-data build needs and the
reference's catalogue scope stops short of (SURVEY §2.8 lists them as the
LLM-pipeline extension surface):

- :func:`redact_pii` — PII scrubbing (emails, IPv4 addresses, canonical
  phone numbers) as a pure ``regexp_replace`` chain. The C4/Dolma-style
  pass that must run over every byte of a 100 TB corpus, so it has to be
  a zero-shuffle JVM map — no Python, no UDF.
- :func:`sample_stratified` — deterministic per-stratum downsampling via
  md5 bucketing. Reproducible across engines and runs (no RNG state), a
  pure map, and the sampling decision embeds in the scan filter so
  Catalyst can pipeline it into the first stage.
- :func:`pack_sequences` — greedy token-budget packing of documents into
  training sequences, per shard. Real pipelines concatenate documents in
  a stable order and cut at the token budget; packing WITHIN a shard key
  (here ``source``) keeps the window partitioned — no global sort, no
  single-reducer cumulative sum at 100 TB.

Everything matches a DuckDB-SQL twin value-for-value (the driver oracle);
all expressions are built-in column functions, codegen-eligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# PII patterns. Kept deliberately engine-portable: every construct below
# (character classes, bounded repetition, \b) means the same thing to
# Java's regex engine (Spark) and RE2 (DuckDB). No backreferences, no
# lookaround — RE2 has neither.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(\d{1,3}\.){3}\d{1,3}\b"
#: canonical international-ish form only (+C-AAA-BBB-NNNN with - or space
#: separators); deliberately narrow — a greedy free-form phone regex is
#: where regex engines disagree and real pipelines over-redact.
PHONE_PATTERN = r"\+\d{1,2}[- ]\d{3}[- ]\d{3,4}[- ]\d{4}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _token_count(text: Column, token: str) -> Column:
    """Occurrences of a literal token via the length-difference trick —
    a memchr-speed substring scan instead of another full regex pass."""
    removed = F.replace(text, F.lit(token), F.lit(""))
    return ((F.length(text) - F.length(removed)) / len(token)).cast("long")


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4s / canonical phone numbers with typed tokens.

    Appends ``redacted`` (the scrubbed text) and per-category replacement
    counts ``n_emails`` / ``n_ips`` / ``n_phones``. Order matters and is
    fixed: emails first (an email's domain must not be half-eaten by the
    IP pass when it is dotted-numeric), then IPs, then phones. Pure column
    expressions — one projection, no shuffle.

    Throughput design (measured at 1M docs / 538 MB, local[32]): the
    email pattern's leading char class engages Java's backtracker at every
    letter position — 12.5s/pass vs 0.65s for the bare scan — so the
    email and phone passes are gated on a literal ``contains`` precheck
    ('@' / '+'): clean documents, the overwhelming majority of a real
    corpus, pay memchr instead of regex. Counts are derived from the
    inserted tokens by length difference (3 more regex passes saved);
    tokens already present in the input are netted out of the counts.
    """
    t = F.col(text_col)
    t1 = F.when(t.contains("@"), F.regexp_replace(t, EMAIL_PATTERN, EMAIL_TOKEN)).otherwise(t)
    t2 = F.regexp_replace(t1, IPV4_PATTERN, IP_TOKEN)
    t3 = F.when(t2.contains("+"), F.regexp_replace(t2, PHONE_PATTERN, PHONE_TOKEN)).otherwise(t2)
    base_email = _token_count(t, EMAIL_TOKEN)
    base_ip = _token_count(t, IP_TOKEN)
    base_phone = _token_count(t, PHONE_TOKEN)
    return (
        df.withColumn("_t1", t1)
        .withColumn("_t2", t2)
        .withColumn("redacted", t3)
        .withColumn("n_emails", _token_count(F.col("_t1"), EMAIL_TOKEN) - base_email)
        .withColumn("n_ips", _token_count(F.col("_t2"), IP_TOKEN) - base_ip)
        .withColumn("n_phones", _token_count(F.col("redacted"), PHONE_TOKEN) - base_phone)
        .drop("_t1", "_t2")
    )


#: keep-rate for domain d against the binding domain b, over columns
#: (s, t, t_b, s_b) — DECIMAL(38,0) so ``s·T_b·10⁶`` cannot wrap int64
#: (the BIGINT spelling overflowed past ~9×10⁹ binding-domain tokens
#: with shares near 1000‰ — ADVICE r5); integral ``div`` keeps the
#: result engine-exact vs the oracle's integer arithmetic
RATE_PPM_EXPR = (
    "(cast(s as decimal(38,0)) * t_b * 1000000)"
    " div (cast(s_b as decimal(38,0)) * t)"
)


def mix_domains(
    df: DataFrame,
    targets: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Deterministic corpus re-mixing to target per-domain TOKEN shares
    (the data-mixing knob — DoReMi, Xie et al. NeurIPS 2023, applies
    learned domain weights exactly like this; so do hand-tuned
    Pile/RedPajama mixes). ``targets`` maps domain → per-mille share.

    No domain can grow (subsampling only), so the mix is anchored on the
    BINDING domain — the one whose tokens run out first at its target
    share (min Tᵈ/sᵈ); every other domain is thinned to match:
    ``keep_rate_d = (s_d · T_b) / (s_b · T_d)``. Documents are kept by an
    md5 ppm draw on the id — reproducible under any partitioning, no rng
    state (the ``shuffle_shards``/``sample_stratified`` discipline).

    Plan: one token-count scan, one combinable per-domain sum, the
    binding-domain argmin on the (tiny) domain dimension, a broadcast
    rate join back, one filter. Rate arithmetic runs in DECIMAL(38,0)
    with integral division (engine-exact, same integral results as the
    previous BIGINT spelling): the BIGINT form overflowed int64 once
    ``s·T_b·10⁶`` passed 2⁶³ — with per-mille shares near 1000 that is
    only ~9×10⁹ tokens in the binding domain, well inside real corpus
    sizes, and Spark's default non-ANSI mode would have wrapped the rate
    silently (ADVICE r5). DECIMAL(38,0) holds ~10³⁸: safe past 10²⁸
    tokens. Shares are validated to (0, 1000]; >1000 would demand domain
    GROWTH, which subsampling cannot deliver.

    Returns kept rows: ``(id, domain, n_tokens, rate_ppm)``. Domains
    absent from ``targets`` are dropped entirely (share 0). Raises when
    a target domain has no rows — a silent mix hole otherwise.
    """
    from .textstats import whitespace_token_count

    if not targets or any(s <= 0 for s in targets.values()):
        raise ValueError("targets must be a non-empty dict of positive ‰")
    if any(s > 1000 for s in targets.values()):
        raise ValueError(
            "per-mille shares above 1000 are unsatisfiable by subsampling"
        )
    spark = df.sparkSession
    tdim = spark.createDataFrame(
        sorted(targets.items()), "domain string, s long"
    )
    tok = df.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        whitespace_token_count(F.col(text_col)).cast("long").alias(
            "n_tokens"
        ),
    )
    t_dom = tok.groupBy("domain").agg(F.sum("n_tokens").alias("t"))
    sized = tdim.join(t_dom, "domain", "left")
    missing = sized.filter(
        F.col("t").isNull() | (F.col("t") == 0)
    ).limit(1).collect()
    if missing:
        raise ValueError(
            f"target domain {missing[0]['domain']!r} has no tokens in the "
            "corpus — the requested mix is unsatisfiable"
        )
    binding = sized.select(
        F.min(
            F.struct(
                F.expr(
                    "cast(t as decimal(38,0)) * 1000000 div s"
                ).alias("_cap"),
                F.col("t").alias("t_b"),
                F.col("s").alias("s_b"),
            )
        ).alias("_m")
    ).select("_m.t_b", "_m.s_b")
    rates = sized.join(F.broadcast(binding), F.lit(True)).select(
        "domain",
        F.least(
            F.lit(1_000_000).cast("long"), F.expr(RATE_PPM_EXPR)
        ).alias("rate_ppm"),
    )
    hex8 = F.substring(F.md5(F.col("id").cast("string")), 1, 8)
    draw = F.conv(hex8, 16, 10).cast("long") % 1_000_000
    return (
        tok.join(F.broadcast(rates), "domain")
        .filter(draw < F.col("rate_ppm"))
        .select("id", "domain", "n_tokens", "rate_ppm")
    )


def md5_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from the md5 of the id's string
    form. Engine-portable: DuckDB computes the identical value as
    ``('0x' || substring(md5(id::varchar), 1, 8))::bigint % n``. Eight hex
    digits = 32 bits — fits a long with no overflow ambiguity.
    """
    hex8 = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % n_buckets).cast("int")


def sample_stratified(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
    n_buckets: int = 100,
) -> DataFrame:
    """Keep a deterministic ``rates[stratum]``/``n_buckets`` fraction of
    each stratum (e.g. downweight over-represented languages in a corpus
    mix). A row survives iff ``md5_bucket(id) < rate(stratum)``.

    Scale notes: the predicate is a pure function of the row — no
    sampling state, no shuffle, re-runs and backfills pick the exact same
    rows. Appends ``bucket`` so downstream audits can verify the rate.
    """
    bucket = md5_bucket(F.col(id_col), n_buckets)
    rate = F.lit(default_rate)
    # CASE chain over the (small, driver-known) rate table; an engine will
    # constant-fold per-stratum comparisons into the scan filter.
    for stratum in sorted(rates):
        rate = F.when(F.col(strata_col) == stratum, F.lit(rates[stratum])).otherwise(rate)
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < rate)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str = "source",
    order_col: str | None = None,
) -> DataFrame:
    """Assign each document to a training sequence of ~``budget`` tokens.

    Documents are laid out in ``id_col`` order within each ``shard_col``
    group (the unit real pipelines pack independently — one input shard,
    one packer); a document starts at the running token offset of its
    predecessors and belongs to ``seq_id = floor(start_offset / budget)``.
    This is the standard concatenate-then-cut packing: a document may
    straddle a boundary; its sequence is where it STARTS.

    Returns ``(id, shard, n_tokens, start_offset, seq_id)``.

    Scale notes: the only wide operation is a window partitioned by the
    shard key — cumulative sums never leave their shard, so there is no
    global sort and no single-reducer bottleneck; skewed shards are the
    caller's layout problem (same contract as any per-shard packer).
    ``order_col`` overrides the within-shard layout order (default: the
    id) for callers that lay out by a shuffled position rather than the
    id itself (:func:`prepare_corpus` packs in ``shuffle_shards``'
    ``pos`` order — inlined there so both windows share one exchange).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col or id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        F.col(token_col).cast("long").alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / F.lit(budget)).cast("long").alias("seq_id"),
    )


def shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int = 16
) -> DataFrame:
    """Deterministic global corpus shuffle into training shards.

    Every LLM data pipeline ends with "shuffle the corpus": examples must
    reach the trainer in an order uncorrelated with their source/crawl
    layout. A random shuffle is irreproducible; this one is a pure
    function of the row id — ``shard = md5_bucket(id, n_shards)`` and
    ``pos`` = rank of ``md5(id)`` within the shard (ties broken by id) —
    so re-runs, backfills and both engines produce the identical layout.
    md5 is uniform, so shards are balanced and the within-shard order is
    indistinguishable from random w.r.t. any input attribute.

    Returns the input columns plus ``shard`` and ``pos``.

    Scale shape: ONE exchange (hash on ``shard``) plus a per-shard sort —
    exactly the floor for any global shuffle; no global total order, no
    single reducer. Pick ``n_shards`` ≥ the writer parallelism of the
    target cluster (shards are the output-file unit; at 100 TB that is
    10⁴-10⁵, keeping each shard's sort in-memory).
    """
    sort_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy(sort_key, F.col(id_col))
    return df.withColumn(
        "shard", md5_bucket(F.col(id_col), n_shards).cast("long")
    ).withColumn("pos", F.row_number().over(w).cast("long"))


def _hashed_grams(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """One row per word unigram/bigram INSTANCE: ``(id, bucket)`` with
    ``bucket = md5_bucket(gram, n_buckets)`` — the DSIR paper's hashed
    bag-of-ngrams features (Xie et al. 2023, §3: unigrams+bigrams hashed
    into 10k buckets). Raw counts, NOT per-doc distinct — importance
    weights are over the token distribution, so multiplicity matters
    (unlike :func:`..dedup.word_ngrams`' set semantics).

    The token array is materialized in its own projection before the
    bigram ``transform`` (the measured O(tokens²) Catalyst re-eval trap,
    see word_ngrams); narrow inputs are fanned out before the explode
    (a 1-partition 1M-doc probe ran the md5 stage on one core).
    """
    from .parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df, multiplier=200)
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    t = F.col("_toks")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select("id", F.explode(F.concat(t, bigrams)).alias("_gram"))
        .select("id", md5_bucket(F.col("_gram"), n_buckets).alias("bucket"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    n_buckets: int = 8192,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR importance weights: how target-like is each raw document?

    Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
    fit bag-of-hashed-ngram unigram models of the target corpus ``p`` and
    the raw corpus ``q`` (add-one smoothed over ``n_buckets`` hash
    buckets), then weight each raw document by its log importance ratio
    ``log w(x) = Σ_g [log p(bucket(g)) − log q(bucket(g))]`` over the
    document's gram instances. Resampling-by-weight (the paper's top-k /
    Gumbel step) is the caller's one-liner on the returned column.

    Returns ``(id, n_grams, logw_q)`` for every raw document with ≥1
    gram, where ``logw_q`` is the integer-quantized log weight: each
    bucket's log ratio is ``floor(scale · ln((cnt_t+1)(R+B) /
    ((cnt_r+1)(T+B))))`` and the per-doc sum is pure BIGINT arithmetic —
    order-insensitive, so Spark and the DuckDB oracle agree exactly
    (the same quantize-then-integer-reduce discipline as the cosine and
    winnowing paths; doubles enter only inside the per-bucket ``ln``,
    where both engines evaluate the identical expression once).

    Scale shape: the corpus is read exactly TWICE — DSIR's floor (one
    pass to count ``q``, one to score). The count pass folds per-bucket
    counts AND the grand total into a single ``rollup`` aggregation
    (map-side combinable, B+1 output rows) whose tiny result is
    checkpointed, so the gram-explode subtree is never re-evaluated for
    the totals (the naive spelling evaluated it three times — measured
    at 1M docs). The only wide ops are two (B+1)-row count shuffles, a
    broadcast of the B-row λ table, and one ``(id, long)`` groupBy. The
    target side is small by nature (a quality slice / wiki / books),
    and nothing about it is ever driver-collected.
    """
    tcol = target_text_col or text_col
    raw_g = _hashed_grams(docs, id_col, text_col, n_buckets)
    tgt_g = _hashed_grams(target, id_col, tcol, n_buckets)
    # rollup = per-bucket counts + the NULL-bucket grand-total row in one
    # aggregation; buckets are md5 residues, never NULL, so the marker is
    # unambiguous. localCheckpoint (B+1 rows) because each frame has two
    # consumers (λ join + totals) whose re-evaluation would re-run the
    # full corpus explode.
    raw_cnt = (
        raw_g.rollup("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    tgt_cnt = (
        tgt_g.rollup("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    cnt_r = raw_cnt.filter(F.col("bucket").isNotNull()).select(
        "bucket", F.col("_n").alias("_cr")
    )
    cnt_t = tgt_cnt.filter(F.col("bucket").isNotNull()).select(
        "bucket", F.col("_n").alias("_ct")
    )
    totals = raw_cnt.filter(F.col("bucket").isNull()).select(
        F.col("_n").alias("_R")
    ).crossJoin(
        tgt_cnt.filter(F.col("bucket").isNull()).select(
            F.col("_n").alias("_T")
        )
    )
    # buckets needed for scoring are exactly cnt_r's keys (every scored
    # gram was counted), so the λ table is cnt_r ⟕ cnt_t — no dense
    # 0..B-1 frame needed; absent target buckets smooth to cnt_t = 0
    lam = (
        cnt_r.join(cnt_t, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                F.lit(scale)
                * F.log(
                    (
                        (F.coalesce(F.col("_ct"), F.lit(0)) + 1)
                        * (F.col("_R") + n_buckets)
                    ).cast("double")
                    / ((F.col("_cr") + 1) * (F.col("_T") + n_buckets)).cast(
                        "double"
                    )
                )
            )
            .cast("long")
            .alias("_lam"),
        )
    )
    return (
        raw_g.join(F.broadcast(lam), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("_lam").cast("long").alias("logw_q"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``n``-gram with an evaluation set (the GPT-3 appendix-C / PaLM
    13-gram rule — a training corpus must not contain eval text, verbatim
    OR partially quoted).

    Returns ``(id, n_hit_ngrams)`` — one row per contaminated document
    with the number of distinct leaked n-grams. Feed it to
    :func:`remove_contaminated` for the cleaned corpus.

    Scale shape: the benchmark side is SMALL by nature (eval suites are
    megabytes; the corpus is the 100 TB side), so its distinct n-gram set
    is broadcast — the corpus-side plan is explode → broadcast hash join
    → partial-agg count, zero corpus shuffles. The gram explode reuses
    :func:`..dedup.word_ngrams` (materialized token array, O(tokens) not
    O(tokens²)).
    """
    from .dedup import word_ngrams

    doc_grams = word_ngrams(docs, id_col, text_col, n)
    bench_grams = (
        word_ngrams(benchmark, bench_id_col, bench_text_col, n)
        .select("shingle")
        .distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_ngrams"))
    )


def remove_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """The cleaned corpus: ``docs`` minus every document
    :func:`decontaminate` flags (left anti join on the contaminated id
    set — the flag side is tiny relative to the corpus, broadcast)."""
    hits = decontaminate(
        docs, benchmark, id_col, text_col, bench_id_col, bench_text_col, n
    ).select(F.col("id").alias(id_col))
    return docs.join(F.broadcast(hits), id_col, "left_anti")


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    budget: int = 512,
    min_quality: float = 0.6,
    lang: str = "en",
    decontam_n: int = 13,
) -> DataFrame:
    """The composed end-to-end training-corpus preparation pipeline:
    exact dedup → quality/language/Gopher-repetition gates →
    benchmark decontamination → deterministic shuffle into shards →
    token-budget sequence packing in shuffle order.

    This is the pre-training twin of the KG side's ``kg_transcripts_e2e``
    flagship: every stage is an individually oracle-checked operator
    (:func:`..textstats.clean_corpus_gopher`, :func:`decontaminate`,
    :func:`shuffle_shards`, :func:`pack_sequences`) and the composition
    adds NO operator-level redundancy — the decontamination gram pass
    runs over the cleaned survivors only, and packing consumes the
    shuffle's ``pos`` directly.

    Returns the training-ready layout
    ``(doc_id, shard, pos, n_tokens, start_offset, seq_id)``.

    Scale shape (in stage order): one md5 groupBy + one semi join
    (dedup); pure codegen'd projections (quality / lang / repetition);
    explode → broadcast-hash join → anti join (decontamination — the
    eval-set gram side is broadcast, zero corpus shuffles); ONE hash
    exchange on shard + per-shard sort (shuffle + packing share the
    window partitioning — the packer's cumulative sum reuses the
    shuffle's exchange, so the whole tail is a single wide stage).
    """
    from .textstats import clean_corpus_gopher

    # (id, n_tokens) only — checkpointed because THREE consumers read it
    # (the semi-join, the decontamination input, the final anti-join);
    # left live, the whole gate subtree incl. its Arrow repetition stage
    # re-evaluates per consumer (measured 106.6s -> 79.8s at 1M docs)
    survivors = (
        clean_corpus_gopher(
            docs, id_col, text_col, min_quality=min_quality, lang=lang
        )
        .select(id_col, "n_tokens")
        .localCheckpoint(eager=False)
    )
    kept_docs = docs.join(survivors.select(id_col), id_col, "left_semi")
    hits = decontaminate(
        kept_docs, benchmark, id_col, text_col, n=decontam_n
    ).select(F.col("id").alias(id_col))
    clean = survivors.join(F.broadcast(hits), id_col, "left_anti")
    sharded = shuffle_shards(clean, id_col, n_shards=n_shards)
    # pack_sequences' cumulative-sum semantics inlined over the shuffle's
    # own (shard, pos) window: both window functions share one exchange +
    # one sort, so shuffle AND packing plan as a single wide stage (the
    # operator-reuse spelling re-joined pos back on id — a whole extra
    # shuffle for a column the window already had)
    w = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return sharded.select(
        F.col(id_col),
        "shard",
        "pos",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / F.lit(budget)).cast("long").alias("seq_id"),
    )


def score_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score_q",
) -> DataFrame:
    """CCNet-style corpus terciles: bucket every document into ``head`` /
    ``middle`` / ``tail`` by corpus-wide thirds of an integer score
    (Wenzek et al., LREC 2020 §4.3 — they bucket by LM perplexity and
    train preferentially on the head; lower score = better = head).

    Boundaries are score THRESHOLDS, not per-row ranks: ``t1`` is the
    smallest score whose cumulative count reaches ⌈N/3⌉ (integer test
    ``3·cum ≥ N``), ``t2`` likewise for 2N/3 — so tied scores always
    share a bucket and the assignment is engine-exact and deterministic
    (a head bucket can exceed N/3 by the size of the tie straddling the
    boundary). Pair with :func:`dsir_weights` (score = −logw_q) or any
    integer quality/perplexity proxy.

    Scale shape: ONE map-side-combinable ``groupBy(score).count()`` over
    the corpus; the cumulative sum then runs over the O(distinct scores)
    distribution table — a single-partition window over thousands-to-
    millions of rows, never the corpus (at 100 TB, quantized scores keep
    this table small; coarsen the quantization if a score column is
    near-unique). The two one-row thresholds broadcast via crossJoin and
    the final bucket assignment is a pure projection.
    """
    score = F.col(score_col).cast("long")
    d = (
        df.groupBy(score.alias("_s"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_cum",
            F.sum("_c").over(
                Window.orderBy("_s").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .localCheckpoint(eager=False)
    )
    n = d.agg(F.sum("_c").cast("long").alias("_n"))
    bounds = (
        d.crossJoin(F.broadcast(n))
        .agg(
            F.min(F.when(3 * F.col("_cum") >= F.col("_n"), F.col("_s"))).alias(
                "_t1"
            ),
            F.min(
                F.when(3 * F.col("_cum") >= 2 * F.col("_n"), F.col("_s"))
            ).alias("_t2"),
        )
    )
    return df.select(F.col(id_col).alias("id"), score.alias("score_q")).crossJoin(
        F.broadcast(bounds)
    ).select(
        "id",
        "score_q",
        F.when(F.col("score_q") <= F.col("_t1"), F.lit("head"))
        .when(F.col("score_q") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
