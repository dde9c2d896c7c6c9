"""Streaming exact deduplication: the batch corpus dedup's unbounded twin.

Continuously-arriving documents are deduplicated on content hash across
micro-batches with Spark's stateful streaming ``dropDuplicates``: the state
store holds one entry per DISTINCT content hash ever seen — the true lower
bound for exact dedup over an unbounded stream (the batch operator needs
the same information; here it is checkpointed, so a restarted job keeps
rejecting content it saw before the restart).

Semantics difference from the batch operator, on purpose: batch
``exact_dedup`` keeps the min-id representative of each duplicate group
(deterministic under any input order); a stream cannot wait for a
"minimum" that may arrive later, so the streaming operator keeps the
FIRST-ARRIVING document — the streaming-natural contract. On any prefix
of the stream processed as one batch, the set of surviving content hashes
is identical; only the representative ids may differ.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: documents-table schema (TESTDATA.md) for the file-source stream
DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    available_now: bool = True,
):
    """Start (and with ``available_now``, drain) the streaming dedup.

    Reads a parquet documents directory as a file stream, keeps the first
    arrival of every distinct ``md5(text)``, appends survivors (plus their
    ``content_md5``) to ``output_dir/data`` with exactly-once semantics
    from the checkpoint at ``output_dir/_checkpoint`` — re-running over a
    grown input directory processes only new files, and the dedup state
    survives the restart.

    Scale notes: the hash projection is stateless and map-side; the only
    stateful operator is ``dropDuplicates`` on the 32-char hash, which
    shuffles each micro-batch by hash to its state-store partition —
    state is O(distinct content), independent of duplicate volume.
    """
    docs = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    deduped = docs.withColumn("content_md5", F.md5(F.col("text"))).dropDuplicates(
        ["content_md5"]
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", f"{output_dir}/data")
        .option("checkpointLocation", f"{output_dir}/_checkpoint")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_line_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    delim: str = "\n",
    available_now: bool = True,
):
    """Streaming twin of :func:`..operators.dedup.line_dedup` (CCNet-style
    corpus-global line dedup over an unbounded document stream).

    Each arriving document is split into lines; the stateful
    ``dropDuplicates`` on ``md5(line)`` keeps only the FIRST-ARRIVING
    instance of every distinct line across all micro-batches (state =
    one entry per distinct line ever seen, checkpointed — a restarted
    job keeps rejecting lines it saw before the restart). Surviving
    documents are re-assembled from their surviving lines in original
    order and appended to ``output_dir/data`` as
    ``(doc_id, text, n_lines, n_kept)``.

    Re-assembly runs inside ``foreachBatch``: a document arrives as ONE
    stream row, so all of its exploded lines live in the same
    micro-batch and the per-doc groupBy is batch-local — no streaming
    aggregation state, no watermark needed. Same semantics difference
    from the batch operator as :func:`stream_exact_dedup`, on purpose:
    batch keep-first is the global (id, pos) minimum; a stream keeps the
    first ARRIVAL. On any prefix processed as one batch the surviving
    LINE SET is identical; which document keeps a shared line may
    differ.
    """
    from ..operators.dedup import exploded_lines, reassemble_lines_aggs

    lines = (
        exploded_lines(
            spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir),
            "doc_id",
            "text",
            delim,
        )
        .withColumnRenamed("id", "doc_id")
        .withColumn("line_md5", F.md5(F.col("line")))
        .dropDuplicates(["line_md5"])
    )

    def _reassemble(batch_df, _batch_id):
        (
            batch_df.groupBy("doc_id")
            .agg(*reassemble_lines_aggs(delim))
            .write.mode("append")
            .parquet(f"{output_dir}/data")
        )

    writer = (
        lines.writeStream.foreachBatch(_reassemble)
        .option("checkpointLocation", f"{output_dir}/_checkpoint")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
