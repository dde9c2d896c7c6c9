"""Streaming SFT pairs: batch parity across micro-batch splits."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

from bop_consus_importing_rdf_spark.kg.pipeline import sft_examples
from bop_consus_importing_rdf_spark.streaming.sft import stream_sft_examples

T0 = datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _rows():
    out = []
    for c in range(6):
        conv = f"c{c}"
        for t in range(8):
            role = "assistant" if t % 2 == 1 else ("tool" if t == 4 else "user")
            out.append(
                (conv, t, role, f"{conv}-t{t} says {t * c}", None,
                 T0 + timedelta(seconds=t))
            )
    # double delivery of one turn (later ts) — keep-first must drop it
    out.append(("c1", 3, "assistant", "dup!", None, T0 + timedelta(hours=1)))
    return out


def test_stream_sft_batch_parity(spark, tmp_path):
    rows = _rows()
    # in-order split: each conversation's turns land across 3 batches in
    # turn order (the module's delivery contract)
    batches = [
        [r for r in rows if r[1] < 3],
        [r for r in rows if 3 <= r[1] < 6],
        [r for r in rows if r[1] >= 6],
    ]
    in_dir = str(tmp_path / "in")
    for i, b in enumerate(batches, 1):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/f{i}"
        )
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/*")
    )
    q = (
        stream_sft_examples(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sft_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.turn_idx): (r.context, r.response, r.n_context_turns)
        for r in spark.sql("SELECT * FROM sft_stream").collect()
    }
    batch = {
        (r.conv_id, r.turn_idx): (r.context, r.response, r.n_context_turns)
        for r in sft_examples(
            spark.createDataFrame(rows, SCHEMA), k_context=4
        ).collect()
    }
    assert got == batch
    assert len(got) == 6 * 4  # 4 assistant turns per conversation
