"""Streaming SFT example construction.

Unbounded twin of ``kg/pipeline.sft_examples``: as transcript turns land,
emit one training pair per assistant turn with the previous ``K_CONTEXT``
turns as context. A custom stateful operator (``applyInPandasWithState``
keyed by ``conv_id``) keeps a BOUNDED per-conversation state — the last
``K_CONTEXT`` turns plus the highest turn index seen — so state size is
O(conversations × k), independent of stream length.

Delivery contract (same as ``stream_sessionize``): turns of one
conversation arrive in order across micro-batches; within a batch they
are sorted ``(turn_idx, ts, text)``. Double-delivered turn indices are
dropped keep-first — the same deterministic rule as the batch
``stable_turns`` when delivery respects that order. Late context can not
retro-update an already-emitted pair (the usual streaming emission
trade; the batch pipeline is the replayable source of truth).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

K_CONTEXT = 4
ASSISTANT_ROLE = "assistant"

_SFT_OUTPUT = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", LongType()),
        StructField("context", StringType()),
        StructField("response", StringType()),
        StructField("n_context_turns", LongType()),
    ]
)

#: (max turn_idx seen, last-k context turn indices / roles / texts)
_SFT_STATE = StructType(
    [
        StructField("max_idx", LongType()),
        StructField("ctx_idx", ArrayType(IntegerType())),
        StructField("ctx_role", ArrayType(StringType())),
        StructField("ctx_text", ArrayType(StringType())),
    ]
)


def _sft_state_func(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        max_idx, ctx_idx, ctx_role, ctx_text = state.get
        ctx = list(zip(ctx_idx, ctx_role, ctx_text))
    else:
        max_idx, ctx = None, []

    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["turn_idx", "ts", "text"])
        for turn_idx, role, text in zip(
            pdf["turn_idx"], pdf["role"], pdf["text"]
        ):
            ti = int(turn_idx)
            if max_idx is not None and ti <= max_idx:
                continue  # double delivery (keep-first under the contract)
            max_idx = ti
            if role == ASSISTANT_ROLE:
                out.append(
                    (
                        conv_id,
                        ti,
                        "\n".join(f"{r}: {x}" for _, r, x in ctx),
                        text,
                        len(ctx),
                    )
                )
            ctx.append((ti, role, text))
            if len(ctx) > K_CONTEXT:
                ctx.pop(0)

    state.update(
        (
            max_idx,
            [c[0] for c in ctx],
            [c[1] for c in ctx],
            [c[2] for c in ctx],
        )
    )
    yield pd.DataFrame(
        out,
        columns=[
            "conv_id", "turn_idx", "context", "response", "n_context_turns"
        ],
    )


def stream_sft_examples(transcripts: DataFrame) -> DataFrame:
    """SFT pairs over a stream of transcript turns (``conv_id, turn_idx,
    role, text, tool, ts``); batch-equal with
    ``sft_examples(k_context=4)`` when delivery honors the in-order
    contract (test-pinned across batch splits)."""
    return transcripts.groupBy("conv_id").applyInPandasWithState(
        _sft_state_func,
        outputStructType=_SFT_OUTPUT,
        stateStructType=_SFT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
