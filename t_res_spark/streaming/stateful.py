"""Custom stateful streaming operator — per-conversation running state
via ``applyInPandasWithState``.

The reference processes each document's mentions against an in-memory
memo/context that accumulates as the document is read
(/root/reference/geoparser/ranking.py:315-316 memo-cache;
/root/reference/utils/rel_utils.py:145-153 sentence-context build-up).
The streaming analog: as turns of a conversation arrive over time, keep
a per-conversation state (turns seen, mentions seen, last-seen surface
per entity-ish key) and emit per-batch conversation summaries. This is
the ``applyInPandasWithState`` pattern the task brief names for custom
stateful operators: group = conv_id, state = counts + recent surfaces,
timeout = processing-time so idle conversations eventually flush.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..operators.extraction import extract_mentions_from_text

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turns_seen", T.LongType(), False),
        T.StructField("mentions_seen", T.LongType(), False),
        T.StructField("distinct_surfaces", T.LongType(), False),
        T.StructField("last_turn_idx", T.IntegerType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turns_seen", T.LongType(), False),
        T.StructField("mentions_seen", T.LongType(), False),
        T.StructField("surfaces", T.ArrayType(T.StringType()), False),
        T.StructField("last_turn_idx", T.IntegerType(), False),
    ]
)


def _update_conversation(key, pdfs, state: GroupState):
    (conv_id,) = key
    if state.exists:
        turns_seen, mentions_seen, surfaces, last_turn = state.get
        surfaces = list(surfaces)
    else:
        turns_seen, mentions_seen, surfaces, last_turn = 0, 0, [], -1
    for pdf in pdfs:
        for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
            turns_seen += 1
            last_turn = max(last_turn, int(turn_idx))
            for mention, _s, _e in extract_mentions_from_text(text):
                mentions_seen += 1
                if mention not in surfaces:
                    surfaces.append(mention)
    state.update((turns_seen, mentions_seen, surfaces, last_turn))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "turns_seen": [turns_seen],
            "mentions_seen": [mentions_seen],
            "distinct_surfaces": [len(surfaces)],
            "last_turn_idx": [last_turn],
        }
    )


def conversation_state_stream(stream: DataFrame) -> DataFrame:
    """transcript stream → per-conversation running summaries.

    One row per (conv_id, micro-batch); counters are cumulative across
    batches via the state store (checkpointed with the query — survives
    restarts, the streaming face of the engine's resumability story)."""
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
