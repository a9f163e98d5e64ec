"""Custom stateful streaming operator via applyInPandasWithState.

Running per-key totals across micro-batches — the stateful analog of the
reference's two-phase frequency counting (ST2, SURVEY.md §2.8: rkmh needs
the global k-mer counter built BEFORE streaming because it has no state
abstraction; /root/reference/src/rkmh.cpp:744-769 left the precomputed-
counter loading unimplemented). With managed state the counter IS the
stream state: per shingle/event key, an (n, total) accumulator updated per
micro-batch, bounded by key cardinality not stream length.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n": [n], "total": [round(total, 6)]}
    )


def running_event_totals(events_stream: DataFrame) -> DataFrame:
    """stream(event_type, value, …) → per-key running (n, total)."""
    return (
        events_stream.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
