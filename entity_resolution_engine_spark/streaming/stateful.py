"""Custom stateful streaming operator: per-domain crawl-rate monitor.

The one streaming shape ``session_window``/watermark aggregations can't
express: state that is an arbitrary PYTHON value evolved per group per
micro-batch — here an exponentially weighted moving average of each
domain's events-per-trigger, flagging batches that spike past a factor
of the learned rate (a crawler trap / mirror-burst detector for the
ingest side of the pipeline).

Built on ``applyInPandasWithState`` (Arrow-batched, the supported
custom-state API): groups are hash-partitioned by domain, each
partition's state lives in the state store (RocksDB-backed on a real
cluster), and the per-group state payload is a fixed ~24 bytes — at
100 TB the state size is O(active domains), independent of page
volume, and the only shuffle is the groupBy hash exchange.

Reference analog: the observability anomaly pass
(/root/reference/entity_resolution_engine/observability/anomalies.py)
is batch z-score over run history; this is its streaming counterpart
where "history" cannot be re-scanned per event.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RATE_OUTPUT = StructType(
    [
        StructField("domain", StringType()),
        StructField("batch_events", LongType()),
        StructField("ewma_before", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("is_spike", BooleanType()),
        StructField("n_batches", LongType()),
    ]
)

_STATE = StructType(
    [
        StructField("n_batches", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def make_rate_monitor_fn(alpha: float, spike_factor: float):
    """The per-group update: one output row per (domain, trigger).

    A batch is a spike when the domain already has history and its
    event count exceeds ``spike_factor ×`` the pre-batch EWMA.  The
    EWMA then absorbs the batch (``alpha·count + (1-alpha)·ewma``) so a
    sustained new rate stops alarming after ~1/alpha triggers —
    deterministic given the trigger partitioning, which tests pin with
    one file per trigger."""

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        count = 0
        for pdf in pdfs:
            count += len(pdf)
        if state.exists:
            n_batches, ewma = state.get
            before: Any = float(ewma)
            is_spike = count > spike_factor * before
            new_ewma = alpha * count + (1.0 - alpha) * before
        else:
            n_batches, before = 0, None
            is_spike = False
            new_ewma = float(count)
        state.update((n_batches + 1, float(new_ewma)))
        yield pd.DataFrame(
            {
                "domain": [key[0]],
                "batch_events": [count],
                "ewma_before": [before],
                "ewma": [float(new_ewma)],
                "is_spike": [is_spike],
                "n_batches": [n_batches + 1],
            }
        )

    return update


def domain_rate_monitor(
    events: DataFrame,
    domain_col: str = "domain",
    alpha: float = 0.3,
    spike_factor: float = 3.0,
) -> DataFrame:
    """events (streaming, any schema with ``domain_col``) → one row per
    (domain, trigger) carrying the batch count, the learned EWMA rate,
    and the spike flag.  Output mode must be ``update``."""
    return (
        events.selectExpr(f"{domain_col} as domain")
        .groupBy("domain")
        .applyInPandasWithState(
            make_rate_monitor_fn(alpha, spike_factor),
            outputStructType=RATE_OUTPUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
