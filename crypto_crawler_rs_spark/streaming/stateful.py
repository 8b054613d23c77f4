"""Custom stateful streaming operator: per-host politeness gate.

The reference enforces uplink budgets with a token bucket carried in
connection state (governor quota,
crypto-ws-client/src/common/connect_async.rs:72-77) that survives
across frames of the same connection.  The Structured-Streaming
analog is ``applyInPandasWithState``: the budget counter is GroupState
keyed by host, carried across micro-batches and restored from the
streaming checkpoint on restart.

Each incoming fetch request is admitted while the host's cumulative
admitted-count is below ``budget``; the rest are emitted as
``deferred`` (they would re-enter a later window in a full deploy).
Deterministic: requests are processed in (priority, url) order within
each batch-group, mirroring the batch pop operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "host string, url string, priority long, admitted boolean, admitted_so_far long"
STATE_SCHEMA = "admitted long"


def budget_gate(requests: DataFrame, budget: int = 5) -> DataFrame:
    """requests: streaming DF with (host, url, priority).  Returns
    each request with an ``admitted`` decision; at most ``budget``
    admissions per host over the stream's lifetime (cumulative state)."""

    def gate(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        admitted = state.get[0] if state.exists else 0
        # a group larger than arrow maxRecordsPerBatch arrives as
        # MULTIPLE chunks — concatenate before sorting so admissions
        # follow the global (priority, url) order within the group,
        # matching the batch pop operator (operators/pop.py)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["priority", "url"], kind="mergesort")
            # vectorized admission: in (priority, url) order, row i is
            # admitted iff fewer than `budget` admissions precede it —
            # i.e. prior-state admissions plus its rank in this group.
            decisions = (admitted + np.arange(len(pdf))) < budget
            counts = admitted + np.cumsum(decisions)
            admitted = int(counts[-1]) if len(counts) else admitted
            out = pd.DataFrame(
                {
                    "host": host,
                    "url": pdf["url"].to_numpy(),
                    "priority": pdf["priority"].to_numpy(),
                    "admitted": decisions,
                    "admitted_so_far": counts,
                }
            )
            yield out
        state.update((admitted,))

    return requests.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
