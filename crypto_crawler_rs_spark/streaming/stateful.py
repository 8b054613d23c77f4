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


TRAP_OUT_SCHEMA = (
    "host string, pattern string, url string, suppressed boolean, "
    "template_count long"
)
TRAP_STATE_SCHEMA = "n_urls long"


def trap_gate(candidates: DataFrame, min_urls: int = 50) -> DataFrame:
    """Streaming twin of the batch trap suppression
    (operators/traps.py / FrontierConfig.trap_min_urls): cumulative
    per-(host, digit-masked template) url counts carried in
    GroupState across micro-batches; once a template's count reaches
    ``min_urls`` every FURTHER url of that template is suppressed.

    Boundary semantics vs the batch round loop (ADVICE r4): this gate
    decides PER URL — the first ``min_urls`` urls of a template are
    admitted, suppression starts at url ``min_urls + 1``.  The batch
    path (FrontierScheduler trap suppression) decides PER ROUND — the
    whole round's urls for a template are dropped as soon as the
    cumulative count INCLUDING that round reaches the threshold, so
    urls that arrive in the threshold-crossing round die in batch but
    the first ``min_urls`` of them survive here.  A stream cannot
    retro-drop urls it already emitted, so the per-url rule is the
    tightest batch-compatible one; do not expect row-identical output
    from the two paths around the boundary.

    ``candidates``: streaming DF with (host, pattern, url) — the
    masking itself stays a JVM expression upstream (see
    tests/test_stateful_streaming.py for the wiring) so only the
    counter lives in Python.  Deterministic: urls are processed in
    url order within each batch-group.  Like the batch path, the
    count is an upper bound under at-least-once replay — conservative
    in the suppressing direction.
    """

    def gate(key, pdfs, state):
        host, pattern = key
        n = state.get[0] if state.exists else 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            pdf = pdf.sort_values("url", kind="mergesort")
            counts = n + np.arange(1, len(pdf) + 1)
            # a url is suppressed once the template already had
            # >= min_urls urls BEFORE it
            suppressed = (counts - 1) >= min_urls
            n = int(counts[-1])
            yield pd.DataFrame(
                {
                    "host": host,
                    "pattern": pattern,
                    "url": pdf["url"].to_numpy(),
                    "suppressed": suppressed,
                    "template_count": counts,
                }
            )
        state.update((n,))

    return candidates.groupBy("host", "pattern").applyInPandasWithState(
        gate,
        outputStructType=TRAP_OUT_SCHEMA,
        stateStructType=TRAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
