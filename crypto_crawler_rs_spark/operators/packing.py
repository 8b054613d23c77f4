"""Greedy command bin-packing — the one genuinely sequential-per-group
operator (SURVEY.md §2.10 pack_commands).

The reference packs subscription topics into websocket command frames
under TWO budgets simultaneously: a byte budget (4096 bytes binance,
crypto-ws-client/src/clients/binance.rs:24-26) and a max-topic count
(kucoin 100, bitmex 20), greedily in a fixed order
(``ensure_frame_size``, crypto-ws-client/src/common/utils.rs:3-38).

A running-sum window (O4 in __spark_entry__) approximates this, but
true greedy packing is order-dependent state — exactly the case for
``applyInPandas``: per-group (per host/connection) sequential logic
over an Arrow batch, groups processed in parallel across executors.

Determinism: items are packed in (priority, item) order inside each
group; the output carries (group, bin_id, position).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def pack_commands(
    df: DataFrame,
    group_col: str = "host",
    item_col: str = "url",
    priority_col: str = "priority",
    byte_budget: int = 4096,
    max_items: int = 100,
    overhead_per_item: int = 3,  # the reference adds json punctuation per topic
) -> DataFrame:
    """Assign each item a ``bin_id``/``bin_pos`` per group under byte
    + count budgets, greedy in (priority, item) order.  Items larger
    than the byte budget get a bin of their own (like the reference's
    single-topic oversize command)."""
    out_schema = f"{group_col} string, {item_col} string, {priority_col} long, bin_id int, bin_pos int"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([priority_col, item_col], kind="mergesort")
        bin_id, bin_pos, used = 0, 0, 0
        ids, poss = [], []
        for item in pdf[item_col]:
            cost = len(item.encode("utf-8")) + overhead_per_item
            if bin_pos > 0 and (used + cost > byte_budget or bin_pos >= max_items):
                bin_id += 1
                bin_pos, used = 0, 0
            ids.append(bin_id)
            poss.append(bin_pos)
            bin_pos += 1
            used += cost
        pdf = pdf[[group_col, item_col, priority_col]].copy()
        pdf["bin_id"] = pd.array(ids, dtype="int32")
        pdf["bin_pos"] = pd.array(poss, dtype="int32")
        return pdf

    return (
        df.select(group_col, item_col, priority_col)
        .groupBy(group_col)
        .applyInPandas(pack, schema=out_schema)
    )
