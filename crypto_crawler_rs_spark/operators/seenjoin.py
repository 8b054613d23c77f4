"""Bucket-pruned exact seen-membership — the anti-join without the
seen-side shuffle.

The discovery anti-join is THE recurring scale cost of the crawl: a
plain ``left_anti`` on url re-shuffles the ENTIRE seen set (10^10
rows) every round, while the links side is tiny (bloom-prefiltered).
On Iceberg the answer is storage bucketing (both sides bucketed by
the join key -> no shuffle); this operator is the same design on
plain parquet: seen deltas are written ``partitionBy(bucket)`` where
``bucket = pmod(host_hash, n_buckets)`` (StateStore.write
partition_by), links repartition by the same expression, and each
task reads ONLY its buckets' directories (``bucket=K/``) to do an
exact in-memory membership check.

Memory model: one bucket's url set must fit a task — size
``n_buckets >= total_urls / ~3M`` (at 10^10 urls: 4096 buckets ≈
2.4M urls/bucket ≈ 200 MB of strings per task, streamed per
partition).  The shuffle-based path remains the default and the
semantics authority; equality is pinned by the e2e oracle tests with
``seen_anti_join='bucket_pruned'``.

Crossover (measured, 1M-page corpus, 32 cores): at ~1M seen rows the
two modes tie (40s vs 42s per 4 rounds — python set membership
offsets the saved shuffle).  The mode pays off when the seen set
DWARFS the per-round links (10^9+ rows), where re-shuffling it every
round is minutes of cluster time; below that, keep the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_unseen_bucket_pruned(
    links: DataFrame,
    seen_paths: list[str],
    tomb_rounds: dict,
    n_buckets: int,
    current_round: int,
    out_cols: tuple = ("url", "host", "depth"),
) -> DataFrame:
    """Rows of ``links`` whose url is NOT in the seen set.

    ``links`` must carry ``url`` and ``host_hash``.  ``tomb_rounds``
    maps url -> latest tombstone round; a seen row survives iff
    ``added_round > tomb_round`` OR it was added THIS round
    (``added_round == current_round`` — the current delta is exempt
    from tombstones, mirroring the shuffle path's
    ``seen ∪ current_delta`` construction).
    """
    part = links.withColumn(
        "_bucket", F.pmod(F.col("host_hash"), F.lit(n_buckets))
    ).repartition(n_buckets, F.col("_bucket"))
    fields = {f.name: f.dataType.simpleString() for f in links.schema.fields}
    out_schema = ", ".join(f"{c} {fields[c]}" for c in out_cols)
    cols = list(out_cols)

    def run(batches):
        import os

        import numpy as np
        import pyarrow.parquet as pq

        cache: dict[int, set] = {}

        def load(bucket: int) -> set:
            seen: set = set()
            for p in seen_paths:
                d = os.path.join(p, f"bucket={bucket}")
                if not os.path.isdir(d):
                    continue
                t = pq.read_table(d, columns=["url", "added_round"])
                urls = t.column("url").to_pylist()
                if tomb_rounds:
                    rounds = t.column("added_round").to_pylist()
                    for u, r in zip(urls, rounds):
                        tr = tomb_rounds.get(u)
                        if tr is None or r > tr or r == current_round:
                            seen.add(u)
                else:
                    seen.update(urls)
            return seen

        for pdf in batches:
            if not len(pdf):
                continue
            mask = np.empty(len(pdf), dtype=bool)
            buckets = pdf["_bucket"].to_numpy()
            urls = pdf["url"].to_numpy()
            for i, (b, u) in enumerate(zip(buckets, urls)):
                s = cache.get(b)
                if s is None:
                    s = cache[b] = load(int(b))
                mask[i] = u not in s
            yield pdf.loc[mask, cols]

    return part.mapInPandas(run, schema=out_schema)
