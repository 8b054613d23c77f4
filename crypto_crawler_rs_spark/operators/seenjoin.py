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

Tombstones (forget/unsubscribe, U3) are ALSO bucket-partitioned and
applied executor-side inside the per-bucket load — nothing about the
seen set ever reaches the driver (a deletion-heavy crawl previously
grew a driver-side dict shipped in every task closure).

Membership is fully vectorized: each bucket's surviving urls become a
cached ``pd.Index`` whose hash table is built once and reused across
batches (``get_indexer`` — no per-row Python).

Memory model: one bucket's url set must fit a task — size
``n_buckets >= total_urls / ~3M`` (at 10^10 urls: 4096 buckets ≈
2.4M urls/bucket ≈ 200 MB of strings per task, streamed per
partition).  The shuffle-based path remains the default and the
semantics authority; equality is pinned by the e2e oracle tests with
``seen_anti_join='bucket_pruned'``.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- worker-side immutable-delta cache ------------------------------
# Delta roots are IMMUTABLE once a manifest references them
# (plans/state.py write-then-commit), so per-(path, bucket) parquet
# reads can be cached in the long-lived python worker across rounds:
# round N+1 re-reads only its NEW delta, not the whole seen set —
# that re-read is the recurring I/O term of the 10^10 crawl.  The
# cache is bounded (LRU by rows) and keyed by path, so compaction
# (which writes NEW roots) naturally ages old entries out.  Negative
# entries (missing bucket dir) are safe for the same immutability
# reason.  Requires spark.python.worker.reuse (the default).
_PATH_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_PATH_CACHE_ROWS = 0
# row budget per worker process; 0 disables caching entirely
# (env knob so deployments can size it to executor memory)
import os as _os  # noqa: E402

_PATH_CACHE_MAX_ROWS = int(
    _os.environ.get("SPARK_GRAFT_SEENJOIN_CACHE_ROWS", 5_000_000)
)


def _read_bucket_part(path: str, bucket: int, columns: tuple):
    """Cached read of one delta root's ``bucket=K`` dir — returns
    per-column numpy arrays, or None when the dir doesn't exist.

    The cache holds ARROW tables, not numpy object arrays: millions
    of long-lived python str objects would make every CPython gen-2
    GC walk them for the worker's whole lifetime, taxing ALL
    subsequent tasks (measured ~12% on the 1M-page crawl).  Arrow
    buffers are GC-invisible; the numpy conversion happens per use
    and its strings die young."""
    global _PATH_CACHE_ROWS
    import os

    import pyarrow.parquet as pq

    key = (path, bucket, columns)
    hit = _PATH_CACHE.get(key)
    if hit is not None:
        _PATH_CACHE.move_to_end(key)
        t = hit[0]
    else:
        d = os.path.join(path, f"bucket={bucket}")
        t = pq.read_table(d, columns=list(columns)) if os.path.isdir(d) else None
        if _PATH_CACHE_MAX_ROWS > 0:
            rows = t.num_rows if t is not None else 0
            _PATH_CACHE[key] = (t, rows)
            _PATH_CACHE_ROWS += rows
            while _PATH_CACHE_ROWS > _PATH_CACHE_MAX_ROWS and len(_PATH_CACHE) > 1:
                _k, (_v, _rows) = _PATH_CACHE.popitem(last=False)
                _PATH_CACHE_ROWS -= _rows
    if t is None:
        return None
    return tuple(t.column(c).to_numpy(zero_copy_only=False) for c in columns)


def filter_unseen_bucket_pruned(
    links: DataFrame,
    seen_paths: list[str],
    tomb_paths: list[str],
    n_buckets: int,
    current_round: int,
    out_cols: tuple = ("url", "host", "depth"),
) -> DataFrame:
    """Rows of ``links`` whose url is NOT in the seen set.

    ``links`` must carry ``url`` and ``host_hash``.  ``tomb_paths``
    are tombstone delta roots (url, tomb_round), bucket-partitioned
    like the seen deltas; a seen row survives iff
    ``added_round > max(tomb_round)`` for its url OR it was added
    THIS round (``added_round == current_round`` — the current delta
    is exempt from tombstones, mirroring the shuffle path's
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
        import pandas as pd
        import pyarrow.parquet as pq

        cache: dict[int, "pd.Index"] = {}
        legacy_tomb: list = []  # lazily-loaded non-partitioned roots
        legacy_seen: list = []  # lazily-loaded non-partitioned seen roots

        def read_bucket(paths: list[str], bucket: int, columns: tuple):
            """(per-column arrays) per path — through the worker-wide
            immutable-delta cache, so across rounds only NEW delta
            roots touch disk."""
            parts = []
            for p in paths:
                arrs = _read_bucket_part(p, bucket, columns)
                if arrs is not None:
                    parts.append(arrs)
            return parts

        def tomb_frame(bucket: int):
            frames = [
                pd.DataFrame({"url": u, "tomb_round": r})
                for u, r in read_bucket(tomb_paths, bucket, ("url", "tomb_round"))
            ]
            # legacy compat: tombstones written before bucket_pruned
            # mode have no bucket dirs — read them whole, once per
            # task (urls of other buckets simply never match)
            if not legacy_tomb:
                whole = []
                for p in tomb_paths:
                    has_bucket_dirs = any(
                        e.startswith("bucket=") for e in os.listdir(p)
                    ) if os.path.isdir(p) else False
                    if not has_bucket_dirs:
                        t = pq.read_table(p, columns=["url", "tomb_round"])
                        if t.num_rows:
                            whole.append(t.to_pandas())
                legacy_tomb.append(
                    pd.concat(whole, ignore_index=True) if whole else None
                )
            if legacy_tomb[0] is not None:
                frames.append(legacy_tomb[0])
            if not frames:
                return None
            t = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
            return t.groupby("url", sort=False)["tomb_round"].max()

        def legacy_seen_frame():
            """Seen deltas written before bucket_pruned mode (a
            shuffle-mode run being resumed under bucket_pruned) have
            no ``bucket=K`` dirs — without this fallback the whole
            previously-seen set would read as EMPTY and be silently
            re-crawled (ADVICE r3 #1).  Read each flat root once per
            task and recompute the bucket from host_hash (same
            pmod(host_hash, n) as the writer)."""
            if not legacy_seen:
                whole = []
                for p in seen_paths:
                    has_bucket_dirs = os.path.isdir(p) and any(
                        e.startswith("bucket=") for e in os.listdir(p)
                    )
                    if os.path.isdir(p) and not has_bucket_dirs:
                        t = pq.read_table(
                            p, columns=["url", "host_hash", "added_round"]
                        )
                        if t.num_rows:
                            f = t.to_pandas()
                            # numpy % matches Spark pmod for positive n
                            f["_bucket"] = (
                                f["host_hash"].to_numpy().astype(np.int64)
                                % np.int64(n_buckets)
                            )
                            whole.append(f)
                legacy_seen.append(
                    pd.concat(whole, ignore_index=True) if whole else None
                )
            return legacy_seen[0]

        def load(bucket: int) -> "pd.Index":
            # no tombstones -> only the url column is ever consulted
            cols = ("url", "added_round") if tomb_paths else ("url",)
            parts = read_bucket(seen_paths, bucket, cols)
            url_parts = [p[0] for p in parts]
            round_parts = [p[1] for p in parts] if tomb_paths else []
            lf = legacy_seen_frame()
            if lf is not None:
                sel = lf["_bucket"].to_numpy() == bucket
                if sel.any():
                    url_parts.append(lf.loc[sel, "url"].to_numpy())
                    if tomb_paths:
                        round_parts.append(lf.loc[sel, "added_round"].to_numpy())
            if not url_parts:
                return pd.Index([], dtype=object)
            urls = np.concatenate(url_parts)
            tomb = tomb_frame(bucket) if tomb_paths else None
            if tomb is not None and len(tomb):
                rounds = np.concatenate(round_parts)
                seen = pd.DataFrame({"url": urls, "added_round": rounds})
                tr = seen["url"].map(tomb)
                keep = (
                    tr.isna()
                    | (seen["added_round"] > tr)
                    | (seen["added_round"] == current_round)
                )
                urls = seen.loc[keep, "url"].to_numpy()
            # unique Index: its hash table is built on first
            # get_indexer and REUSED across every batch of this task
            return pd.Index(pd.unique(urls))

        for pdf in batches:
            if not len(pdf):
                continue
            buckets = pdf["_bucket"].to_numpy()
            urls = pdf["url"].to_numpy()
            mask = np.empty(len(pdf), dtype=bool)
            for b in np.unique(buckets):
                sel = buckets == b
                idx = cache.get(int(b))
                if idx is None:
                    idx = cache[int(b)] = load(int(b))
                if len(idx) == 0:
                    mask[sel] = True
                else:
                    mask[sel] = idx.get_indexer(urls[sel]) == -1
            yield pdf.loc[mask, cols]

    return part.mapInPandas(run, schema=out_schema)
