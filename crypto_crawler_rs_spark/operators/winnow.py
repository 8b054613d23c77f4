"""Winnowing passage fingerprints — local document fingerprinting
(Schleimer, Wilkerson, Aiken 2003, the MOSS algorithm) for
passage-level duplicate detection.

Whole-doc hashing (``doc_fingerprint``) misses documents that share a
copied PASSAGE inside otherwise-different text — boilerplate blocks,
syndicated paragraphs, license headers — the webtext case MinHash
handles only probabilistically at the whole-doc level.  Winnowing
gives a deterministic local guarantee: selecting the minimum k-gram
hash in every sliding window of ``w`` consecutive k-grams ensures any
shared token run of length >= w + k - 1 contributes at least one
IDENTICAL selected fingerprint to both documents.

Reference analog: the frame-level dedup of replayed websocket streams
(crypto-ws-client reconnect replay discards already-seen frames by
content) — applied at sub-document granularity.

Scale shape: fingerprint selection is a per-row array pipeline
(tokens -> k-gram md5 strings -> per-window ``array_min`` -> distinct)
— zero shuffle, zero UDF, whole-stage codegen.  Pair detection is the
dedup family's inverted-index discipline: explode selected
fingerprints, df-cap the stop-fingerprints (the fanout guard, same as
``ngram_jaccard_pairs``), equi-join on the fingerprint — banded, never
all-pairs.  Hashes are md5 hex strings so the DuckDB oracle replays
them exactly; production would swap xxhash64 8-byte keys via the same
``hash_family`` pattern as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Adds ``fingerprints``: the document's DISTINCT selected k-gram
    hashes (md5 hex of space-joined k-token grams), one ``array_min``
    per sliding window of ``w`` grams.  Documents shorter than k
    tokens get an empty array."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(t)
    n_grams = F.greatest(n - F.lit(k - 1), F.lit(0))
    grams = F.transform(
        F.slice(t, 1, n_grams),
        lambda x, i: F.md5(
            F.concat_ws(
                " ", F.array(*[t[i + j] for j in range(k)])
            ).cast("binary")
        ),
    )
    n_windows = F.greatest(F.size(grams) - F.lit(w - 1), F.lit(0))
    selected = F.transform(
        F.slice(grams, 1, n_windows),
        lambda x, i: F.array_min(F.slice(grams, i + 1, w)),
    )
    # short docs (k <= tokens < k+w-1): fewer grams than a window —
    # keep their single min so passages at doc granularity still match
    short = F.when(
        (F.size(grams) > 0) & (n_windows == 0),
        F.array(F.array_min(grams)),
    )
    fps = F.coalesce(
        F.when(n_windows > 0, F.array_distinct(selected)), short, F.array()
    )
    return df.withColumn("fingerprints", fps)


def winnow_passage_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    df_cap: int = 100,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` selected fingerprints
    — candidates for passage-level duplication.  ``df_cap`` drops
    fingerprints present in more than that many documents (corpus
    boilerplate connects everything; its join fanout is df² — the same
    skew guard as ``ngram_jaccard_pairs``).  Returns
    ``(id_a, id_b, shared_fps)`` with ``id_a < id_b``."""
    fp = (
        winnow_fingerprints(df, id_col, text_col, k, w)
        .select(F.col(id_col).alias("_id"), F.explode("fingerprints").alias("_fp"))
    )
    keep = (
        fp.groupBy("_fp")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= df_cap)
        .select("_fp")
    )
    fp = fp.join(keep, "_fp")
    pairs = (
        fp.alias("a")
        .join(fp.alias("b"), "_fp")
        .where(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
    return pairs
