"""Approximate-nearest-neighbor search over embedding columns.

Two tiers, mirroring the bloom-then-exact pattern used everywhere in
this engine:

* :func:`cosine_topk_bruteforce` — exact baseline: a crossJoin with
  the dot product computed by JVM higher-order functions
  (``zip_with`` + ``aggregate``), norms precomputed once per side.
  Quadratic — correct at any scale where |queries|×|corpus| fits the
  cluster, and the correctness oracle for the approximate path.
* :func:`cosine_topk_lsh` — scale path: random-hyperplane LSH
  (SimHash for vectors).  Each vector gets a bucket signature from
  the signs of ``n_planes`` fixed pseudo-random projections
  (deterministic: plane weights derive from xxhash64 of
  (plane, dim), no RNG state).  Candidates = bucket collisions under
  multiple independent tables; exact cosine re-ranks candidates.
  Shuffles only on (table, bucket) keys — never all-pairs.

All arithmetic is double (explicit cast from array<float>) so
results are reproducible across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Normalize to unit length once — cosine becomes a plain dot."""
    v = _as_double(F.col(vec_col))
    n = _norm(v)
    return df.withColumn(
        "_unit", F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) per query.

    scale: broadcast the smaller side (queries) so the crossJoin is a
    BroadcastNestedLoopJoin streamed over corpus partitions — no
    shuffle of the corpus; the window is per-query (bounded fanout).
    """
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("_qv")
    )
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", _dot(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rk")
    )


def _plane_weight(table: int, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane weight in [-1, 1):
    xxhash64 of the coordinate identity, scaled.  No RNG state, so
    every executor/run derives identical planes."""
    h = F.xxhash64(F.lit(f"plane:{table}:{plane}:{dim}"))
    return h.cast("double") / F.lit(float(2**63))


def lsh_bucket_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """(id, table, bucket) — sign pattern of n_planes projections per
    table.  Projections unroll to JVM expressions over array elements
    (element_at), fully codegen'd; no UDF, no shuffle."""
    v = _as_double(F.col(vec_col))
    out = df.select(F.col(id_col).alias("_id"), v.alias("_v"))
    rows = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            proj = reduce(
                lambda acc, d: acc
                + F.element_at(F.col("_v"), d + 1) * _plane_weight(t, p, d),
                range(dim),
                F.lit(0.0),
            )
            bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("string"))
        rows.append(
            out.select(
                "_id",
                F.lit(t).alias("table"),
                F.concat_ws("", *bits).alias("bucket"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), rows)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: LSH bucket collisions -> exact cosine
    re-rank of candidates only."""
    qs = lsh_bucket_signatures(queries, id_col, vec_col, dim, n_planes, n_tables)
    cs = lsh_bucket_signatures(corpus, id_col, vec_col, dim, n_planes, n_tables)
    cand = (
        qs.select(F.col("_id").alias("query_id"), "table", "bucket")
        .join(cs.select(F.col("_id").alias("neighbor_id"), "table", "bucket"), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("_qv")
    )
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("_cv")
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("sim", _dot(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rk")
    )
