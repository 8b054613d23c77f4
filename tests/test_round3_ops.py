"""Round-3 operators: IVF ANN and incremental digest dedup."""

import pandas as pd
from pyspark.sql import functions as F


def test_ivf_recall_vs_bruteforce(spark):
    from crypto_crawler_rs_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(q, emb, k=5).toPandas()
    approx = cosine_topk_ivf(
        emb.filter(F.col("vec_id") < 20), emb, k=5, n_cells=8, nprobe=2,
        centroids=emb.filter(F.col("vec_id") < 8),
    ).toPandas()
    # every query answered with k rows, ranks dense 1..5
    assert sorted(approx.query_id.unique()) == sorted(exact.query_id.unique())
    assert (
        approx.sort_values(["query_id", "rk"])
        .groupby("query_id")
        .rk.apply(lambda s: s.tolist() == [1, 2, 3, 4, 5])
        .all()
    )
    hits = len(
        set(map(tuple, approx[["query_id", "neighbor_id"]].values))
        & set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    )
    recall = hits / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # sims are TRUE cosines (exact re-rank) — every reported pair's
    # sim equals the brute-force sim for the same pair
    merged = approx.merge(
        exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e")
    )
    assert (merged.sim_a == merged.sim_e).all()


def test_ivf_nprobe_full_equals_bruteforce(spark):
    """Probing ALL cells makes IVF exhaustive: results must equal the
    brute-force top-k exactly (candidate generation loses nothing)."""
    from crypto_crawler_rs_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(q, emb, k=3).toPandas().sort_values(
        ["query_id", "rk"]
    )
    approx = cosine_topk_ivf(
        q, emb, k=3, n_cells=4, nprobe=4,
        centroids=emb.filter(F.col("vec_id") < 4),
    ).toPandas().sort_values(["query_id", "rk"])
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True), exact.reset_index(drop=True)
    )


def test_incremental_digest_dedup(spark, tmp_path):
    from crypto_crawler_rs_spark.operators.dedup import (
        filter_new_digests,
        write_digest_index,
    )

    batch0 = spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text"), (2, "alpha text")],
        "doc_id long, text string",
    )
    batch1 = spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text"), (12, "beta text"),
         (13, "gamma text")],
        "doc_id long, text string",
    )
    idx0 = str(tmp_path / "idx0")
    write_digest_index(batch0, idx0, n_buckets=4)
    new1 = filter_new_digests(batch1, [idx0], n_buckets=4).toPandas()
    # alpha/beta already indexed; BOTH gamma rows are new (the index
    # dedups against the PAST, not within the incoming batch — run
    # exact_dedup on the batch itself for that)
    assert sorted(new1.doc_id) == [11, 13]
    # append a second index delta; a third batch sees the union
    idx1 = str(tmp_path / "idx1")
    write_digest_index(
        batch1.filter(F.col("doc_id").isin([11])), idx1, n_buckets=4
    )
    batch2 = spark.createDataFrame(
        [(20, "gamma text"), (21, "delta text")], "doc_id long, text string"
    )
    new2 = filter_new_digests(batch2, [idx0, idx1], n_buckets=4).toPandas()
    assert sorted(new2.doc_id) == [21]
    assert set(new2.columns) == {"doc_id", "text_md5"}
