"""Benchmark decontamination — flag training documents that share
word-shingle n-grams with a held-out evaluation set.

The canonical pre-training hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap): any training document containing an n-gram that also
appears in a benchmark document is contaminated and must be dropped or
down-weighted before training, otherwise eval numbers measure
memorization.  Reference analog: the subscribe-list exclusion filter —
drop candidates already present in a privileged set
(crypto-crawler/src/crawlers/utils.rs:543-555) — applied to text
shingles instead of symbols.

Scale shape (the part that matters at 100 TB): evaluation sets are
small (10^3-10^6 docs, 10^6-10^8 distinct shingles) while the corpus is
the 100 TB side.  So the benchmark's distinct-shingle set is the BUILD
side of a broadcast/bucketed equi-join and the corpus streams through
it once at scan speed:

    corpus --explode shingles--> [shingle] --semi-join--> counts
                                      ^ broadcast(distinct bench shingles)

No all-pairs, no corpus self-join, one shuffle (the per-doc count
groupBy, combiner-backed).  When the benchmark side outgrows the
broadcast threshold the same plan degrades gracefully to a shuffle
equi-join on the shingle key (AQE picks; ``broadcast_bench=False``
forces it).

Oracle parity: the join key is the raw shingle STRING so DuckDB can
replay it exactly; ``key_family='xxhash64'`` swaps in
``xxhash64(shingle)`` (8-byte shuffle/broadcast keys) exactly as
``operators/dedup.py`` does via its ``hash_family`` knob — key width
changes, plan shape doesn't, and the report is identical modulo
64-bit collisions (pinned by ``test_decontaminate_prod_key_family``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
    key_family: str = "string",
) -> DataFrame:
    """Per-corpus-document overlap with the benchmark's shingle set.

    Returns ``(doc_id, overlap_shingles, n_shingles, contamination)``
    for documents with at least ``min_overlap`` distinct k-word
    shingles also present in ``benchmark``; ``contamination`` is the
    fraction of the document's distinct shingles that are contaminated
    (1.0 = the whole document is benchmark text).

    ``key_family``: ``'string'`` joins on the raw shingle (DuckDB
    replayable), ``'xxhash64'`` on its 8-byte hash — the production
    key that shrinks both the broadcast table and any shuffle
    fallback by ~an order of magnitude for typical shingle lengths.
    """
    if key_family not in ("string", "xxhash64"):
        raise ValueError(f"key_family must be string|xxhash64, got {key_family!r}")
    # (_id, _n, _s): exploded DISTINCT shingles + per-doc counts —
    # the same primitive every shingle dedup operator shares
    corpus_sh = shingle_rows(corpus, id_col=id_col, text_col=text_col, k=k)
    bench_sh = shingle_rows(benchmark, id_col=id_col, text_col=text_col, k=k)
    if key_family == "xxhash64":
        # hash BEFORE the bench distinct: one shuffle on the 8-byte
        # key (collision-merging two bench shingles can't change
        # membership), map-side projection on the corpus side
        corpus_sh = corpus_sh.withColumn("_s", F.xxhash64("_s"))
        bench_sh = bench_sh.select(F.xxhash64("_s").alias("_s"))
    bench_sh = bench_sh.select("_s").distinct()
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        corpus_sh.join(bench_sh, "_s")
        .groupBy("_id", "_n")
        .agg(F.count("*").alias("overlap_shingles"))
        .where(F.col("overlap_shingles") >= min_overlap)
    )
    return hits.select(
        F.col("_id").alias(id_col),
        "overlap_shingles",
        F.col("_n").alias("n_shingles"),
        F.round(F.col("overlap_shingles") / F.col("_n"), 6).alias(
            "contamination"
        ),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_contamination: float = 0.0,
    min_overlap: int = 1,
    key_family: str = "string",
) -> DataFrame:
    """The corpus minus contaminated documents: drop every document
    whose contamination fraction exceeds ``max_contamination`` (the
    default 0.0 drops on any ``min_overlap``-shingle hit).  A
    left-anti join against the report on the id key; the report is
    usually small enough that AQE broadcasts it, but it is NOT forced
    — a heavily-contaminated corpus can make it arbitrarily large."""
    bad = contamination_report(
        corpus,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        k=k,
        min_overlap=min_overlap,
        key_family=key_family,
    ).where(F.col("contamination") > max_contamination)
    return corpus.join(bad.select(id_col), id_col, "left_anti")
