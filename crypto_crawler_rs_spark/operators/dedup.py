"""Document deduplication operators for training-data pipelines.

The reference's dedup is identity-level: an anti-join of discovered
symbols vs the subscribed set (crypto-crawler/src/crawlers/utils.rs:543-555).
A web-scale corpus additionally needs CONTENT-level dedup.  All
operators below are pure DataFrame compositions (JVM hash functions,
no Python in the hot path) except where noted; each scales by
shuffling only on small keys (hashes / band signatures), never on
raw text.

Operators
---------
exact_dedup           hash-groupBy on md5(text)
word_shingles         shared shingling primitive (JVM ``transform``)
ngram_jaccard_pairs   all-pairs n-gram Jaccard via shingle inverted
                      index (self-join on shingle hash)
minhash_lsh_pairs     MinHash signatures + banded LSH candidate
                      generation + exact-Jaccard verification —
                      the bloom-prefilter-then-exact-confirm pattern
                      again (SURVEY.md §2.4 J1)
simhash64             64-bit SimHash per doc, fully JVM-side
                      (explode tokens -> xxhash64 -> 64 signed bit
                      sums -> reassemble), near-dups = small hamming
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: (text_md5, keeper_id, dup_count)."""
    return (
        df.withColumn("text_md5", F.md5(F.col(text_col)))
        .groupBy("text_md5")
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count("*").alias("dup_count"),
        )
    )


def word_shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Add a ``shingles`` array<string> of k-word shingles — built-in
    higher-order functions only (sequence/transform/slice), all
    whole-stage-codegen."""
    words = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(words) - (k - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return df.withColumn(
        "shingles", F.when(n > 0, F.array_distinct(shingles)).otherwise(F.array())
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All doc pairs with Jaccard(shingle sets) >= threshold.

    Inverted-index self-join: explode shingles, join on the shingle
    (hashed to a long so the shuffle key is 8 bytes, not the string),
    count shared shingles per pair, then |A∪B| = |A|+|B|-shared.
    scale: the join key distribution is the shingle df — a stopword-
    like super-common shingle is a skew key; AQE skew-join handles
    moderate cases, and dropping top-frequency shingles (standard
    MinHash practice) bounds it.
    """
    sh = word_shingles(df.select(id_col, text_col), text_col, k)
    sized = sh.select(
        F.col(id_col).alias("_id"), F.size("shingles").alias("_n"), "shingles"
    )
    ex = sized.select(
        "_id", "_n", F.explode("shingles").alias("_s")
    ).withColumn("_sh", F.xxhash64("_s")).drop("_s")
    a = ex.select(
        F.col("_id").alias("id_a"), F.col("_n").alias("n_a"), "_sh"
    )
    b = ex.select(
        F.col("_id").alias("id_b"), F.col("_n").alias("n_b"), "_sh"
    )
    pairs = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("shared"))
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return pairs


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 32,
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature — one groupBy with n min
    aggregates over seeded xxhash64 of the shingles (JVM-side hash
    family: xxhash64(seed_tag || shingle))."""
    sh = word_shingles(df.select(id_col, text_col), text_col, k)
    ex = sh.select(F.col(id_col).alias("_id"), F.explode("shingles").alias("_s"))
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{i}#"), F.col("_s")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return ex.groupBy("_id").agg(*aggs).withColumnRenamed("_id", id_col)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via banded LSH then EXACT Jaccard confirmation.

    Band collision is the cheap probabilistic prefilter (like the
    seen-set Bloom); the exact shingle-set Jaccard kills false
    positives, so the returned pairs are exact-threshold correct —
    LSH only bounds recall, never precision.
    """
    from pyspark import StorageLevel

    rows_per_band = n_hashes // n_bands
    # shingle once, reuse for both the signature build and the exact
    # confirmation join (the shingling scan is the expensive part)
    sh_base = word_shingles(df.select(id_col, text_col), text_col, k).select(
        F.col(id_col).alias("_id"), F.size("shingles").alias("_n"), "shingles"
    )
    ex_base = sh_base.select("_id", "_n", F.explode("shingles").alias("_s")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{i}#"), F.col("_s")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = ex_base.groupBy("_id").agg(*aggs).withColumnRenamed("_id", id_col)
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            sig.select(
                F.col(id_col).alias("_id"),
                F.lit(b).alias("_band"),
                F.xxhash64(F.concat_ws("|", *[c.cast("string") for c in cols])).alias(
                    "_sig"
                ),
            )
        )
    banded = reduce(lambda x, y: x.unionByName(y), bands)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["_band", "_sig"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    # exact confirm: jaccard on true shingle sets of candidates only
    ex = ex_base
    ja = (
        cand.join(ex.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a"), "_s"), "id_a")
        .join(ex.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b"), "_s"), ["id_b", "_s"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("shared"))
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return ja


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document, entirely JVM-side: explode
    whitespace tokens, xxhash64 each, and for every bit position sum
    +1/-1 across tokens; the fingerprint re-assembles the sign bits.
    Near-duplicates are pairs with small hamming distance
    (bit_count(x ^ y) in Spark SQL)."""
    tok = df.select(
        F.col(id_col).alias("_id"), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    aggs = [
        F.sum(
            F.when(
                F.col("_h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = tok.groupBy("_id").agg(*aggs)
    fp = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        ),
        range(64),
        F.lit(0).cast("long"),
    )
    return sums.select(F.col("_id").alias(id_col), fp.alias("simhash"))
