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

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def _family_hash(tag: str, col: Column, hash_family: str) -> Column:
    """Seeded hash-family member H_tag(col).

    * ``xxhash64`` (default) — JVM-native, 8-byte output: the
      production path (cheapest shuffle keys, no string
      materialization).
    * ``md5`` — 32-char lowercase hex STRING.  Identical in Spark and
      DuckDB, which makes every LSH decision (min-hash, band
      signatures) reproducible by the SQL oracle; min/comparisons on
      the fixed-width hex encode the same order as the numeric value.
    """
    seeded = F.concat(F.lit(f"{tag}#"), col)
    if hash_family == "xxhash64":
        return F.xxhash64(seeded)
    if hash_family == "md5":
        return F.md5(seeded)
    raise ValueError(f"unknown hash_family {hash_family!r}")


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
    whole-stage-codegen.

    The token array is materialized as a column FIRST: an inline
    ``split()`` referenced inside the transform lambda is re-evaluated
    per shingle (no common-subexpression elimination across lambda
    scopes), turning an O(words) row into O(words²) — measured 2.4x
    on the sf0.1 dedup queries."""
    words_col = f"_words_{text_col}"
    out = df.withColumn(words_col, F.split(F.col(text_col), " "))
    words = F.col(words_col)
    n = F.greatest(F.size(words) - (k - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return out.withColumn(
        "shingles", F.when(n > 0, F.array_distinct(shingles)).otherwise(F.array())
    ).drop(words_col)


def shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    impl: str = "arrow",
) -> DataFrame:
    """Exploded distinct k-word shingle rows ``(_id, _n, _s)`` where
    ``_n`` is the doc's distinct-shingle count — the shared input of
    every shingle-based dedup operator.

    Two implementations with IDENTICAL output (multiset of rows;
    pinned by ``test_shingle_impls_equivalent``):

    * ``impl='hof'`` — :func:`word_shingles` + explode.  Pure JVM, but
      higher-order functions (transform/slice/concat_ws lambdas) are
      INTERPRETED per element, not codegen'd.
    * ``impl='arrow'`` (default) — one ``mapInPandas`` doing the
      split/join in Python over Arrow batches.  Measured ~2.9x faster
      steady-state at sf0.1 (0.8s vs 2.2s for the full explode) —
      the interpreted-HOF tax outweighs Python string costs here,
      the exception to the usual stay-JVM rule (same finding as the
      LSH Arrow matmul, SNIPPETS r2)."""
    if impl == "hof":
        sh = word_shingles(df.select(id_col, text_col), text_col, k)
        return sh.select(
            F.col(id_col).alias("_id"),
            F.size("shingles").alias("_n"),
            F.explode("shingles").alias("_s"),
        )
    if impl != "arrow":
        raise ValueError(f"unknown shingle impl {impl!r}")
    # r7: the bench corpora are single-row-group parquet files, so the
    # python shingling pass would run as ONE task; spread first
    # (no-op at real scan widths — see functions/partitioning.py)
    from ..functions.partitioning import spread_small_scan

    df = spread_small_scan(df.select(id_col, text_col))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, ns, ss = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split(" ")
                if len(toks) >= k:
                    sset = list(
                        dict.fromkeys(
                            " ".join(toks[i : i + k])
                            for i in range(len(toks) - (k - 1))
                        )
                    )
                else:
                    sset = []
                n = len(sset)
                ids.extend([did] * n)
                ns.extend([n] * n)
                ss.extend(sset)
            yield pd.DataFrame({"_id": ids, "_n": ns, "_s": ss})

    return df.select(id_col, text_col).mapInPandas(
        gen, schema="_id long, _n int, _s string"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
    cleanup: list | None = None,
    shingle_impl: str = "arrow",
) -> DataFrame:
    """All doc pairs with Jaccard(shingle sets) >= threshold.

    Inverted-index self-join: explode shingles, join on the shingle
    (hashed to a long so the shuffle key is 8 bytes, not the string),
    count shared shingles per pair, then |A∪B| = |A|+|B|-shared.

    ``df_cap``: drop shingles whose DOCUMENT FREQUENCY exceeds the
    cap before the self-join (standard MinHash practice).  This is
    the skew guard: the join fanout of one shingle is df², so a
    stopword-like shingle present in 1% of a 10^9-doc corpus alone
    contributes 10^14 pairs — quadratic death on a single key.  A cap
    of c bounds per-key fanout at c² while only ignoring evidence
    from non-discriminative shingles (they connect everything, so
    they carry ~zero Jaccard signal).  NOTE the semantics change:
    shared/size counts then use the CAPPED shingle sets on both sides
    of the Jaccard — mirror the cap in any oracle.

    ``cleanup``: optional list the persisted shingle index is
    appended to — unpersist after materializing the result, or a
    long-lived session accumulates cached partitions per invocation
    (same pattern as rank.global_rank / bloom_probe_udf).  Without a
    list the caller owns the leak.
    """
    from pyspark import StorageLevel

    # persist the exploded (id, shingle-hash) index: BOTH sides of the
    # self-join (and the df-cap count) reuse it, so the text scan +
    # shingling runs once instead of 2-3x (it dominates the query)
    ex = (
        shingle_rows(df, id_col, text_col, k, impl=shingle_impl)
        .withColumn("_sh", F.xxhash64("_s"))
        .drop("_s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if cleanup is not None:
        cleanup.append(ex)
    if df_cap is not None:
        keep = (
            ex.groupBy("_sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= df_cap)
            .select("_sh")
        )
        # r7: persist the CAPPED index — the self-join consumes it on
        # both sides and the sizes aggregate once more, and without a
        # cache each consumer re-runs the df-cap count+join (the
        # captured plan held FOUR copies of the keep aggregate)
        ex = ex.drop("_n").join(keep, "_sh").persist(StorageLevel.MEMORY_AND_DISK)
        if cleanup is not None:
            cleanup.append(ex)
        # sizes recomputed over the SURVIVING shingles so the Jaccard
        # denominator matches the capped sets.  r7: sizes are attached
        # to the AGGREGATED pair counts (one row per doc pair) instead
        # of riding through the df² join fanout — n_a/n_b are functions
        # of id_a/id_b, so grouping on the ids alone yields identical
        # groups with half the aggregate key width, and the capped
        # index keeps its _sh partitioning into the self-join (no _id
        # re-shuffle on the fat path; guide §2.3/§2.4).
        sizes = ex.groupBy("_id").agg(F.count("*").alias("_n"))
        a = ex.select(F.col("_id").alias("id_a"), "_sh")
        b = ex.select(F.col("_id").alias("id_b"), "_sh")
        counts = (
            a.join(b, "_sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("shared"))
        )
        pairs = (
            counts.join(
                sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")),
                "id_a",
            )
            .join(
                sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b")),
                "id_b",
            )
            .withColumn(
                "jaccard",
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        )
        return pairs
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
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature — one groupBy with n min
    aggregates over a seeded hash family of the shingles
    (H_i(s) = family('mh{i}#' || s); see :func:`_family_hash`)."""
    ex = shingle_rows(df, id_col, text_col, k).select("_id", "_s")
    aggs = [
        F.min(_family_hash(f"mh{i}", F.col("_s"), hash_family)).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return ex.groupBy("_id").agg(*aggs).withColumnRenamed("_id", id_col)


def _minhash_sig_rows_arrow(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    n_hashes: int,
) -> DataFrame:
    """``(_id, h0..h{n-1})`` md5-family MinHash signature table in ONE
    Arrow pass over ``(id, text)`` — bit-identical to the
    ``groupBy(_id).agg(min(md5('mh{i}#'||s)))`` build (same shingling
    as :func:`shingle_rows`, same UTF-8 md5 hex, and min over
    lowercase-hex ASCII strings is the same order under python str,
    JVM UTF8String and DuckDB collation), but ~an order of magnitude
    less hashing: a PARTITION-LOCAL memo computes the ``n_hashes``
    seeded digests once per distinct shingle seen by the task instead
    of once per (doc, shingle) occurrence.  Web-text shingle
    frequencies are Zipf — the repeated-shingle mass is exactly the
    part the JVM agg re-hashes per row and the memo pays once (at
    bench scale the corpus vocabulary makes the ratio ~10-100x; at
    web scale the stopword-like head still dominates occurrences).
    The memo is capped (cleared at 100k entries ≈ a few hundred MB)
    so executor memory is bounded at any scale; docs with fewer than
    ``k`` words emit no row, matching the groupBy over their zero
    shingle rows.  Requires unique ids (true for every caller: raw
    doc ids, exact-deduped keepers, digest-filtered batches).
    """
    from ..functions.partitioning import spread_small_scan

    src = spread_small_scan(docs.select(id_col, text_col))
    seeds = [f"mh{i}#".encode("utf-8") for i in range(n_hashes)]

    def gen(batches):
        import hashlib

        import pandas as pd

        memo: dict = {}
        get = memo.get
        for pdf in batches:
            ids: list = []
            cols: list = [[] for _ in range(len(seeds))]
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split(" ")
                if len(toks) < k:
                    continue
                sset = dict.fromkeys(
                    " ".join(toks[i : i + k]) for i in range(len(toks) - (k - 1))
                )
                hl = []
                ap = hl.append
                for s in sset:
                    hs = get(s)
                    if hs is None:
                        b = s.encode("utf-8")
                        hs = tuple(
                            hashlib.md5(sd + b).hexdigest() for sd in seeds
                        )
                        if len(memo) >= 100_000:
                            memo.clear()
                        memo[s] = hs
                    ap(hs)
                ids.append(did)
                for col, v in zip(cols, (min(c) for c in zip(*hl))):
                    col.append(v)
            out = {"_id": pd.Series(ids, dtype="int64")}
            for i in range(len(seeds)):
                out[f"h{i}"] = pd.Series(cols[i], dtype="object")
            yield pd.DataFrame(out)

    schema = "_id long, " + ", ".join(f"h{i} string" for i in range(n_hashes))
    return src.mapInPandas(gen, schema=schema)


def _band_signatures(
    ex_base: DataFrame,
    n_hashes: int,
    n_bands: int,
    hash_family: str,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """``(_id, _band, _sig)`` banded MinHash signatures from a shingle
    table (``shingle_rows`` output) — the shared band construction of
    :func:`minhash_lsh_pairs` and :func:`write_band_index`, so the
    incremental path collides on bit-identical signatures.

    When the caller also passes the source ``docs`` (id, text) and the
    family is md5, the signature table comes from
    :func:`_minhash_sig_rows_arrow` (one memoized Arrow pass) instead
    of the n_hashes-seeded-md5-per-shingle-row JVM aggregation —
    identical output, ~10x less hashing (r7, guide §4).  The xxhash64
    family keeps the JVM agg (no python twin of Spark's xxhash64 in
    this container; its 8-byte keys also hash ~10x faster than md5,
    so the seeded agg is not the bottleneck there)."""
    rows_per_band = n_hashes // n_bands
    if docs is not None and hash_family == "md5":
        sig = _minhash_sig_rows_arrow(docs, id_col, text_col, k, n_hashes)
    else:
        aggs = [
            F.min(_family_hash(f"mh{i}", F.col("_s"), hash_family)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
        sig = ex_base.groupBy("_id").agg(*aggs)
    # ONE pass, not a union of n_bands branches (r7, guide §2.4): the
    # branch-per-band union re-ran the 32-min-agg final aggregation
    # once per band (the map side deduped via ReusedExchange, the
    # post-shuffle agg + n_hashes seeded hashes did not) — a
    # posexplode over the array of band signatures computes the
    # signature table once and emits identical (_id, _band, _sig)
    # rows (pos == the old F.lit(b) band id, same int type).
    band_sigs = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_key = F.concat_ws("|", *[c.cast("string") for c in cols])
        band_sigs.append(
            F.xxhash64(band_key) if hash_family == "xxhash64" else F.md5(band_key)
        )
    return sig.select(
        "_id", F.posexplode(F.array(*band_sigs)).alias("_band", "_sig")
    )


def _confirm_pairs(
    cand: DataFrame,
    ex: DataFrame,
    threshold: float,
    cleanup: list | None = None,
) -> DataFrame:
    """EXACT Jaccard confirmation of candidate pairs against the true
    shingle sets — the shared final stage of :func:`minhash_lsh_pairs`
    and :func:`incremental_lsh_pairs`.

    Set-based (r7, guide §2.3 shuffle-fewer-bytes): each doc's
    distinct shingles are collected into ONE array row
    (``(_id, _s)`` is distinct by :func:`shingle_rows`'s contract, so
    ``collect_set`` loses nothing), the candidate pair joins its two
    arrays by the 8-byte ids, and ``size(array_intersect(...))`` is
    the same integer the old exploded form counted with
    candidates⋈shingles⋈shingles + groupBy — that shape shuffled the
    Σ|shingles| × pairs exploded intermediate twice (~17 M rows at
    sf1.0 candidate counts) where this one shuffles one array row per
    doc plus the pair table (measured 2x on the confirm stage at
    sf1.0 shape; bit-identical jaccard: same ints, same division,
    same round).  Row width is bounded by the doc's shingle count —
    the same class as carrying ``text`` through a join, which every
    upstream stage already does."""
    from pyspark import StorageLevel

    # persist (r7): both attach joins aggregate the SAME sets table,
    # and each side lands in its own broadcast — no shared exchange,
    # so without the cache the collect_set aggregation runs twice.
    # Same cleanup contract as the callers' shingle index.
    sets = ex.groupBy("_id").agg(
        F.collect_set("_s").alias("_ss"), F.first("_n").alias("_n")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if cleanup is not None:
        cleanup.append(sets)
    return (
        cand.join(
            sets.select(
                F.col("_id").alias("id_a"),
                F.col("_ss").alias("_sa"),
                F.col("_n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("_id").alias("id_b"),
                F.col("_ss").alias("_sb"),
                F.col("_n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn("shared", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
    hash_family: str = "xxhash64",
    bucket_cap: int | None = None,
    shingle_impl: str = "arrow",
    cleanup: list | None = None,
) -> DataFrame:
    """Near-dup pairs via banded LSH then EXACT Jaccard confirmation.

    Band collision is the cheap probabilistic prefilter (like the
    seen-set Bloom); the exact shingle-set Jaccard kills false
    positives, so the returned pairs are exact-threshold correct —
    LSH only bounds recall, never precision.

    ``hash_family='md5'`` makes the banding DuckDB-reproducible (the
    oracle replays the identical minhashes and band signatures), at
    the cost of string shuffle keys — use the default xxhash64 in
    production.

    ``bucket_cap``: drop band buckets holding more than cap docs —
    the degenerate-bucket guard for mass-duplicate corpora, where one
    bucket of b identical docs costs b² candidate pairs.  Those docs
    are exact duplicates (or near enough to collide on most bands);
    run :func:`exact_dedup` FIRST and feed only keeper docs here, and
    the cap never fires.  Mirror the cap in any oracle (recall-only
    effect, like the band count itself).
    """
    from pyspark import StorageLevel

    # shingle once, reuse for both the signature build and the exact
    # confirmation join (the shingling scan is the expensive part).
    # r7 4th pass: on the md5/arrow family the signatures come from
    # the separate memoized Arrow pass over the docs, so the shingle
    # table's ONLY consumer is the confirm's one sets aggregation —
    # the persist there was a pure cache-write pass (the same
    # single-consumer call made in write_band_index's arrow branch).
    # The JVM-agg family keeps it (signature build + confirm share it).
    ex_base = shingle_rows(df, id_col, text_col, k, impl=shingle_impl)
    if hash_family != "md5":
        ex_base = ex_base.persist(StorageLevel.MEMORY_AND_DISK)
        if cleanup is not None:
            # same contract as ngram_jaccard_pairs (ADVICE r3 #4): the
            # caller unpersists the shingle index after materializing,
            # or a long-lived session accumulates cached partitions
            # per call
            cleanup.append(ex_base)
    banded = _band_signatures(
        ex_base, n_hashes, n_bands, hash_family,
        docs=df, id_col=id_col, text_col=text_col, k=k,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # persist (r7): the self-join below consumes `banded` on BOTH
    # sides, and the planner broadcasts one of them — no exchange to
    # reuse, so without the cache the signature build (the arrow md5
    # pass / the 32-min aggregation) executes twice per query.  The
    # plan pin: exactly ONE MapInPandas sig pass under the candidate
    # join (plans/r07/dedup_minhash_lsh_after.txt).  Same cleanup
    # contract as ex_base.
    if cleanup is not None:
        cleanup.append(banded)
    if bucket_cap is not None:
        keep = (
            banded.groupBy("_band", "_sig")
            .agg(F.count("*").alias("_bc"))
            .filter(F.col("_bc") <= bucket_cap)
            .select("_band", "_sig")
        )
        banded = banded.join(keep, ["_band", "_sig"])
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["_band", "_sig"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    # exact confirm: jaccard on true shingle sets of candidates only
    return _confirm_pairs(cand, ex_base, threshold, cleanup=cleanup)


def _simhash_fp_rows_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int,
) -> DataFrame:
    """md5-family SimHash fingerprints in ONE Arrow pass — bit-identical
    to the explode + per-token md5 + n_bits signed-bit-sum aggregation
    (the bit of digit ``n_digits-1-(b//4)`` at ``b%4`` is bit ``b`` of
    the first ``n_digits`` hex chars read as an integer), but each
    DISTINCT token's ±1 bit vector is computed once per partition via
    a memo instead of once per occurrence (token frequencies are Zipf
    — same argument as :func:`_minhash_sig_rows_arrow`).  Token
    multiplicity still counts: sums accumulate over OCCURRENCES,
    exactly like the JVM sum aggregate.  NULL text emits no row
    (explode over a NULL split); empty text tokenizes to [""] and
    gets a fingerprint, both matching the JVM path."""
    from ..functions.partitioning import spread_small_scan

    assert n_bits % 4 == 0 and n_bits <= 60  # sign-safe in BIGINT
    src = spread_small_scan(df.select(id_col, text_col))
    n_digits = n_bits // 4

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        shifts = list(range(n_bits))
        memo: dict = {}
        get = memo.get
        for pdf in batches:
            ids: list = []
            fps: list = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue  # NULL text: explode(split(NULL)) emits no row
                toks = text.split(" ")
                sums = np.zeros(n_bits, dtype=np.int64)
                for t in toks:
                    vec = get(t)
                    if vec is None:
                        v = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:n_digits], 16)
                        vec = np.array(
                            [1 if (v >> b) & 1 else -1 for b in shifts],
                            dtype=np.int8,
                        )
                        if len(memo) >= 1_000_000:
                            memo.clear()
                        memo[t] = vec
                    sums += vec
                fp = 0
                for b in shifts:
                    if sums[b] > 0:
                        fp |= 1 << b
                ids.append(did)
                fps.append(fp)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "simhash": pd.Series(fps, dtype="int64"),
                }
            )

    return src.mapInPandas(gen, schema=f"{id_col} long, simhash long")


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "xxhash64",
    n_bits: int = 64,
    impl: str = "auto",
) -> DataFrame:
    """n-bit SimHash per document, entirely JVM-side: explode
    space-split tokens, hash each, and for every bit position sum
    +1/-1 across tokens; the fingerprint re-assembles the sign bits.
    Near-duplicates are pairs with small hamming distance
    (``bit_count(x ^ y)``) — see :func:`simhash_pairs`.

    ``hash_family='md5'`` derives the token bits from the md5 hex
    digits (bit b lives in digit ``n_bits//4 - b//4``), so a DuckDB
    oracle reproduces the fingerprints exactly; with md5 use
    ``n_bits<=60`` so the fingerprint stays positive in a signed
    BIGINT on both engines (xxhash64 uses the native 64 bits).

    ``impl``: ``'auto'`` (default) uses the memoized Arrow twin
    :func:`_simhash_fp_rows_arrow` for the md5 family (identical
    fingerprints, each distinct token hashed once per partition
    instead of once per occurrence — r7, guide §4); ``'agg'`` forces
    the JVM explode+sum build (the equivalence pin's reference).
    xxhash64 always uses the JVM build (native 8-byte hashing is not
    the bottleneck, and this container has no python xxhash64 twin).
    """
    from ..functions.partitioning import spread_small_scan

    if impl not in ("auto", "agg"):
        raise ValueError(f"unknown simhash impl {impl!r}")
    if impl == "auto" and hash_family == "md5":
        return _simhash_fp_rows_arrow(df, id_col, text_col, n_bits)

    # r7: the token explode + per-token hashing + n_bits partial sums
    # all run map-side — spread the single-split bench scan first
    tok = spread_small_scan(df.select(id_col, text_col)).select(
        F.col(id_col).alias("_id"), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    )
    if hash_family == "xxhash64":
        assert n_bits <= 64
        tok = tok.withColumn("_h", F.xxhash64("_t"))
        bit = [
            F.when(
                F.col("_h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1
            ).otherwise(0)
            for b in range(n_bits)
        ]
    elif hash_family == "md5":
        assert n_bits % 4 == 0 and n_bits <= 60  # sign-safe in BIGINT
        n_digits = n_bits // 4
        tok = tok.withColumn("_h", F.md5("_t"))
        # digit j (1-based from the left of the first n_digits hex
        # chars) carries bits 4*(n_digits-j)+3 .. 4*(n_digits-j).
        # Digits are MATERIALIZED as columns so each conv/substring
        # evaluates once per token, not once per bit (4x per digit)
        tok = tok.select(
            "_id",
            *[
                F.conv(F.substring("_h", j, 1), 16, 10).cast("int").alias(f"_d{j}")
                for j in range(1, n_digits + 1)
            ],
        )
        digits = [F.col(f"_d{j}") for j in range(1, n_digits + 1)]
        bit = [
            F.shiftright(digits[n_digits - 1 - (b // 4)], b % 4).bitwiseAND(F.lit(1))
            for b in range(n_bits)
        ]
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    aggs = [
        F.sum(F.when(bit[b] == 1, 1).otherwise(-1)).alias(f"b{b}") for b in range(n_bits)
    ]
    sums = tok.groupBy("_id").agg(*aggs)
    fp = reduce(
        lambda acc, b: acc
        + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long")),
        range(n_bits),
        F.lit(0).cast("long"),
    )
    return sums.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Back-compat alias: 64-bit xxhash64-family SimHash."""
    return simhash_fingerprints(df, id_col, text_col, "xxhash64", 64)


def simhash_pairs(
    fp: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    max_hamming: int = 3,
    n_bits: int = 64,
    n_bands: int | None = None,
) -> DataFrame:
    """Near-dup pairs from SimHash fingerprints WITHOUT an all-pairs
    join: band the fingerprint into ``n_bands`` contiguous bit slices
    and join on (band, slice value) — by pigeonhole, any pair with
    hamming <= n_bands - 1 collides on at least one untouched band,
    so with the default ``n_bands = max_hamming + 1`` the banded join
    is EXACT (100% recall); ``bit_count(x ^ y)`` confirms survivors.

    scale: shuffles only (band, 8-byte slice) keys; a degenerate
    corpus (mass-identical fingerprints) concentrates one bucket —
    the same df-cap treatment as ngram applies if that ever matters.
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    width = n_bits // n_bands
    # the fingerprint build is a WIDE plan (n_bits aggregates + an
    # n_bits-term reassembly fold); the band union + self-join would
    # re-analyze that tree once per branch, so planning dominates the
    # query.  localCheckpoint materializes the (id, fp) pairs (two
    # 8-byte columns) and truncates the lineage — downstream plans see
    # a leaf.
    fpx = fp.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp")
    ).localCheckpoint()
    bands = []
    for b in range(n_bands):
        lo = b * width
        w = width if b < n_bands - 1 else n_bits - lo  # last band takes remainder
        slice_val = F.shiftright(F.shiftleft(F.col("_fp"), 64 - lo - w), 64 - w)
        bands.append(
            fpx.select(
                "_id", "_fp", F.lit(b).alias("_band"), slice_val.alias("_slice")
            )
        )
    banded = reduce(lambda x, y: x.unionByName(y), bands)
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["_band", "_slice"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            F.bit_count(F.col("x._fp").bitwiseXOR(F.col("y._fp"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def write_digest_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist a bucket-partitioned content-digest index — the
    document analog of the crawl's seen-set deltas (plans/state.py):
    ``bucket = pmod(hash(md5(text)), n_buckets)`` hive dirs, so an
    incremental dedup pass can prune to one bucket's files per task."""
    (
        docs.select(
            F.col(id_col).alias("keeper_id"),
            F.md5(F.col(text_col)).alias("digest"),
        )
        .withColumn("bucket", F.pmod(F.hash("digest"), F.lit(n_buckets)))
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def compact_digest_index(
    spark,
    index_paths: list[str],
    out_path: str,
    n_buckets: int = 32,
) -> str:
    """Fold many digest-index deltas into ONE bucketed index — the
    content-dedup analog of FrontierScheduler.compact_seen (and of
    Iceberg rewrite-data-files): incremental ingest appends a delta
    index per batch (:func:`write_digest_index`), and the per-task
    probe cost of :func:`filter_new_digests` grows with the delta
    count until a periodic compaction folds them.

    Overlapping digests keep the LOWEST keeper_id, so the fold is
    order-independent: the same keeper wins no matter how the deltas
    are grouped or which batch indexed the content first (min is
    associative) — pinned by ``test_digest_compaction``.  One read +
    one groupBy shuffle on the 16-byte digest + one partitioned
    write; linear in index size, bucket-parallel."""
    from functools import reduce as _reduce

    dfs = [
        spark.read.parquet(p).select("keeper_id", "digest") for p in index_paths
    ]
    merged = (
        _reduce(lambda a, b: a.unionByName(b), dfs)
        .groupBy("digest")
        .agg(F.min("keeper_id").alias("keeper_id"))
        .withColumn("bucket", F.pmod(F.hash("digest"), F.lit(n_buckets)))
        .repartition(n_buckets, "bucket")
    )
    merged.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
    return out_path


def filter_new_digests(
    docs: DataFrame,
    index_paths: list[str],
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """INCREMENTAL exact dedup: rows of ``docs`` whose text digest is
    NOT in the persistent digest index — new content only, without
    re-shuffling the ever-growing index each batch.

    Same design as the crawl's bucket-pruned seen check
    (operators/seenjoin.py): docs repartition by the index's bucket
    key, each task reads ONLY its buckets' ``bucket=K/`` dirs and
    probes a cached pd.Index (vectorized, hash table built once per
    bucket).  At 10^10 indexed documents the plain ``left_anti``
    re-shuffles the whole index every incremental batch; this path
    stays O(batch + touched-bucket files).

    Returns (id, text_md5) of the unseen rows."""
    keyed = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_md5")
    ).withColumn("_bucket", F.pmod(F.hash("text_md5"), F.lit(n_buckets)))
    part = keyed.repartition(n_buckets, F.col("_bucket"))
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in docs.schema.fields
    )[id_col]
    out_schema = f"{id_col} {id_type}, text_md5 string"

    def run(batches):
        import os

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        cache: dict[int, "pd.Index"] = {}

        def load(bucket: int) -> "pd.Index":
            frames = []
            for p in index_paths:
                d = os.path.join(p, f"bucket={bucket}")
                if os.path.isdir(d):
                    frames.append(
                        pq.read_table(d, columns=["digest"]).to_pandas()
                    )
            if not frames:
                return pd.Index([], dtype=object)
            t = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
            return pd.Index(pd.unique(t["digest"].to_numpy()))

        for pdf in batches:
            if not len(pdf):
                continue
            buckets = pdf["_bucket"].to_numpy()
            digests = pdf["text_md5"].to_numpy()
            mask = np.empty(len(pdf), dtype=bool)
            for b in np.unique(buckets):
                sel = buckets == b
                idx = cache.get(int(b))
                if idx is None:
                    idx = cache[int(b)] = load(int(b))
                if len(idx) == 0:
                    mask[sel] = True
                else:
                    mask[sel] = idx.get_indexer(digests[sel]) == -1
            yield pdf.loc[mask, [id_col, "text_md5"]]

    return part.mapInPandas(run, schema=out_schema)


def write_band_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 32,
    n_bands: int = 16,
    hash_family: str = "xxhash64",
    n_buckets: int = 32,
    shingle_impl: str = "arrow",
) -> None:
    """Persist the FUZZY-dedup state for a document batch — the
    MinHash analog of :func:`write_digest_index`, and the third leg of
    the incremental family (digests → :func:`filter_new_digests`,
    clusters → ``components.incremental_components``, pairs → this +
    :func:`incremental_lsh_pairs`).

    Two hive-partitioned tables under ``path``:

    * ``bands/``: ``(_id, _band, _sig)`` partitioned by
      ``bucket = pmod(hash(_sig), n_buckets)`` — the collision join's
      key layout, so a later batch's probe prunes to matching bucket
      dirs (dynamic partition pruning against the small new side).
    * ``shingles/``: ``(_id, _n, _s)`` partitioned by
      ``bucket = pmod(hash(_id), n_buckets)`` — the exact-Jaccard
      confirm's retrieval layout, read candidate-pruned.

    Band signatures come from the SAME ``_band_signatures`` build as
    :func:`minhash_lsh_pairs`, so cross-batch collisions are
    bit-identical to a full-corpus run."""
    ex = shingle_rows(docs, id_col, text_col, k, impl=shingle_impl)
    # r7: on the md5/arrow path _band_signatures re-shingles from
    # ``docs`` inside its own Arrow pass and never reads ``ex`` — the
    # shingle table then has exactly ONE consumer (the shingles write)
    # and a persist would only add a cache-write pass.  The JVM-agg
    # path consumes ``ex`` twice (signature agg + shingles write), so
    # it keeps the persist.
    arrow_sigs = docs is not None and hash_family == "md5"
    if not arrow_sigs:
        ex = ex.persist()
    banded = _band_signatures(
        ex, n_hashes, n_bands, hash_family,
        docs=docs, id_col=id_col, text_col=text_col, k=k,
    )

    def _write(df: DataFrame, part_col: str, sub: str) -> None:
        (
            df.withColumn("bucket", F.pmod(F.hash(part_col), F.lit(n_buckets)))
            .repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path.rstrip("/") + "/" + sub)
        )

    if arrow_sigs:
        # the two writes share no lineage here (bands come from the
        # Arrow doc pass, shingles from ``ex``) — submit them from two
        # driver threads so the second job back-fills the first's tail
        # (guide §2.6); output files are identical either way.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        # pass the SESSION so job tags/local properties are inherited
        # by the worker threads (the bare-callable form warns and
        # drops tags on Spark 4)
        wrap = inheritable_thread_target(docs.sparkSession)
        jobs = (
            lambda: _write(banded, "_sig", "bands"),
            lambda: _write(ex, "_id", "shingles"),
        )
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(wrap(j)) for j in jobs]
            for f in futs:
                f.result()
    else:
        _write(banded, "_sig", "bands")
        _write(ex, "_id", "shingles")
        ex.unpersist()


def compact_band_index(
    spark,
    index_paths: list[str],
    out_path: str,
    n_buckets: int = 32,
) -> str:
    """Fold many band-index deltas into ONE — same maintenance cadence
    as :func:`compact_digest_index` (probe cost grows with the delta
    COUNT: each incremental batch lists/reads every delta's matching
    buckets until a compaction folds them).  Batches index disjoint
    documents (the :func:`filter_new_digests`-first flow guarantees
    it), so the fold is a pure re-bucketing union — one read + one
    partitioned write per table, no dedup shuffle."""
    base = out_path.rstrip("/")
    for sub in ("bands", "shingles"):
        dfs = [
            spark.read.parquet(p.rstrip("/") + "/" + sub) for p in index_paths
        ]
        merged = reduce(lambda a, b: a.unionByName(b), dfs)
        (
            merged.repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(base + "/" + sub)
        )
    return out_path


def incremental_lsh_pairs(
    new_docs: DataFrame,
    index_paths: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 32,
    n_bands: int = 16,
    threshold: float = 0.5,
    hash_family: str = "xxhash64",
    n_buckets: int = 32,
    shingle_impl: str = "arrow",
    cleanup: list | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """INCREMENTAL MinHash-LSH: confirmed near-dup pairs TOUCHING the
    new batch — ``(id_a, id_b, jaccard)``, exactly the rows a
    full-corpus :func:`minhash_lsh_pairs` over (indexed ∪ new) emits
    with at least one new id — WITHOUT re-banding or re-joining
    history.  Candidate collisions are batch-independent (a pair
    collides on a band or it doesn't, whoever indexed first), so
    feeding these pairs to ``incremental_components`` keeps cluster
    keepers identical to a from-scratch run; old-old pairs were
    emitted by earlier batches.

    Scale shape (the reason this exists): per batch, the ever-growing
    index contributes (a) a bands-side equi-join pruned to the new
    batch's ``bucket=`` dirs by a STATIC partition filter — the
    batch's distinct bucket values (≤ ``n_buckets`` ints, one bounded
    collect, the seenjoin discipline: deterministic pruning instead
    of trusting the DPP heuristic, which declines here because the
    broadcast side carries no selective predicate) — so the probe is
    O(new bands + colliding buckets), not O(index); and (b) a
    shingles read pruned the same way to the CANDIDATE ids' buckets,
    then row-pruned by a broadcast semi-join on the candidate ids
    (bounded by the collision count, not the corpus).  Nothing
    re-shuffles history.  ``new_docs`` must be disjoint from indexed
    docs — run :func:`filter_new_digests` first, same contract as the
    digest index.  ``cleanup``: receives the persisted new-batch
    shingle index (same contract as :func:`minhash_lsh_pairs`).
    ``stats_out``: receives the probe/confirm scan plans
    (``bands_plan``/``shingles_plan``) so tests and plan audits can
    assert the partition filters engaged."""
    from pyspark import StorageLevel

    spark = new_docs.sparkSession
    ex_new = shingle_rows(new_docs, id_col, text_col, k, impl=shingle_impl).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if cleanup is not None:
        cleanup.append(ex_new)
    banded_new = _band_signatures(
        ex_new, n_hashes, n_bands, hash_family,
        docs=new_docs, id_col=id_col, text_col=text_col, k=k,
    ).withColumn("bucket", F.pmod(F.hash("_sig"), F.lit(n_buckets)))
    # the new batch is the small side everywhere below; lineage-cut it
    # (band build = n_hashes aggregates re-analyzed per consumer) and
    # let the 2-col table broadcast.  The static pruning key (≤
    # n_buckets ints of driver traffic) rides the SAME materialization
    # as a collect_set Observation instead of a separate distinct+
    # collect job (r7 — the checkpoint already scans every row).
    bucket_obs = Observation()
    banded_new = banded_new.observe(
        bucket_obs, F.collect_set("bucket").alias("buckets")
    ).localCheckpoint()
    new_buckets = list(bucket_obs.get["buckets"])
    old_bands = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(p.rstrip("/") + "/bands")
            for p in index_paths
        ],
    ).where(F.col("bucket").isin(new_buckets))
    cand_new_old = (
        old_bands.join(
            F.broadcast(banded_new.select("bucket", "_band", "_sig", F.col("_id").alias("_nid"))),
            ["bucket", "_band", "_sig"],
        )
        .select(
            F.least("_id", "_nid").alias("id_a"),
            F.greatest("_id", "_nid").alias("id_b"),
        )
    )
    if stats_out is not None:
        stats_out["bands_plan"] = (
            cand_new_old._jdf.queryExecution().executedPlan().toString()
        )
    cand_new_new = (
        banded_new.alias("x")
        .join(banded_new.alias("y"), ["_band", "_sig"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
    )
    # confirm = exact Jaccard over true shingle sets; the index side
    # is file-pruned to the candidate ids' buckets then row-pruned by
    # a broadcast semi-join (candidate count is collision-bounded).
    # Both sides' bucket sets (≤ n_buckets ints each) ride the cand
    # checkpoint as Observation metrics — two fewer driver-barrier
    # jobs than the old distinct-collect per table (r7).
    cand_obs = Observation()
    cand = (
        cand_new_old.unionByName(cand_new_new)
        .distinct()
        .observe(
            cand_obs,
            F.collect_set(
                F.pmod(F.hash("id_a"), F.lit(n_buckets))
            ).alias("ba"),
            F.collect_set(
                F.pmod(F.hash("id_b"), F.lit(n_buckets))
            ).alias("bb"),
        )
        .localCheckpoint()
    )
    cand_metrics = cand_obs.get
    cand_buckets = sorted(set(cand_metrics["ba"]) | set(cand_metrics["bb"]))
    # cand_ids now has a single consumer (the broadcast semi-join) and
    # derives from the checkpointed cand — no extra checkpoint needed
    cand_ids = (
        cand.select(F.col("id_a").alias("_id"))
        .unionByName(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    old_sh = (
        reduce(
            lambda a, b: a.unionByName(b),
            [
                spark.read.parquet(p.rstrip("/") + "/shingles")
                for p in index_paths
            ],
        )
        .where(F.col("bucket").isin(cand_buckets))
        .join(F.broadcast(cand_ids), "_id", "left_semi")
    )
    if stats_out is not None:
        stats_out["shingles_plan"] = (
            old_sh._jdf.queryExecution().executedPlan().toString()
        )
    # r7: prune the NEW side to candidate ids too — the confirm's
    # attach joins are inner on the pair ids, so docs in no candidate
    # pair never contribute, yet the whole batch's shingles were
    # feeding the collect_set aggregate (the old side was already
    # candidate-pruned).  cand_ids derives from the checkpointed cand,
    # so the extra consumer re-runs only a tiny distinct.  Measured
    # flat at bench shape (the aggregate was not the warm cost), kept
    # because it bounds the confirm by the collision count instead of
    # the batch size — the operator's own scale contract.
    ex_all = old_sh.select("_id", "_n", "_s").unionByName(
        ex_new.select("_id", "_n", "_s").join(
            F.broadcast(cand_ids), "_id", "left_semi"
        )
    )
    return _confirm_pairs(cand, ex_all, threshold, cleanup=cleanup)


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
) -> DataFrame:
    """CCNet-style chunk-level exact dedup: split every document into
    non-overlapping ``chunk_words``-word chunks, keep only the FIRST
    corpus-wide occurrence of each chunk (first = lowest
    ``(doc_id, chunk_idx)``, the CCNet paragraph-dedup convention),
    and reassemble each document from its surviving chunks.

    Returns one row per input doc:
    ``(doc_id, text_dedup, n_chunks, n_kept)`` — ``text_dedup`` is ''
    for a document whose every chunk first appeared elsewhere (the
    fully-boilerplate page that web dedup exists to drop).

    Spark shape: chunking is pure higher-order functions inside
    whole-stage codegen (sequence/transform/slice — the same
    materialize-the-token-array-first rule as :func:`word_shingles`);
    first-occurrence is a ``min_by`` AGGREGATE on ``md5(chunk)``
    (16-byte shuffle key, not the chunk text) joined back on the
    hash, NOT a row_number window: at web scale one universal
    boilerplate chunk (cookie banner, nav footer) puts 10^8 rows
    under a single window key, and a window's hot partition cannot be
    split — while the aggregate combines map-side to one row per
    chunk before the exchange, and AQE's skew-join splitting handles
    the join's probe side.  Reassembly is ONE groupBy(doc) with an
    order-struct collect.  Three hash-partitioned shuffles, every one
    combiner-friendly or skew-splittable — the CCNet sharded-hash
    layout re-expressed declaratively.

    Reference analog: the dedup responsibility of the reference's
    seen-set (crypto-crawler/src/crawlers/utils.rs:557-561) applied to
    page CONTENT instead of urls — sub-document granularity is what a
    training-data pipeline needs (boilerplate navigation/footer chunks
    repeat across most pages of a host).
    """
    from ..functions.partitioning import spread_small_scan

    w = chunk_words
    words_col = "_cd_words"
    # r7: chunking (sequence/transform/slice HOFs + md5 per chunk) is
    # map-side CPU — spread the single-split bench scan first
    out = spread_small_scan(df.select(id_col, text_col)).withColumn(
        words_col, F.split(F.col(text_col), " ")
    )
    words = F.col(words_col)
    n_chunks = F.ceil(F.size(words) / F.lit(float(w))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * w + 1, w)),
    )
    exploded = out.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    ).withColumn("_chash", F.md5("chunk"))
    firsts = exploded.groupBy("_chash").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("_first")
    )
    flagged = exploded.join(firsts, "_chash").withColumn(
        "kept",
        (
            (F.col(f"_first.{id_col}") == F.col(id_col))
            & (F.col("_first.chunk_idx") == F.col("chunk_idx"))
        ).cast("int"),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept") == 1,
                                F.struct("chunk_idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
            ).alias("text_dedup"),
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
    )
