"""connected_components / dedup_keep_list vs an independent
union-find oracle, including the end-to-end MinHash-pairs -> clusters
-> keeper pipeline on the planted near-dup corpus."""

from __future__ import annotations

import pytest


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def _cc(spark, pairs, **kw):
    from crypto_crawler_rs_spark.operators.components import connected_components

    df = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r.node: r.component for r in connected_components(df, **kw).collect()
    }


def test_components_chain_and_isolated_cluster(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)]
    got = _cc(spark, pairs)
    assert got == _union_find(pairs)
    assert got[4] == 1 and got[11] == 10 and got[21] == 20


def test_components_converges_before_max_iter(spark):
    # star graph: diameter 2 -> converges fast even with max_iter=30
    pairs = [(5, i) for i in range(6, 16)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {5}


def test_components_long_chain_random_order(spark):
    import random

    rng = random.Random(3)
    chain = [(i, i + 1) for i in range(40)]
    rng.shuffle(chain)
    got = _cc(spark, chain)
    assert got == _union_find(chain)
    assert set(got.values()) == {0}


def test_dedup_keep_list_semantics(spark):
    from crypto_crawler_rs_spark.operators.components import dedup_keep_list

    df = spark.createDataFrame([(7, 3), (3, 9)], "src long, dst long")
    out = {r.node: (r.keeper, r.is_keeper) for r in dedup_keep_list(df).collect()}
    assert out == {3: (3, True), 7: (3, False), 9: (3, False)}


def test_minhash_pairs_to_keepers_end_to_end(spark):
    """The full recipe: LSH pairs over the documents table ->
    components -> keep list; every cluster keeps exactly its min
    doc_id and the keep list covers exactly the paired docs."""
    from crypto_crawler_rs_spark.operators.components import dedup_keep_list
    from crypto_crawler_rs_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, k=3, n_hashes=32, n_bands=16, threshold=0.05
    ).select("id_a", "id_b")
    pair_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert pair_rows, "fixture corpus must contain planted near-dups"
    keep = dedup_keep_list(pairs, src="id_a", dst="id_b").toPandas()
    oracle = _union_find(pair_rows)
    assert {r.node: r.keeper for r in keep.itertuples()} == oracle
    # exactly one keeper per cluster, and it's the min id
    keepers = keep[keep.is_keeper]
    assert set(keepers.node) == set(oracle.values())


def test_chunk_dedup_identity_on_unique_corpus(spark):
    """Property: when every chunk is corpus-unique, chunk_dedup must
    reassemble each document byte-identically (n_kept == n_chunks)."""
    from crypto_crawler_rs_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 23)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    out = chunk_dedup(docs).toPandas().set_index("doc_id")
    src = {r.doc_id: r.text for r in docs.collect()}
    for i, row in out.iterrows():
        assert row.text_dedup == src[i]
        assert row.n_kept == row.n_chunks


def test_chunk_dedup_order_insensitive_keeper(spark):
    """Property: the kept occurrence is (doc_id, chunk_idx)-minimal
    regardless of input row order."""
    from crypto_crawler_rs_spark.operators.dedup import chunk_dedup

    rows = [
        (9, "shared chunk words one two three four five six seven"),
        (2, "shared chunk words one two three four five six seven"),
    ]
    for order in (rows, rows[::-1]):
        out = (
            chunk_dedup(spark.createDataFrame(order, "doc_id long, text string"))
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[2, "n_kept"] == 1  # min doc_id keeps
        assert out.loc[9, "n_kept"] == 0
        assert out.loc[9, "text_dedup"] == ""


def test_finisher_paths_agree_with_loop(spark):
    """r6 local finisher: the bounded union-find short-circuit must
    produce exactly the labeling the pure iterative loop produces —
    on a deep chain (stale jump-truncation pointers), a hub star
    (degree-aware gate), and a mixed graph."""
    import random

    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(120)]
    hub = [(500, 500 + i) for i in range(1, 60)]
    mixed = chain + hub + [(119, 500)]
    rng.shuffle(mixed)
    for pairs in (chain, hub, mixed):
        st_fin: dict = {}
        fin = _cc(spark, pairs, stats_out=st_fin)
        loop = _cc(spark, pairs, finish_candidate_rows=0)
        assert fin == loop == _union_find(pairs)
        assert st_fin.get("finisher_engaged"), "finisher should engage on tiny graphs"


def test_finisher_overflow_falls_back_to_loop(spark):
    """A 1-row collect cap forces the overflow branch every round;
    the loop must still converge to the oracle (nothing mutated by
    the abandoned attempt)."""
    pairs = [(i, i + 1) for i in range(50)] + [(100, 101), (101, 102)]
    st: dict = {}
    got = _cc(spark, pairs, finish_collect_rows=1, stats_out=st)
    assert got == _union_find(pairs)
    # the cap forced several overflow fallback rounds (an unconstrained
    # finisher resolves this graph at iteration 1); once the residual
    # fits under the 1-row cap it may engage trivially
    assert st["iterations"] >= 3
    assert st.get("finisher_pairs", 0) <= 1


def test_finisher_random_graphs_match_union_find(spark):
    """Seeded sweep over arbitrary graph shapes (random sparse, dense
    blob, parallel chains bridged late, self-referential dup edges):
    the finisher-enabled default must equal the union-find oracle on
    every one.  Catches residual-set completeness holes the curated
    chain/hub fixtures can't."""
    import random

    rng = random.Random(61)
    cases = []
    # random sparse graphs at several densities over a sparse id space
    for n_edges, id_space in ((30, 40), (60, 45), (120, 300)):
        cases.append(
            [
                (rng.randrange(id_space), rng.randrange(id_space))
                for _ in range(n_edges)
            ]
        )
    # parallel chains merged by one late bridge (worst case for jump
    # truncation: deep chains whose min labels meet only at the end)
    chains = [
        (base + i, base + i + 1) for base in (0, 1000, 2000) for i in range(25)
    ]
    cases.append(chains + [(25, 1000), (1025, 2000)])
    # duplicate + reversed + self-loop edges
    cases.append([(4, 9), (9, 4), (4, 9), (7, 7), (9, 12), (12, 4)])
    for pairs in cases:
        pairs = [p for p in pairs if p[0] != p[1]] or [(1, 2)]
        assert _cc(spark, pairs) == _union_find(pairs), f"mismatch on {pairs[:8]}..."


def _inc(spark, prior, new_pairs, **kw):
    from crypto_crawler_rs_spark.operators.components import (
        incremental_components,
    )

    p = spark.createDataFrame(prior, "node long, component long")
    n = spark.createDataFrame(new_pairs, "src long, dst long")
    return {
        r.node: r.component
        for r in incremental_components(p, n, **kw).collect()
    }


def test_incremental_matches_full_recompute(spark):
    """components(prior_labels ∪ new_pairs) == components(all pairs):
    the prior labeling is a contracted spanning forest, so folding a
    new batch into it must equal re-clustering history."""
    import random

    rng = random.Random(17)
    all_pairs = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    all_pairs = [p for p in all_pairs if p[0] != p[1]]
    b1, b2 = all_pairs[:40], all_pairs[40:]
    prior = sorted(_cc(spark, b1).items())
    got = _inc(spark, prior, b2)
    assert got == _union_find(all_pairs)


def test_incremental_singletons_and_merge(spark):
    # prior: singletons 5 and 9, component {1,2}; new pairs merge 9
    # with a brand-new node and bridge nothing else
    prior = [(5, 5), (9, 9), (1, 1), (2, 1)]
    got = _inc(spark, prior, [(9, 30)])
    assert got == {5: 5, 9: 9, 30: 9, 1: 1, 2: 1}
    # a new pair bridging two prior components takes the min of minima
    got2 = _inc(spark, prior, [(2, 9)])
    assert got2 == {5: 5, 1: 1, 2: 1, 9: 1}


def test_incremental_untouched_components_stable(spark):
    """Keeper stability: components untouched by the new batch keep
    their exact labels (no relabeling churn for downstream dedup)."""
    prior = [(10, 10), (11, 10), (12, 10), (20, 20), (21, 20)]
    got = _inc(spark, prior, [(30, 31)])
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == got[21] == 20
    assert got[30] == got[31] == 30
