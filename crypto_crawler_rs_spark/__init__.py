"""crypto_crawler_rs_spark — a PySpark-native crawl frontier & fetch scheduler.

A from-scratch re-expression of the capabilities of the reference
repo EvgeniiKobelev/crypto-crawler-rs (a Rust realtime exchange
crawler) as a batch-iterative URL frontier over partitioned tables of
Common-Crawl-style pages.  See /root/repo/SURVEY.md for the full
operator mapping.  This is NOT a port: the reference's per-connection
tokio task graph becomes DataFrame lineage between round super-steps;
its in-memory subscribed-set becomes a bucketed, bloom-prefiltered
``seen`` table; its token-bucket rate limiters become declarative
per-host budget windows.

Layout
------
functions/   pure column / pandas-UDF building blocks (urls, hashing,
             text, bloom)
sources/     deterministic fixture generators + testdata loaders
operators/   reusable dataframe operators (pop, dedup, similarity,
             packing)
plans/       the frontier scheduler round loop, state store, oracle
streaming/   structured-streaming variant of the ingest path
"""

__version__ = "0.1.0"
