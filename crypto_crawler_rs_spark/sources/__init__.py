from .fixtures import gen_corpus, corpus_to_parquet, PAGES_SCHEMA
from .tpch import load_tables

__all__ = ["gen_corpus", "corpus_to_parquet", "PAGES_SCHEMA", "load_tables"]
