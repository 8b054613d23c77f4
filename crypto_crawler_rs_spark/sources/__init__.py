from .fixtures import PAGES_SCHEMA, corpus_to_parquet, corpus_to_spark, gen_corpus
from .robots import parse_robots_txt, robots_policy
from .sitemap import parse_sitemap, sitemap_urls
from .tpch import load_tables
from .warc import pages_from_warc, stream_pages_from_warc, write_warc

__all__ = [
    "PAGES_SCHEMA",
    "corpus_to_parquet",
    "corpus_to_spark",
    "gen_corpus",
    "load_tables",
    "pages_from_warc",
    "parse_robots_txt",
    "parse_sitemap",
    "robots_policy",
    "sitemap_urls",
    "stream_pages_from_warc",
    "write_warc",
]
