from .urls import canonicalize_url, canonicalize_udf, host_of_url, host_udf
from .hashing import murmur3_32, hash_cols
from .text import (
    extract_text_py,
    extract_text_udf,
    extract_outlinks_py,
    outlinks_udf,
)

__all__ = [
    "canonicalize_url",
    "canonicalize_udf",
    "host_of_url",
    "host_udf",
    "murmur3_32",
    "hash_cols",
    "extract_text_py",
    "extract_text_udf",
    "extract_outlinks_py",
    "outlinks_udf",
]
