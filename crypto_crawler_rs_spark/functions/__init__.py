from .urls import canonicalize_url, canonicalize_udf, host_of_url, host_udf
from .hashing import murmur3_32, hash_cols
from .text import (
    extract_text_py,
    extract_text_udf,
    extract_outlinks_py,
    outlinks_udf,
)
from .bloom import ShardedBloom, bloom_probe_udf, sharded_probe_col
from .payload import (
    decode_frame,
    decode_frame_udf,
    decompress_udf,
    hmac_sign_udf,
    pb_decode,
    pb_decode_udf,
    pb_encode,
    pb_encode_udf,
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
    "ShardedBloom",
    "bloom_probe_udf",
    "sharded_probe_col",
    "decode_frame",
    "decode_frame_udf",
    "decompress_udf",
    "hmac_sign_udf",
    "pb_decode",
    "pb_decode_udf",
    "pb_encode",
    "pb_encode_udf",
]
