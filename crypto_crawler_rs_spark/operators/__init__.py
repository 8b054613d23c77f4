from .rank import global_rank
from .pop import pop_per_host
from .packing import pack_commands
from .dedup import (
    exact_dedup,
    word_shingles,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash64,
    simhash_fingerprints,
    simhash_pairs,
)
from .similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    cosine_neardup_pairs,
    lsh_bucket_signatures,
    with_unit_vectors,
)
from .multimodal import extract_media_features, gen_media_fixture, sniff_format
from .seenjoin import filter_unseen_bucket_pruned

__all__ = [
    "global_rank",
    "pop_per_host",
    "pack_commands",
    "exact_dedup",
    "word_shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_fingerprints",
    "simhash_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "cosine_neardup_pairs",
    "lsh_bucket_signatures",
    "with_unit_vectors",
    "extract_media_features",
    "gen_media_fixture",
    "sniff_format",
    "filter_unseen_bucket_pruned",
]
