from rkmh_spark.functions.murmur3 import murmur3_x64_128_low64, murmur3_scalar
from rkmh_spark.functions.urls import canonical_url, url_dedup
from rkmh_spark.functions.shingles import (
    shingle_hashes,
    bottom_s_sketch,
    sketch_text,
    multiset_intersection_size,
)

__all__ = [
    "canonical_url",
    "url_dedup",
    "murmur3_x64_128_low64",
    "murmur3_scalar",
    "shingle_hashes",
    "bottom_s_sketch",
    "sketch_text",
    "multiset_intersection_size",
]
