"""rkmh_spark — a PySpark-native near-duplicate detection + clustering engine.

Re-grounds the bottom-k MinHash sketching loop of edawson/rkmh
(/root/reference/src/rkmh.cpp) into web-scale text dedup over a pages table
``(url string, warc_ts timestamp, html binary, text string, lang string)``:

    pages → k-byte shingles → murmur3_x64_128(seed=42) low-64 hashes
          → bottom-s MinHash sketch (mapInPandas, Arrow-batched)
          → LSH banding (posexplode + groupBy, hot-bucket salting)
          → exact sketch-Jaccard verification of candidate pairs
          → iterative connected components → cluster assignments

Design notes: every cross-row operation is a native DataFrame op so Catalyst
can plan it; per-row kernels are vectorized NumPy inside pandas UDFs (no
per-row Python). See SURVEY.md for the reference-operator mapping.
"""

from rkmh_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
