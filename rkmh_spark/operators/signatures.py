"""Stage 1 — signature computation (SURVEY.md §7.2 M1).

pages(url, warc_ts, html, text, lang) → signatures(url, sketch, minhash,
n_shingles).

One ``mapInPandas`` pass: Arrow delivers columnar batches, the whole batch's
shingles are hashed in a single vectorized murmur3 call, and only the
signatures leave the worker — the full hash arrays never hit the shuffle.
This is the Spark reshaping of rkmh's per-read OpenMP loop (calc_hashes →
minhashes, /root/reference/src/rkmh.cpp:845-863): thread parallelism
becomes partition parallelism, the per-read task becomes a per-batch
vectorized kernel.

Two signatures per page, from the same murmur pass:
- ``sketch``: bottom-s multiset sketch — the REFERENCE-PARITY object; exact
  verification and recall accounting use only this.
- ``minhash``: K = num_bands*band_rows One-Permutation-Hashing minima
  (bin = h mod K, per-bin min, rotation densification) — the LSH banding
  object. Bottom-k slices don't band (one differing small hash shifts all
  later positions); per-bin minima do, at O(n) instead of O(n*K).

Scale notes:
- Output is O(s + K) longs/doc regardless of document size, so the
  signatures table for 10^12 docs is shuffle-friendly and checkpointable.
- The hot-shingle filter arrives as a broadcast (driver-collected) int64
  array — by construction it only contains shingles present in more than
  ``max_doc_freq`` documents, so it stays small (it is the boilerplate set).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from rkmh_spark.config import DedupConfig
from rkmh_spark.functions.shingles import sketch_texts_batch


def signatures_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("sketch", T.ArrayType(T.LongType()), False),
            T.StructField("minhash", T.ArrayType(T.LongType()), False),
            T.StructField("n_shingles", T.LongType(), False),
        ]
    )


def compute_signatures(
    pages: DataFrame,
    cfg: DedupConfig,
    drop_hashes: np.ndarray | None = None,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """pages → (url, sketch, minhash, n_shingles); arrays bit-cast u64→i64."""
    k, s, seed = cfg.k, cfg.sketch_size, cfg.hash_seed
    num_perms = cfg.num_bands * cfg.band_rows
    banned = None
    if drop_hashes is not None and len(drop_hashes):
        banned = np.sort(np.asarray(drop_hashes, dtype=np.int64).view(np.uint64))

    # Column-prune before the python worker: only url+text cross Arrow.
    narrow = pages.select(url_col, text_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sketches, minhashes, counts = sketch_texts_batch(
                pdf[text_col].tolist(), k, s, seed,
                drop_hashes=banned, num_bins=num_perms,
            )
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].values,
                    "sketch": sketches,
                    "minhash": minhashes,
                    "n_shingles": counts,
                }
            )

    return narrow.mapInPandas(kernel, schema=signatures_schema())
