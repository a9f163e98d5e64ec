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
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from rkmh_spark.config import DedupConfig
from rkmh_spark.functions.shingles import (
    oph_minhash,
    shingle_hashes,
    sketch_texts_batch,
)


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


def compute_signatures_min_occ_approx(
    pages: DataFrame,
    cfg: DedupConfig,
    cms,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """F4 via the A5 Count-Min counter: keep a hash iff the CMS ESTIMATE
    of its global occurrence count >= cfg.min_occ — the literal Spark
    reshaping of the reference's doReadDepth loop (counter lookup per
    sorted hash, /root/reference/src/rkmh.cpp:1256-1267) with the counter
    broadcast instead of shared-memory-resident.

    vs the exact relational path (compute_signatures_min_occ): ZERO
    shuffles — one mapInPandas pass, the CMS table rides the closure
    (~0.5 MB). CMS estimates only over-count, so the kept set is a
    SUPERSET of the exact path's (the reference's own collision-mode
    direction, README.md:67-69); width sizes the error.
    """
    if cfg.min_occ is None:
        raise ValueError("requires cfg.min_occ")
    from rkmh_spark.functions.shingles import oph_minhash as _oph

    k, s, seed = cfg.k, cfg.sketch_size, cfg.hash_seed
    num_perms = cfg.num_bands * cfg.band_rows
    min_occ = int(cfg.min_occ)
    table, a, b, width, depth = cms.table, cms.a, cms.b, cms.width, cms.depth

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rkmh_spark.operators.docfreq import CountMinSketchNP

        local = CountMinSketchNP(width, depth, 0)
        local.table, local.a, local.b = table, a, b
        for pdf in batches:
            sketches, minhashes, counts = [], [], []
            for t in pdf[text_col].tolist():
                h = shingle_hashes(t if t is not None else "", k, seed)
                h = h[h != 0]
                counts.append(h.size)
                if h.size:
                    h = h[local.estimate(h) >= min_occ]
                hs = np.sort(h)
                sketches.append(hs[:s].view(np.int64))
                minhashes.append(_oph(hs, num_perms))
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].values,
                    "sketch": sketches,
                    "minhash": minhashes,
                    "n_shingles": np.asarray(counts, dtype=np.int64),
                }
            )

    return pages.select(url_col, text_col).mapInPandas(
        kernel, schema=signatures_schema()
    )


def compute_signatures_min_occ(
    pages: DataFrame,
    cfg: DedupConfig,
    depth: DataFrame | None = None,
    doc_freq: DataFrame | None = None,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """F4 (rkmh ``-M min_kmer_occ``): keep a hash iff its GLOBAL occurrence
    count >= cfg.min_occ, then bottom-s sketch the survivors
    (/root/reference/src/rkmh.cpp:1256-1267,1363-1374).

    The keep-set at web scale is every shingle seen >= M times — far too
    large to broadcast (the opposite regime from the hot-shingle drop-set,
    which is small by construction). So this path is relational:

      pages → per-doc distinct (url, hash, cnt)      [mapInPandas]
            ⋈ depth(hash, depth)                      [shuffle on hash]
            → groupBy(url) rebuild sketch + OPH       [applyInPandas]

    Both shuffles are bounded by Σ distinct shingles per doc (counts
    travel, not occurrences). ``depth`` defaults to the per-doc relation
    re-aggregated (one corpus pass total — r6; hash_depth_table spells
    the same table standalone); pass a precomputed one to share it with
    the variant caller. When cfg.max_doc_freq is also set, ``doc_freq`` (distinct-doc
    counts, rkmh ``-I``) is joined too and hot shingles are dropped before
    sketching — the two reference filters compose exactly as in the
    reference's doReadDepth branch.
    """
    if cfg.min_occ is None and cfg.max_doc_freq is None:
        raise ValueError(
            "compute_signatures_min_occ requires cfg.min_occ and/or "
            "cfg.max_doc_freq (relational -I-only mode)"
        )
    from rkmh_spark.operators.docfreq import shingle_doc_frequency

    k, s, seed = cfg.k, cfg.sketch_size, cfg.hash_seed
    num_perms = cfg.num_bands * cfg.band_rows

    def explode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, hs, cs = [], [], []
            for u, t in zip(pdf[url_col].tolist(), pdf[text_col].tolist()):
                h = shingle_hashes(t if t is not None else "", k, seed)
                h = h[h != 0]
                if h.size:
                    vals, cnts = np.unique(h, return_counts=True)
                else:  # keep the doc visible downstream (empty-sketch row)
                    vals = np.zeros(1, dtype=np.uint64)
                    cnts = np.zeros(1, dtype=np.int64)
                urls.append(np.repeat(u, vals.size))
                hs.append(vals.view(np.int64))
                cs.append(cnts)
            yield pd.DataFrame(
                {
                    "url": np.concatenate(urls) if urls else [],
                    "hash": np.concatenate(hs) if hs else [],
                    "cnt": np.concatenate(cs) if cs else [],
                }
            )

    per_doc = pages.select(url_col, text_col).mapInPandas(
        explode_kernel,
        schema=T.StructType(
            [
                T.StructField("url", T.StringType(), False),
                T.StructField("hash", T.LongType(), False),
                T.StructField("cnt", T.LongType(), False),
            ]
        ),
    )
    if cfg.min_occ is not None and depth is None:
        # the global depth table IS the per-doc relation re-aggregated:
        # depth(h) = Σ_docs cnt(doc, h). Deriving it here (r6) instead of
        # calling hash_depth_table saves a SECOND full tokenize+murmur
        # pass over the corpus — per_doc is materialized once
        # (localCheckpoint, O(Σ distinct shingles/doc) compact rows, the
        # same volume the depth shuffle already moves) and feeds both the
        # groupBy and the keep-join below. cnt=0 placeholder rows of
        # empty docs are excluded to match hash_depth_table exactly.
        per_doc = per_doc.localCheckpoint(eager=True)
        depth = (
            per_doc.where(F.col("cnt") > 0)
            .groupBy("hash")
            .agg(F.sum("cnt").alias("depth"))
        )
    if cfg.min_occ is not None:
        # the join loses nothing: every real hash of every doc appears in
        # the depth table (the doc itself contributed); the cnt=0
        # placeholder row of empty docs left-joins to NULL depth →
        # keep=false, cnt sum 0.
        joined = per_doc.join(depth, "hash", "left").withColumn(
            "keep",
            F.coalesce(F.col("depth"), F.lit(0)) >= F.lit(int(cfg.min_occ)),
        )
    else:
        # -I-only relational mode (hot set too large to broadcast): every
        # real hash starts kept; the doc-freq join below applies the drop
        joined = per_doc.withColumn("keep", F.col("cnt") > 0)
    if cfg.max_doc_freq is not None:
        if doc_freq is None:
            doc_freq = shingle_doc_frequency(pages, cfg, text_col=text_col)
        joined = joined.join(doc_freq, "hash", "left").withColumn(
            "keep",
            F.col("keep")
            & (F.coalesce(F.col("df"), F.lit(0)) <= F.lit(cfg.max_doc_freq)),
        )
    # ONE aggregation gathers each doc's kept (hash, cnt) pairs + totals;
    # the sketch rebuild then runs as a batched mapInPandas (one Python
    # call per Arrow batch) rather than applyInPandas' one call + one
    # DataFrame construction per GROUP — measured ~2× on 5k docs
    gathered = joined.groupBy("url").agg(
        F.sum("cnt").alias("n_shingles"),
        F.collect_list(F.when(F.col("keep"), F.col("hash"))).alias("khash"),
        F.collect_list(F.when(F.col("keep"), F.col("cnt"))).alias("kcnt"),
    )

    def rebuild(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sketches, minhashes = [], []
            for kh, kc in zip(pdf["khash"], pdf["kcnt"]):
                vals = np.asarray(kh, dtype=np.int64).view(np.uint64)
                cnts = np.asarray(kc, dtype=np.int64)
                order = np.argsort(vals)  # u64 order BEFORE the i64 bit-cast
                expanded = np.repeat(vals[order], cnts[order])
                sketches.append(expanded[:s].view(np.int64))
                minhashes.append(oph_minhash(vals[order], num_perms))
            yield pd.DataFrame(
                {
                    "url": pdf["url"].values,
                    "sketch": sketches,
                    "minhash": minhashes,
                    "n_shingles": pdf["n_shingles"].values,
                }
            )

    return gathered.mapInPandas(rebuild, schema=signatures_schema())
