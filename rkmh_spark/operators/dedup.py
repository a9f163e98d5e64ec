"""End-to-end near-duplicate detection pipeline (the flagship dataflow).

pages → signatures → [doc-freq hot-shingle filter] → LSH candidates →
exact verification → connected components → assignments(url, cluster_id).

Mirrors rkmh stream/classify's lifecycle (/root/reference/src/rkmh.cpp:584-948)
with the all-pairs comparison replaced by LSH (SURVEY.md §3.1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from rkmh_spark.config import DedupConfig
from rkmh_spark.operators.components import connected_components
from rkmh_spark.operators.docfreq import hot_shingles, shingle_doc_frequency
from rkmh_spark.operators.lsh import band_buckets, candidate_pairs
from rkmh_spark.operators.signatures import (
    compute_signatures,
    compute_signatures_min_occ,
)
from rkmh_spark.operators.verify import brute_force_pairs, verify_pairs


def keep_representatives(pages: DataFrame, assignments: DataFrame) -> DataFrame:
    """S8 graft role ('filter' sink, /root/reference/src/rkmh.cpp:1298-1310):
    re-emit only the pages that pass — here, one representative per cluster
    (the min-url member, which IS the cluster id under the min-label rule).
    """
    return pages.join(
        assignments.where(F.col("url") == F.col("cluster_id")).select("url"),
        "url",
        "left_semi",
    )


@dataclass
class DedupResult:
    signatures: DataFrame
    pairs: DataFrame          # verified dup pairs (url_a, url_b, shared, est_jaccard)
    assignments: DataFrame    # (url, cluster_id)


def dedup_pages(
    pages: DataFrame,
    cfg: DedupConfig,
    use_lsh: bool = True,
    containment_threshold: float | None = None,
    url_dedup_first: bool = False,
) -> DedupResult:
    """Run the full dedup pipeline; ``use_lsh=False`` = exhaustive verify
    (the reference's own mechanism, for fixtures/recall oracles).

    ``containment_threshold``: when set, LSH candidates additionally go
    through the containment pass (Broder threshold-restricted estimate →
    exact substring confirmation against the page texts) and confirmed
    asymmetric dups become extra edges for clustering — catches
    truncation/mirror-with-chrome dups whose symmetric Jaccard is low.

    ``url_dedup_first``: run the url-level pre-pass (keep the newest
    fetch per canonical url, functions/urls.py) before any sketching —
    the standard crawl pipeline ordering; refetches and tracking-param
    spellings never reach the shingle kernel. Default off so the pinned
    content-dedup gates measure the content path alone.
    """
    if url_dedup_first:
        from rkmh_spark.functions.urls import url_dedup

        pages = url_dedup(pages).drop("canonical_url")
    to_unpersist: list = []
    if cfg.min_occ is not None:
        # F4 (rkmh -M): global-occurrence filter — relational rebuild (the
        # keep-set is unbroadcastable at scale); composes -I when both set
        sigs = compute_signatures_min_occ(pages, cfg)
    elif cfg.max_doc_freq is not None:
        # -I: the hot set is small by construction for sane thresholds
        # (boilerplate), but COUNT before collecting — a low threshold on
        # a huge corpus would otherwise OOM the driver. Past the guard,
        # the relational anti-join spelling (same machinery as -M) drops
        # hot shingles with a shuffle instead of a broadcast.
        dfreq = shingle_doc_frequency(pages, cfg).persist()
        n_hot = (
            dfreq.where(F.col("df") > cfg.max_doc_freq)
            .limit(cfg.hot_broadcast_limit + 1)
            .count()
        )
        if n_hot > cfg.hot_broadcast_limit:
            # dfreq feeds the lazy doc-freq join — unpersist only after
            # the pairs count materializes the whole signature chain
            sigs = compute_signatures_min_occ(pages, cfg, doc_freq=dfreq)
            to_unpersist.append(dfreq)
        else:
            drop = hot_shingles(dfreq, cfg.max_doc_freq)
            sigs = compute_signatures(pages, cfg, drop_hashes=drop)
            dfreq.unpersist()
    else:
        sigs = compute_signatures(pages, cfg)
    sigs = sigs.persist()

    multi_use = containment_threshold is not None
    if use_lsh:
        buckets = band_buckets(sigs, cfg)
        # containment path reads candidates twice → eager checkpoint;
        # plain dedup consumes them once → lazy (checkpoint measured 2×
        # the candidate-stage wall), with the census persist handed back
        # for unpersist after pairs materialize
        cands = candidate_pairs(
            buckets, cfg, materialize=multi_use, cleanup=to_unpersist
        )
        pairs = verify_pairs(cands, sigs, cfg)
    else:
        cands = None
        pairs = brute_force_pairs(sigs, cfg)

    # ONE count job both materializes the persisted pairs and hands the
    # edge count to connected_components (skips its limit().count() job)
    pairs = pairs.persist()
    n_pairs = pairs.count()
    for h in to_unpersist:
        h.unpersist()
    edges = pairs.select("url_a", "url_b")
    if containment_threshold is not None and cands is not None:
        from rkmh_spark.operators.containment import (
            confirm_substring,
            containment_candidates,
            containment_pairs,
        )

        # asymmetric dups need their own candidates: symmetric-Jaccard
        # banding misses them by construction (see containment_candidates)
        ccands = cands.unionByName(
            containment_candidates(sigs, cfg)
        ).distinct()
        contained = containment_pairs(ccands, sigs, cfg, containment_threshold)
        confirmed = confirm_substring(contained, pages)
        edges = edges.unionByName(
            confirmed.select("url_a", "url_b")
        ).distinct()
        n_pairs = None  # containment edges added — count no longer known

    labels = connected_components(
        edges, cfg.max_cc_iterations, n_edges=n_pairs,
        driver_threshold=cfg.cc_driver_threshold,
    )
    assignments = (
        pages.select("url")
        .join(labels.withColumnRenamed("node", "url"), "url", "left")
        .select("url", F.coalesce("label", "url").alias("cluster_id"))
    )
    return DedupResult(signatures=sigs, pairs=pairs, assignments=assignments)
