"""Structured Streaming front-ends (reference ST1-ST3, SURVEY.md §2.8).

rkmh `stream` hashes the reference panel once, holds it resident, and
classifies reads as they arrive on STDIN in constant memory
(/root/reference/README.md:53-73, src/rkmh.cpp:1329-1414). The Spark
reshaping is a stream-static pattern: the panel is a static signatures
DataFrame (broadcast per micro-batch); new pages arrive via readStream
and each micro-batch runs the SAME batch kernels (signatures → band join →
verify → argmax) inside foreachBatch.

foreachBatch rather than a streaming join/agg: the reference's semantics
are arrival-order with no event-time (no watermark concept maps to it,
SURVEY.md §2.8), and foreachBatch lets the micro-batch reuse the exact
batch operators — one code path, two execution modes, which is also how
the correctness gate can cover streaming logic.

State across batches (incremental dedup): new pages match against the
panel AND get appended to it via the checkpointed signatures table, so a
page arriving in batch k can match a page from batch j<k. This is the
constant-memory growth model the reference documents (README.md:64-65) —
state = panel signatures only, never raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rkmh_spark.config import DedupConfig
from rkmh_spark.operators.classify import classify_pages
from rkmh_spark.operators.signatures import compute_signatures
from rkmh_spark.sources.pages import pages_schema


def classify_file_stream(
    spark: SparkSession,
    source_dir: str,
    ref_sigs: DataFrame,
    cfg: DedupConfig,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Classify newly arriving page files against a static panel.

    Returns the StreamingQuery; with ``available_now`` the query drains
    existing files and stops (test/batch-catchup mode), otherwise it runs
    continuously with the default micro-batch trigger (ST3: the buffered
    chunk loop, bufsz → micro-batch).
    """
    stream = (
        spark.readStream.schema(pages_schema())
        .format("parquet")
        .load(source_dir)
    )
    ref_sigs = ref_sigs.persist()  # hashed once, resident (rkmh.cpp:813-838)

    def handle(batch: DataFrame, batch_id: int) -> None:
        sigs = compute_signatures(batch, cfg)
        out = classify_pages(sigs, ref_sigs, cfg)
        out.write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    cfg: DedupConfig,
    signatures_dir: str,
    assignments_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental near-dup assignment for newly crawled pages.

    Per micro-batch: sketch the new pages; match them against the
    accumulated signatures table (panel); a new page matching an existing
    one inherits that page's cluster representative (min-url rule),
    otherwise it founds its own cluster; then the batch's signatures are
    appended to the panel. Within-batch dups resolve against the panel
    on the NEXT batch boundary only if unmatched — so batches are also
    self-joined here to catch intra-batch pairs.
    """
    import os

    from pyspark.sql import functions as F

    from rkmh_spark.operators.components import connected_components
    from rkmh_spark.operators.lsh import band_buckets, candidate_pairs
    from rkmh_spark.operators.verify import verify_pairs

    stream = (
        spark.readStream.schema(pages_schema())
        .format("parquet")
        .load(source_dir)
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        sigs_new = compute_signatures(batch, cfg).persist()

        have_panel = os.path.exists(os.path.join(signatures_dir, "_SUCCESS"))
        if have_panel:
            panel = spark.read.parquet(signatures_dir)
            combined = panel.unionByName(sigs_new)
        else:
            combined = sigs_new

        # candidates restricted to pairs touching the new batch
        buckets = band_buckets(combined, cfg)
        new_urls = sigs_new.select("url")
        pairs = candidate_pairs(buckets, cfg)
        pairs = pairs.join(
            new_urls.withColumnRenamed("url", "url_a"), "url_a", "left_semi"
        ).unionByName(
            pairs.join(
                new_urls.withColumnRenamed("url", "url_b"), "url_b", "left_semi"
            )
        ).distinct()
        verified = verify_pairs(pairs, combined, cfg)

        labels = connected_components(
            verified.select("url_a", "url_b"), cfg.max_cc_iterations
        )
        # cluster-id stability: if any component member already holds an
        # assignment from an earlier batch, the whole component adopts the
        # smallest such id (assignments are append-only; a later bridge
        # between two old clusters is recorded through the new pages only —
        # documented incremental-CC tradeoff).
        prev = (
            spark.read.parquet(assignments_dir)
            if os.path.exists(os.path.join(assignments_dir, "_SUCCESS"))
            else None
        )
        if prev is not None:
            inherit = (
                labels.join(
                    prev.withColumnRenamed("url", "node"), "node", "left"
                )
                .groupBy("label")
                .agg(F.min("cluster_id").alias("old_id"))
            )
            labels = labels.join(inherit, "label").select(
                "node", F.coalesce("old_id", "label").alias("label")
            )
        assign = (
            sigs_new.select("url")
            .join(labels.withColumnRenamed("node", "url"), "url", "left")
            .select("url", F.coalesce("label", "url").alias("cluster_id"))
        )
        assign.write.mode("append").parquet(assignments_dir)
        sigs_new.write.mode("append").parquet(signatures_dir)
        sigs_new.unpersist()

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
