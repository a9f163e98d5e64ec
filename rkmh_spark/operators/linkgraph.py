"""Domain-level link graph from crawled HTML — the aggregation behind
seed selection, spam-domain detection, and crawl prioritization in a
web pipeline.

Reference analog: rkmh's read→reference hit aggregation (J5 membership
search + A11 per-class counts, /root/reference/src/rkmh.cpp:2666-2704)
— occurrences extracted per record, then counted per (source, target)
class pair; here the classes are registrable hosts.

Shape: one map-only projection (extract_links + host resolution, all
codegen regexps) -> explode -> one groupBy on (src_host, dst_host).
At 10^12 pages the single shuffle carries only the host-pair keys and
partial counts (map-side combine); hot pairs (intra-site navigation)
are bounded by per-site page counts, and the groupBy reducer sees one
partial row per map task, not one per link.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rkmh_spark.functions.html import extract_links
from rkmh_spark.functions.urls import url_host


def domain_link_graph(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """-> (src_host, dst_host, n_links): outlink counts between
    registrable hosts.

    href resolution, in order:
    - ``scheme://...``     -> url_host of the target (http/https only —
      mailto:/javascript:/data: parse to no host and are dropped);
    - ``//host/path``      -> protocol-relative, host taken directly;
    - ``#fragment``        -> dropped (same-page navigation, not a link);
    - anything else        -> relative path, resolves to the source host.

    Rows whose source url or resolved target have no host are dropped.
    """
    href = F.col("href")
    src = F.col("src_host")
    dst = (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), url_host(href))
        .when(href.startswith("//"), url_host(F.concat(F.lit("https:"), href)))
        .when(href.startswith("#"), F.lit(None).cast("string"))
        .when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"), F.lit(None))
        .otherwise(src)
    )
    return (
        pages.select(
            url_host(url_col).alias("src_host"),
            F.explode(extract_links(html_col)).alias("href"),
        )
        .select(src, dst.alias("dst_host"))
        .where(src.isNotNull() & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_degrees(graph: DataFrame) -> DataFrame:
    """-> (host, out_hosts, out_links, in_hosts, in_links) from a
    (src_host, dst_host, n_links) graph — the degree summary crawl
    schedulers rank by. Self-links (intra-domain navigation) count on
    both sides, as both degrees describe the same edge set. Two bounded
    aggregations + one full-outer hash join on host."""
    out_d = graph.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("out_hosts"), F.sum("n_links").alias("out_links")
    )
    in_d = graph.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").alias("in_hosts"), F.sum("n_links").alias("in_links")
    )
    j = out_d.join(in_d, "host", "full_outer")
    return j.select(
        "host",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("out_hosts", "out_links", "in_hosts", "in_links")
        ],
    )
