"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query executes with a noop write so every
column is materialized (a bare count() would let Catalyst prune the work).

Extra keys beyond the required contract:
  pages_per_sec  — flagship dedup throughput (docs / dedup seconds)
  calibration_8w_iters_per_sec — Spark-free numpy burn on an 8-worker
      pool (same yardstick bench_scaling.py uses), run BEFORE the query
      loop. This host's wall-clock varies 2-3× between load windows
      (VERDICT r4 adjudicated a phantom 2× "regression" as host
      weather); dividing per-query times by the calibration ratio makes
      BENCH_r*.json comparable across rounds.
  loadavg_start  — 1-min load average when the bench started
  scaling        — optional; populated by bench_scaling.py runs
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _calibrate_8w() -> float:
    from bench_scaling import _burn

    with mp.Pool(8) as p:
        t0 = time.perf_counter()
        its = p.map(_burn, range(8))
        wall = time.perf_counter() - t0
    return round(sum(its) / wall, 1)


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    loadavg = round(os.getloadavg()[0], 2)
    calibration = _calibrate_8w()

    import __spark_entry__ as entry
    from rkmh_spark.session import get_spark

    spark = get_spark(app_name="rkmh_spark_bench", cores=cpus)
    qfns = entry.queries()

    headline = [
        "dedup_assignments",      # flagship: full LSH dedup pipeline
        "minhash_signatures",     # signature-stage throughput
        "exact_dup_groups",
        "token_docfreq",
        "ngram_jaccard_pairs",
        "simhash_bands",
        "embedding_topk",
        "pricing_summary",
        "brand_revenue",
        "rolling_avg",
        "top_orders_per_customer",
        "variant_calls",          # r2: rkmh-call graft (P6/A9/F7)
        "min_occ_signatures",     # r2: F4 relational filtered sketch
        "quality_filter",         # r4: Gopher composite keep/drop
        "lm_score",               # r5: unigram-LM cross-entropy
        "dup_spans",              # r5: exact duplicated-span mining
    ]

    # JVM+python-worker warm-up on the tiny sf so per-query times measure
    # the operators, not JIT/worker spin-up: exercise the same code paths
    # (Arrow mapInPandas kernels, shuffles, pandas-UDF verify, driver CC)
    _run(qfns["pricing_summary"](spark, "/root/testdata/sf0.001"))
    _run(qfns["dedup_assignments"](spark, "/root/testdata/sf0.001"))

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    times: dict[str, float] = {}
    for name in headline:
        if name not in qfns:
            continue
        t0 = time.perf_counter()
        _run(qfns[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    dedup_sec = times.get("dedup_assignments", float("nan"))
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "pages_per_sec": round(n_docs / dedup_sec, 1) if dedup_sec else None,
        "n_docs": n_docs,
        "cpus": cpus,
        "calibration_8w_iters_per_sec": calibration,
        "loadavg_start": loadavg,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
