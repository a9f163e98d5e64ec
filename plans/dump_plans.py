"""Dump .explain("formatted") for named queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python plans/dump_plans.py <tag> <suffix> [query ...]
Runs at sf0.001 (plan shape is scale-independent; literal paths differ only
in the scan location). Not part of the bench contract.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

DEFAULT = [
    "dedup_assignments",
    "ngram_jaccard_pairs",
    "simhash_bands",
    "simhash_dup_pairs",
    "containment_sketch",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "embedding_dup_pairs_lsh",
    "embedding_topk",
    "dup_spans",
    "strip_spans",
    "line_dedup",
    "semantic_dedup",
    "min_occ_signatures",
    "minhash_signatures",
    "variant_calls",
    "quality_filter",
    "lm_score",
]


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), tag)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from rkmh_spark.session import get_spark

    spark = get_spark(app_name="plan_dump", cores=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    qfns = entry.queries()
    for name in names:
        df = qfns[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
