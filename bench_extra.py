"""Supplementary profiling harness for optimization rounds (guide §1.4).

NOT the frozen bench: this isolates each suite query with the noop sink,
runs the same min-of-2 protocol, and writes .explain("formatted") plans
under plans/r07/. Usage:
  python bench_extra.py [query ...]          # default: the 11 suite queries
  SPARK_GRAFT_EXPLAIN_DIR=plans/r07 SPARK_GRAFT_PLAN_TAG=before python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 24)
REPEATS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "2"))
PLAN_DIR = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR", "")
PLAN_TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")

SUITE = [
    "knn_exact_euclidean",
    "hubness_csls",
    "hubness_ls",
    "hubness_mp_normal",
    "hubness_dsl",
    "lsh_knn_cosine",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "cc_clusters",
    "tpch_q1",
    "tpch_q3",
]


def _warm(batches):
    import numpy as np
    import pandas as pd

    n = 0
    for pdf in batches:
        n += len(pdf)
    yield pd.DataFrame({"n": [n + int(np.int64(0))]})


def main():
    from kiez_spark.session import get_spark

    names = sys.argv[1:] or SUITE
    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000, numPartitions=2 * CPUS).mapInPandas(_warm, "n long").count()

    from kiez_spark.driver_queries import QUERIES

    times = {}
    for name in names:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"extra:{name}")
        walls = []
        for rep in range(REPEATS):
            if rep:
                spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            walls.append(round(time.time() - t0, 3))
        times[name] = min(walls)
        print(f"  {name}: {n} rows, min {times[name]}s of {walls}", file=sys.stderr)
        if PLAN_DIR:
            os.makedirs(PLAN_DIR, exist_ok=True)
            spark.catalog.clearCache()
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": times, "total": round(sum(times.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
