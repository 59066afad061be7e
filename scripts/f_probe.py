"""Itemize the per-superstep driver fixed cost f: Spark JOB COUNT per
superstep for both PageRank paths, plus wall medians, at a chosen core
count and AQE setting.

The f + W/cores fit (BENCH.md) showed ~1.3-2 s/superstep of driver cost.
Its components are per-JOB latencies (job submit + stage replan + sync),
so the first-order lever is the number of jobs a superstep runs:

  round-3 shape: DF = broadcast(rank_src) + agg/broadcast(msgs) +
                 checkpoint  -> 3 jobs; CSR = broadcast(acc) + checkpoint
                 -> 2 jobs (+ AQE sub-job replans inside each).
  round-4 shape: DF = broadcast(rank_src) + checkpoint -> 2; CSR =
                 checkpoint only -> 1 (union-agg fold, loop AQE off).

Usage: python scripts/f_probe.py [cpus] [aqe on|off] [V] [E]
Prints one JSON line; uses a tiny synthetic graph by default so the job
STRUCTURE is visible without the bandwidth term.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def total_jobs(spark) -> int:
    return spark._jsparkSession.sparkContext().statusStore().jobsList(None).size()


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    aqe = sys.argv[2] if len(sys.argv) > 2 else "off"
    V = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    E = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000_000

    from pyspark.sql import functions as F

    from hoshizora_spark import Graph, pagerank, pagerank_csr
    from hoshizora_spark.graph.csr import build_csr_blocks
    from hoshizora_spark.session import get_spark

    loop_conf = {"spark.sql.adaptive.enabled": "false"} if aqe == "off" else None
    spark = get_spark(app_name="f_probe", master=f"local[{cpus}]", shuffle_partitions=cpus)
    edges = spark.range(E).select(
        F.pmod(F.xxhash64("id", F.lit("s")), F.lit(V)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit("d")), F.lit(V)).alias("dst"),
    )
    g = Graph.from_edges(edges.localCheckpoint(eager=True), num_vertices=V)

    out: dict = {"cpus": cpus, "aqe": aqe, "V": V, "E": E}
    N_IT = 8

    pagerank(g, tol=None, max_iters=2, loop_conf=loop_conf)  # warm
    j0, t0 = total_jobs(spark), time.perf_counter()
    res = pagerank(g, tol=None, max_iters=N_IT, loop_conf=loop_conf)
    out["df_jobs_per_superstep"] = round((total_jobs(spark) - j0 - 2) / N_IT, 2)
    # -2: the one-time ew count + persist-priming jobs outside the loop
    out["df_wall_per_superstep_s"] = round((time.perf_counter() - t0) / N_IT, 3)
    out["df_median_superstep_s"] = round(
        sorted(res.wall_ms_per_iter)[N_IT // 2] / 1000, 3
    )

    csr = build_csr_blocks(g)
    pagerank_csr(g, csr, tol=None, max_iters=2, loop_conf=loop_conf)  # warm
    j0, t0 = total_jobs(spark), time.perf_counter()
    resc = pagerank_csr(g, csr, tol=None, max_iters=N_IT, loop_conf=loop_conf)
    out["csr_jobs_per_superstep"] = round((total_jobs(spark) - j0) / N_IT, 2)
    out["csr_wall_per_superstep_s"] = round((time.perf_counter() - t0) / N_IT, 3)
    out["csr_median_superstep_s"] = round(
        sorted(resc.wall_ms_per_iter)[N_IT // 2] / 1000, 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
