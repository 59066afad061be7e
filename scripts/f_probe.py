"""Direct measurement of the per-superstep driver fixed cost f.

BENCH.md's ``T = f + W/cores`` fit extracts f from two-point ladders, which
at 128M edges conflates residual driver cost with memory-bus saturation.
This probe measures f directly: supersteps on a TINY graph (W ≈ 0, data
volume ~KB) where wall time IS the fixed cost — job submission, DAG/AQE
planning, task launch, (CSR) one Arrow worker round-trip, the lineage-cut
job, and the Observation sync. Jobs per superstep are counted via the
status tracker so the fixed cost is itemized per driver job.

Usage:
    python scripts/f_probe.py [cores]          # default 32
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

V = 2_000
E = 20_000
WARMUP = 3
MEASURE = 20


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from pyspark.sql import functions as F

    from hoshizora_spark import Graph, build_csr_blocks, pagerank, pagerank_csr
    from hoshizora_spark.session import get_spark

    spark = get_spark(
        app_name=f"hz_f_probe_{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    sc = spark.sparkContext
    edges = spark.range(E).select(
        F.pmod(F.xxhash64("id", F.lit("s")), F.lit(V)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit("d")), F.lit(V)).alias("dst"),
    )
    g = Graph.from_edges(edges, num_vertices=V)
    csr = build_csr_blocks(g, num_blocks=4)

    def probe(name: str, fn) -> dict:
        fn(WARMUP)  # JIT / codegen / Python-worker warmup
        sc.setJobGroup(f"probe_{name}", name)
        t0 = time.perf_counter()
        res = fn(MEASURE)
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"probe_{name}"))
        med = statistics.median(res.wall_ms_per_iter) / 1000.0
        row = {
            "path": name,
            "cores": cores,
            "median_superstep_s": round(med, 4),
            "total_wall_s": round(wall, 3),
            "jobs_total": jobs,
            "jobs_per_superstep": round(jobs / MEASURE, 2),
            "f_per_job_s": round(med / max(jobs / MEASURE, 1e-9), 4),
        }
        print(json.dumps(row))
        return row

    rows = [
        probe("df_broadcast", lambda k: pagerank(g, tol=None, max_iters=k)),
        probe(
            "df_shuffle",
            lambda k: pagerank(g, tol=None, max_iters=k, broadcast_vertices=0),
        ),
        probe("csr", lambda k: pagerank_csr(g, csr, tol=None, max_iters=k)),
    ]
    print(json.dumps({"V": V, "E": E, "cores": cores, "paths": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
