"""Direct measurement of the per-superstep driver fixed cost f.

BENCH.md's ``T = f + W/cores`` fit extracts f from two-point ladders, which
at 128M edges conflates residual driver cost with memory-bus saturation.
This probe measures f directly: supersteps on a TINY graph (W ≈ 0, data
volume ~KB) where wall time IS the fixed cost — job submission, DAG/AQE
planning, task launch, (CSR) one Arrow worker round-trip, the lineage-cut
job, and the Observation sync. Jobs per superstep are counted via the
status tracker so the fixed cost is itemized per driver job.

Job accounting (ADVICE r4): each pagerank call runs one-time setup jobs
(edge count + persist priming) inside its own wall; a naive
jobs/MEASURE division books them into every superstep. The probe
therefore counts a 1-superstep baseline call in its own job group and
reports the MARGINAL jobs per superstep: (jobs(MEASURE) - jobs(1)) /
(MEASURE - 1).

Usage:
    python scripts/f_probe.py [cores] [aqe on|off]   # default 32, on
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
    aqe = sys.argv[2] if len(sys.argv) > 2 else "on"
    if aqe not in ("on", "off"):
        raise SystemExit("usage: f_probe.py [cores] [aqe on|off]")
    from pyspark.sql import functions as F

    from hoshizora_spark import Graph, build_csr_blocks, pagerank, pagerank_csr
    from hoshizora_spark.session import get_spark

    spark = get_spark(
        app_name=f"hz_f_probe_{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true" if aqe == "on" else "false")
    sc = spark.sparkContext
    edges = spark.range(E).select(
        F.pmod(F.xxhash64("id", F.lit("s")), F.lit(V)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit("d")), F.lit(V)).alias("dst"),
    )
    g = Graph.from_edges(edges, num_vertices=V)
    csr = build_csr_blocks(g, num_blocks=4)

    def probe(name: str, fn) -> dict:
        fn(WARMUP)  # JIT / codegen / Python-worker warmup
        # baseline call: per-call setup jobs + ONE superstep's jobs
        sc.setJobGroup(f"base_{name}", name)
        fn(1)
        sc.setJobGroup("", "")
        base_jobs = len(sc.statusTracker().getJobIdsForGroup(f"base_{name}"))
        sc.setJobGroup(f"probe_{name}", name)
        t0 = time.perf_counter()
        res = fn(MEASURE)
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"probe_{name}"))
        med = statistics.median(res.wall_ms_per_iter) / 1000.0
        # marginal jobs per steady-state superstep: the setup jobs (and the
        # first superstep) cancel in the difference
        jobs_per = (jobs - base_jobs) / (MEASURE - 1)
        row = {
            "path": name,
            "cores": cores,
            "aqe": aqe,
            "median_superstep_s": round(med, 4),
            "total_wall_s": round(wall, 3),
            "jobs_total": jobs,
            "jobs_baseline": base_jobs,
            "jobs_per_superstep": round(jobs_per, 2),
            "f_per_job_s": round(med / max(jobs_per, 1e-9), 4),
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
    print(json.dumps({"V": V, "E": E, "cores": cores, "aqe": aqe, "paths": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
