"""Scaling-efficiency bench: same job, same input, N vs 4N cores.

Sandbox protocol for the north_rule's "N and 4N executors, efficiency
>= 0.8" criterion (no real cluster here): run identical PageRank supersteps
at local[8] and local[32] on one pre-built edge table and compare
edges-processed/sec/superstep. Steady-state measurement: fixed superstep
count, first iteration (JIT/pageranks warmup) discarded.

Usage:
    python scripts/scaling_bench.py            # orchestrates both levels
    python scripts/scaling_bench.py --run 8    # one level (subprocess)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA_DIR = Path(os.environ.get("HZ_SCALE_DIR", "/tmp/hz_scale"))
EDGES = DATA_DIR / "edges.parquet"
WARMUP = 2
MEASURE = 8
NUM_REPOS = 2000
FILES_PER_REPO = 500


def build_input() -> None:
    from hoshizora_spark.corpus import synthesize_corpus
    from hoshizora_spark.graph.build import build_graph_from_corpus
    from hoshizora_spark.session import get_spark

    spark = get_spark(app_name="hz_scale_build", master="local[32]", shuffle_partitions=32)
    corpus = synthesize_corpus(spark, num_repos=NUM_REPOS, files_per_repo=FILES_PER_REPO)
    bundle = build_graph_from_corpus(corpus)
    bundle.edges.write.mode("overwrite").parquet(str(EDGES))
    meta = {"num_vertices": bundle.num_vertices, "num_edges": bundle.num_edges}
    (DATA_DIR / "meta.json").write_text(json.dumps(meta))
    print(f"built input: {meta}", file=sys.stderr)
    spark.stop()


def run_level(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from hoshizora_spark import Graph, build_csr_blocks, pagerank, pagerank_csr
    from hoshizora_spark.session import get_spark

    meta = json.loads((DATA_DIR / "meta.json").read_text())
    spark = get_spark(
        app_name=f"hz_scale_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    edges = spark.read.parquet(str(EDGES))
    g = Graph.from_edges(edges, num_vertices=meta["num_vertices"])

    out: dict = {"cpus": cpus, **meta}
    # DataFrame path: run WARMUP+MEASURE supersteps, time the tail.
    res = pagerank(g, tol=None, max_iters=WARMUP)  # warmup JVM/codegen
    t0 = time.perf_counter()
    res = pagerank(g, tol=None, max_iters=MEASURE)
    df_wall = time.perf_counter() - t0
    out["df_wall_s"] = round(df_wall, 3)
    out["df_edges_per_sec"] = round(res.edges_processed_per_iter * MEASURE / df_wall)

    # CSR path (build excluded from the measured window; it's one-time).
    csr = build_csr_blocks(g, num_blocks=cpus)
    pagerank_csr(g, csr, tol=None, max_iters=WARMUP)
    t0 = time.perf_counter()
    resc = pagerank_csr(g, csr, tol=None, max_iters=MEASURE)
    csr_wall = time.perf_counter() - t0
    out["csr_wall_s"] = round(csr_wall, 3)
    out["csr_edges_per_sec"] = round(csr.num_edges * MEASURE / csr_wall)
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return
    DATA_DIR.mkdir(parents=True, exist_ok=True)
    if not (DATA_DIR / "meta.json").exists():
        build_input()
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, __file__, "--run", str(cpus)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        if proc.returncode != 0:
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"level {cpus} failed")
        results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(results[cpus]), file=sys.stderr)
    for path in ("df", "csr"):
        t8 = results[8][f"{path}_edges_per_sec"]
        t32 = results[32][f"{path}_edges_per_sec"]
        results[f"{path}_scaling_efficiency"] = round(t32 / t8 / 4.0, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
