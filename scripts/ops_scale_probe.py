"""Moderate-scale smoke-bench for the round-5 operator batch.

The correctness oracles run on a 99-vertex graph; this probe shows the
same code paths running on a deterministic power-law graph a few orders
of magnitude larger (default V=1M, E=8M — the scaling_bench generator),
recording wall time and round counts per operator. It is EVIDENCE OF
SCALE SHAPE (contracting rounds, bounded state), not a tuned benchmark:
single session, one rep, this VM's ±50% noise applies.

Usage:
    python scripts/ops_scale_probe.py [V] [E]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from pyspark.sql import functions as F

    from hoshizora_spark import (
        Graph,
        betweenness_centrality,
        densest_subgraph,
        greedy_coloring,
        maximal_independent_set,
        minimum_spanning_forest,
    )
    from hoshizora_spark.session import get_spark

    V = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000

    spark = get_spark(
        app_name="ops_scale_probe", master="local[32]", shuffle_partitions=32
    )
    u = F.pmod(F.xxhash64("id", F.lit("t")), F.lit(1_000_003)) / 1_000_003.0
    edges = (
        spark.range(E)
        .select(
            F.pmod(F.xxhash64("id", F.lit("s")), F.lit(V)).alias("src"),
            F.floor(F.lit(V) * F.pow(u, F.lit(2.0))).cast("long").alias("dst"),
        )
        .persist()
    )
    edges.count()
    g = Graph.from_edges(edges, num_vertices=V)
    out: dict[str, dict] = {}

    def probe(name, fn):
        t0 = time.monotonic()
        info = fn()
        out[name] = {"wall_s": round(time.monotonic() - t0, 1), **info}
        print(f"{name}: {out[name]}", file=sys.stderr)

    probe(
        "mis",
        lambda: (lambda r: {"rounds": r.rounds, "size": r.members.agg(
            F.sum("in_mis")).collect()[0][0]})(maximal_independent_set(g, seed=1)),
    )
    probe(
        "coloring",
        lambda: (lambda r: {"rounds": r.rounds, "colors": r.colors.agg(
            F.max("color") + 1).collect()[0][0]})(greedy_coloring(g, seed=1)),
    )
    probe(
        "msf",
        lambda: (lambda r: {"rounds": r.rounds, "forest_edges": r.edges.count()})(
            minimum_spanning_forest(g)
        ),
    )
    probe(
        "densest",
        lambda: (lambda r: {
            "rounds": r.rounds, "best_round": r.best_round,
            "density": round(r.density, 3), "S": r.vertices.count(),
        })(densest_subgraph(g, eps=0.5)),
    )
    probe(
        "betweenness_sampled",
        lambda: (lambda r: {
            "rounds": r.rounds, "levels": r.levels, "sources": r.num_sources,
            "rows": r.centrality.count(),
        })(betweenness_centrality(g, sample_mod=max(V // 8, 1), seed=1)),
    )
    print(json.dumps({"V": V, "E": E, "ops": out}))


if __name__ == "__main__":
    main()
