"""End-to-end V0-at-scale demo: corpus table → dependency graph → PageRank.

Exercises the full north_star pipeline at the largest size comfortable
in-sandbox: synthesize the (repo, path, commit, lang, content) corpus,
verify the per-row sha256 invariant, extract+resolve import edges, compact
dense ids, run PageRank to 1e-6, report top-10 most-depended-on files and
per-stage timings as one JSON line.

    python scripts/corpus_scale_demo.py           # 10M files default
    HZ_DEMO_REPOS=2000 HZ_DEMO_FILES=500 python scripts/corpus_scale_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPOS = int(os.environ.get("HZ_DEMO_REPOS", 20_000))
FILES = int(os.environ.get("HZ_DEMO_FILES", 500))


def main() -> None:
    from hoshizora_spark import pagerank, top_k
    from hoshizora_spark.corpus import synthesize_corpus, verify_sha256
    from hoshizora_spark.graph.build import build_graph_from_corpus
    from hoshizora_spark.session import get_spark

    spark = get_spark(app_name="corpus_scale_demo", master="local[32]",
                      shuffle_partitions=64)
    out: dict = {"num_files": REPOS * FILES}

    t0 = time.perf_counter()
    corpus = synthesize_corpus(spark, num_repos=REPOS, files_per_repo=FILES,
                               num_partitions=64).persist()
    n = corpus.count()
    out["t_synthesize_s"] = round(time.perf_counter() - t0, 1)
    assert n == REPOS * FILES

    t0 = time.perf_counter()
    mismatches = verify_sha256(corpus)
    out["sha256_mismatches"] = mismatches
    out["t_sha256_verify_s"] = round(time.perf_counter() - t0, 1)
    assert mismatches == 0

    t0 = time.perf_counter()
    bundle = build_graph_from_corpus(corpus)
    out["num_vertices"] = bundle.num_vertices
    out["num_edges"] = bundle.num_edges
    out["unresolved_refs"] = bundle.unresolved_refs
    out["t_build_graph_s"] = round(time.perf_counter() - t0, 1)
    corpus.unpersist()

    t0 = time.perf_counter()
    res = pagerank(bundle.graph, tol=1e-6, max_iters=200)
    top = top_k(res.ranks.join(bundle.vertices, "vid"), 10).select(
        "repo", "path", "rank"
    ).collect()
    out["t_pagerank_s"] = round(time.perf_counter() - t0, 1)
    out["pagerank_iters"] = res.iterations
    out["pagerank_converged"] = res.converged
    out["edges_per_sec_per_superstep"] = round(
        res.edges_processed_per_iter * res.iterations / (time.perf_counter() - t0)
    )
    out["top10"] = [(r["repo"], r["path"], round(r["rank"], 8)) for r in top]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
