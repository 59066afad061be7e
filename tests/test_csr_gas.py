"""CSR-block GAS path: equivalence vs oracle + structural invariants."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import (
    Graph,
    build_csr_blocks,
    connected_components_csr,
    edges_from_pairs,
    pagerank_csr,
)
from hoshizora_spark.graph.csr import local_block_id
from tests import oracle
from tests.fixtures import ALL_FIXTURES

CSR_FIXTURES = ["g1_chain", "g3_star", "g5_multi_dup_isolated", "g6_powerlaw"]


def _graph(spark, name: str) -> Graph:
    return Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES[name]))


@pytest.mark.parametrize("name", [n for n in CSR_FIXTURES if n in ALL_FIXTURES])
def test_pagerank_csr_matches_oracle(spark, name):
    edges = ALL_FIXTURES[name]
    g = _graph(spark, name)
    res = pagerank_csr(g, tol=1e-9, max_iters=300)
    assert res.converged
    rows = {r["vid"]: r["rank"] for r in res.ranks.collect()}
    got = np.array([rows[i] for i in range(g.num_vertices)])
    want = oracle.pagerank(edges, tol=1e-9)
    assert np.allclose(got, want, atol=1e-6), f"{name}: max err {np.abs(got - want).max()}"


@pytest.mark.parametrize("name", ["g4_two_triangles_bridge", "g5_multi_dup_isolated"])
def test_cc_csr_matches_oracle(spark, name):
    edges = ALL_FIXTURES[name]
    g = _graph(spark, name)
    res = connected_components_csr(g)
    assert res.converged
    rows = {r["vid"]: r["label"] for r in res.labels.collect()}
    got = np.array([rows[i] for i in range(g.num_vertices)])
    want = oracle.connected_components(edges)
    assert (got == want).all(), f"{name}: {got} != {want}"


def test_csr_block_invariants(spark):
    name = next(iter(ALL_FIXTURES))
    edges = ALL_FIXTURES[name]
    g = _graph(spark, name)
    csr = build_csr_blocks(g, num_blocks=3)
    rows = csr.blocks_df(spark).collect()
    # blocks tile the vertex range exactly
    spans = sorted((r["lo"], r["hi"]) for r in rows)
    assert spans[0][0] == 0 and spans[-1][1] == g.num_vertices
    for (_, h1), (l2, _) in zip(spans, spans[1:]):
        assert h1 == l2
    total_entries = 0
    for r in rows:
        off = np.asarray(r["offsets"])
        assert off[0] == 0 and len(off) == r["hi"] - r["lo"] + 1
        assert (np.diff(off) >= 0).all()
        assert off[-1] == len(r["indices"]) == len(r["weights"])
        total_entries += len(r["indices"])
        # every edge entry belongs to a src inside [lo, hi)
        src_local = np.repeat(np.arange(r["hi"] - r["lo"]), np.diff(off))
        assert ((src_local >= 0) & (src_local < r["hi"] - r["lo"])).all()
    assert total_entries == len(edges)
    # numpy-side block assignment agrees with the bounds
    vids = np.arange(g.num_vertices)
    bids = local_block_id(csr.bounds, vids)
    for r in rows:
        in_block = (vids >= r["lo"]) & (vids < r["hi"])
        assert (bids[in_block] == r["block_id"]).all()
    csr.unpersist()


@pytest.mark.parametrize(
    "name",
    ["g1_chain", "g2_cycle", "g3_star", "g4_two_triangles_bridge",
     "g5_multi_dup_isolated", "g6_powerlaw", "g7_bipartite"],
)
def test_lpa_csr_bitmatches_df_path(spark, name):
    """Keyed CSR kernel (per-(dst,label) counts) must reproduce the DF
    path's labels exactly, round-for-round, on every fixture — the same
    equivalence discipline as the scalar pagerank/cc CSR tests."""
    from hoshizora_spark import label_propagation
    from hoshizora_spark.algorithms.labelprop import label_propagation_csr

    g = _graph(spark, name)
    df_res = label_propagation(g, max_rounds=10)
    csr_res = label_propagation_csr(g, max_rounds=10)
    df_rows = {r["vid"]: r["label"] for r in df_res.labels.collect()}
    csr_rows = {r["vid"]: r["label"] for r in csr_res.labels.collect()}
    assert df_rows == csr_rows, f"{name}: CSR labels diverge from DF labels"
    assert df_res.rounds == csr_res.rounds


@pytest.mark.parametrize(
    "name",
    ["g1_chain", "g2_cycle", "g3_star", "g4_two_triangles_bridge",
     "g5_multi_dup_isolated", "g6_powerlaw", "g7_bipartite"],
)
def test_clustering_csr_bitmatches_df_path(spark, name):
    """The clustering best-move superstep through the CSR gain-argmax fold
    (gas_gain_argmax over raw-weight blocks) must produce bit-identical
    cluster assignments, level counts, and per-level sizes vs the
    DataFrame plan — same q frame, same IEEE double gain arithmetic, same
    final max(struct(gain, -src)) merge."""
    from hoshizora_spark.algorithms.clustering import clustering

    g = _graph(spark, name)
    df_res = clustering(g)
    csr_res = clustering(g, use_csr=True)
    df_rows = {r["vid"]: r["cluster"] for r in df_res.assign.collect()}
    csr_rows = {r["vid"]: r["cluster"] for r in csr_res.assign.collect()}
    assert df_rows == csr_rows, f"{name}: CSR clusters diverge from DF clusters"
    assert df_res.num_clusters == csr_res.num_clusters
    assert df_res.levels == csr_res.levels
    assert df_res.clusters_per_level == csr_res.clusters_per_level


def test_gas_gain_argmax_matches_numpy(spark):
    """Direct fold check on a weighted multigraph-free coarse graph: the
    (dst, gain, src) frame equals a brute-force numpy evaluation of
    2*(w/c2m - q_s*q_d) with strict-threshold, min-src tiebreak."""
    from hoshizora_spark.graph.csr import build_csr_blocks
    from hoshizora_spark.runtime.gas import dst_route_table, gas_gain_argmax

    edges = [(0, 1, 2.0), (2, 1, 3.0), (3, 1, 3.0), (1, 0, 1.0), (4, 2, 0.5),
             (0, 4, 1.5), (2, 4, 1.5), (3, 0, 2.5)]
    ew = spark.createDataFrame(edges, schema="src long, dst long, w double")
    g = Graph(edges=ew, num_vertices=5)
    csr = build_csr_blocks(g, num_blocks=3, weight_col="w", normalize_weights=False)
    qvals = {0: 0.30, 1: 0.45, 2: 0.20, 3: 0.15, 4: 0.10}
    q = spark.createDataFrame(list(qvals.items()), schema="vid long, q double")
    c2m, thr = 16.0, 0.05
    got = {
        r["dst"]: (r["gain"], r["src"])
        for r in gas_gain_argmax(csr, q, dst_route_table(csr, ew), c2m, thr).collect()
    }
    best: dict[int, tuple] = {}
    for s, d, w in edges:
        gain = 2.0 * (w / c2m - qvals[s] * qvals[d])
        if gain > thr and (d not in best or (-gain, s) < (-best[d][0], best[d][1])):
            best[d] = (gain, s)
    assert got == best


def test_clustering_entry_query_equal_through_both_paths(spark, sf_dir, monkeypatch):
    """The clustering_modularity driver query yields identical assignments
    whether HZ_CLUSTERING_CSR routes it through the CSR fold or not — the
    oracle row stays green through either path."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "hz_entry_csr_test", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()["clustering_modularity"]
    monkeypatch.delenv("HZ_CLUSTERING_CSR", raising=False)
    df_rows = {(r["vid"], r["cluster"]) for r in q(spark, sf_dir).collect()}
    monkeypatch.setenv("HZ_CLUSTERING_CSR", "1")
    csr_rows = {(r["vid"], r["cluster"]) for r in q(spark, sf_dir).collect()}
    assert df_rows == csr_rows


@pytest.mark.parametrize(
    "name",
    ["g1_chain", "g2_cycle", "g3_star", "g4_two_triangles_bridge",
     "g5_multi_dup_isolated", "g6_powerlaw", "g7_bipartite"],
)
def test_kcore_csr_bitmatches_df_path(spark, name):
    """The h-index iteration through the keyed CSR fold must reproduce the
    DF path's coreness exactly, round-for-round: same (dst, h) histogram
    counts, same shared _hindex_agg fold, same convergence round."""
    from hoshizora_spark import k_core_hindex
    from hoshizora_spark.algorithms.kcore import k_core_hindex_csr

    g = _graph(spark, name)
    df_res = k_core_hindex(g)
    csr_res = k_core_hindex_csr(g)
    df_rows = {r["vid"]: r["coreness"] for r in df_res.coreness.collect()}
    csr_rows = {r["vid"]: r["coreness"] for r in csr_res.coreness.collect()}
    assert df_rows == csr_rows, f"{name}: CSR coreness diverges from DF"
    assert df_res.rounds == csr_res.rounds
    assert df_res.max_core == csr_res.max_core
