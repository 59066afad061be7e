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
