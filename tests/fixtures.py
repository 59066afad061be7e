"""Golden fixture graphs (FIXTURES.md §2) in reference edge-list form."""

from __future__ import annotations

G1_CHAIN = [(0, 1), (1, 2), (2, 3)]
G2_CYCLE = [(0, 1), (1, 2), (2, 0)]
G3_STAR = [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0)]
G4_TWO_TRIANGLES_BRIDGE = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
G5_MULTI_DUP_ISOLATED = [(0, 1), (0, 1), (1, 2), (4, 5)]


def g6_powerlaw(num_vertices: int = 200, m: int = 4, seed: int = 42) -> list[tuple[int, int]]:
    """Seeded Barabási–Albert-ish directed graph, V≈200 E≈800.

    Deterministic preferential attachment: each new vertex v sends m edges
    to targets sampled (with a seeded RNG) proportional to in-degree+1.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    edges: list[tuple[int, int]] = []
    indeg = np.ones(num_vertices, dtype=np.float64)  # +1 smoothing
    start = m + 1
    for v in range(1, start):
        for t in range(v):
            edges.append((v, t))
            indeg[t] += 1
    for v in range(start, num_vertices):
        probs = indeg[:v] / indeg[:v].sum()
        targets = rng.choice(v, size=m, replace=False, p=probs)
        for t in targets:
            edges.append((v, int(t)))
            indeg[t] += 1
    return edges


# complete bipartite K2,3 — the classic synchronous-LPA oscillator: labels
# flip between the two sides every round, so termination comes from the
# round cap and MUST be deterministic (same parity engine vs oracle)
G7_BIPARTITE = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4)]

ALL_FIXTURES: dict[str, list[tuple[int, int]]] = {
    "g1_chain": G1_CHAIN,
    "g2_cycle": G2_CYCLE,
    "g3_star": G3_STAR,
    "g4_two_triangles_bridge": G4_TWO_TRIANGLES_BRIDGE,
    "g5_multi_dup_isolated": G5_MULTI_DUP_ISOLATED,
    "g6_powerlaw": g6_powerlaw(),
    "g7_bipartite": G7_BIPARTITE,
}
