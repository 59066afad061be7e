"""Per-partition CSR blocks inside Arrow-backed DataFrames (M5 fast path).

The reference stores adjacency as CSR chunks, one per pinned worker thread,
edge-balanced across the vertex range (/root/reference/src/hoshizora/core/
graph.h:55-66 CSR arrays, 147-177 edge-balanced boundaries, 182-201
NUMA-local chunk alloc). The Spark-native equivalent built here:

    blocks(block_id int, lo long, hi long,
           offsets array<long>,   -- len hi-lo+1, local prefix sums
           indices array<long>,   -- global dst ids, CSR order
           weights array<double>) -- per-edge 1/out_degree(src)

* **Edge-balanced boundaries** come from ``approxQuantile`` over the edge
  table's ``src`` column — quantiles of src weighted by edge multiplicity
  are exactly the reference's "split vertex range into chunks of equal edge
  count" (graph.h:147-161), computed in one distributed pass.
* **Block build** is one shuffle (``repartition(block_id)``) plus a
  ``mapInPandas`` that assembles numpy CSR arrays per block — the Arrow
  batch is the analogue of the reference's NUMA-local chunk.
* **Sizing**: ``num_blocks`` should target a few million edges per block
  (tens of MB per Arrow row). At 10^12-edge scale that means thousands of
  blocks, each still a single executor task; nothing on the driver grows
  with E.

Multi-edges are kept (graph.h:457-479 does not dedup) — each occurrence
contributes its own weight term, pre-folded into ``weights``.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph

BLOCK_SCHEMA = (
    "block_id int, lo long, hi long, offsets array<long>, "
    "indices array<long>, weights array<double>"
)


@dataclass(frozen=True)
class CsrBlocks:
    """Edge-balanced CSR partitioning of a Graph's out-adjacency."""

    blocks: DataFrame  # BLOCK_SCHEMA, persisted
    bounds: list[int]  # block b owns src in [bounds[b], bounds[b+1])
    num_vertices: int
    num_edges: int  # edge entries across all blocks (multi-edges counted)

    @property
    def num_blocks(self) -> int:
        return len(self.bounds) - 1

    def block_id_of(self, vid_col):
        """Column expr mapping a vertex id to its owning block id.

        O(num_blocks) comparisons per row JVM-side; fine for thousands of
        blocks. (The per-row work is a literal-array binary search at heart;
        Catalyst folds the literals.)
        """
        interior = self.bounds[1:-1]
        arr = F.array(*[F.lit(int(b)) for b in interior])
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(vid_col >= b, F.lit(1)).otherwise(F.lit(0)),
        ).cast("int")

    def unpersist(self) -> None:
        self.blocks.unpersist()


def edge_balanced_bounds(edges: DataFrame, num_vertices: int, num_blocks: int) -> list[int]:
    """Split points so each block holds ≈ E/num_blocks edge entries.

    Distributed analogue of the reference's ``lower_bound(offsets, k·E/T)``
    loop (graph.h:147-161): the k/num_blocks quantiles of the src column of
    the edge list ARE the degree-cumsum split points.
    """
    if num_blocks <= 1:
        return [0, num_vertices]
    probs = [k / num_blocks for k in range(1, num_blocks)]
    qs = edges.stat.approxQuantile("src", probs, 0.001)
    bounds = [0]
    for q in qs:
        b = int(q) + 1  # boundary after the quantile vertex
        if bounds[-1] < b < num_vertices:
            bounds.append(b)
    bounds.append(num_vertices)
    return bounds


def build_csr_blocks(
    graph: Graph, num_blocks: int | None = None, target_edges_per_block: int = 4_000_000
) -> CsrBlocks:
    """One-time physical build (the analogue of ``Graph::from_edge_list``)."""
    spark = graph.spark
    V = graph.num_vertices
    E = graph.edges.count()
    if num_blocks is None:
        num_blocks = max(
            1,
            min(
                int(spark.conf.get("spark.sql.shuffle.partitions", "32")) * 4,
                -(-E // target_edges_per_block),
            ),
        )
    bounds = edge_balanced_bounds(graph.edges, V, num_blocks)

    # per-edge weight 1/out_degree(src); multi-edge entries each carry it
    deg = graph.out_degrees
    ew = graph.edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    )

    interior = bounds[1:-1]

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One physical partition == one block (repartition below), but stay
        # defensive: group by block_id inside the batch stream.
        parts: dict[int, list[pd.DataFrame]] = {}
        for pdf in batches:
            for bid, grp in pdf.groupby("block_id"):
                parts.setdefault(int(bid), []).append(grp)
        out = []
        for bid, grps in parts.items():
            pdf = pd.concat(grps, ignore_index=True)
            lo, hi = bounds[bid], bounds[bid + 1]
            src = pdf["src"].to_numpy(np.int64)
            order = np.argsort(src, kind="stable")
            src = src[order]
            indices = pdf["dst"].to_numpy(np.int64)[order]
            weights = pdf["w"].to_numpy(np.float64)[order]
            counts = np.bincount(src - lo, minlength=hi - lo)
            offsets = np.zeros(hi - lo + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            out.append(
                pd.DataFrame(
                    {
                        "block_id": [bid],
                        "lo": [lo],
                        "hi": [hi],
                        "offsets": [offsets],
                        "indices": [indices],
                        "weights": [weights],
                    }
                )
            )
        if not out:
            return
        yield pd.concat(out, ignore_index=True)

    with_bid = ew.withColumn(
        "block_id",
        F.aggregate(
            F.array(*[F.lit(int(b)) for b in interior]),
            F.lit(0),
            lambda acc, b: acc + F.when(F.col("src") >= b, F.lit(1)).otherwise(F.lit(0)),
        ).cast("int"),
    )
    blocks = (
        with_bid.repartition(len(bounds) - 1, "block_id")
        .mapInPandas(assemble, schema=BLOCK_SCHEMA)
        .persist()
    )
    blocks.count()  # materialize now; build cost is one-time
    return CsrBlocks(blocks=blocks, bounds=bounds, num_vertices=V, num_edges=E)


def local_block_id(bounds: list[int], vids: np.ndarray) -> np.ndarray:
    """numpy-side block assignment (for tests / driver-side checks)."""
    return np.asarray(
        [bisect.bisect_right(bounds, int(v), 1, len(bounds) - 1) - 1 for v in vids],
        dtype=np.int64,
    )
