"""Round-5 fixes: pyarrow.fs sidecar I/O, ivf_topk query cap, domain
validation, and the streaming→snapshot salted-pagerank integration loop
(VERDICT r4 "next round" items 2, 6, 7 + ADVICE int32-precondition item)."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, pagerank
from hoshizora_spark.graph import csr as csrmod
from hoshizora_spark.graph.csr import build_csr_blocks, load_block


def _ring_graph(spark, n=40, extra=None):
    pairs = [(i, (i + 1) % n) for i in range(n)] + (extra or [])
    return Graph.from_edges(
        spark.createDataFrame(pairs, schema="src long, dst long")
    )


def test_fs_for_scheme_detection():
    from pyarrow import fs as pafs

    f1, p1 = csrmod._fs_for("/tmp/somewhere")
    assert isinstance(f1, pafs.LocalFileSystem)
    assert p1 == "/tmp/somewhere"
    f2, p2 = csrmod._fs_for("file:///tmp/elsewhere")
    assert isinstance(f2, pafs.LocalFileSystem)
    assert p2 == "/tmp/elsewhere"


def test_csr_sidecar_through_file_uri(spark, tmp_path):
    """Full build + superstep path through a file:// URI sidecar — the
    pyarrow.fs code path a cluster deployment uses (with hdfs://, s3://
    resolving through the same FileSystem.from_uri branch)."""
    from hoshizora_spark.algorithms.pagerank import pagerank_csr

    g = _ring_graph(spark, extra=[(0, 5), (0, 7), (3, 9)])
    uri_root = f"file://{tmp_path}/sidecar"
    csr = build_csr_blocks(g, num_blocks=3, sidecar_root=uri_root)
    assert csr.path.startswith("file://")
    # loader goes through the same scheme-detected filesystem
    lo, hi, offsets, indices, *_ = load_block(csr.path, 0)
    assert offsets[-1] == len(indices)
    # end-to-end: CSR pagerank over the URI sidecar matches the DF path
    want = {
        r["vid"]: r["rank"]
        for r in pagerank(g, tol=None, max_iters=8).ranks.collect()
    }
    got = {
        r["vid"]: r["rank"]
        for r in pagerank_csr(g, csr, tol=None, max_iters=8).ranks.collect()
    }
    assert got.keys() == want.keys()
    assert np.allclose(
        [got[k] for k in sorted(got)], [want[k] for k in sorted(want)], atol=1e-12
    )


def test_csr_bare_path_equals_uri_blocks(spark, tmp_path):
    """Same graph built through a bare path and a file:// URI produces
    byte-identical block arrays (scheme only changes transport)."""
    g = _ring_graph(spark)
    a = build_csr_blocks(g, num_blocks=2, sidecar_root=str(tmp_path / "bare"))
    b = build_csr_blocks(g, num_blocks=2, sidecar_root=f"file://{tmp_path}/uri")
    for bid in range(a.num_blocks):
        ba, bb = load_block(a.path, bid), load_block(b.path, bid)
        for xa, xb in zip(ba, bb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_ivf_topk_query_cap(spark, monkeypatch):
    from hoshizora_spark import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, float(i % 5)]) for i in range(30)],
        schema="vec_id long, emb array<double>",
    ).withColumnRenamed("emb", "embedding")
    queries = spark.createDataFrame(
        [(i, [1.0, float(i), 0.5]) for i in range(5)],
        schema="query_id long, embedding array<double>",
    )
    monkeypatch.setattr(similarity, "MAX_QUERIES", 3)
    with pytest.raises(ValueError, match="MAX_QUERIES"):
        similarity.ivf_topk(emb, queries, k=2, n_centroids=2, iters=1)
    # under the cap: runs and returns per-query rows
    out = similarity.ivf_topk(
        emb, queries.limit(2), k=2, n_centroids=2, nprobe=2, iters=1
    )
    assert out.count() > 0


def test_from_edges_validate_domain(spark):
    edges = spark.createDataFrame([(0, 1), (1, 5)], schema="src long, dst long")
    with pytest.raises(ValueError, match="dense domain"):
        Graph.from_edges(edges, num_vertices=4, validate=True)
    g = Graph.from_edges(edges, num_vertices=6, validate=True)
    assert g.num_vertices == 6


def test_streaming_snapshot_salted_pagerank_e2e(spark, tmp_path):
    """The full lambda loop (VERDICT r4 stretch item): tail an edge
    directory → windowed degree table → hot_keys_from_degrees → pagerank
    on the snapshot WITH those salting decisions — and the salted fixed
    point equals the plain one."""
    from hoshizora_spark.runtime.skew import hot_keys_from_degrees
    from hoshizora_spark.streaming.ingest import streaming_degrees_windowed

    # vertex 7 bursts in the 00:00 window; a later 02:00 event advances
    # the watermark so that window finalizes into the append-mode sink
    rows = (
        [("2024-01-01 00:01:00", 7, i) for i in range(6)]
        + [("2024-01-01 00:02:00", 3, 7), ("2024-01-01 00:03:00", 5, 7)]
        + [("2024-01-01 02:00:00", 1, 0)]
    )
    edge_dir = tmp_path / "edges"
    batch = spark.createDataFrame(rows, schema="ts string, src long, dst long")
    batch.coalesce(1).write.parquet(str(edge_dir))

    stream = spark.readStream.schema(batch.schema).parquet(str(edge_dir))
    deg = streaming_degrees_windowed(stream, window="10 minutes", watermark="30 minutes")
    q = (
        deg.writeStream.format("memory")
        .queryName("e2e_deg_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        sink = spark.sql("SELECT * FROM e2e_deg_sink")
        hot = hot_keys_from_degrees(sink, min_count=3, key_col="vid", out_key="src")
        assert {r["src"] for r in hot.collect()} == {7}
    finally:
        q.stop()

    # snapshot run: same directory read as a batch table, salting driven
    # by the live histogram (broadcast_vertices=0 forces the shuffle-join
    # regime where salting engages)
    g = Graph.from_edges(spark.read.parquet(str(edge_dir)).select("src", "dst"))
    salted = pagerank(
        g, tol=None, max_iters=10, broadcast_vertices=0, hot_keys_df=hot, num_salts=4
    )
    plain = pagerank(g, tol=None, max_iters=10)
    got = {r["vid"]: r["rank"] for r in salted.ranks.collect()}
    want = {r["vid"]: r["rank"] for r in plain.ranks.collect()}
    assert got.keys() == want.keys()
    assert np.allclose(
        [got[k] for k in sorted(got)], [want[k] for k in sorted(want)], atol=1e-9
    )
