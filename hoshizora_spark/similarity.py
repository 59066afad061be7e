"""Embedding similarity search over ``embeddings(vec_id, embedding, label)``.

Two tiers, mirroring the dedup design:

* **brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against the corpus, dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, codegen'd — no Python). O(Q·N·d) work but
  embarrassingly parallel: each corpus partition scores independently and
  a per-partition top-k heap (TakeOrderedAndProject after the groupBy
  max-k pattern) bounds the shuffle at Q·k rows per partition.
* **random-hyperplane LSH** — the scale path: P seeded pseudo-random
  hyperplanes (weights derived from xxhash64(plane, dim) — deterministic,
  no stored model), sign bits → banded buckets → candidates → exact
  cosine re-rank. Sub-linear candidate sets at 10^9+ vectors.
* **cosine near-dup pairs** — exact all-pairs above a threshold (small
  N verification; at scale run it over LSH candidate pairs instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def with_unit_vectors(embeddings: DataFrame, col: str = "embedding") -> DataFrame:
    """Pre-normalize once so cosine = dot (saves a sqrt per comparison)."""
    a = F.col(col).cast("array<double>")
    n = _norm(a)
    return embeddings.withColumn(
        "_unit", F.transform(a, lambda x: x / F.greatest(n, F.lit(1e-12)))
    )


def _per_query_topk(scored: DataFrame, k: int) -> DataFrame:
    """Top-k (cos desc, vec_id asc) per query WITHOUT a global window.

    ``row_number().over(Window.partitionBy(query_id))`` ships every corpus
    score for a query through ONE reducer task — at 10^9 vectors that is a
    straggler/OOM. Instead: per-(query, partition) top-k partial (bounded
    heap via sort_array+slice over the partition's rows), then a final
    merge over ≤ k·num_partitions rows per query — the same
    TakeOrderedAndProject discipline as ``top_k`` (pagerank.py).

    Sort key: struct(-cos, vec_id) ascending == (cos desc, vec_id asc);
    negation of a double is exact, so the emitted cos is bit-identical.
    """
    item = F.struct((-F.col("cos")).alias("neg"), F.col("vec_id").alias("vec_id"))
    part = scored.groupBy("query_id", F.spark_partition_id().alias("_p")).agg(
        F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("top")
    )
    merged = part.select("query_id", F.explode("top").alias("t"))
    fin = merged.groupBy("query_id").agg(
        F.slice(F.sort_array(F.collect_list("t")), 1, k).alias("top")
    )
    return fin.select("query_id", F.explode("top").alias("t")).select(
        "query_id",
        F.col("t.vec_id").alias("vec_id"),
        (-F.col("t.neg")).alias("cos"),
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """(query_id, vec_id, cos) — exact top-k neighbors per query vector.

    ``queries``: (query_id, embedding). Excludes self-matches
    (query_id == vec_id). Queries are broadcast — the corpus never moves,
    each corpus partition scores independently, and the per-partition
    top-k partial bounds the shuffle at k rows per (query, partition).
    """
    corp = with_unit_vectors(embeddings).select("vec_id", F.col("_unit").alias("cv"))
    qry = with_unit_vectors(queries.withColumnRenamed("embedding", "embedding")).select(
        F.col("query_id"), F.col("_unit").alias("qv")
    )
    scored = corp.crossJoin(F.broadcast(qry)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(_dot(F.col("qv"), F.col("cv")), round_dp).alias("cos"),
    )
    return _per_query_topk(scored, k)


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, round_dp: int = 6
) -> DataFrame:
    """(a, b, cos) exact pairs with cosine >= threshold (a < b)."""
    u = with_unit_vectors(embeddings).select("vec_id", "_unit")
    left = u.select(F.col("vec_id").alias("a"), F.col("_unit").alias("ua"))
    right = u.select(F.col("vec_id").alias("b"), F.col("_unit").alias("ub"))
    return (
        left.crossJoin(right)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(_dot(F.col("ua"), F.col("ub")), round_dp).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Spherical k-means coarse quantizer — the IVF cell structure.

    Deterministic end to end: initial centroids are the vectors of the
    ``n_centroids`` vec_ids with the smallest ``xxhash64(vec_id, 'ivf')``
    (a seedless pseudo-random sample, identical across runs and cluster
    sizes), then Lloyd iterations with unit-normalized mean updates.

    Centroids are k×d floats — driver-resident by design (kilobytes); the
    assignment pass embeds them as literal arrays, so each Lloyd iteration
    is ONE scan + ONE groupBy over the corpus with no join: at 10^9
    vectors that is the only shape that doesn't shuffle the embeddings.
    Returns (assignments (vec_id, cell), centroids).
    """
    u = with_unit_vectors(embeddings).select("vec_id", F.col("_unit").alias("v"))
    u = u.persist()
    d = len(u.select("v").first()["v"])
    seed_ids = [
        r["vec_id"]
        for r in u.select("vec_id")
        .orderBy(F.xxhash64("vec_id", F.lit("ivf")), F.col("vec_id"))
        .limit(n_centroids)
        .collect()
    ]
    cents = [
        list(r["v"])
        for r in u.filter(F.col("vec_id").isin(seed_ids))
        .orderBy("vec_id")
        .collect()
    ]

    def assign_expr(cs: list[list[float]]):
        scored = F.array(
            *[
                F.struct(
                    (-_dot(F.col("v"), F.array(*[F.lit(float(x)) for x in c]))).alias(
                        "neg"
                    ),
                    F.lit(ci).alias("cell"),
                )
                for ci, c in enumerate(cs)
            ]
        )
        return F.array_min(scored)["cell"]

    assign = None
    for _ in range(iters):
        assign = u.select("vec_id", "v", assign_expr(cents).alias("cell"))
        sums = assign.groupBy("cell").agg(
            *[F.avg(F.element_at("v", i + 1)).alias(f"m{i}") for i in range(d)],
        )
        new = {r["cell"]: [r[f"m{i}"] for i in range(d)] for r in sums.collect()}
        import math

        for ci in range(len(cents)):
            if ci in new:
                m = new[ci]
                nrm = math.sqrt(sum(x * x for x in m)) or 1.0
                cents[ci] = [x / nrm for x in m]
    out = assign.select("vec_id", "cell")
    u.unpersist()
    return out, cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """(query_id, vec_id, cos) — IVF-style ANN: probe the ``nprobe``
    nearest cells per query, exact cosine re-rank inside them.

    The at-scale shape: the corpus is scanned once for assignment (index
    build, amortized over queries), and each query touches only
    ~nprobe/n_centroids of the corpus. Queries are small by contract, so
    their cell probes are computed driver-side from the tiny centroid
    table. Recall grows with nprobe; nprobe = n_centroids degrades
    gracefully to exact search.
    """
    import numpy as np

    assign, cents = ivf_index(embeddings, n_centroids, iters)
    c = np.asarray(cents)  # (k, d), unit rows
    qrows = with_unit_vectors(queries).select("query_id", F.col("_unit").alias("qv")).collect()
    pairs = []  # (query_id, cell)
    for r in qrows:
        sims = c @ np.asarray(r["qv"])
        for cell in np.argsort(-sims)[:nprobe]:
            pairs.append((int(r["query_id"]), int(cell)))
    probes = embeddings.sparkSession.createDataFrame(
        pairs, schema="query_id long, cell int"
    )
    cand = assign.join(F.broadcast(probes), "cell").select("query_id", "vec_id")

    corp = with_unit_vectors(embeddings).select("vec_id", F.col("_unit").alias("cv"))
    qry = with_unit_vectors(queries).select("query_id", F.col("_unit").alias("qv"))
    scored = (
        cand.filter(F.col("vec_id") != F.col("query_id"))
        .join(corp, "vec_id")
        .join(F.broadcast(qry), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("cv")), round_dp).alias("cos"),
        )
    )
    return _per_query_topk(scored, k)


def _plane_weight(plane: int, dim_col):
    """Deterministic pseudo-random weight in [-1, 1) for (plane, dim)."""
    return (
        F.pmod(F.xxhash64(F.lit(plane), dim_col), F.lit(2_000_003)) / 1_000_001.5
        - F.lit(1.0)
    )


def hyperplane_signatures(embeddings: DataFrame, num_planes: int = 16) -> DataFrame:
    """(vec_id, sig: array<int>) — sign bit per seeded hyperplane.

    Weight w[p][d] is a hash of (p, d): no stored random state, identical
    across runs and cluster sizes (determinism requirement).
    """
    a = F.col("embedding").cast("array<double>")
    bits = F.array(
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        a,
                        F.sequence(F.lit(0), F.size(a) - 1),
                        lambda x, d: x * _plane_weight(p, d),
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v,
                )
                >= 0,
                1,
            )
            .otherwise(0)
            .alias(f"p{p}")
            for p in range(num_planes)
        ]
    )
    return embeddings.select("vec_id", bits.alias("sig"))


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
    round_dp: int = 6,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """(query_id, vec_id, cos) — approximate top-k via LSH bucket join.

    Candidates = vectors sharing ≥1 signature band with the query; exact
    cosine re-rank on candidates only. Recall grows with bands; the
    bucket join replaces the crossJoin so work is ~O(candidates·d).
    ``max_bucket_size`` thins degenerate corpus buckets (all-identical
    embeddings) by deterministic hash-sampling — see text.cap_bucket_size.
    """
    rows = num_planes // bands
    sig_c = hyperplane_signatures(embeddings, num_planes)
    sig_q = hyperplane_signatures(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"), num_planes
    ).select(F.col("vec_id").alias("query_id"), F.col("sig").alias("qsig"))

    def banded(df, idc, sigc):
        return df.select(
            idc,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                ",", *[F.element_at(sigc, b * rows + r + 1) for r in range(rows)]
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(idc, "bb.band", "bb.bucket")

    bc = banded(sig_c, "vec_id", F.col("sig"))
    if max_bucket_size is not None:
        from hoshizora_spark.text import cap_bucket_size

        bc = cap_bucket_size(bc, ["band", "bucket"], "vec_id", max_bucket_size)
    bq = banded(sig_q, "query_id", F.col("qsig"))
    cand = bc.join(bq, ["band", "bucket"]).select("query_id", "vec_id").distinct()

    corp = with_unit_vectors(embeddings).select("vec_id", F.col("_unit").alias("cv"))
    qry = with_unit_vectors(
        queries.select("query_id", "embedding")
    ).select("query_id", F.col("_unit").alias("qv"))
    scored = (
        cand.filter(F.col("vec_id") != F.col("query_id"))
        .join(corp, "vec_id")
        .join(F.broadcast(qry), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("cv")), round_dp).alias("cos"),
        )
    )
    # candidate set is LSH-bounded, but reuse the windowless top-k anyway
    return _per_query_topk(scored, k)
