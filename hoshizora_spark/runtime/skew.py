"""Skew handling for power-law graphs: salting + hot-key detection.

The reference has NO skew handling — its edge-balanced chunks still put a
hub vertex's whole in-edge slice on one thread (/root/reference/src/
hoshizora/core/bulksync_gas_executor.h:213-227 fold runs per-dst on the
owning thread). On Spark, a hot repo/file (power-law in-degree, the
north_rule's "hot repos") would do the same to one reducer task. Three
layers defend against it here:

1. **Map-side partial aggregation** (free): Catalyst's hash agg combines
   per map partition before the exchange, so a hot dst receives at most
   one row per upstream partition at the final agg.
2. **Two-stage salted aggregation** (this module): when upstream
   partitions are themselves too few/large, pre-split each hot key into
   ``num_salts`` sub-keys, aggregate per (key, salt), then re-aggregate —
   bounds any single reducer's input at rows/num_salts.
3. **Salted join**: replicate the small (state) side of a per-superstep
   join ``num_salts`` times for hot keys and scatter the large (edge)
   side uniformly across the replicas — the classic skew-join transform
   that AQE's skew-join does adaptively; explicit here so it also covers
   non-AQE plan shapes and lets the engine pin the salt count from a
   degree histogram.

The CSR-block GAS path needs none of this: its per-block partial fold
already bounds a hot vertex's fan-in at ``num_blocks`` rows (runtime/gas.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_hz_salt"


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Keys whose multiplicity exceeds ``min_count`` (the degree histogram
    cut). One aggregation; result is small by construction (power law)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > min_count)
        .select(key)
    )


def hot_keys_from_degrees(
    degrees: DataFrame,
    min_count: int,
    key_col: str = "vid",
    deg_col: str = "out_deg",
    out_key: str | None = None,
) -> DataFrame:
    """Hot-key set from a live degree histogram — the bridge from
    ``streaming.ingest.streaming_degrees_windowed``'s sink table to the
    salting decisions (``salted_join_edges_state``'s ``hot`` input).

    ``degrees`` is the windowed degree table (window_start, window_end,
    vid, out_deg) — read back from the stream's sink, or any batch frame
    with the same shape. Only the MOST RECENT window per vertex counts:
    hot *now* is what skews the next superstep; a vertex that was hot two
    windows ago and went quiet must not keep paying the replication cost.
    One ``max_by`` aggregation; the result is small by construction
    (power law tail above the cut).
    """
    if "window_start" in degrees.columns:
        cur = degrees.groupBy(key_col).agg(
            F.max_by(deg_col, F.col("window_start")).alias(deg_col)
        )
    else:  # plain (vid, out_deg) total-degree table: use as-is
        cur = degrees
    out = out_key or key_col
    return (
        cur.filter(F.col(deg_col) > min_count)
        .select(F.col(key_col).alias(out))
    )


def salted_sum(
    df: DataFrame,
    key: str,
    value_expr,
    out_col: str,
    num_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage sum: groupBy(key, salt) -> groupBy(key).

    The salt is data-derived — a hash of the key's partner columns
    (``salt_cols``, default: every non-key column) — NOT
    ``spark_partition_id``: if the upstream stage has fewer partitions
    than ``num_salts`` (AQE coalescing does this on small stages), a
    topology-derived salt collapses to that partition count and stage-2
    skew returns. Hashing row content keeps the spread at ``num_salts``
    regardless of upstream partitioning.
    """
    if salt_cols is None:
        salt_cols = [c for c in df.columns if c != key]
    # The salt MUST be a deterministic function of row content: a
    # nondeterministic component (monotonically_increasing_id,
    # spark_partition_id, rand) changes on shuffle-fetch-failure recompute,
    # migrating rows between (key, salt) groups mid-shuffle — the classic
    # double-count/loss hazard with nondeterministic repartition keys.
    # Cost of determinism: bit-identical rows under one hot key collide on
    # one salt; acceptable because real payloads differ per row.
    salted = df.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]),
            F.lit(num_salts),
        ),
    )
    partial = salted.groupBy(key, SALT_COL).agg(F.sum(value_expr).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(out_col))


def salted_join_edges_state(
    edges: DataFrame,
    state: DataFrame,
    key: str,
    hot: DataFrame,
    num_salts: int = 16,
) -> DataFrame:
    """Join edges (large, skewed on ``key``) with state (one row per key).

    Hot keys: state row replicated ``num_salts`` times with salt 0..k-1;
    edge rows pick a uniform salt. Cold keys: salt 0 both sides. Output
    columns = edges' + state's non-key columns.
    """
    hot_marked = hot.withColumn("_is_hot", F.lit(True))
    # Deterministic content-derived salt (see salted_sum): a retry-recomputed
    # edge row must land on the SAME state replica, or the join emits it
    # twice/zero times. Hashing every edge column spreads hot keys across
    # replicas as long as edge rows differ (they do: distinct dst/payload).
    edge_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in edges.columns]), F.lit(num_salts)
    )
    e = edges.join(F.broadcast(hot_marked), key, "left").withColumn(
        SALT_COL,
        F.when(F.col("_is_hot").isNotNull(), edge_salt)
        .otherwise(F.lit(0))
        .cast("int"),
    ).drop("_is_hot")
    s = (
        state.join(F.broadcast(hot_marked), key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_is_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(num_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn(SALT_COL, F.explode(F.col("_salts").cast("array<int>")))
        .drop("_salts", "_is_hot")
    )
    return e.join(s, [key, SALT_COL]).drop(SALT_COL)
