"""Edge-list sources (reference op #1) — Spark-native scans.

The reference's only source is a whitespace-delimited ``src dst`` text file
read single-threaded on the driver (/root/reference/src/hoshizora/core/
io.h:32-71). Here the same format is a distributed ``spark.read.text`` scan
(splittable, so a 100 TB edge file fans out across executors), plus parquet
for the primary at-scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list(spark: SparkSession, path: str) -> DataFrame:
    """(src: long, dst: long) from whitespace-delimited pair-per-line text.

    Matches ``IO::from_file`` observable behavior (io.h:32-71): every pair
    of whitespace-separated integer tokens is one directed edge; blank
    lines skipped. Lines starting with ``#`` (SNAP headers) are skipped —
    the reference would choke on them, callers pre-strip. Non-integer
    tokens become NULL via ``try_cast`` (a plain ``cast`` under Spark 4
    ANSI mode would abort the whole read on one malformed line) and are
    dropped by the isNotNull filter.
    """
    lines = spark.read.text(path).select(F.trim("value").alias("line"))
    toks = (
        lines.filter((F.col("line") != "") & ~F.col("line").startswith("#"))
        .select(F.split("line", r"\s+").alias("t"))
    )
    # pair up consecutive tokens within a line (normally exactly 2 per line)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.floor(F.size("t") / 2) - 1).cast("int")),
                lambda i: F.struct(
                    F.element_at("t", (i * 2 + 1).cast("int")).try_cast("long").alias("src"),
                    F.element_at("t", (i * 2 + 2).cast("int")).try_cast("long").alias("dst"),
                ),
            )
        ).alias("e")
    )
    return pairs.select("e.src", "e.dst").filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )


def read_edges_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet edge table — the at-scale source (column-pruned scan)."""
    return spark.read.parquet(path).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
