"""Deterministic synthetic source-code corpus (BASELINE.json input_hint shape).

Produces the mandated table ``(repo, path, commit, lang, content)`` plus the
generation-time ``content_sha256`` column used for the per-row ingest
invariant. Everything is generated JVM-side from counter-based hashes
(xxhash64 of the row id + a salt), so the table is deterministic for a given
(num_repos, files_per_repo, seed) regardless of partitioning or parallelism —
the Spark analogue of a seeded RNG, with no Python in the loop.

Import-line formats (FIXTURES.md §1), each resolvable within the corpus:
    py  -> ``import <repo>.<stem>``          (stem = file name sans ext)
    c   -> ``#include "<repo>/<path>"``
    js  -> ``require('<repo>/<path>')``

Out-edge targets are drawn power-law-ish (u^3 bias toward low file indices,
u^2 toward low repo ids) so a few "hot" files/repos receive most references —
this exercises the skew/salting path at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "c", "js"]


def _u(col_id, seed: int, salt: str):
    """Deterministic uniform in [0, 1) from a row id + salt (counter-based)."""
    return F.pmod(F.xxhash64(col_id, F.lit(seed), F.lit(salt)), F.lit(1_000_003)) / 1_000_003.0


def synthesize_corpus(
    spark: SparkSession,
    num_repos: int = 8,
    files_per_repo: int = 16,
    seed: int = 42,
    max_out: int = 6,
    same_repo_prob: float = 0.7,
    num_partitions: int | None = None,
) -> DataFrame:
    """Corpus table: (repo, path, commit, lang, content, content_sha256)."""
    R, Fn = num_repos, files_per_repo
    total = R * Fn
    rng = spark.range(0, total, 1, num_partitions or spark.sparkContext.defaultParallelism)

    files = rng.select(
        F.col("id"),
        (F.col("id") / Fn).cast("long").alias("r"),
        F.pmod(F.col("id"), F.lit(Fn)).alias("i"),
    ).select(
        "id",
        "r",
        "i",
        F.format_string("repo%04d", F.col("r")).alias("repo"),
        F.format_string("f%05d", F.col("i")).alias("stem"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod("i", F.lit(3)) + 1).cast("int")).alias("lang"),
    ).withColumn(
        "path", F.format_string("src/%s.%s", F.col("stem"), F.col("lang"))
    )

    # out-degree in [1, max_out], then one row per out-edge slot j
    k = (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("k")), F.lit(max_out)) + 1).alias("k")
    slots = files.withColumn("k", k).select(
        "*", F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("j")
    )
    sid = F.xxhash64("id", "j", F.lit(seed))  # per-slot id for hash draws

    # power-law target file index (bias to 0); avoid self-import by +1 shift
    t_raw = F.floor(F.lit(Fn) * F.pow(_u(sid, seed, "t"), F.lit(3.0))).cast("long")
    t = F.when(t_raw == F.col("i"), F.pmod(t_raw + 1, F.lit(Fn))).otherwise(t_raw)
    # target repo: same repo w.p. same_repo_prob else power-law over repos
    tr = F.when(_u(sid, seed, "sr") < F.lit(same_repo_prob), F.col("r")).otherwise(
        F.floor(F.lit(R) * F.pow(_u(sid, seed, "tr"), F.lit(2.0))).cast("long")
    )

    refs = slots.select(
        "id", "repo", "path", "lang", "stem", "j",
        F.format_string("repo%04d", tr).alias("tgt_repo"),
        t.alias("tgt_i"),
    ).select(
        "*",
        F.format_string("f%05d", F.col("tgt_i")).alias("tgt_stem"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]), (F.pmod("tgt_i", F.lit(3)) + 1).cast("int")
        ).alias("tgt_ext"),
    ).withColumn(
        "tgt_path", F.format_string("src/%s.%s", F.col("tgt_stem"), F.col("tgt_ext"))
    ).withColumn(
        "import_line",
        F.when(F.col("lang") == "py", F.format_string("import %s.%s", F.col("tgt_repo"), F.col("tgt_stem")))
        .when(F.col("lang") == "c", F.format_string('#include "%s/%s"', F.col("tgt_repo"), F.col("tgt_path")))
        .otherwise(F.format_string("require('%s/%s')", F.col("tgt_repo"), F.col("tgt_path"))),
    )

    bodies = refs.groupBy("id", "repo", "path", "lang", "stem").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "import_line"))),
                lambda s: s["import_line"],
            ),
            "\n",
        ).alias("imports")
    )

    corpus = bodies.select(
        "repo",
        "path",
        F.substring(F.sha2(F.concat_ws("/", "repo", "path"), 256), 1, 40).alias("commit"),
        "lang",
        F.concat(
            F.format_string("// %s/%s lang=%s\n", F.col("repo"), F.col("path"), F.col("lang")),
            F.col("imports"),
            F.lit("\n"),
        ).alias("content"),
    ).withColumn("content_sha256", F.sha2("content", 256))
    return corpus


def verify_sha256(corpus: DataFrame) -> int:
    """Per-row ingest invariant (BASELINE input_hint): recompute sha256(content)
    at scan time and count mismatches vs the stored column. Must be 0."""
    return corpus.filter(F.sha2("content", 256) != F.col("content_sha256")).count()
