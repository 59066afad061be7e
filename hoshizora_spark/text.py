"""Text-pipeline operators over a documents table (training-data prep).

Beyond the reference's graph algorithms, a link-graph engine feeding a
training pipeline needs corpus hygiene ops. All of these are pure
Catalyst expressions (no Python in the hot path) over
``documents(doc_id, text, lang, source, n_chars)``:

  * exact dedup         — sha256 over normalized text, keep min doc_id
  * token counting      — whitespace tokenization, JVM-side
  * quality scoring     — length / punctuation / stopword ratios
  * language-ID         — marker-word n-gram heuristic, per-language scores
  * n-gram Jaccard      — exact near-dup pairs via shingle self-join
  * MinHash + LSH       — the at-scale near-dup path: k seeded hash
                          functions, banded signatures, bucket join; the
                          self-join touches only bucket-colliding pairs
  * SimHash             — 64-bit fingerprint via per-token hash bit voting

Scale notes (100 TB corpus): every op here is a scan + groupBy/join on
either a 64-bit hash or a shingle — no global sorts, no driver
collection. The shingle explode multiplies rows ~n_tokens×; at scale,
cap tokens per doc (``max_tokens``) and MinHash instead of exact
Jaccard — exact pair-verification then runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with"],
    "es": ["el", "la", "que"],
    "de": ["der", "und", "ist"],
    "fr": ["le", "les", "est"],
    "zh": ["de", "shi", "bu"],
}


def normalized(col):
    """lower + collapse whitespace + trim — the canonical dedup key."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(content_hash, keep_id, n_dups): one row per distinct normalized text.

    sha256 (not xxhash64) so fingerprints are portable across engines and
    runs; at 10^12 docs the groupBy key is the 32-byte digest, not the
    text — shuffle carries hashes only.
    """
    hashed = docs.select(
        F.col("doc_id"), F.sha2(normalized(F.col("text")), 256).alias("content_hash")
    )
    return hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_id"),
        (F.count(F.lit(1)) - 1).alias("n_dups"),
    )


def tokens(col):
    return F.split(F.trim(col), r"\s+")


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_measured)."""
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stopword_ratio, quality).

    quality = min(n_tokens/100, 1) * (1 - punct_ratio) *
              (0.5 + stopword_ratio)   — rewards prose-like docs; fixed
    formula so the DuckDB oracle reproduces it bit-for-bit at 6 dp.
    """
    t = tokens(normalized(F.col("text")))
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda w: w.isin(STOPWORDS)))
    punct = F.length(F.regexp_replace(F.lower(F.col("text")), r"[a-z0-9\s]", ""))
    punct_ratio = punct / F.greatest(F.length("text"), F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    quality = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0))
        * (F.lit(1.0) - punct_ratio)
        * (F.lit(0.5) + stop_ratio)
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def _count_marker(text_col, w: str):
    # occurrences of token w (word-boundary-free count, same in both engines):
    # (len(s) - len(replace(s, w, ''))) / len(w)
    return (
        (F.length(text_col) - F.length(F.replace(text_col, F.lit(w), F.lit(""))))
        / F.lit(len(w))
    ).cast("long")


def lang_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, <lang>_score..., pred_lang) — marker-word heuristic.

    pred_lang = first language (fixed en,es,de,fr,zh order) whose score is
    strictly greater than all later ones — deterministic argmax.
    """
    low = F.lower(F.col("text"))
    cols = {
        lang: sum(
            (_count_marker(low, w) for w in ws), F.lit(0).cast("long")
        ).alias(f"{lang}_score")
        for lang, ws in LANG_MARKERS.items()
    }
    scored = docs.select("doc_id", *cols.values())
    langs = list(LANG_MARKERS)
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [f"{l}_score" for l in langs[langs.index(lang) + 1:]]
        cond = F.lit(True)
        for c in later:
            cond = cond & (F.col(f"{lang}_score") >= F.col(c))
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return scored.withColumn("pred_lang", pred)


# GPT-style pre-tokenizer classes, simplified to what both Java regex
# (Spark) and RE2 (DuckDB) support identically: letter runs, digit runs,
# punctuation runs. The real BPE merge table is model-specific; the
# pre-tokenizer split is what sizing/costing pipelines need.
BPE_SPLIT_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_counts_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bpe_tokens, n_alpha_runs, n_digit_runs, n_punct_runs).

    BPE-ish token accounting: the pre-tokenizer split above approximates
    subword token counts far better than whitespace (punctuation and
    number runs become their own tokens) — the standard first-order cost
    model for training-data sizing. Pure Catalyst regexp, no Python.
    """
    # Spark SQL string literals eat single backslashes ('\s' -> 's'), so
    # the canonical RE2/Java-portable pattern gets its backslashes doubled
    # here; DuckDB literals pass backslashes through untouched.
    spark_re = BPE_SPLIT_RE.replace("\\", "\\\\")
    toks = F.expr(f"regexp_extract_all(text, '{spark_re}', 0)")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-zA-Z]+', 0)"))
        .cast("long")
        .alias("n_alpha_runs"),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)"))
        .cast("long")
        .alias("n_digit_runs"),
        F.size(F.expr(r"regexp_extract_all(text, '[^a-zA-Z0-9\\s]+', 0)"))
        .cast("long")
        .alias("n_punct_runs"),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 7, window: int = 4, max_chars: int = 4000
) -> DataFrame:
    """(doc_id, fp) — MOSS-style winnowing document fingerprints.

    Rolling char-k-gram hashes; each sliding window of ``window``
    consecutive hashes contributes its minimum; distinct minima are the
    doc's fingerprint set. Guarantees every shared substring of length
    ≥ k + window − 1 between two docs yields a shared fingerprint —
    the classic plagiarism/near-dup detector with provable recall
    (Schleimer, Wilkerson, Aiken, SIGMOD 2003).

    Hash = the portable 60-bit sha256 prefix (sha_token_hash60), so the
    whole op is reproducible in any engine with sha256 — full oracle.
    Docs shorter than k chars (after normalization) yield no rows.
    ``max_chars`` bounds per-doc work at scale; the array pipeline is
    one Catalyst expression chain, no Python, no shuffle until the final
    distinct.
    """
    norm = F.substring(normalized(F.col("text")), 1, max_chars)
    n_hashes = F.length(norm) - k + 1
    hs = F.transform(
        F.sequence(F.lit(1), n_hashes),
        lambda i: sha_token_hash60(F.substr(norm, i, F.lit(k))),
    )
    # Sliding-window min via window-1 shifted zip_with passes — O(w·n)
    # expression evaluations. The obvious per-position
    # ``transform(seq, j -> array_min(slice(hs, j, w)))`` is O(n²):
    # Catalyst inlines the hs construction into every lambda element, so
    # each of the n positions re-hashes the whole document (measured
    # ~1.2 s/doc at 500 chars — two orders slower than this form).
    m = hs
    for s in range(1, window):
        # zip_with pads the shorter side with NULL; least() ignores NULLs,
        # and the final slice keeps only full windows anyway.
        m = F.zip_with(m, F.slice(hs, s + 1, n_hashes), lambda a, b: F.least(a, b))
    mins = F.slice(m, 1, n_hashes - window + 1)
    guarded = F.when(n_hashes >= window, mins).otherwise(
        F.when(n_hashes >= 1, F.array(F.array_min(hs))).otherwise(
            F.expr("CAST(array() AS array<long>)")
        )
    )
    return (
        docs.select("doc_id", F.explode(F.array_distinct(guarded)).alias("fp"))
        .distinct()
    )


def word_ngrams(docs: DataFrame, n: int = 3, max_tokens: int = 10_000) -> DataFrame:
    """(doc_id, gram) — distinct word n-gram shingles per doc.

    Docs with fewer than ``n`` tokens yield no grams. The guard matters:
    ``F.sequence(0, size-n)`` with size < n would produce a *descending*
    sequence (Spark infers step -1) whose -1 entry makes ``F.slice`` throw
    under ANSI mode — one short doc would abort the whole job.
    """
    t = F.slice(tokens(normalized(F.col("text"))), 1, max_tokens)
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """(a, b, jaccard) for doc pairs with n-gram Jaccard >= threshold.

    Exact path: shingle self-join. Quadratic only within identical grams —
    fine at verification scale; at corpus scale use minhash_lsh_candidates
    to prefilter and feed candidates through the same verification join.
    """
    g = word_ngrams(docs, n)
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = g.select(F.col("doc_id").alias("a"), "gram")
    gb = g.select(F.col("doc_id").alias("b"), "gram")
    inter = (
        ga.join(gb, "gram")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 32, n: int = 3) -> DataFrame:
    """(doc_id, sig: array<long>) — k independent seeded min-hashes.

    h_i(gram) = xxhash64(gram, i); signature element i = min over the
    doc's grams. One explode + one groupBy; at 10^12 docs the shuffle
    carries (doc_id, 32 longs).
    """
    g = word_ngrams(docs, n)
    hashes = F.array(
        *[F.xxhash64(F.col("gram"), F.lit(i)).alias(f"h{i}") for i in range(num_hashes)]
    )
    per_gram = g.select("doc_id", hashes.alias("hs"))
    return per_gram.groupBy("doc_id").agg(
        F.array(
            *[F.min(F.element_at("hs", i + 1)).alias(f"m{i}") for i in range(num_hashes)]
        ).alias("sig")
    )


def cap_bucket_size(
    banded: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    max_bucket_size: int,
) -> DataFrame:
    """Bound any LSH bucket at ~``max_bucket_size`` members.

    A degenerate corpus (an all-near-identical crawl shard) puts everything
    in one bucket and makes the candidate self-join quadratic. Oversized
    buckets are thinned by deterministic hash-sampling (keep rows where
    hash(id, bucket) ≡ 0 mod ceil(size/cap)) — no per-bucket sort or
    collect, so the thinning itself never concentrates a hot bucket on one
    task. Rationale: members of a mega-bucket are mutual near-dups with
    overwhelming probability; exact dedup already collapses the identical
    ones, and a sampled subset still surfaces the cluster. Buckets at or
    under the cap pass through untouched (the common case — output is
    unchanged unless a bucket actually degenerates).
    """
    sizes = banded.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bsz"))
    stride = F.ceil(F.col("_bsz") / F.lit(max_bucket_size)).cast("long")
    return (
        banded.join(sizes, bucket_cols)
        .filter(
            (F.col("_bsz") <= max_bucket_size)
            | (
                F.pmod(
                    F.xxhash64(F.col(id_col), *[F.col(c) for c in bucket_cols]), stride
                )
                == 0
            )
        )
        .drop("_bsz")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """(a, b) candidate near-dup pairs from banded MinHash buckets.

    bands × rows-per-band = num_hashes; pairs colliding in ≥1 band emerge.
    The bucket join groups on (band, bucket_hash) so hot buckets are the
    only skew surface; ``max_bucket_size`` bounds them (cap_bucket_size)
    so a degenerate all-identical shard can't go quadratic.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        banded = cap_bucket_size(banded, ["band", "bucket"], "doc_id", max_bucket_size)
    left = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard — the at-scale near-dup op."""
    cand = minhash_lsh_candidates(docs, num_hashes, bands, n, max_bucket_size)
    g = word_ngrams(docs, n)
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = g.select(F.col("doc_id").alias("a"), "gram")
    gb = g.select(F.col("doc_id").alias("b"), "gram")
    inter = (
        cand.join(ga, "a")
        .join(gb, ["b", "gram"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def sha_token_hash60(tok_col):
    """Deterministic 60-bit token hash portable across engines: the first
    15 hex chars of sha256, parsed base-16. 60 bits (not 64) so the value
    fits a signed long without sign-bit games in ANSI mode, and so DuckDB
    can reproduce it with a positional hex-digit sum — the cross-engine
    oracle hook xxhash64 can't provide."""
    return F.conv(F.substring(F.sha2(tok_col, 256), 1, 15), 16, 10).cast("long")


def _simhash(docs: DataFrame, token_hash, bits: int) -> DataFrame:
    """Shared bit-voting core: bit b of the fingerprint = majority vote of
    bit b across all token-occurrence hashes (ties -> 0)."""
    tok = docs.select(
        "doc_id", F.explode(tokens(normalized(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    h = tok.select("doc_id", token_hash(F.col("tok")).alias("h"))
    votes = h.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{b}")
            for b in range(bits)
        ],
    )
    agg = votes.groupBy("doc_id").agg(
        *[F.sum(f"b{b}").alias(f"b{b}") for b in range(bits)]
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        # bit 63 would land on the sign bit; bitwiseOR keeps it total within long
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select("doc_id", fp.alias("simhash"))


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit fingerprint by per-token hash bit voting.

    bit b of the fingerprint = majority vote of bit b across all token
    xxhash64 values. Near-identical docs differ in few bits (Hamming).
    """
    return _simhash(docs, F.xxhash64, 64)


def simhash_sha60(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 60-bit SimHash over the portable sha256-prefix
    token hash. Same voting semantics as ``simhash64``; exists so the
    fingerprint is bit-reproducible in any engine with sha256 (the
    cross-engine correctness oracle). xxhash64 stays the fast path."""
    return _simhash(docs, sha_token_hash60, 60)
