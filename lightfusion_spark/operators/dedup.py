"""Deduplication operators for large-scale training-data pipelines.

All of these are engine extensions beyond the reference (SURVEY §2.4) —
the reference has no dedup surface at all.  Every operator is pure
DataFrame algebra (no Python UDFs, no ``collect()``), so Catalyst keeps
whole-stage codegen and the shuffle structure is explicit and scalable.

Hashing is MD5-derived (``conv(substr(md5(x),1,14),16,10)`` -> 56-bit
positive int) rather than ``xxhash64`` so a DuckDB oracle can reproduce
every hash bit-for-bit; at production scale swap ``_md5_long`` for
``F.xxhash64`` (same plan shape, faster JVM hash).

100 TB design notes
-------------------
* **exact_dedup** — one hash-partitioned shuffle on the dedup key; with
  a pre-bucketed table the shuffle disappears entirely.  Skewed keys
  (empty docs) are fine: the window only needs per-key local order.
* **minhash LSH** — the banding trick keeps candidate generation at
  O(n · bands) rows instead of O(n²) pairs: only documents agreeing on
  a full band collide, and the band-signature groupBy is an ordinary
  hash shuffle.  Band width trades recall vs candidate volume
  (P[collide] = 1-(1-j^r)^b for jaccard j).  The verification join that
  follows touches only candidate pairs.
* **simhash** — fingerprints are one narrow shuffle (explode words ->
  per-doc bit votes); pairing at scale should block on fingerprint
  prefixes (here, at test scale, a bounded self-join suffices).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _md5_long(col: Column, seed: int | None = None) -> Column:
    """Deterministic 56-bit positive hash, reproducible in DuckDB as
    ``CAST('0x' || substr(md5(...),1,14) AS BIGINT)``."""
    if seed is not None:
        col = F.concat_ws(":", F.lit(str(seed)), col)
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep the first row (by ``order_col``) of every duplicate group.

    The classic ``row_number() OVER (PARTITION BY key ORDER BY tiebreak)``
    formulation — deterministic, unlike ``dropDuplicates`` whose survivor
    depends on partitioning.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word ``n``-grams of lowercased, whitespace-split text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(c), r"\s+")
    # sequence(1, size-n+1) would flip descending for short docs; guard.
    window_idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(window_idx, gram)),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) long form — one row per distinct shingle per doc."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def minhash_long(
    shingles: DataFrame, id_col: str, n_hashes: int = 8
) -> DataFrame:
    """(id, k, minhash): the k-th minwise hash of each doc's shingle set.

    One groupBy shuffle over (id, k); partial min() combines map-side so
    the shuffle carries n_docs * n_hashes rows, not n_shingles * n_hashes.
    """
    ks = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("k")
    return (
        shingles.select(F.col(id_col), F.col("shingle"), ks)
        .select(id_col, "k", _md5_long_seeded("shingle", "k").alias("h"))
        .groupBy(id_col, "k")
        .agg(F.min("h").alias("minhash"))
    )


def _md5_long_seeded(shingle_col: str, k_col: str) -> Column:
    """Hash family indexed by the ``k`` column (seed mixed into the input)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(k_col).cast("string"), F.col(shingle_col))),
            1,
            14,
        ),
        16,
        10,
    ).cast("bigint")


def lsh_candidate_pairs(
    minhashes: DataFrame, id_col: str, rows_per_band: int = 2
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b).

    Two docs become candidates iff ALL hashes inside some band agree —
    the LSH trick that avoids the O(n²) all-pairs comparison at scale.
    """
    sigs = (
        minhashes.withColumn("band", (F.col("k") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("sig")
        )
    )
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verified_pairs(
    shingles: DataFrame,
    candidates: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact word-shingle Jaccard for candidate pairs; keep >= threshold.

    Joins only the candidate pairs against the shingle sets — the
    expensive exact check is confined to the LSH survivors.
    Output: (id_a, id_b, jaccard).
    """
    counts = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full fuzzy-dedup pipeline: shingle -> minhash -> LSH bands ->
    exact-Jaccard verification.  Output (id_a, id_b, jaccard)."""
    sh = doc_shingles(df, id_col, text_col, shingle_n)
    mh = minhash_long(sh, id_col, n_hashes)
    cand = lsh_candidate_pairs(mh, id_col, rows_per_band)
    return jaccard_verified_pairs(sh, cand, id_col, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint over distinct lowercased words.

    Bit j of the fingerprint is 1 iff the sum over words of
    ``(bit_j(hash(word)) ? +1 : -1)`` is positive.  One explode + one
    groupBy shuffle; the ``bits`` conditional sums are a single
    projection evaluated map-side.
    """
    words = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("w"),
    ).withColumn("h", _md5_long(F.col("w")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = words.groupBy(id_col).agg(*votes)
    fingerprint = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return agg.select(F.col(id_col), fingerprint.cast("bigint").alias("simhash"))


def simhash_near_duplicates(
    fingerprints: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs of fingerprints within ``max_hamming`` bits.

    Bounded self-join (fine at test scale); at 100 TB block on fingerprint
    prefixes (split the fingerprint into max_hamming+1 chunks — any pair
    within the radius shares at least one exact chunk, pigeonhole).
    Output (id_a, id_b, hamming).
    """
    a = fingerprints.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = fingerprints.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Character n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup within a blocking key.

    Blocking (same ``block_col``) bounds the pair space — the test-scale
    stand-in for LSH prefixes at 100 TB.  Output (id_a, id_b, jaccard).
    """
    grams = df.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(lower({text_col})) - {n - 1}, 0)),"
                    f" i -> substring(lower({text_col}), i, {n}))"
                )
            )
        ).alias("gram"),
    )
    counts = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_g"))
    ga = grams.select(F.col(id_col).alias("id_a"), F.col("_blk"), "gram")
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("_blk"), "gram")
    inter = (
        ga.join(gb, ["_blk", "gram"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_g").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_g").alias("n_b"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
