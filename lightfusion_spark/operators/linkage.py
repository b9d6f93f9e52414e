"""Blocked fuzzy record linkage: edit-distance matching without the
all-pairs explosion.

The data-cleaning sibling of the dedup family: product names, author
strings, and addresses arrive with typos that exact/minhash dedup
(token-level) misses at short lengths.  The classic shape is BLOCKING
(Fellegi-Sunter practice): an equi-join on a cheap blocking key bounds
the candidate set, then the edit-distance refine runs only within
blocks — at 100 TB the blocking key IS the shuffle key, and the
quadratic cost is per-block, never corpus-wide (the same discipline as
the simhash pigeonhole and minhash band joins).

``levenshtein`` is a JVM built-in with identical semantics in DuckDB,
so the whole operator stays oracle-replayable and Python-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column | str,
    max_distance: int,
) -> DataFrame:
    """Within-table fuzzy pairs: ``(id_a, id_b, text_a, text_b,
    distance)`` for all same-block pairs with ``levenshtein <=
    max_distance``, each unordered pair once (``id_a < id_b``).

    Pick ``block`` so true matches cannot disagree on it (last name
    token, normalized city, zip prefix …) — recall is exactly the
    probability a true match shares the block, and that choice is the
    caller's domain knowledge, not something to hide in a default.
    """
    b = F.col(block) if isinstance(block, str) else block
    a_side = df.select(
        b.alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
    )
    b_side = df.select(
        b.alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
    )
    return (
        a_side.join(b_side, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein(F.col("text_a"), F.col("text_b")))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "text_a", "text_b", "distance")
    )


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    left_block: Column | str,
    right_block: Column | str,
    max_distance: int,
    best_only: bool = False,
) -> DataFrame:
    """Two-table fuzzy linkage (the master-data match): candidates from
    the block equi-join, ``levenshtein`` refine, and optionally only
    each left row's single best match (``best_only`` — ties break on
    the smaller right id, deterministic).
    """
    from pyspark.sql.window import Window

    lb = F.col(left_block) if isinstance(left_block, str) else left_block
    rb = F.col(right_block) if isinstance(right_block, str) else right_block
    l_side = left.select(
        lb.alias("_blk"),
        F.col(left_id).alias("left_id"),
        F.col(left_text).alias("left_text"),
    )
    r_side = right.select(
        rb.alias("_blk"),
        F.col(right_id).alias("right_id"),
        F.col(right_text).alias("right_text"),
    )
    matched = (
        l_side.join(r_side, "_blk")
        .withColumn("distance", F.levenshtein(F.col("left_text"), F.col("right_text")))
        .where(F.col("distance") <= max_distance)
        .select("left_id", "left_text", "right_id", "right_text", "distance")
    )
    if not best_only:
        return matched
    w = Window.partitionBy("left_id").orderBy(
        F.col("distance").asc(), F.col("right_id").asc()
    )
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
