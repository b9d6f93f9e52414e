"""SFT / eval conversation ingestion and turn-level deduplication.

The one LLM-pipeline data shape the repo had no ingest face for
(round-11 verdict item 8): post-training corpora ship as JSONL — one
conversation per line, ``messages`` as an ordered role/content array
(the de-facto chat format of public SFT datasets).  These operators
produce the repo's relational currency (a TURNS table) from that raw
file and dedup it at the two granularities that matter for SFT:

* **turn-level** — canned/templated responses repeat VERBATIM across
  conversations (refusal boilerplate, greeting templates); training on
  thousands of copies skews the loss.  :func:`dedup_turns_exact`.
* **conversation-level** — whole transcripts get re-ingested under new
  ids when datasets are merged.  :func:`dedup_conversations_exact`.

Spark-first: the JSONL parse is ``spark.read.json`` with an EXPLICIT
schema — the JVM line-delimited reader, splittable and predicate-
prunable, never a Python loop (schema inference is also skipped: one
pass, not two, and a schema drift fails loudly instead of silently
re-typing a column).  Everything downstream is pure DataFrame algebra.

100 TB design
-------------
* JSONL is line-splittable: the JVM reader hands each HDFS/S3 block to
  its own task — file-level AND intra-file parallelism are free.
* The dedup shuffles ship ``(digest, id)`` projections, never message
  text (the :func:`~.dedup.incremental_dedup` projection-first
  pattern): survivors come from a map-side-combinable
  ``groupBy(digest).agg(min(id))``, and text is re-attached only by
  the caller if needed.
* Digests are MD5 (reproducible bit-for-bit by the DuckDB oracle, the
  same contract as :mod:`.dedup`); at production scale swap for
  ``xxhash64`` — identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

#: The chat-JSONL schema: one conversation per line.
CONVERSATION_SCHEMA = StructType(
    [
        StructField("conversation_id", StringType()),
        StructField("source", StringType()),
        StructField(
            "messages",
            ArrayType(
                StructType(
                    [
                        StructField("role", StringType()),
                        StructField("content", StringType()),
                    ]
                )
            ),
        ),
        StructField("_corrupt", StringType()),
    ]
)


def read_jsonl_conversations(spark: SparkSession, path: str) -> DataFrame:
    """Read a chat-format JSONL file (one conversation object per line)
    into ``(conversation_id, source, messages, _corrupt)``.

    Explicit schema, PERMISSIVE mode: a malformed line becomes a row
    whose data columns are NULL and whose ``_corrupt`` column holds the
    raw line — visible and countable, never silently skipped (the
    repo's loud-failure convention).  Callers gate on
    ``_corrupt IS NULL`` and count the rest.
    """
    return (
        spark.read.schema(CONVERSATION_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def conversation_turns(df: DataFrame) -> DataFrame:
    """Explode conversations to the TURNS relation::

        (conversation_id, source, n_turns, turn_idx, role, content)

    ``turn_idx`` is the 0-based position within the conversation
    (``posexplode`` — order is the array's, deterministic).  A pure
    zero-shuffle projection; corrupt rows (NULL ``messages``) vanish
    here by explode semantics, so gate/count them upstream.
    """
    return df.select(
        "conversation_id",
        "source",
        F.size("messages").alias("n_turns"),
        F.posexplode("messages").alias("turn_idx", "_msg"),
    ).select(
        "conversation_id",
        "source",
        "n_turns",
        "turn_idx",
        F.col("_msg.role").alias("role"),
        F.col("_msg.content").alias("content"),
    )


def _norm(col):
    """Shared turn normalization: lowercase, trim, collapse internal
    whitespace — the template-dup equivalence class (a canned response
    re-wrapped or re-indented is still the same response)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def turn_digest(role_col, content_col):
    """MD5 digest of a turn, ROLE-SCOPED (unit separator 0x1f joins
    role and normalized content): an assistant turn and a user turn
    with identical text are different training signals and must not
    collapse.  Reproducible in DuckDB as
    ``md5(coalesce(role,'') || chr(31) || <norm(coalesce(content,''))>)``.

    The convention is TOTAL: NULL role and NULL content each coalesce
    to the empty string BEFORE hashing, so a turn with a missing field
    (a well-formed JSONL line omitting ``role`` or ``content`` — the
    PERMISSIVE ``_corrupt`` gate does not catch absent struct fields)
    lands in the same dedup class as its empty-string twin — one
    documented class per role, never a silent ``concat_ws``-skip class
    and never a Spark/oracle NULL divergence (DuckDB ``||`` yields
    NULL; Spark's ``concat_ws`` skips — coalescing both sides
    identically removes the trap).  Pinned by
    ``tests/test_conversations.py::test_turn_digest_null_classes``.
    """
    role = F.coalesce(role_col, F.lit(""))
    content = F.coalesce(content_col, F.lit(""))
    return F.md5(F.concat_ws("\x1f", role, _norm(content)))


def dedup_turns_exact(
    turns: DataFrame,
    id_col: str = "conversation_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
    role: str | None = None,
) -> DataFrame:
    """Exact turn-level dedup: one survivor per distinct (role,
    normalized content), the FIRST occurrence by ``(id, turn_idx)``
    ordering — deterministic whatever the partitioning.

    Returns ``(digest, conversation_id, turn_idx, role, n_dups)``:
    the survivor's coordinates plus how many copies it had (``n_dups``
    ≥ 2 rows are the template/boilerplate report, the thing an SFT
    curator actually reads).  Pass ``role='assistant'`` to dedup only
    that side (the common case — user prompts legitimately repeat).

    Scale: the only shuffle ships ``(digest, id, idx, role)`` — text
    never leaves the map side (the projection-first pattern); the
    survivor pick is a map-side-combinable ``min(struct(id, idx))``,
    no window, no join.
    """
    if role is not None:
        turns = turns.where(F.col(role_col) == role)
    proj = turns.select(
        turn_digest(F.col(role_col), F.col(content_col)).alias("digest"),
        F.col(id_col).alias("conversation_id"),
        F.col(idx_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
    )
    return (
        proj.groupBy("digest")
        .agg(
            F.min(F.struct("conversation_id", "turn_idx")).alias("_s"),
            F.min("role").alias("role"),  # constant within a digest
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(
            "digest",
            F.col("_s.conversation_id").alias("conversation_id"),
            F.col("_s.turn_idx").alias("turn_idx"),
            "role",
            "n_dups",
        )
    )


def conversation_signature(
    turns: DataFrame,
    id_col: str = "conversation_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> DataFrame:
    """One row per conversation with its content signature: the MD5 of
    the '|'-joined per-turn digests IN TURN ORDER — two conversations
    match iff every turn matches (role-scoped, normalized) in the same
    sequence, whatever their ids.  Returns ``(conversation_id,
    n_turns, conv_sig)``.

    Scale: one (id)-keyed aggregation; what shuffles is the per-turn
    32-hex digest, never the text.
    """
    per_turn = turns.select(
        F.col(id_col).alias("conversation_id"),
        F.col(idx_col).alias("turn_idx"),
        turn_digest(F.col(role_col), F.col(content_col)).alias("digest"),
    )
    return per_turn.groupBy("conversation_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "digest"))
                    ),
                    lambda s: s["digest"],
                ),
            )
        ).alias("conv_sig"),
    )


def dedup_conversations_exact(
    turns: DataFrame,
    id_col: str = "conversation_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> DataFrame:
    """Whole-conversation exact dedup over :func:`conversation_signature`:
    one survivor per signature (MIN conversation_id — deterministic),
    with ``n_dups`` counting the merged copies.  Returns
    ``(conv_sig, conversation_id, n_turns, n_dups)``."""
    sig = conversation_signature(
        turns, id_col, idx_col, role_col, content_col
    )
    return (
        sig.groupBy("conv_sig")
        .agg(
            F.min("conversation_id").alias("conversation_id"),
            F.min("n_turns").alias("n_turns"),  # constant within a sig
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("conv_sig", "conversation_id", "n_turns", "n_dups")
    )
