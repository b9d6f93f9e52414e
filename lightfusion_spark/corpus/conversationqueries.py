"""Conversation-corpus queries: chat-JSONL ingest + turn/conversation dedup.

Round-12 addition (verdict item 8): post-training (SFT/eval) corpora
ship as JSONL with an ordered ``messages`` array — the one LLM-pipeline
data shape the repo had no ingest face for.  The ingest face reads the
committed fixture (``tools/gen_conversations_fixture.py`` — byte-
deterministic, like the WARC/JPEG fixtures) and its oracle re-parses
the SAME raw file with DuckDB's ``read_json`` — two independent JSON
parsers must agree on every row.  The dedup faces exercise
:mod:`..operators.conversations` at both granularities; the turn-level
face derives its turns from ``documents`` so it scales with sf.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..fixtures import fixture_path
from ..operators import conversations as conv_ops
from .registry import register
from .util import table

_CONV_FIXTURE = fixture_path("data", "conversations.jsonl")

_READ_JSON = f"""read_json('{_CONV_FIXTURE}',
       format='newline_delimited',
       columns={{'conversation_id': 'VARCHAR', 'source': 'VARCHAR',
                 'messages': 'STRUCT(role VARCHAR, content VARCHAR)[]'}})"""


@register(
    "pipe_ingest_conversations",
    oracle=f"""
SELECT conversation_id, source,
       CAST(len(messages) AS INT) AS n_turns,
       CAST(u.i - 1 AS INT) AS turn_idx,
       messages[u.i].role AS role,
       messages[u.i].content AS content
FROM {_READ_JSON} t,
     UNNEST(range(1, len(messages) + 1)) AS u(i)
""",
    doc="chat-JSONL front door (conversations.read_jsonl_conversations "
    "+ conversation_turns): one conversation per line, messages as an "
    "ordered role/content array -> the TURNS relation.  Spark side is "
    "the JVM line-delimited json reader with an EXPLICIT schema "
    "(splittable, one pass, loud on drift; PERMISSIVE _corrupt column "
    "gated) + a zero-shuffle posexplode.  The oracle re-parses the "
    "SAME raw fixture with DuckDB's read_json — two independent JSON "
    "parsers must produce identical rows.  Fixture committed + "
    "regenerable (tools/gen_conversations_fixture.py); reads it "
    "regardless of sf_dir, like the WARC/codec faces",
)
def pipe_ingest_conversations(spark, sf_dir):
    raw = conv_ops.read_jsonl_conversations(spark, _CONV_FIXTURE)
    return conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))


@register(
    "pipe_dedup_turns",
    oracle="""
WITH segs AS (
  SELECT doc_id AS conversation_id, u.i - 1 AS turn_idx0,
         array_to_string(parts[(u.i - 1) * 3 + 1 : (u.i - 1) * 3 + 3], ' ')
           AS content
  FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents) t,
       UNNEST(range(1, CAST(ceil(len(parts) / 3.0) AS BIGINT) + 1)) AS u(i)
),
turns AS (
  SELECT conversation_id, CAST(turn_idx0 AS INT) AS turn_idx,
         CASE WHEN turn_idx0 % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         content
  FROM segs WHERE trim(content) <> ''
),
proj AS (
  SELECT md5(coalesce(role, '') || chr(31)
             || regexp_replace(trim(lower(coalesce(content, ''))),
                               '\\s+', ' ', 'g'))
           AS digest,
         conversation_id, turn_idx, role
  FROM turns
),
ranked AS (
  SELECT digest, conversation_id, turn_idx, role,
         ROW_NUMBER() OVER (PARTITION BY digest
                            ORDER BY conversation_id, turn_idx) AS rn,
         COUNT(*) OVER (PARTITION BY digest) AS n_dups
  FROM proj
)
SELECT digest, conversation_id, turn_idx, role,
       CAST(n_dups AS BIGINT) AS n_dups
FROM ranked WHERE rn = 1
""",
    doc="turn-level exact dedup (conversations.dedup_turns_exact): one "
    "survivor per distinct (role, normalized content) — the canned-"
    "response/template report of SFT curation.  Turns derive from "
    "documents as 3-token chunks with alternating user/assistant "
    "roles, so the face scales with sf AND has real duplicate mass "
    "(9,216 turns -> 7,460 survivors at sf0.01, heaviest template "
    "x10).  The only shuffle ships (digest, id, idx, role) — text "
    "never leaves the map side; the survivor is a map-side-"
    "combinable min(struct(id, idx)), no window, no join (the oracle "
    "replays it as a window, engine-idiomatic each side).  MD5 "
    "digests reproduce bit-for-bit in DuckDB; normalization is "
    "trim+lower+whitespace-collapse in both",
)
def pipe_dedup_turns(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(3.0)).cast("int")
    chunks = F.when(
        F.size(toks) >= 1,
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i - F.lit(1)) * F.lit(3) + F.lit(1), 3)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    turns = (
        d.select(
            F.col("doc_id").alias("conversation_id"),
            F.posexplode(chunks).alias("turn_idx", "content"),
        )
        .where(F.trim(F.col("content")) != "")
        .select(
            "conversation_id",
            "turn_idx",
            F.when(F.col("turn_idx") % 2 == 0, "user")
            .otherwise("assistant")
            .alias("role"),
            "content",
        )
    )
    return conv_ops.dedup_turns_exact(turns)


@register(
    "pipe_dedup_conversations",
    oracle=f"""
WITH turns AS (
  SELECT conversation_id,
         CAST(u.i - 1 AS INT) AS turn_idx,
         messages[u.i].role AS role,
         messages[u.i].content AS content
  FROM {_READ_JSON} t,
       UNNEST(range(1, len(messages) + 1)) AS u(i)
),
per_turn AS (
  SELECT conversation_id, turn_idx,
         md5(coalesce(role, '') || chr(31)
             || regexp_replace(trim(lower(coalesce(content, ''))),
                               '\\s+', ' ', 'g'))
           AS digest
  FROM turns
),
sig AS (
  SELECT conversation_id,
         CAST(COUNT(*) AS BIGINT) AS n_turns,
         md5(string_agg(digest, '|' ORDER BY turn_idx)) AS conv_sig
  FROM per_turn GROUP BY conversation_id
)
SELECT conv_sig,
       MIN(conversation_id) AS conversation_id,
       MIN(n_turns) AS n_turns,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM sig GROUP BY conv_sig
""",
    doc="whole-conversation exact dedup (conversations."
    "dedup_conversations_exact): the signature is the MD5 of the "
    "'|'-joined per-turn digests IN TURN ORDER, so two transcripts "
    "match iff every turn matches in sequence whatever their ids — "
    "the merged-dataset re-ingest case (the fixture plants 15 "
    "duplicate conversations under fresh ids).  One id-keyed agg over "
    "32-hex digests + one sig-keyed agg; text never shuffles.  The "
    "oracle rebuilds signatures from the raw fixture via string_agg "
    "ORDER BY — an independent parse AND an independent ordered fold",
)
def pipe_dedup_conversations(spark, sf_dir):
    raw = conv_ops.read_jsonl_conversations(spark, _CONV_FIXTURE)
    turns = conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))
    return conv_ops.dedup_conversations_exact(turns)
