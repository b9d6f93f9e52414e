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
_BPE_EXPECTED = fixture_path("data", "bpe_expected.parquet")

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


@register(
    "pipe_conversation_quality",
    oracle=f"""
WITH conv AS (
  SELECT conversation_id, messages FROM {_READ_JSON}
),
turns AS (
  SELECT conversation_id, CAST(u.i - 1 AS INT) AS turn_idx,
         coalesce(messages[u.i].role, '') AS role,
         regexp_replace(trim(lower(coalesce(messages[u.i].content, ''))),
                        '\\s+', ' ', 'g') AS content_n
  FROM conv, UNNEST(range(1, len(messages) + 1)) AS u(i)
),
lead AS (
  SELECT conversation_id,
         COALESCE(CAST(MIN(turn_idx) FILTER (WHERE role <> 'system')
                       AS INT),
                  CAST(COUNT(*) AS INT)) AS n_lead
  FROM turns GROUP BY conversation_id
),
agg AS (
  SELECT t.conversation_id,
         CAST(COUNT(*) FILTER (WHERE role = 'system') AS INT) AS n_system,
         MAX(l.n_lead) AS n_lead_system,
         CAST(COUNT(*) FILTER (WHERE role = 'system') AS INT)
           = MAX(l.n_lead) AS system_only_leading,
         COALESCE(BOOL_AND(CASE WHEN turn_idx >= l.n_lead
             THEN role = (CASE WHEN (turn_idx - l.n_lead) % 2 = 0
                               THEN 'user' ELSE 'assistant' END)
             END), FALSE) AS alternates_ok,
         CAST(COUNT(*) FILTER (WHERE content_n = '') AS INT)
           AS n_empty_content,
         CAST(COUNT(*) FILTER (WHERE role NOT IN
              ('system', 'user', 'assistant')) AS INT) AS n_unknown_role,
         arg_max(role, turn_idx) = 'assistant' AS ends_with_assistant,
         CAST(MIN(length(content_n)) AS INT) AS min_len,
         CAST(MAX(length(content_n)) AS INT) AS max_len,
         CAST(SUM(length(content_n)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_len
  FROM turns t JOIN lead l USING (conversation_id)
  GROUP BY t.conversation_id
)
SELECT c.conversation_id,
       CAST(len(c.messages) AS INT) AS n_turns,
       COALESCE(a.n_system, 0) AS n_system,
       COALESCE(a.n_lead_system, 0) AS n_lead_system,
       COALESCE(a.system_only_leading, TRUE) AS system_only_leading,
       COALESCE(a.alternates_ok, FALSE) AS alternates_ok,
       COALESCE(a.n_empty_content, 0) AS n_empty_content,
       COALESCE(a.n_unknown_role, 0) AS n_unknown_role,
       COALESCE(a.ends_with_assistant, FALSE) AS ends_with_assistant,
       a.min_len, a.max_len, a.avg_len,
       COALESCE(a.alternates_ok, FALSE)
         AND COALESCE(a.system_only_leading, TRUE)
         AND COALESCE(a.n_empty_content, 0) = 0
         AND COALESCE(a.n_unknown_role, 0) = 0 AS valid
FROM conv c LEFT JOIN agg a USING (conversation_id)
""",
    doc="per-conversation STRUCTURE/QUALITY gate (conversations."
    "conversation_quality) — what a curator runs between ingest and "
    "dedup: role alternation after an optional leading system block, "
    "no mid-stream system turns, no empty/whitespace-only content, no "
    "unknown roles (NULL role/content coalesce to '' — the total "
    "digest convention), plus turn-length stats.  The fixture's "
    "q-block plants one violation per check (assistant-first, double "
    "user, mid-stream system, role 'tool', blank content, MISSING "
    "role/content struct fields — well-formed JSON the _corrupt gate "
    "cannot catch — and a zero-turn conversation).  Spark side is a "
    "PURE PROJECTION: every check is a row-local higher-order array "
    "expression over the un-exploded messages column — zero shuffles, "
    "gate runs at scan speed; the oracle is an independent UNNEST + "
    "aggregate formulation of the same checks",
)
def pipe_conversation_quality(spark, sf_dir):
    raw = conv_ops.read_jsonl_conversations(spark, _CONV_FIXTURE)
    return conv_ops.conversation_quality(
        raw.where(F.col("_corrupt").isNull())
    )


#: the SFT span/packing pipeline as a reusable oracle CTE body — shared
#: between pipe_sft_spans (which SELECTs the spans relation directly)
#: and pipe_train_shards (which composes shard assignment + the
#: manifest aggregation on top).
_SFT_SPANS_ORACLE_BODY = f"""
WITH conv AS (
  SELECT conversation_id, messages FROM {_READ_JSON}
),
segs AS (
  SELECT conversation_id,
         CAST((u.i - 1) * 2 AS INT) AS seg_order,
         FALSE AS is_loss,
         '<|' || coalesce(messages[u.i].role, '') || '|>' || chr(10)
           AS seg_text
  FROM conv, UNNEST(range(1, len(messages) + 1)) AS u(i)
  UNION ALL
  SELECT conversation_id,
         CAST((u.i - 1) * 2 + 1 AS INT) AS seg_order,
         coalesce(messages[u.i].role, '') = 'assistant' AS is_loss,
         coalesce(messages[u.i].content, '') || chr(10) AS seg_text
  FROM conv, UNNEST(range(1, len(messages) + 1)) AS u(i)
),
f AS (SELECT DISTINCT fp_md5, n_tokens
      FROM read_parquet('{_BPE_EXPECTED}')),
tok AS (
  SELECT s.conversation_id, s.seg_order, s.is_loss,
         CAST(f.n_tokens AS BIGINT) AS n_toks
  FROM segs s JOIN f ON md5(s.seg_text) = f.fp_md5
),
off AS (
  SELECT *,
         SUM(n_toks) OVER (PARTITION BY conversation_id ORDER BY seg_order
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks
           AS start
  FROM tok
),
per_conv AS (
  SELECT conversation_id,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_toks)
              FILTER (WHERE is_loss AND n_toks > 0), 0) AS BIGINT)
           AS n_loss_tokens,
         CAST(COUNT(*) FILTER (WHERE is_loss AND n_toks > 0) AS INT)
           AS n_spans,
         COALESCE(string_agg(
             CAST(start AS VARCHAR) || ':'
               || CAST(start + n_toks AS VARCHAR), ' ' ORDER BY seg_order)
           FILTER (WHERE is_loss AND n_toks > 0), '') AS spans
  FROM off GROUP BY conversation_id
),
pk AS (
  SELECT conversation_id, n_tokens,
         CAST('0x' || substr(md5(conversation_id), 1, 14) AS BIGINT) % 8
           AS pack_group
  FROM per_conv
),
pk2 AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY conversation_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS prev
  FROM pk
),
spans AS (
  SELECT p.conversation_id, p.n_tokens, p.n_loss_tokens, p.n_spans, p.spans,
         k.pack_group,
         CAST(FLOOR(k.prev / 512.0) AS BIGINT) AS pack_no
  FROM per_conv p JOIN pk2 k USING (conversation_id)
)
"""


@register(
    "pipe_sft_spans",
    oracle=_SFT_SPANS_ORACLE_BODY
    + """
SELECT conversation_id, n_tokens, n_loss_tokens, n_spans, spans,
       pack_group, pack_no
FROM spans
""",
    doc="chat-template rendering + LOSS-MASK span prep + packing "
    "(conversations.render_chat_segments + sft_loss_spans) — the last "
    "step between dedup'd conversations and training shards: per-turn "
    "header '<|role|>\\n' / body 'content\\n' segments tokenize "
    "INDEPENDENTLY (real byte-level BPE, the committed merges), so "
    "assistant-span token offsets are exact with no sub-token "
    "alignment pass; spans are 'start:end' pairs, then "
    "curation.pack_sequences assigns 512-token packs in 8 hash "
    "groups.  Spark: zero-shuffle render, one Arrow crossing that "
    "ships only (id, seg_order, is_loss, n_toks) — segment text never "
    "shuffles — one id-keyed agg with a row-local span fold.  Oracle: "
    "segments rebuilt by an independent parse, token counts joined by "
    "content hash from the independent-encoder fixture "
    "(bpe_expected.parquet), span arithmetic replayed as a window + "
    "ordered string_agg, packing replayed as the pipe_pack_bpe window",
)
def pipe_sft_spans(spark, sf_dir):
    raw = conv_ops.read_jsonl_conversations(spark, _CONV_FIXTURE)
    turns = conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))
    return conv_ops.sft_loss_spans(turns)


@register(
    "pipe_train_shards",
    oracle=_SFT_SPANS_ORACLE_BODY
    + """
, packu AS (
  SELECT DISTINCT CAST(pack_group AS VARCHAR) || ':'
           || CAST(pack_no AS VARCHAR) AS pack_id
  FROM spans
),
sh AS (
  SELECT pack_id,
         CAST(CAST('0x' || substr(md5('3:' || pack_id), 1, 14) AS BIGINT) % 4
              AS INT) AS shard
  FROM packu
),
rows_ AS (
  SELECT s.*, h.shard,
         CAST(s.pack_group AS VARCHAR) || ':'
           || CAST(s.pack_no AS VARCHAR) AS pack_id
  FROM spans s
  JOIN sh h ON h.pack_id = CAST(s.pack_group AS VARCHAR) || ':'
                 || CAST(s.pack_no AS VARCHAR)
)
SELECT shard,
       CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(COUNT(*) AS BIGINT) AS n_conversations,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_loss_tokens) AS BIGINT) AS n_loss_tokens,
       CAST(SUM(n_spans) AS BIGINT) AS n_spans,
       CAST(MIN(n_tokens) AS BIGINT) AS min_conv_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_conv_tokens
FROM rows_ GROUP BY shard
""",
    doc="trainer-shard export manifest (conversations."
    "training_shard_plan + training_shard_manifest) — the last step "
    "between the SFT pipeline and a trainer, as a replayable query: "
    "sft_loss_spans' pack units (each ~512-token pack is one training "
    "sequence; every conversation of a pack must land in the SAME "
    "shard file) are hash-sharded by PACK ID via curation."
    "shard_assign (seed 3, 4 shards), and the per-shard manifest "
    "(pack/conversation counts, token + loss-token + span totals, "
    "min/max conversation tokens) is exact integer sums only — "
    "additive, partition-order-proof.  The writer "
    "(write_training_shards, pytest round-trip) lays data out "
    "partitionBy(shard) and aggregates THIS SAME manifest from the "
    "written files read back; the oracle replays the whole "
    "composition: spans CTE + md5 shard hash + the manifest agg.  "
    "Scale: the shard exchange keys on pack ids (two integers), one "
    "writer task per shard, text never re-shuffles",
)
def pipe_train_shards(spark, sf_dir):
    raw = conv_ops.read_jsonl_conversations(spark, _CONV_FIXTURE)
    turns = conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))
    plan = conv_ops.training_shard_plan(turns, n_shards=4, seed=3)
    return conv_ops.training_shard_manifest(plan)


def _fuzzy_conversations_oracle() -> str:
    from .pipeline import _minhash_bands_sql, _minhash_mins_sql

    return f"""
WITH turns AS (
  SELECT conversation_id,
         CAST(u.i - 1 AS INT) AS turn_idx,
         messages[u.i].role AS role,
         messages[u.i].content AS content
  FROM {_READ_JSON} t,
       UNNEST(range(1, len(messages) + 1)) AS u(i)
),
flat AS (
  SELECT conversation_id,
         string_agg(coalesce(role, '') || ':' ||
                    regexp_replace(trim(lower(coalesce(content, ''))),
                                   '\\s+', ' ', 'g'),
                    ' ' ORDER BY turn_idx) AS conv_text
  FROM turns GROUP BY conversation_id
),
toks AS (
  SELECT conversation_id AS doc_id,
         string_split_regex(lower(conv_text), '\\s+') AS t
  FROM flat
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 3)
),
base AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h
  FROM sh
),
mh AS (
  SELECT doc_id,
         {_minhash_mins_sql(8)}
  FROM base GROUP BY doc_id
),
sigs AS (
  {_minhash_bands_sql(8, 2)}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM base GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN base ba ON ba.doc_id = c.id_a
  JOIN base bb ON bb.doc_id = c.id_b AND bb.h = ba.h
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT i.id_a, i.id_b,
         CAST(i.n_inter AS DOUBLE)
           / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
  FROM inter i
  JOIN cnt ca ON ca.doc_id = i.id_a
  JOIN cnt cb ON cb.doc_id = i.id_b
  WHERE CAST(i.n_inter AS DOUBLE)
          / (ca.n_sh + cb.n_sh - i.n_inter) >= 0.5
),
touched AS (
  SELECT id_a AS cid, jaccard, FALSE AS has_lower FROM pairs
  UNION ALL
  SELECT id_b AS cid, jaccard, TRUE AS has_lower FROM pairs
),
verdict AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_near_dups,
         MAX(jaccard) AS max_jaccard,
         BOOL_OR(has_lower) AS has_lower
  FROM touched GROUP BY cid
)
SELECT f.conversation_id,
       COALESCE(v.n_near_dups, CAST(0 AS BIGINT)) AS n_near_dups,
       v.max_jaccard,
       NOT COALESCE(v.has_lower, FALSE) AS keep
FROM flat f LEFT JOIN verdict v ON v.cid = f.conversation_id
"""


@register(
    "pipe_dedup_conversations_fuzzy",
    oracle=_fuzzy_conversations_oracle(),
    doc="NEAR-duplicate conversation dedup (conversations."
    "dedup_conversations_fuzzy) — the fuzzy tier the exact signature "
    "misses: the fixture plants 12 paraphrased re-ingests (one "
    "pleasantry appended to a user turn, p-prefixed ids) that all "
    "clear dedup_conversations_exact; banded MinHash over the "
    "flattened role-tagged text catches 10 of them at Jaccard 0.75+ "
    "(the other 2 are the documented 4-band recall miss, pinned in "
    "tests/test_conversations.py).  Composition, not new machinery: "
    "conversation_flat_text (one id-keyed agg, the exact tier's "
    "shuffle) -> dedup.minhash_near_duplicates (shingle -> minhash -> "
    "LSH band equi-join -> exact-Jaccard verify, never all-pairs) -> "
    "one per-conversation verdict agg with the min-id survivor "
    "convention.  The oracle replays the whole pipeline from the raw "
    "fixture: independent JSON parse, independent ordered string_agg "
    "flatten, independent minhash fold",
)
def pipe_dedup_conversations_fuzzy(spark, sf_dir):
    raw = conv_ops.read_jsonl_conversations(spark, _CONV_FIXTURE)
    turns = conv_ops.conversation_turns(raw.where(F.col("_corrupt").isNull()))
    return conv_ops.dedup_conversations_fuzzy(turns)
