"""Subword-tokenization queries: real BPE token counts, token-exact
chunking and token-budget packing (SURVEY §2.4, round-6 item 1).

Oracle strategy: the committed fixture ``fixtures/data/bpe_expected.parquet``
maps ``md5(text)`` → token ids, produced by an INDEPENDENT rank-order
BPE encoder (``tools/gen_bpe_fixture.py``) — so the driver's hash
compare pins the production encoder against a second implementation,
and the downstream windowing/packing math is replayed natively in
DuckDB SQL over the fixture's id lists.  The content-hash join keeps
the oracle valid for any dataset whose texts are covered (sf0.001 +
sf0.01 + sf0.1 committed — the full local corpus); an uncovered text
drops its row and fails the row-count gate loudly instead of silently
passing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..fixtures import fixture_path
from ..operators import curation
from ..operators.tokenize import chunk_token_ids, tokenize_bpe
from .registry import register
from .util import table

_EXPECTED = fixture_path("data", "bpe_expected.parquet")

#: Shared oracle prefix: documents joined to their expected tokenization
#: by content hash (NULL text == the empty document, as in the operator).
_FIXTURE_JOIN = f"""
    f AS (SELECT DISTINCT fp_md5, n_tokens, token_ids_str
          FROM read_parquet('{_EXPECTED}')),
    t AS (SELECT d.doc_id, f.n_tokens, f.token_ids_str
          FROM documents d
          JOIN f ON md5(coalesce(d.text, '')) = f.fp_md5)
"""

_CHUNK, _OVERLAP = 96, 32
_STRIDE = _CHUNK - _OVERLAP
_PACK_CAPACITY = 512  # power of two: FLOOR(x/512.0) is exact in both engines


@register(
    "pipe_tokenize_bpe",
    oracle=f"""
    WITH {_FIXTURE_JOIN}
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
           token_ids_str AS token_ids
    FROM t
    """,
    doc="byte-level BPE tokenization (GPT-2 family) as Arrow-batched "
    "mapInPandas with a per-executor merges cache; oracle is the "
    "committed fixture from the independent rank-order encoder",
)
def pipe_tokenize_bpe(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    t = tokenize_bpe(d, "doc_id", "text")
    return t.select(
        "doc_id", "n_tokens", F.array_join("token_ids", " ").alias("token_ids")
    )


@register(
    "pipe_chunk_bpe",
    oracle=f"""
    WITH {_FIXTURE_JOIN},
    ids AS (
      SELECT doc_id, n_tokens AS n,
             CASE WHEN token_ids_str = '' THEN CAST([] AS INTEGER[])
                  ELSE [CAST(x AS INTEGER) FOR x IN
                        string_split(token_ids_str, ' ')] END AS ids
      FROM t),
    c AS (
      SELECT doc_id, n, ids,
             unnest(range(0, CASE WHEN n <= {_CHUNK} THEN 1
                          ELSE CAST(CEIL((n - {_CHUNK}) / CAST({_STRIDE} AS DOUBLE))
                               AS BIGINT) + 1 END)) AS chunk_id
      FROM ids)
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(GREATEST(0, LEAST({_CHUNK}, n - chunk_id * {_STRIDE})) AS INTEGER)
             AS n_chunk_tokens,
           array_to_string(
             list_slice(ids, chunk_id * {_STRIDE} + 1,
                        LEAST(chunk_id * {_STRIDE} + {_CHUNK}, CAST(n AS BIGINT))),
             ' ') AS chunk_ids
    FROM c
    """,
    doc="token-EXACT chunking: BPE ids -> fixed 96-id windows with 32-id "
    "overlap, pure JVM slice/explode (zero shuffles); oracle replays the "
    "windowing natively over the fixture's id lists",
)
def pipe_chunk_bpe(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    t = tokenize_bpe(d, "doc_id", "text")
    chunks = chunk_token_ids(
        t, "doc_id", "token_ids", chunk_tokens=_CHUNK, overlap=_OVERLAP
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
        F.array_join("chunk_ids", " ").alias("chunk_ids"),
    )


@register(
    "pipe_pack_bpe",
    oracle=f"""
    WITH {_FIXTURE_JOIN},
    b AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT)
               % 8 AS pack_group
      FROM t),
    c AS (
      SELECT *,
             SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS prev
      FROM b)
    SELECT doc_id, n_tokens, pack_group,
           CAST(FLOOR(prev / CAST({_PACK_CAPACITY} AS DOUBLE)) AS BIGINT) AS pack_no
    FROM c
    """,
    doc="token-budget packing over REAL subword counts (the number a "
    "trainer actually streams), parallel fill in 8 hash groups — the "
    "token-exact upgrade of pipe_pack_sequences",
)
def pipe_pack_bpe(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    t = tokenize_bpe(d, "doc_id", "text")
    return curation.pack_sequences(
        t, "doc_id", "n_tokens", capacity=_PACK_CAPACITY, n_groups=8
    )


#: pipe_bpe_train's expected merge tables, one block per covered corpus,
#: keyed by the corpus content signature (tools/gen_bpe_fixture.py:
#: reference_train, an INDEPENDENT trainer implementation).
_TRAIN_EXPECTED = fixture_path("data", "bpe_train_expected.parquet")


@register(
    "pipe_bpe_train",
    # Training is an iterative argmax over a mutating word table — not
    # SQL-expressible as a REPLAY.  But the trainer is DETERMINISTIC, so
    # the oracle can assert the exact expected OUTPUT instead: the merge
    # table precomputed by the independent offline trainer at fixture-
    # build time, selected by the corpus's content signature (sum of
    # per-doc md5 prefixes mod 2^61-1 — count alone is not an identity:
    # two local corpora share n_docs=500).  An uncovered corpus joins to
    # zero rows and fails the row-count gate loudly; the driver then
    # hash-verifies rank order and pair bytes (round-7 verdict item 5).
    oracle=f"""
    WITH sig AS (
      SELECT CAST(SUM(CAST('0x' || substr(md5(coalesce(text, '')), 1, 14)
                           AS BIGINT)) % 2305843009213693951 AS BIGINT) AS s
      FROM documents
    )
    SELECT CAST(rank AS INTEGER) AS rank, "left", "right"
    FROM read_parquet('{_TRAIN_EXPECTED}') f
    JOIN sig ON f.corpus_sig = sig.s
    """,
    doc="distributed BPE TRAINING (the documented round-6 seam, closed): "
    "one Arrow-batched word-count crossing + one map-side-combined "
    "groupBy (the only shuffle carries distinct words, never the "
    "corpus), then the same greedy merge loop as the offline trainer on "
    "the Zipf-bounded driver-side table (min_count=2 prunes hapax "
    "noise).  Oracle: the trainer is deterministic, so the committed "
    "expected-merges fixture from an INDEPENDENT trainer "
    "implementation (tools/gen_bpe_fixture.py:reference_train) is "
    "selected by corpus content signature and hash-compared rank by "
    "rank; tests/test_tokenize.py additionally pins distributed == "
    "local trainer and BPETokenizer round-trip",
)
def pipe_bpe_train(spark, sf_dir):
    from ..operators.tokenize import train_bpe_distributed

    d = table(spark, sf_dir, "documents")
    merges = train_bpe_distributed(d, "text", n_merges=40, min_count=2)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )
