"""§2.4 — LLM-training-data pipeline operators as driver-checkable queries.

Each spec wraps an operator from ``lightfusion_spark.operators`` and
pairs it with a DuckDB oracle that reproduces the *same algorithm* in
pure SQL (same MD5-derived hashes, same shingles, same thresholds), so
the distributed implementation is verified value-for-value — including
the MinHash-LSH banding pipeline end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..fixtures import fixture_path
from ..operators import curation, dedup, ingest, multimodal, similarity, text as text_ops
from .registry import register
from .util import table

# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

@register(
    "pipe_dedup_exact",
    oracle="""
    SELECT doc_id, md5(text) AS fp_md5 FROM documents
    QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
    doc="exact dedup: deterministic first-writer-wins by content; the "
    "shuffle key is the 16-byte MD5 digest, not the document text",
)
def pipe_dedup_exact(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(d, ["text"], "doc_id", hash_shuffle_key=True)
    return kept.select("doc_id", F.md5("text").alias("fp_md5"))


@register(
    "pipe_dedup_incremental",
    oracle="""
    WITH new AS (SELECT doc_id, COALESCE(md5(text), '') AS fp_md5 FROM documents
                 WHERE doc_id % 2 = 1),
         corp AS (SELECT DISTINCT COALESCE(md5(text), '') AS fp_md5 FROM documents
                  WHERE doc_id % 2 = 0)
    SELECT doc_id, fp_md5 FROM (
      SELECT n.doc_id, n.fp_md5,
             ROW_NUMBER() OVER (PARTITION BY n.fp_md5 ORDER BY n.doc_id) AS rn
      FROM new n WHERE n.fp_md5 NOT IN (SELECT fp_md5 FROM corp)
    ) WHERE rn = 1
    """,
    doc="continual-ingest dedup: an arriving batch (odd doc ids) checked "
    "against the historical corpus (even ids) by 16-byte digest "
    "anti-join, then deduped within the batch — the fingerprint-store "
    "pattern; nothing wider than a digest ever shuffles",
)
def pipe_dedup_incremental(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 2 == 1)
    corpus = d.where(F.col("doc_id") % 2 == 0)
    return dedup.incremental_dedup(new, corpus, "doc_id", "text")


@register(
    "pipe_dedup_spans",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(COALESCE(text, ''), '\s+') AS tk,
             LEN(string_split_regex(COALESCE(text, ''), '\s+')) AS nt
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(range(0, nt - 4)) AS start,
             unnest([md5(array_to_string(tk[i+1 : i+5], ' '))
                     FOR i IN range(0, nt - 4)]) AS g
      FROM t WHERE nt >= 5
    ),
    dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
    ss AS (
      SELECT doc_id, list_sort(list(start)) AS starts
      FROM grams WHERE g IN (SELECT g FROM dup) GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(array_to_string(
             [tk[j+1] FOR j IN range(0, nt)
              IF LEN(list_filter(COALESCE(ss.starts, []),
                                 s -> s <= j AND j < s + 5)) = 0], ' '), '')
             AS clean_text,
           CAST(nt AS INTEGER) AS n_tokens,
           CAST(nt - LEN([j FOR j IN range(0, nt)
              IF LEN(list_filter(COALESCE(ss.starts, []),
                                 s -> s <= j AND j < s + 5)) = 0]) AS INTEGER)
             AS n_removed
    FROM t LEFT JOIN ss USING (doc_id)
    """,
    doc="span-level exact-substring dedup (Lee et al. 2022): every token "
    "covered by a word 5-gram occurring more than once in the corpus is "
    "removed, the rest of the document kept — duplicated-coverage via "
    "one digest count (nothing wider than 16 bytes shuffles), rebuild "
    "via a JVM-side coverage filter",
)
def pipe_dedup_spans(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return dedup.remove_duplicate_spans(d, "doc_id", "text", ngram=5)


def _minhash_mins_sql(n_hashes: int) -> str:
    from ..operators.dedup import _MINHASH_MOD

    return ",\n         ".join(
        f"MIN((h * {2 * k + 3} + {k * 1000003}) % {_MINHASH_MOD}) AS m{k}"
        for k in range(n_hashes)
    )


def _minhash_bands_sql(n_hashes: int, rows_per_band: int) -> str:
    parts = []
    for b in range(n_hashes // rows_per_band):
        members = " || ',' || ".join(
            f"CAST(m{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        parts.append(f"SELECT doc_id, {b} AS band, {members} AS sig FROM mh")
    return "\n  UNION ALL ".join(parts)


def _minhash_oracle(cand_pred: str) -> str:
    """Full MinHash-LSH replay in SQL; ``cand_pred`` picks the candidate
    pairing — ``a.doc_id < b.doc_id`` for the batch self-join,
    side-splitting predicates for the continual-ingest variant."""
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 3)
),
base AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h FROM sh
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
    ON a.band = b.band AND a.sig = b.sig AND {cand_pred}
),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM base GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN base ba ON ba.doc_id = c.id_a
  JOIN base bb ON bb.doc_id = c.id_b AND bb.h = ba.h
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.id_a
JOIN cnt cb ON cb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.n_inter) >= 0.5
"""


_MINHASH_ORACLE = _minhash_oracle("a.doc_id < b.doc_id")


@register(
    "pipe_dedup_minhash",
    oracle=_MINHASH_ORACLE,
    doc="fuzzy dedup: 3-word shingles -> 8 minhashes -> 4 LSH bands -> "
    "exact-Jaccard verification >= 0.5 (banding avoids the O(n^2) pair scan)",
)
def pipe_dedup_minhash(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(
        d, "doc_id", "text", n_hashes=8, rows_per_band=2, shingle_n=3, threshold=0.5
    )


@register(
    "pipe_dedup_minhash_incr",
    oracle=_minhash_oracle("a.doc_id % 2 = 1 AND b.doc_id % 2 = 0"),
    doc="continual-ingest FUZZY dedup: arriving docs (odd ids) near-dup-"
    "checked against the historical corpus (even ids) — batch-side "
    "banding cross-joined against the corpus band table (a maintained "
    "bucketed store at scale), exact-Jaccard verification on candidates "
    "only; the MinHash face of pipe_dedup_incremental",
)
def pipe_dedup_minhash_incr(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 2 == 1)
    corpus = d.where(F.col("doc_id") % 2 == 0)
    return dedup.minhash_incremental(
        new, corpus, "doc_id", "text",
        n_hashes=8, rows_per_band=2, shingle_n=3, threshold=0.5,
    )


@register(
    "pipe_decontaminate_fuzzy",
    oracle=f"""
    WITH pairs AS (
      SELECT * FROM ({_minhash_oracle("a.doc_id % 10 != 9 AND b.doc_id % 10 = 9")}) t
    ),
    hits AS (
      SELECT id_a, COUNT(*) AS n_bench_matches, MAX(jaccard) AS max_jaccard
      FROM pairs GROUP BY id_a
    )
    SELECT d.doc_id,
           COALESCE(h.n_bench_matches, 0) AS n_bench_matches,
           h.max_jaccard,
           COALESCE(h.n_bench_matches, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 != 9) d
    LEFT JOIN hits h ON d.doc_id = h.id_a
    """,
    doc="FUZZY benchmark decontamination (curation.decontaminate_fuzzy): "
    "corpus docs (doc_id % 10 != 9) MinHash-near-dup-matched against a "
    "held-out eval set (doc_id % 10 = 9), then one per-doc aggregation "
    "turns verified pairs into (n_bench_matches, max_jaccard, "
    "contaminated).  Paraphrased eval leakage clears the exact n-gram "
    "gate (pipe_decontaminate) but sits at high shingle-Jaccard — this "
    "is the gate that catches it; candidate volume stays bounded by "
    "bench-side banding, never a corpus self-join",
)
def pipe_decontaminate_fuzzy(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 10 != 9)
    bench = d.where(F.col("doc_id") % 10 == 9)
    return curation.decontaminate_fuzzy(
        corpus, bench, "doc_id", "text",
        n_hashes=8, rows_per_band=2, shingle_n=3, threshold=0.5,
    )


def _simhash_oracle(bits: int = 16) -> str:
    # Mirrors operators.dedup.simhash: bit j comes from seeded hash j // 48
    # (seed 0 = unseeded md5, seeds k>0 prefix the word with "k:").
    lane = 48
    n_lanes = (bits + lane - 1) // lane
    hashes = ",\n         ".join(
        "CAST('0x' || substr(md5("
        + ("w" if k == 0 else f"'{k}:' || w")
        + f"), 1, 14) AS BIGINT) AS h{k}"
        for k in range(n_lanes)
    )
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h{j // lane} >> {j % lane}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return rf"""
WITH words AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
    FROM documents)
),
hashed AS (
  SELECT doc_id,
         {hashes}
  FROM words
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


@register(
    "pipe_dedup_simhash",
    oracle=_simhash_oracle(),
    doc="16-bit SimHash fingerprint per document (bit-voting over word hashes)",
)
def pipe_dedup_simhash(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return dedup.simhash(d, "doc_id", "text", bits=16)


@register(
    "pipe_simhash_pairs",
    oracle=f"""
    WITH fp AS ({_simhash_oracle()})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup pairs within Hamming distance 3 (at 100 TB: block "
    "on fingerprint chunks — pigeonhole guarantees a shared exact chunk)",
)
def pipe_simhash_pairs(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    fp = dedup.simhash(d, "doc_id", "text", bits=16)
    pairs = dedup.simhash_near_duplicates(fp, "doc_id", max_hamming=3, bits=16)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "pipe_simhash_wide",
    oracle=f"""
    WITH fp AS ({_simhash_oracle(dedup.SIMHASH_BITS)})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
    doc="production-width (60-bit) SimHash near-dup pairs, Hamming <= 6; "
    "pigeonhole blocking on 8-bit-plus chunks — each equi-join key matches "
    "~1/256 of the corpus at radius 6, ~1/32768 at the default radius 3 "
    "(64-bit is unusable cross-engine: DuckDB BIGINT shifts overflow at bit 63)",
)
def pipe_simhash_wide(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    # cache: both chunk sides of the pigeonhole join consume the (narrow:
    # id + int64) fingerprint relation, and the 60 vote-sums that produce
    # it are the expensive part — same pattern as the minhash pipeline;
    # at 100 TB this is a bucketed intermediate table instead.
    fp = dedup.simhash(d, "doc_id", "text").cache()  # operator default: 60-bit
    pairs = dedup.simhash_near_duplicates(fp, "doc_id", max_hamming=6)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


_NGRAM_ORACLE = r"""
WITH docs AS (SELECT doc_id, lang, lower(text) AS lt FROM documents WHERE lang = 'fr'),
grams AS (
  SELECT DISTINCT doc_id, lang, substr(lt, i, 3) AS gram
  FROM (SELECT doc_id, lang, lt, unnest(range(1, length(lt) - 1)) AS i
        FROM docs WHERE length(lt) >= 3)
),
cnt AS (SELECT doc_id, COUNT(*) AS n_g FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b
    ON a.lang = b.lang AND a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       CAST(i.n_inter AS DOUBLE) / (ca.n_g + cb.n_g - i.n_inter) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.id_a
JOIN cnt cb ON cb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (ca.n_g + cb.n_g - i.n_inter) >= 0.62
"""


@register(
    "pipe_dedup_ngram",
    oracle=_NGRAM_ORACLE,
    doc="char-3-gram Jaccard near-dup within a language block (>= 0.62)",
)
def pipe_dedup_ngram(spark, sf_dir):
    d = table(spark, sf_dir, "documents").where(F.col("lang") == "fr")
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", "lang", n=3, threshold=0.62)


@register(
    "pipe_neardup_embedding",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_inner_product(a.v, b.v)
                   / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))),
                   6) AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.35
    """,
    doc="embedding-cosine near-dup pairs, label-blocked (blocking stands in "
    "for LSH buckets at scale)",
)
def pipe_neardup_embedding(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_blocked(
        e, "vec_id", "embedding", "label", threshold=0.35
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@register(
    "pipe_sim_topk",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.v, c.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= 5
    """,
    doc="exact brute-force top-5 cosine neighbors for 20 query vectors "
    "(broadcast queries x corpus scan; per-partition partial top-k)",
)
def pipe_sim_topk(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine(e, q, "vec_id", "embedding", k=5)


def _ann_lsh_oracle(planes) -> str:
    bucket_terms = []
    for p, plane in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in plane)
        bucket_terms.append(
            f"(CASE WHEN list_inner_product(v, [{lits}]) > 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket = " + ".join(bucket_terms)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    q AS (SELECT * FROM b WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.v, c.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= 3
    """


_ANN_PLANES = similarity.random_hyperplanes(n_planes=4, dim=64, seed=7)


@register(
    "pipe_sim_ann_lsh",
    oracle=_ann_lsh_oracle(_ANN_PLANES),
    doc="approximate top-3 neighbors via sign-LSH (4 hyperplanes, 16 buckets): "
    "candidate join on bucket id instead of the full cross product",
)
def pipe_sim_ann_lsh(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_lsh(e, q, _ANN_PLANES, "vec_id", "embedding", k=3)


def _multiprobe_oracle(planes, k: int = 3) -> str:
    """Replay of similarity.topk_cosine_lsh_multiprobe at n_probes=2: the
    second probe flips the query's lowest-|projection| bit (ties -> lowest
    plane index, same as the Spark array_sort(struct(m, p)) ordering)."""
    dp_cols = []
    for p, plane in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in plane)
        dp_cols.append(f"list_inner_product(v, [{lits}]) AS dp{p}")
    n = len(planes)
    bucket = " + ".join(
        f"(CASE WHEN dp{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(n)
    )
    minm = "LEAST(" + ", ".join(f"abs(dp{p})" for p in range(n)) + ")"
    flip = (
        "CASE "
        + " ".join(f"WHEN abs(dp{p}) = minm THEN {1 << p}" for p in range(n - 1))
        + f" ELSE {1 << (n - 1)} END"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    d AS (SELECT vec_id, v, {', '.join(dp_cols)} FROM e),
    b AS (SELECT vec_id, v, {bucket} AS bucket,
                 {', '.join(f'dp{p}' for p in range(n))} FROM d),
    q0 AS (SELECT *, {minm} AS minm FROM b WHERE vec_id < 20),
    qp AS (
      SELECT vec_id, v, bucket AS probe FROM q0
      UNION ALL
      SELECT vec_id, v, xor(bucket, {flip}) AS probe FROM q0
    ),
    scored AS (
      SELECT qp.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(qp.v, c.v)
                   / (sqrt(list_inner_product(qp.v, qp.v))
                      * sqrt(list_inner_product(c.v, c.v))), 6) AS cos_sim
      FROM qp JOIN b c ON qp.probe = c.bucket AND qp.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= {k}
    """


@register(
    "pipe_sim_lsh_multiprobe",
    oracle=_multiprobe_oracle(_ANN_PLANES),
    doc="multi-probe sign-LSH top-3 (4 hyperplanes, n_probes=2): each query "
    "also searches the bucket across its lowest-margin plane — the recall "
    "knob for LSH without any cross product; only the small query side "
    "explodes n_probes ways",
)
def pipe_sim_lsh_multiprobe(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_lsh_multiprobe(
        e, q, _ANN_PLANES, "vec_id", "embedding", k=3, n_probes=2
    )


def _banded_lsh_oracle(planes, n_tables: int, k: int = 3) -> str:
    """Replay of similarity.topk_cosine_lsh_banded: per-table band keys
    (table index folded in as t*2^r + sign bits), candidate pairs as the
    DISTINCT union over tables, scored once each."""
    r = len(planes) // n_tables
    selects = []
    for t in range(n_tables):
        bits = []
        for j in range(r):
            lits = ", ".join(repr(float(x)) for x in planes[t * r + j])
            bits.append(
                f"(CASE WHEN list_inner_product(v, [{lits}]) > 0 THEN {1 << j} ELSE 0 END)"
            )
        selects.append(
            f"SELECT vec_id, {t * (1 << r)} + {' + '.join(bits)} AS key FROM e"
        )
    keys = "\n      UNION ALL\n      ".join(selects)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    keys AS (
      {keys}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM keys q JOIN keys c ON q.key = c.key AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_inner_product(qv.v, cv.v)
                   / (sqrt(list_inner_product(qv.v, qv.v))
                      * sqrt(list_inner_product(cv.v, cv.v))), 6) AS cos_sim
      FROM cand
      JOIN e qv ON qv.vec_id = cand.query_id
      JOIN e cv ON cv.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= {k}
    """


#: 8 tables x 4 planes: measured micro-recall@5 = 0.676 on sf0.01 (vs 0.13
#: for the single-table 4-plane code and 0.03 at 8 planes — the AND-only
#: decay banding exists to fix), at ~40% of the brute-force pair space on
#: RANDOM embeddings (the no-cluster worst case; see docs/SCALE.md).
_BANDED_PLANES = similarity.random_hyperplanes(n_planes=32, dim=64, seed=11)
_BANDED_TABLES = 8


@register(
    "pipe_sim_lsh_banded",
    oracle=_banded_lsh_oracle(_BANDED_PLANES, _BANDED_TABLES),
    doc="multi-table banded sign-LSH top-3 (8 tables x 4 planes, "
    "OR-of-ANDs): each table proposes same-bucket candidates and the "
    "deduplicated union is scored — recall@5 0.676 measured vs 0.13 for "
    "the single-table teaching baseline; candidates stay an equi-join, "
    "vectors join back only for surviving pairs",
)
def pipe_sim_lsh_banded(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_lsh_banded(
        e, q, _BANDED_PLANES, _BANDED_TABLES, "vec_id", "embedding", k=3
    )


# ---------------------------------------------------------------------------
# text -> embedding (hashing-trick TF-IDF) and the composed raw-text ANN
# ---------------------------------------------------------------------------

#: DuckDB replay of text.embed_text_tfidf at dim=64 — the CTE chain ends
#: in ``emb(doc_id, embedding)``.  ``bdims``/``grid`` names avoid the
#: kmeans oracle's ``dims`` CTE when the chains compose.
_EMBED_TFIDF_CTES = """
    toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    model AS (
      SELECT tok,
             CAST('0x' || substr(md5(tok), 1, 14) AS BIGINT) % 64 AS bucket,
             CASE WHEN CAST('0x' || substr(md5(tok), 15, 1) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS sign,
             CAST(ROUND(LN(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1.0, 6)
                  AS DECIMAL(18,6)) AS idf
      FROM dfreq, nd
    ),
    contrib AS (
      SELECT doc_id, bucket, CAST(SUM(sign * tf * idf) AS DOUBLE) AS val
      FROM tf JOIN model USING (tok) GROUP BY doc_id, bucket
    ),
    bdims AS (SELECT unnest(range(0, 64)) AS bucket),
    grid AS (SELECT d.doc_id, b.bucket FROM documents d CROSS JOIN bdims b),
    emb AS (
      SELECT g.doc_id,
             list(COALESCE(c.val, 0.0) ORDER BY g.bucket) AS embedding
      FROM grid g
      LEFT JOIN contrib c ON g.doc_id = c.doc_id AND g.bucket = c.bucket
      GROUP BY g.doc_id
    )
"""


@register(
    "pipe_embed_text",
    # The driver-facing shape is SCALAR columns: its canonicalizer does a
    # pandas sort over every output column and dies on array cells
    # ("unhashable type: numpy.ndarray" — the one red CORRECTNESS_r07 row),
    # so the query face posexplodes the vector to (doc_id, bucket, value)
    # and the oracle emits the grid⋈contrib rows directly instead of
    # re-assembling + unnesting lists.  embed_text_tfidf itself keeps
    # returning array<double> — that is the library API every downstream
    # ANN/semdedup consumer composes with.
    oracle="WITH "
    + _EMBED_TFIDF_CTES
    + """
    SELECT g.doc_id,
           g.bucket AS bucket,
           COALESCE(c.val, 0.0) AS value
    FROM grid g
    LEFT JOIN contrib c ON g.doc_id = c.doc_id AND g.bucket = c.bucket
    """,
    doc="text -> dense vector via signed feature hashing over TF-IDF "
    "(Weinberger et al.): md5 bucket + ±1 sign, idf from one Zipf-"
    "bounded agg over the tf relation, components as exact DECIMAL "
    "sums cast to double — the dependency-free embedding operator that "
    "lets the ANN/semantic-dedup family run from raw text; swap in a "
    "model encoder without touching anything downstream.  Driver face "
    "is the posexploded (doc_id, bucket, value) long form — scalar "
    "columns only (the gate cannot canonicalize array cells).",
)
def pipe_embed_text(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    emb = text_ops.embed_text_tfidf(d, "doc_id", "text", dim=64)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("bucket", "value")
    ).select("doc_id", F.col("bucket").cast("long").alias("bucket"), "value")




# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@register(
    "pipe_text_stats",
    oracle=r"""
    WITH t AS (SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
               FROM documents)
    SELECT doc_id,
           LEN(toks) AS n_words,
           LENGTH(text) AS n_chars_fn,
           CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks) AS avg_word_len,
           CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / LENGTH(text) AS punct_ratio,
           CAST(LEN(list_filter(toks, x -> list_contains(['a','and','is','of','the'], x))) AS DOUBLE) / LEN(toks) AS en_stop_ratio,
           (LEN(toks) >= 10
            AND CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks) BETWEEN 2 AND 12
            AND CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / LENGTH(text) <= 0.2
           ) AS quality_keep
    FROM t
    """,
    doc="per-document quality features (length/word-length/punct/stopword ratios)",
)
def pipe_text_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.text_stats(d, "doc_id", "text")


def _langid_oracle() -> str:
    hits = {
        code: f"LEN(list_filter(toks, x -> list_contains({words!r}, x)))".replace("'", "'")
        for code, words in text_ops.LANG_STOPWORDS.items()
    }
    # repr of a python list of strings is valid DuckDB list syntax
    return rf"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
               FROM documents),
    h AS (SELECT doc_id,
                 {hits['de']} AS hits_de,
                 {hits['en']} AS hits_en,
                 {hits['es']} AS hits_es,
                 {hits['fr']} AS hits_fr
          FROM t)
    SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
           CASE WHEN GREATEST(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
                WHEN hits_de = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
                WHEN hits_en = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
                WHEN hits_es = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM h
    """


@register(
    "pipe_text_langid",
    oracle=_langid_oracle(),
    doc="stopword-voting language heuristic with deterministic tie order",
)
def pipe_text_langid(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.lang_id(d, "doc_id", "text")


@register(
    "pipe_text_tokens",
    oracle=r"""
    SELECT doc_id,
           LEN(string_split_regex(text, '\s+')) AS n_ws_tokens,
           LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
    FROM documents
    """,
    doc="token counting: whitespace + BPE-ish pre-tokenizer regex",
)
def pipe_text_tokens(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.token_counts(d, "doc_id", "text")


@register(
    "pipe_text_fingerprint",
    oracle=r"""
    WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
               FROM documents)
    SELECT doc_id, md5(norm) AS fp_md5,
           CAST('0x' || substr(md5(norm), 1, 14) AS BIGINT) AS fp_bucket
    FROM n
    """,
    doc="normalized-content fingerprint: md5 + 56-bit shuffle bucket",
)
def pipe_text_fingerprint(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.fingerprint(d, "doc_id", "text")


@register(
    "pipe_text_repetition",
    oracle=r"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
               FROM documents),
    g AS (SELECT doc_id, toks, LEN(toks) AS nw,
                 list_transform(range(1, LEN(toks)),
                                i -> toks[i] || ' ' || toks[i+1]) AS g2,
                 list_transform(range(1, LEN(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
          FROM t),
    m AS (SELECT doc_id, nw,
                 CAST(list_max(list_transform(list_distinct(toks),
                      w -> LEN(list_filter(toks, t -> t = w)))) AS DOUBLE) / nw AS top_word_frac,
                 CASE WHEN nw < 2 THEN 0.0
                      ELSE 1.0 - CAST(LEN(list_distinct(g2)) AS DOUBLE) / LEN(g2) END AS dup_2gram_frac,
                 CASE WHEN nw < 3 THEN 0.0
                      ELSE 1.0 - CAST(LEN(list_distinct(g3)) AS DOUBLE) / LEN(g3) END AS dup_3gram_frac
          FROM g)
    SELECT doc_id, nw AS n_words, top_word_frac, dup_2gram_frac, dup_3gram_frac,
           (top_word_frac <= 0.2 AND dup_2gram_frac <= 0.6 AND dup_3gram_frac <= 0.5)
             AS repetition_keep
    FROM m
    """,
    doc="Gopher-style repetition filters: top-word fraction + duplicate "
    "2/3-gram fractions, keep flag at published-ish thresholds; narrow "
    "single-pass HOF projection, zero shuffle",
)
def pipe_text_repetition(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.repetition_stats(d, "doc_id", "text")


def _pii_enriched_sql() -> str:
    """Deterministic PII injection (the corpus text has none): both engines
    derive identical emails/IPs/phones from doc_id, so redaction is
    verified on text where it actually fires."""
    return """
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
             WHEN 1 THEN text || ' node at 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.17 up'
             WHEN 2 THEN text || ' call +4930' || CAST(1000000 + doc_id AS VARCHAR) || ' today'
             ELSE text END AS text2
    FROM documents
    """


def _pii_enriched_df(d):
    m = (F.col("doc_id") % 4).cast("int")
    did = F.col("doc_id").cast("string")
    return d.select(
        "doc_id",
        F.when(m == 0, F.concat("text", F.lit(" contact user"), did, F.lit("@example.com now")))
        .when(m == 1, F.concat("text", F.lit(" node at 10.0."), (F.col("doc_id") % 200).cast("string"), F.lit(".17 up")))
        .when(m == 2, F.concat("text", F.lit(" call +4930"), (F.col("doc_id") + 1000000).cast("string"), F.lit(" today")))
        .otherwise(F.col("text"))
        .alias("text2"),
    )


@register(
    "pipe_text_pii",
    oracle=f"""
    WITH t AS ({_pii_enriched_sql()})
    SELECT doc_id,
           LEN(regexp_extract_all(text2, '{text_ops.EMAIL_RE}')) AS n_emails,
           LEN(regexp_extract_all(text2, '{text_ops.IPV4_RE}')) AS n_ips,
           LEN(regexp_extract_all(text2, '{text_ops.PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text2,
             '{text_ops.EMAIL_RE}', '[EMAIL]', 'g'),
             '{text_ops.IPV4_RE}', '[IP]', 'g'),
             '{text_ops.PHONE_RE}', '[PHONE]', 'g') AS text_clean
    FROM t
    """,
    doc="PII scrub (emails/IPv4/intl phones counted then replaced with "
    "typed placeholders) over deterministically enriched text so the "
    "patterns actually fire; regexes restricted to the Java∩RE2 common "
    "subset",
)
def pipe_text_pii(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.pii_redact(_pii_enriched_df(d), "doc_id", "text2")


def _redact_enriched_sql() -> str:
    """Seven-class PII injection (one class per doc_id % 8 residue; the
    eighth residue rides through untouched) so every link of the full
    redaction chain fires on real rows."""
    return """
    SELECT doc_id,
           CASE CAST(doc_id % 8 AS INT)
             WHEN 0 THEN text || ' mail user' || CAST(doc_id AS VARCHAR) || '@corp.example.org now'
             WHEN 1 THEN text || ' see https://site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com/p?x=1 ok'
             WHEN 2 THEN text || ' host 192.168.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) || ' up'
             WHEN 3 THEN text || ' card 4111 1111 1111 ' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' on file'
             WHEN 4 THEN text || ' ssn 123-45-' || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' here'
             WHEN 5 THEN text || ' iban DE' || CAST(10 + doc_id % 90 AS VARCHAR) || '500105170648489890 set'
             WHEN 6 THEN text || ' call +49151' || CAST(10000 + doc_id % 90000 AS VARCHAR) || ' now'
             ELSE text END AS text2
    FROM documents
    """


def _redact_enriched_df(d):
    m = (F.col("doc_id") % 8).cast("int")
    did = F.col("doc_id").cast("string")

    def s(x):
        return x.cast("string")

    return d.select(
        "doc_id",
        F.when(m == 0, F.concat("text", F.lit(" mail user"), did, F.lit("@corp.example.org now")))
        .when(m == 1, F.concat("text", F.lit(" see https://site"), s(F.col("doc_id") % 50), F.lit(".example.com/p?x=1 ok")))
        .when(m == 2, F.concat("text", F.lit(" host 192.168."), s(F.col("doc_id") % 200), F.lit("."), s(F.col("doc_id") % 250), F.lit(" up")))
        .when(m == 3, F.concat("text", F.lit(" card 4111 1111 1111 "), s(F.col("doc_id") % 9000 + 1000), F.lit(" on file")))
        .when(m == 4, F.concat("text", F.lit(" ssn 123-45-"), s(F.col("doc_id") % 9000 + 1000), F.lit(" here")))
        .when(m == 5, F.concat("text", F.lit(" iban DE"), s(F.col("doc_id") % 90 + 10), F.lit("500105170648489890 set")))
        .when(m == 6, F.concat("text", F.lit(" call +49151"), s(F.col("doc_id") % 90000 + 10000), F.lit(" now")))
        .otherwise(F.col("text"))
        .alias("text2"),
    )


def redaction_oracle_sql(col: str) -> tuple[str, str, str]:
    """DuckDB replay of ``text.redact_pii`` built FROM the operator's own
    ``REDACTION_CHAIN`` (one source of truth, the quality_gate_ctes
    pattern): returns (per-class count select-list, nested replace
    expression, total-count expression)."""
    counts = ",\n           ".join(
        f"LEN(regexp_extract_all({col}, '{rx}')) AS n_{name}"
        for name, rx, _ in text_ops.REDACTION_CHAIN
    )
    clean = col
    for _, rx, tok in text_ops.REDACTION_CHAIN:
        clean = f"regexp_replace({clean}, '{rx}', '{tok}', 'g')"
    total = " + ".join(f"n_{name}" for name, _, _ in text_ops.REDACTION_CHAIN)
    return counts, clean, total


def _text_redact_oracle() -> str:
    counts, clean, total = redaction_oracle_sql("text2")
    return f"""
    WITH t AS ({_redact_enriched_sql()}),
    c AS (
      SELECT doc_id,
           {counts},
           {clean} AS text_redacted
      FROM t
    )
    SELECT *, {total} AS n_redacted FROM c
    """


@register(
    "pipe_text_redact",
    oracle=_text_redact_oracle(),
    doc="full-chain PII redaction (round-9 verdict item 6): emails, "
    "URLs, IPv4, card numbers, SSNs, IBANs and intl phones counted on "
    "the original text then sequentially replaced with typed tokens in "
    "fixed chain order (text.redact_pii / REDACTION_CHAIN — the oracle "
    "SQL is GENERATED from the same chain, so operator and oracle "
    "cannot drift); input deterministically enriched so every class "
    "fires; single-pass JVM regex projection, zero shuffle",
)
def pipe_text_redact(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.redact_pii(_redact_enriched_df(d), "doc_id", "text2")


def _url_enriched_sql() -> str:
    return """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN text || ' see https://site' || CAST(doc_id % 13 AS VARCHAR) || '.example.org/p/' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN text || ' http://a.net/x and http://a.net/y and https://CDN.Example.org/z'
             ELSE text END AS text2
    FROM documents
    """


def _url_enriched_df(d):
    m = (F.col("doc_id") % 3).cast("int")
    return d.select(
        "doc_id",
        F.when(m == 0, F.concat("text", F.lit(" see https://site"), (F.col("doc_id") % 13).cast("string"), F.lit(".example.org/p/"), F.col("doc_id").cast("string")))
        .when(m == 1, F.concat("text", F.lit(" http://a.net/x and http://a.net/y and https://CDN.Example.org/z")))
        .otherwise(F.col("text"))
        .alias("text2"),
    )


@register(
    "pipe_text_urls",
    oracle=f"""
    WITH t AS ({_url_enriched_sql()}),
    d AS (SELECT doc_id,
                 LEN(regexp_extract_all(text2, '{text_ops.URL_RE}')) AS n_urls,
                 list_transform(regexp_extract_all(text2, '{text_ops.URL_DOMAIN_RE}', 1),
                                x -> lower(x)) AS doms
          FROM t)
    SELECT doc_id, n_urls,
           CASE WHEN LEN(doms) > 0 THEN doms[1] END AS first_domain,
           LEN(list_distinct(doms)) AS n_unique_domains
    FROM d
    """,
    doc="URL extraction: count, first domain (lowercased), distinct-domain "
    "count — inputs to domain-blocklist filtering; enriched text as above",
)
def pipe_text_urls(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.url_stats(_url_enriched_df(d), "doc_id", "text2")


#: BM25 demo query: a bag of terms that actually occur in the synthetic
#: corpus vocabulary.
_BM25_TERMS = ["spark", "join", "vector", "data"]


@register(
    "pipe_text_bm25",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
             LEN(string_split_regex(lower(text), '\s+')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM d
    ),
    m AS (
      SELECT doc_id, dl, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM d)
      WHERE tok IN ('spark', 'join', 'vector', 'data')
      GROUP BY doc_id, dl, tok
    ),
    freq AS (SELECT tok, COUNT(*) AS dfreq FROM m GROUP BY tok),
    sc AS (
      SELECT m.doc_id,
             CAST(FLOOR(
               LN((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               * 1000000.0 + 0.5
             ) AS BIGINT) AS s_micro
      FROM m JOIN freq USING (tok), stats
    ),
    agg AS (
      SELECT doc_id, SUM(s_micro) AS b_micro
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id, d.dl AS n_toks,
           CAST(COALESCE(agg.b_micro, 0) AS DOUBLE) / 1000000.0 AS bm25
    FROM d LEFT JOIN agg USING (doc_id)
    """,
    doc="Okapi BM25 relevance of every document to a query-term bag "
    "(targeted corpus selection); constants pre-folded identically in "
    "both engines (k1=1.2, b=0.75 -> tf*2.2, 0.25+0.75*dl/avgdl)",
)
def pipe_text_bm25(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.bm25_scores(d, "doc_id", "text", _BM25_TERMS)


@register(
    "pipe_text_bm25_terms",
    oracle=r"""
    WITH terms AS (
      SELECT * FROM (VALUES ('spark'), ('join'), ('vector'), ('data')) t(tok)
    ),
    d AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
             LEN(string_split_regex(lower(text), '\s+')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM d
    ),
    m AS (
      SELECT doc_id, dl, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM d)
      WHERE tok IN (SELECT tok FROM terms)
      GROUP BY doc_id, dl, tok
    ),
    freq AS (SELECT tok, COUNT(*) AS dfreq FROM m GROUP BY tok),
    sc AS (
      SELECT m.doc_id,
             CAST(FLOOR(
               LN((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               * 1000000.0 + 0.5
             ) AS BIGINT) AS s_micro
      FROM m JOIN freq USING (tok), stats
    ),
    agg AS (
      SELECT doc_id, SUM(s_micro) AS b_micro
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id, d.dl AS n_toks,
           CAST(COALESCE(agg.b_micro, 0) AS DOUBLE) / 1000000.0 AS bm25
    FROM d LEFT JOIN agg USING (doc_id)
    """,
    doc="BM25 with the query terms as a TABLE (broadcast left-semi prune "
    "instead of an isin literal) — the retrieval surface where the term "
    "set comes from another query's output; same math, same output as "
    "pipe_text_bm25",
)
def pipe_text_bm25_terms(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    return text_ops.bm25_scores_terms(d, "doc_id", "text", terms)


#: Deterministic multi-line view of the single-line synthetic documents:
#: a plain-string replace both engines perform byte-identically, planting
#: a crawl-style repeated footer line while splitting the remaining
#: content into lines.  (Real inputs arrive multi-line already; the
#: operator is separator-generic.)
_MULTILINE_SQL = "replace(text, ' the ', concat(chr(10), 'COMMON FOOTER', chr(10)))"
_MULTILINE_DUCK = "replace(text, ' the ', chr(10) || 'COMMON FOOTER' || chr(10))"


@register(
    "pipe_boilerplate_lines",
    oracle=f"""
    WITH docs2 AS (SELECT doc_id, {_MULTILINE_DUCK} AS text FROM documents),
    nz AS (
      SELECT doc_id, unnest(string_split(text, chr(10))) AS line
      FROM docs2
    ),
    freq AS (
      SELECT line, COUNT(DISTINCT doc_id) AS n_docs
      FROM nz WHERE len(line) > 0 GROUP BY line
    ),
    total AS (SELECT COUNT(*) AS n_total FROM docs2)
    SELECT line, n_docs, CAST(n_docs AS DOUBLE) / n_total AS doc_frac
    FROM freq, total
    WHERE CAST(n_docs AS DOUBLE) / n_total >= 0.02
    """,
    doc="CCNet-style boilerplate detection: distinct lines present in "
    ">= 2% of documents (explode -> per-doc distinct -> one count per "
    "distinct line; corpus size rides a broadcast one-row cross join)",
)
def pipe_boilerplate_lines(spark, sf_dir):
    d = table(spark, sf_dir, "documents").withColumn("text", F.expr(_MULTILINE_SQL))
    return text_ops.boilerplate_lines(d, "doc_id", "text", min_doc_frac=0.02)


@register(
    "pipe_strip_boilerplate",
    oracle=f"""
    WITH docs2 AS (SELECT doc_id, {_MULTILINE_DUCK} AS text FROM documents),
    lines AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      FROM docs2
    ),
    nz AS (SELECT * FROM lines WHERE len(line) > 0),
    total AS (SELECT COUNT(*) AS n_total FROM docs2),
    bp AS (
      SELECT line FROM (
        SELECT line, COUNT(DISTINCT doc_id) AS n_docs
        FROM nz GROUP BY line
      ), total
      WHERE CAST(n_docs AS DOUBLE) / n_total >= 0.02
    ),
    kept AS (SELECT * FROM nz WHERE line NOT IN (SELECT line FROM bp)),
    reb AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    orig AS (SELECT doc_id, COUNT(*) AS n_lines FROM nz GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(reb.clean_text, '') AS clean_text,
           COALESCE(orig.n_lines, 0) AS n_lines,
           COALESCE(orig.n_lines, 0) - COALESCE(reb.n_kept, 0) AS n_removed
    FROM docs2 d
    LEFT JOIN orig ON d.doc_id = orig.doc_id
    LEFT JOIN reb ON d.doc_id = reb.doc_id
    """,
    doc="boilerplate REMOVAL: strip the >=2%-frequent lines from every "
    "document and rebuild the text in original line order (broadcast "
    "anti-join against the bounded boilerplate set; per-doc rebuild via "
    "array_sort on unique positions, so output bytes are "
    "partitioning-independent)",
)
def pipe_strip_boilerplate(spark, sf_dir):
    d = table(spark, sf_dir, "documents").withColumn("text", F.expr(_MULTILINE_SQL))
    return text_ops.strip_boilerplate(d, "doc_id", "text", min_doc_frac=0.02)


#: Shared oracle prefix for the two e2e compositions: the multi-line
#: view → boilerplate-strip CTE chain ending in ``stripped`` (doc_id,
#: clean_text, n_lines, n_removed) — ONE copy, so the strip replay
#: cannot drift between `pipe_e2e_curation` and `pipe_e2e_model_curation`.
_STRIP_CTES = f"""
    docs2 AS (SELECT doc_id, {_MULTILINE_DUCK} AS text FROM documents),
    lines AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      FROM docs2
    ),
    nz AS (SELECT * FROM lines WHERE len(line) > 0),
    total AS (SELECT COUNT(*) AS n_total FROM docs2),
    bp AS (
      SELECT line FROM (
        SELECT line, COUNT(DISTINCT doc_id) AS n_docs
        FROM nz GROUP BY line
      ), total
      WHERE CAST(n_docs AS DOUBLE) / n_total >= 0.02
    ),
    kept AS (SELECT * FROM nz WHERE line NOT IN (SELECT line FROM bp)),
    reb AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    orig AS (SELECT doc_id, COUNT(*) AS n_lines FROM nz GROUP BY doc_id),
    stripped AS (
      SELECT d.doc_id,
             COALESCE(reb.clean_text, '') AS clean_text,
             COALESCE(orig.n_lines, 0) AS n_lines,
             COALESCE(orig.n_lines, 0) - COALESCE(reb.n_kept, 0) AS n_removed
      FROM docs2 d
      LEFT JOIN orig ON d.doc_id = orig.doc_id
      LEFT JOIN reb ON d.doc_id = reb.doc_id
    )"""


@register(
    "pipe_e2e_curation",
    oracle=rf"""
    WITH {_STRIP_CTES},
    red AS (
      SELECT doc_id, n_lines, n_removed,
             {redaction_oracle_sql('clean_text')[1]} AS text_redacted,
             {' + '.join(f"LEN(regexp_extract_all(clean_text, '{rx}'))"
                         for _n, rx, _t in text_ops.REDACTION_CHAIN)}
               AS n_redacted
      FROM stripped WHERE len(clean_text) > 0
    ),
    survivors AS (
      SELECT * FROM (
        SELECT r.*, ROW_NUMBER() OVER (PARTITION BY text_redacted
                                       ORDER BY doc_id) AS rn
        FROM red r
      ) WHERE rn = 1
    ),
    toks AS (
      SELECT doc_id, n_lines, n_removed, n_redacted,
             string_split_regex(text_redacted, '\s+') AS tk,
             LEN(string_split_regex(text_redacted, '\s+')) AS n
      FROM survivors
    ),
    chunks AS (
      SELECT doc_id, n_lines, n_removed, n_redacted, n,
             unnest(range(0, CASE WHEN n <= 16 THEN 1
                  ELSE CAST(CEIL((n - 16) / 12.0) AS BIGINT) + 1 END)) AS cid
      FROM toks
    )
    SELECT doc_id, n_lines, n_removed, n_redacted,
           CAST(COUNT(*) AS INTEGER) AS n_chunks,
           CAST(SUM(LEAST(16, n - cid * 12)) AS BIGINT) AS n_chunk_tokens
    FROM chunks GROUP BY doc_id, n_lines, n_removed, n_redacted
    """,
    doc="END-TO-END curation composition: multi-line view -> boilerplate "
    "strip -> drop emptied docs -> full-chain PII redaction "
    "(text.redact_pii, round-9 verdict item 6 — redact BEFORE dedup so "
    "near-identical docs differing only in their PII collapse) -> exact "
    "dedup on redacted text (deterministic min-id survivor) -> 16/4 "
    "token chunking -> per-doc chunk summary carrying n_redacted.  "
    "Verifies the operators COMPOSE (the per-stage queries verify them "
    "in isolation); every stage is the same library call the standalone "
    "query uses",
)
def pipe_e2e_curation(spark, sf_dir):
    d = table(spark, sf_dir, "documents").withColumn("text", F.expr(_MULTILINE_SQL))
    stripped = text_ops.strip_boilerplate(d, "doc_id", "text", min_doc_frac=0.02)
    nonempty = stripped.where(F.length("clean_text") > 0)
    red = text_ops.redact_pii(
        nonempty, "doc_id", "clean_text", passthrough_cols=["n_lines", "n_removed"]
    ).select("doc_id", "n_lines", "n_removed", "n_redacted", "text_redacted")
    survivors = dedup.exact_dedup(
        red, ["text_redacted"], "doc_id", hash_shuffle_key=True
    )
    # n_lines/n_removed/n_redacted ride the chunk rows (passthrough) so
    # the final aggregate needs no join back to survivors — a self-join
    # would make Catalyst execute the whole strip->dedup subtree twice.
    chunks = text_ops.chunk_documents(
        survivors,
        "doc_id",
        "text_redacted",
        chunk_tokens=16,
        overlap=4,
        passthrough_cols=["n_lines", "n_removed", "n_redacted"],
    )
    return chunks.groupBy("doc_id", "n_lines", "n_removed", "n_redacted").agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("n_chunk_tokens"),
    )


def _e2e_model_oracle() -> str:
    from .mlqueries import quality_gate_ctes

    gate = quality_gate_ctes(
        "nonempty", "clean_text", ["doc_id", "clean_text", "n_lines", "n_removed"]
    )
    return rf"""
    WITH {_STRIP_CTES},
    nonempty AS (SELECT * FROM stripped WHERE len(clean_text) > 0),
    {gate},
    keptg AS (SELECT doc_id, clean_text, n_lines, n_removed, p_keep
              FROM gated WHERE p_keep >= 0.5),
    survivors AS (
      SELECT * FROM (
        SELECT k.*, ROW_NUMBER() OVER (PARTITION BY clean_text
                                       ORDER BY doc_id) AS rn
        FROM keptg k
      ) WHERE rn = 1
    ),
    toks2 AS (
      SELECT doc_id, n_lines, n_removed, p_keep,
             LEN(string_split_regex(clean_text, '\s+')) AS n
      FROM survivors
    ),
    chunks AS (
      SELECT doc_id, n_lines, n_removed, p_keep, n,
             unnest(range(0, CASE WHEN n <= 16 THEN 1
                  ELSE CAST(CEIL((n - 16) / 12.0) AS BIGINT) + 1 END)) AS cid
      FROM toks2
    )
    SELECT doc_id, n_lines, n_removed, p_keep,
           CAST(COUNT(*) AS INTEGER) AS n_chunks,
           CAST(SUM(LEAST(16, n - cid * 12)) AS BIGINT) AS n_chunk_tokens
    FROM chunks GROUP BY doc_id, n_lines, n_removed, p_keep
    """


@register(
    "pipe_e2e_model_curation",
    oracle=_e2e_model_oracle(),
    doc="END-TO-END curation with the MODEL gate in the loop: boilerplate "
    "strip -> drop emptied docs -> LightGBM quality gate (Layer A's "
    "batched inference composed mid-pipeline, features on the STRIPPED "
    "text) -> exact dedup on cleaned text -> 16/4 chunking -> per-doc "
    "summary carrying p_keep.  The oracle replays every stage natively "
    "in SQL including the compiled model — a full value-hash check of "
    "the composition",
)
def pipe_e2e_model_curation(spark, sf_dir):
    from ..operators.curation import quality_model_filter
    from .mlqueries import QUALITY_MODEL

    d = table(spark, sf_dir, "documents").withColumn("text", F.expr(_MULTILINE_SQL))
    stripped = text_ops.strip_boilerplate(d, "doc_id", "text", min_doc_frac=0.02)
    nonempty = stripped.where(F.length("clean_text") > 0)
    gated = quality_model_filter(
        spark, nonempty, "doc_id", "clean_text", QUALITY_MODEL,
        passthrough_cols=["clean_text", "n_lines", "n_removed"],
    )
    survivors = dedup.exact_dedup(
        gated.where(F.col("keep")), ["clean_text"], "doc_id", hash_shuffle_key=True
    )
    chunks = text_ops.chunk_documents(
        survivors, "doc_id", "clean_text", chunk_tokens=16, overlap=4,
        passthrough_cols=["n_lines", "n_removed", "p_keep"],
    )
    return chunks.groupBy("doc_id", "n_lines", "n_removed", "p_keep").agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("n_chunk_tokens"),
    )


@register(
    "pipe_chunk_documents",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS toks,
             LEN(string_split_regex(text, '\s+')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks, n,
             unnest(range(0, CASE WHEN n <= 16 THEN 1
                  ELSE CAST(CEIL((n - 16) / 12.0) AS BIGINT) + 1 END)) AS chunk_id
      FROM t
    )
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(LEAST(16, n - chunk_id * 12) AS INTEGER) AS n_chunk_tokens,
           array_to_string(list_slice(toks, chunk_id * 12 + 1, chunk_id * 12 + 16), ' ')
             AS chunk_text
    FROM c
    """,
    doc="pretraining/RAG chunking: every document split into 16-token "
    "windows with 4-token overlap (stride 12) — pure projection + "
    "explode, zero shuffles, token slicing inside whole-stage codegen",
)
def pipe_chunk_documents(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.chunk_documents(d, "doc_id", "text", chunk_tokens=16, overlap=4)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

@register(
    "pipe_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(16 + octet_length(encode(text)) % 32 AS INTEGER) AS fake_width,
           CAST(16 + octet_length(encode(text)) % 24 AS INTEGER) AS fake_height,
           CAST(1 + octet_length(encode(text)) % 7 AS INTEGER) AS fake_frames
    FROM documents
    """,
    doc="binary payload column -> Arrow-batched mapInPandas 'decode' (codec "
    "stubbed deterministically; schema/batching/partitioning are real)",
)
def pipe_multimodal_decode(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    payload = multimodal.attach_binary_payload(d, "doc_id", "text")
    return multimodal.decode_media(payload)


@register(
    "pipe_multimodal_codec",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
           CAST(4 + doc_id % 13 AS INTEGER) AS width,
           CAST(3 + doc_id % 7 AS INTEGER) AS height,
           CAST(list_sum([ (doc_id*31 + 3*i) % 256
                           FOR i IN range((4+doc_id%13)*(3+doc_id%7)) ]) AS DOUBLE)
             / ((4+doc_id%13)*(3+doc_id%7)) AS mean_r,
           CAST(list_sum([ (doc_id*31 + 3*i + 1) % 256
                           FOR i IN range((4+doc_id%13)*(3+doc_id%7)) ]) AS DOUBLE)
             / ((4+doc_id%13)*(3+doc_id%7)) AS mean_g,
           CAST(list_sum([ (doc_id*31 + 3*i + 2) % 256
                           FOR i IN range((4+doc_id%13)*(3+doc_id%7)) ]) AS DOUBLE)
             / ((4+doc_id%13)*(3+doc_id%7)) AS mean_b
    FROM documents
    """,
    doc="REAL image codec round trip: deterministic synthetic PPM(P6) "
    "payloads for even doc ids, 24-bit BMP (padded, bottom-up, BGR) for "
    "odd, decoded by the pure-Python parsers in operators/multimodal.py; "
    "the oracle replays the pixel formula analytically, so a single "
    "header-parse or row-layout bug breaks the hash",
)
def pipe_multimodal_codec(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id")
    payload = multimodal.synthesize_media(d, "doc_id")
    return multimodal.decode_media(payload, real=True)


@register(
    "pipe_multimodal_png",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           CAST(4 + doc_id % 13 AS INTEGER) AS width,
           CAST(3 + doc_id % 7 AS INTEGER) AS height,
           CAST(list_sum([ (doc_id*31 + 3*i) % 256
                           FOR i IN range((4+doc_id%13)*(3+doc_id%7)) ]) AS DOUBLE)
             / ((4+doc_id%13)*(3+doc_id%7)) AS mean_r,
           CAST(list_sum([ (doc_id*31 + 3*i + 1) % 256
                           FOR i IN range((4+doc_id%13)*(3+doc_id%7)) ]) AS DOUBLE)
             / ((4+doc_id%13)*(3+doc_id%7)) AS mean_g,
           CAST(list_sum([ (doc_id*31 + 3*i + 2) % 256
                           FOR i IN range((4+doc_id%13)*(3+doc_id%7)) ]) AS DOUBLE)
             / ((4+doc_id%13)*(3+doc_id%7)) AS mean_b
    FROM documents
    """,
    doc="REAL PNG codec round trip (round-6 item 2): 8-bit RGB "
    "non-interlaced PNGs whose scanline filters cycle through all five "
    "types (None/Sub/Up/Average/Paeth), decoded by the stdlib-zlib parser "
    "in operators/multimodal.py; the oracle replays the pixel formula "
    "analytically, so a defilter or chunk-walk bug breaks the hash",
)
def pipe_multimodal_png(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id")
    payload = multimodal.synthesize_media(d, "doc_id", formats=("png",))
    return multimodal.decode_media(payload, real=True)


_JPEG_EXPECTED = fixture_path("data", "jpeg_expected.parquet")
#: The committed JPEG/video fixtures cover doc_id < 5000 (the full local
#: corpus range, tools/gen_jpeg_fixture.py).  Both query sides bound to
#: that range explicitly so a larger future corpus narrows the checked
#: subset instead of silently hash-mismatching on uncovered ids.
_FIXTURE_DOC_LIMIT = 5000


@register(
    "pipe_multimodal_jpeg",
    oracle=f"""
    SELECT d.doc_id, f.fmt, f.width, f.height, f.mean_r, f.mean_g, f.mean_b
    FROM documents d
    JOIN read_parquet('{_JPEG_EXPECTED}') f ON d.doc_id = f.doc_id
    WHERE d.doc_id < {_FIXTURE_DOC_LIMIT}
    """,
    doc="REAL baseline JPEG round trip: 4:4:4 JFIF payloads (DCT + "
    "standard Huffman tables + bit stuffing, operators/jpegcodec.py) "
    "decoded by a parser that reads DQT/DHT back out of the FILE; the "
    "oracle is the committed encoder-side reconstruction fixture "
    "(quantize->dequantize->IDCT, no entropy coding), so a Huffman/"
    "stuffing/marker bug breaks the hash.  JPEG is lossy: 'correct' = "
    "byte-equal to the reconstruction, not to the source pixels",
)
def pipe_multimodal_jpeg(spark, sf_dir):
    # the id list is tiny but the per-row codec work is Python-heavy; a
    # local corpus arrives as 1-2 input splits, so spread the synth+decode
    # across the executor cores (at 100 TB real payload splits do this)
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _FIXTURE_DOC_LIMIT)
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    payload = multimodal.synthesize_media(d, "doc_id", formats=("jpeg",))
    return multimodal.decode_media(payload, real=True)


@register(
    "pipe_multimodal_wav",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             1 + doc_id % 2 AS ch,
             256 + (doc_id % 7) * 64 AS n
      FROM documents),
    v AS (SELECT doc_id, ch, n,
                 [ ((doc_id*37 + 5*j) % 4096 - 2048) FOR j IN range(n*ch) ] AS s
          FROM p)
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(ch AS INTEGER) AS n_channels,
           CAST(n AS INTEGER) AS n_frames,
           sqrt(CAST(list_sum([ x*x FOR x IN s ]) AS DOUBLE) / (n*ch)) AS rms
    FROM v
    """,
    doc="REAL audio codec round trip: deterministic 16-bit PCM WAV "
    "payloads (RIFF chunk walk, fmt validation, interleaved-channel "
    "layout) decoded by the pure-Python parser; the oracle replays the "
    "sample formula analytically, so a header/layout bug breaks the "
    "hash.  RMS is an exact int64 sum of squares with one float64 "
    "division + sqrt (bit-reproducible across engines)",
)
def pipe_multimodal_wav(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id")
    payload = multimodal.synthesize_audio(d, "doc_id")
    return multimodal.decode_audio(payload)


@register(
    "pipe_multimodal_mp4",
    oracle="""
    WITH p AS (SELECT doc_id FROM documents),
    video AS (
      SELECT doc_id, 0 AS track_idx, 'vide' AS handler, 'avc1' AS codec,
             30000 AS timescale,
             (2 + doc_id % 11) * 15000 AS track_duration,
             30 + doc_id % 7 AS n_samples,
             (30 + doc_id % 7) * (1000 + doc_id % 50) AS sample_bytes
      FROM p),
    audio AS (
      SELECT doc_id, 1 AS track_idx, 'soun' AS handler, 'mp4a' AS codec,
             8000 AS timescale,
             (1 + doc_id % 5) * 8000 AS track_duration,
             50 + doc_id % 13 AS n_samples,
             (50 + doc_id % 13) * 100
               + ((50 + doc_id % 13) * (50 + doc_id % 13 - 1)) // 2
               AS sample_bytes
      FROM p WHERE doc_id % 2 = 1),
    tracks AS (SELECT * FROM video UNION ALL SELECT * FROM audio)
    SELECT t.doc_id,
           'isom' AS major_brand,
           CAST(1000 AS INT) AS movie_timescale,
           CAST(1000 + (t.doc_id % 11) * 500 AS INT) AS movie_duration,
           CAST(CASE WHEN t.doc_id % 2 = 1 THEN 2 ELSE 1 END AS INT)
             AS n_tracks,
           CAST(8 + t.doc_id % 9 AS INT) AS mdat_bytes,
           CAST(t.track_idx AS INT) AS track_idx,
           t.handler, t.codec,
           CAST(t.timescale AS INT) AS timescale,
           CAST(t.track_duration AS INT) AS track_duration,
           CAST(t.n_samples AS INT) AS n_samples,
           CAST(t.sample_bytes AS INT) AS sample_bytes
    FROM tracks t
    """,
    doc="REAL ISO-BMFF container walk (operators/mp4box.py, r12): box "
    "tree parse — 32/64-bit sizes, container recursion, unknown boxes "
    "skipped, v0/v1 full boxes — extracting movie + per-track metadata "
    "(handler, codec fourcc, timescale, duration, stts sample counts, "
    "stsz byte totals in BOTH uniform and per-sample forms) while "
    "touching ZERO coded bytes: the asset-inventory pass a curation "
    "pipeline runs before deciding what reaches the (ffmpeg-seam) "
    "decoder.  Payloads are deterministic build_mp4 structures, so "
    "every parsed field has a closed form the oracle replays — a box-"
    "walk bug breaks the hash.  Codec decode stays the documented seam",
)
def pipe_multimodal_mp4(spark, sf_dir):
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    payload = multimodal.synthesize_mp4(d, "doc_id")
    return multimodal.probe_mp4(payload)


@register(
    "pipe_multimodal_flac",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             1 + doc_id % 2 AS ch,
             256 + (doc_id % 7) * 64 AS n
      FROM documents),
    v AS (SELECT doc_id, ch, n,
                 [ ((doc_id*37 + 5*j) % 4096 - 2048) FOR j IN range(n*ch) ] AS s
          FROM p)
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(ch AS INTEGER) AS n_channels,
           CAST(n AS INTEGER) AS n_frames,
           sqrt(CAST(list_sum([ x*x FOR x IN s ]) AS DOUBLE) / (n*ch)) AS rms
    FROM v
    """,
    doc="REAL compressed-audio round trip (r12, closing the verdict-"
    "named FLAC seam): the WAV face's deterministic PCM encoded as "
    "real FLAC streams — fixed-predictor rice-coded frames, UTF-8 "
    "frame numbers, CRC-8 headers + CRC-16 frames, STREAMINFO MD5 "
    "(operators/flaccodec.py) — then decoded by the full-spec subframe "
    "parser (CONSTANT/VERBATIM/FIXED/LPC, partitioned rice + escapes, "
    "wasted bits, all four channel assignments, CRCs and output-MD5 "
    "verified).  The oracle is the SAME analytic sample formula as "
    "pipe_multimodal_wav, so any bit-level bug in the lossless codec "
    "breaks the hash.  Payload bytes never shuffle; features out only",
)
def pipe_multimodal_flac(spark, sf_dir):
    # codec work is Python-heavy per row; spread the synth+decode across
    # executor cores (the pipe_multimodal_jpeg precedent)
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    payload = multimodal.synthesize_flac(d, "doc_id")
    return multimodal.decode_flac_audio(payload)


_VIDEO_EXPECTED = fixture_path("data", "video_expected.parquet")


@register(
    "pipe_multimodal_video",
    oracle=f"""
    SELECT d.doc_id, f.frame_id, f.n_frames, f.width, f.height,
           f.mean_r, f.mean_g, f.mean_b
    FROM documents d
    JOIN read_parquet('{_VIDEO_EXPECTED}') f ON d.doc_id = f.doc_id
    WHERE d.doc_id < {_FIXTURE_DOC_LIMIT}
    """,
    doc="video frame sampling: LFV1 motion-JPEG clips (2-5 REAL baseline "
    "JPEG frames each) -> decode every 2nd frame only, per-frame channel "
    "means out; the oracle is the committed encoder-reconstruction "
    "fixture per sampled frame, so the container walk AND each frame's "
    "Huffman/marker parsing are hash-verified.  MP4/WebM stay the "
    "ffmpeg seam",
)
def pipe_multimodal_video(spark, sf_dir):
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _FIXTURE_DOC_LIMIT)
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)  # see pipe_multimodal_jpeg
    )
    payload = multimodal.synthesize_video(d, "doc_id")
    return multimodal.sample_video_frames(payload, every_k=2)


# ---------------------------------------------------------------------------
# raw-corpus ingestion (WARC -> HTML -> text)
# ---------------------------------------------------------------------------

_WARC_FIXTURE = fixture_path("data", "sample.warc.gz")
_WARC_EXPECTED = fixture_path("data", "warc_expected.parquet")


@register(
    "pipe_ingest_warc",
    oracle=f"""
    SELECT record_idx, target_uri, http_status, title, text
    FROM read_parquet('{_WARC_EXPECTED}')
    """,
    doc="raw-corpus front door: Common-Crawl-convention WARC archive "
    "(one gzip member per record) -> member-at-a-time record parse -> "
    "HTTP envelope split -> stdlib-HTMLParser text extraction (script/"
    "style dropped, entities decoded, block-level tags split lines); "
    "the oracle is the committed fixture expectation computed "
    "ANALYTICALLY from the page template, never by the extractor "
    "(tools/gen_warc_fixture.py), so a parsing bug breaks the hash. "
    "Reads the committed fixture archive regardless of sf_dir, like the "
    "jpeg/video codec queries",
)
def pipe_ingest_warc(spark, sf_dir):
    recs = ingest.read_warc(spark, _WARC_FIXTURE)
    return ingest.extract_html_text(recs, "payload").select(
        "record_idx", "target_uri", "http_status", "title", "text"
    )


@register(
    "pipe_ingest_warc_clean",
    oracle=f"""
    WITH docs AS (
      SELECT record_idx, text FROM read_parquet('{_WARC_EXPECTED}')
    ),
    lines AS (
      SELECT record_idx,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      FROM docs
    ),
    nz AS (SELECT * FROM lines WHERE len(line) > 0),
    total AS (SELECT COUNT(*) AS n_total FROM docs),
    bp AS (
      SELECT line FROM (
        SELECT line, COUNT(DISTINCT record_idx) AS n_docs
        FROM nz GROUP BY line
      ), total
      WHERE CAST(n_docs AS DOUBLE) / n_total >= 0.5
    ),
    kept AS (SELECT * FROM nz WHERE line NOT IN (SELECT line FROM bp)),
    reb AS (
      SELECT record_idx, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY record_idx
    ),
    orig AS (SELECT record_idx, COUNT(*) AS n_lines FROM nz GROUP BY record_idx)
    SELECT d.record_idx,
           COALESCE(reb.clean_text, '') AS clean_text,
           COALESCE(orig.n_lines, 0) AS n_lines,
           COALESCE(orig.n_lines, 0) - COALESCE(reb.n_kept, 0) AS n_removed
    FROM docs d
    LEFT JOIN orig ON d.record_idx = orig.record_idx
    LEFT JOIN reb ON d.record_idx = reb.record_idx
    """,
    doc="the full raw-corpus ingestion chain: WARC records -> HTML text "
    "extraction -> strip_boilerplate (nav/footer chrome present on "
    ">=50% of pages removed, original line order preserved) — the "
    "crawl-to-clean-text composition every pretraining pipeline runs "
    "first; oracle replays the strip over the analytic fixture "
    "expectation.  NOTE: strip_boilerplate scans its input twice and "
    "each scan re-runs the WARC+HTML extraction here — at real scale, "
    "land the extracted text to parquet once and strip from there "
    "(docs/SCALE.md ingestion section)",
)
def pipe_ingest_warc_clean(spark, sf_dir):
    recs = ingest.read_warc(spark, _WARC_FIXTURE)
    # strip_boilerplate's detection + rebuild branches each re-scan their
    # input; without this pin the WHOLE ingest (WARC record walk + HTML
    # extraction, two Arrow crossings) re-ran per branch — MapInPandas x8
    # in the round-7 plan audit.  One localCheckpoint lands the extracted
    # text once (x2 after), the same fix the embed-IVF path got; at 100 TB
    # this is "land extracted text to parquet before cleaning", executable.
    extracted = (
        ingest.extract_html_text(recs, "payload")
        .select("record_idx", "text")
        .localCheckpoint(eager=False)
    )
    return text_ops.strip_boilerplate(
        extracted, "record_idx", "text", min_doc_frac=0.5
    )


@register(
    "pipe_sim_ivf",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cent FROM e ORDER BY vec_id LIMIT 16),
    assign AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.v, cents.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND(list_inner_product(e.v, cents.cent)
                          / (sqrt(list_inner_product(e.v, e.v))
                             * sqrt(list_inner_product(cents.cent, cents.cent))), 6) DESC,
                          cents.centroid_id) AS rn
        FROM e CROSS JOIN cents) t
      WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, centroid_id FROM assign WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.qv, c.v)
                   / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM q JOIN assign c ON q.centroid_id = c.centroid_id AND q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= 3
    """,
    doc="IVF-style ANN: deterministic coarse quantizer -> cell assignment "
    "(broadcast) -> candidate equi-join on centroid_id -> local top-3",
)
def pipe_sim_ivf(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_ivf(e, q, "vec_id", "embedding", n_centroids=16, k=3)


@register(
    "pipe_diversity_sample",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cent FROM e ORDER BY vec_id LIMIT 16),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, cents.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND(list_inner_product(e.v, cents.cent)
                          / (sqrt(list_inner_product(e.v, e.v))
                             * sqrt(list_inner_product(cents.cent, cents.cent))), 6) DESC,
                          cents.centroid_id) AS rn
        FROM e CROSS JOIN cents) t
      WHERE rn = 1
    ),
    pri AS (
      SELECT vec_id, centroid_id,
             CAST('0x' || substr(md5('3:' || CAST(vec_id AS VARCHAR)), 1, 14)
                  AS BIGINT) AS p
      FROM assign
    )
    SELECT vec_id, centroid_id, CAST(rn AS INTEGER) AS sample_rank FROM (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY centroid_id
                                ORDER BY p, vec_id) AS rn
      FROM pri) t
    WHERE rn <= 5
    """,
    doc="cluster-stratified diversity sampling (curation.diversity_sample): "
    "assign every vector to its coarse IVF cell, keep the top 5 per cell "
    "by deterministic md5 priority — the eval-set/annotation-batch "
    "constructor a uniform sample gets wrong (uniform reproduces cluster "
    "skew; capping per cell makes every occupied region of embedding "
    "space contribute).  Broadcast centroids, one Arrow GEMM assignment "
    "pass, WindowGroupLimit-pruned per-cell top-k",
)
def pipe_diversity_sample(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return curation.diversity_sample(
        e, "vec_id", "embedding", quota_per_cluster=5, n_centroids=16, seed=3
    )


@register(
    "pipe_sim_ivf_probe2",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cent FROM e ORDER BY vec_id LIMIT 16),
    ranked AS (
      SELECT e.vec_id, e.v, cents.centroid_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND(list_inner_product(e.v, cents.cent)
                        / (sqrt(list_inner_product(e.v, e.v))
                           * sqrt(list_inner_product(cents.cent, cents.cent))), 6) DESC,
                        cents.centroid_id) AS rn
      FROM e CROSS JOIN cents
    ),
    assign AS (SELECT vec_id, v, centroid_id FROM ranked WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv, centroid_id
          FROM ranked WHERE vec_id < 20 AND rn <= 2),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.qv, c.v)
                   / (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM q JOIN assign c ON q.centroid_id = c.centroid_id AND q.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= 3
    """,
    doc="IVF ANN with nprobe=2 (the recall knob): each query searches its "
    "two nearest cells; candidates stay a hash equi-join on centroid_id "
    "(a neighbor lives in exactly one cell, so no dedup pass)",
)
def pipe_sim_ivf_probe2(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_ivf_probe(
        e, q, "vec_id", "embedding", n_centroids=16, nprobe=2, k=3
    )


@register(
    "pipe_sim_recall_ivf",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    -- exact top-3 (the ground truth)
    q0 AS (SELECT * FROM e WHERE vec_id < 20),
    xscored AS (
      SELECT q0.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q0.v, c.v)
                   / (sqrt(list_inner_product(q0.v, q0.v)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM q0 JOIN e c ON q0.vec_id <> c.vec_id),
    exact AS (SELECT query_id, neighbor_id FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM xscored) t WHERE rn <= 3),
    -- IVF nprobe=1 approximate top-3 (the pipe_sim_ivf plan)
    cents AS (SELECT vec_id AS centroid_id, v AS cent FROM e ORDER BY vec_id LIMIT 16),
    assign AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.v, cents.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND(list_inner_product(e.v, cents.cent)
                          / (sqrt(list_inner_product(e.v, e.v))
                             * sqrt(list_inner_product(cents.cent, cents.cent))), 6) DESC,
                          cents.centroid_id) AS rn
        FROM e CROSS JOIN cents) t
      WHERE rn = 1),
    qa AS (SELECT vec_id AS query_id, v AS qv, centroid_id FROM assign WHERE vec_id < 20),
    ascored AS (
      SELECT qa.query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(qa.qv, c.v)
                   / (sqrt(list_inner_product(qa.qv, qa.qv)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM qa JOIN assign c ON qa.centroid_id = c.centroid_id AND qa.query_id <> c.vec_id),
    approx AS (SELECT query_id, neighbor_id FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM ascored) t WHERE rn <= 3),
    -- recall@3
    hits AS (
      SELECT ex.query_id,
             CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM exact ex LEFT JOIN approx ap
        ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id),
    perq AS (SELECT query_id, COUNT(*) AS n_exact, SUM(hit) AS n_hit
             FROM hits GROUP BY query_id)
    SELECT CAST(3 AS INTEGER) AS k,
           COUNT(*) AS n_queries,
           CAST(SUM(n_hit) AS BIGINT) AS n_hits,
           CAST(SUM(n_exact) AS BIGINT) AS n_exact,
           ROUND(CAST(SUM(n_hit) AS DOUBLE) / SUM(n_exact), 6) AS micro_recall,
           ROUND(CAST(SUM(CAST(ROUND(CAST(n_hit AS DOUBLE) / n_exact, 6)
                                AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS macro_recall
    FROM perq
    """,
    doc="ANN recall measurement (round-6 item 5): recall@3 of the IVF "
    "nprobe=1 search vs the exact brute-force ground truth, micro + "
    "macro, one-row report — the number that makes nprobe/band tuning "
    "an experiment instead of a guess (recall-vs-nprobe table in "
    "tools/scalecheck.py)",
)
def pipe_sim_recall_ivf(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    exact = similarity.topk_cosine(e, q, "vec_id", "embedding", k=3)
    approx = similarity.topk_cosine_ivf(e, q, "vec_id", "embedding", n_centroids=16, k=3)
    return similarity.recall_report(approx, exact, k=3)


_EMBEDDINGS_CTE = "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"


def _kmeans_assign_ctes(
    n_centroids: int, n_iters: int, dim: int, source_cte: str = _EMBEDDINGS_CTE
) -> tuple:
    """Shared DuckDB replay of similarity.kmeans_centroids: returns
    (cte_list, final_assignment_name) where the final CTE is every corpus
    row with its trained-centroid assignment.

    Each Lloyd iteration is an assignment CTE (row_number over rounded
    cosine, centroid-id tiebreak) and a centroid-update CTE (per-position
    mean over FLOOR(x*1e9+0.5) scaled-BIGINT sums — exactly the Spark
    plan's arithmetic, same IEEE multiply-then-floor in both engines, so
    centroids match bit-for-bit).
    """
    assign = """
a{i} AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND(list_inner_product(e.v, c.cent)
                      / (sqrt(list_inner_product(e.v, e.v))
                         * sqrt(list_inner_product(c.cent, c.cent))), 6) DESC,
                      c.centroid_id) AS rn
    FROM e CROSS JOIN c{i} c) t
  WHERE rn = 1
)"""
    update = """
c{j} AS (
  SELECT centroid_id, list(m ORDER BY pos) AS cent FROM (
    SELECT a.centroid_id, d.pos,
           CAST(SUM(CAST(FLOOR(a.v[d.pos] * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e9 / COUNT(*) AS m
    FROM a{i} a CROSS JOIN dims d
    GROUP BY 1, 2) mm
  GROUP BY centroid_id
)"""
    ctes = [
        source_cte,
        f"dims AS (SELECT unnest(range(1, {dim + 1})) AS pos)",
        f"c0 AS (SELECT vec_id AS centroid_id, v AS cent FROM e ORDER BY vec_id LIMIT {n_centroids})",
    ]
    for i in range(n_iters):
        ctes.append(assign.format(i=i))
        ctes.append(update.format(i=i, j=i + 1))
    ctes.append(assign.format(i=n_iters))  # final assignment to trained centroids
    return ctes, f"a{n_iters}"


def _kmeans_ivf_oracle(
    n_centroids: int,
    n_iters: int,
    dim: int,
    k: int,
    source_cte: str = _EMBEDDINGS_CTE,
) -> str:
    ctes, fin = _kmeans_assign_ctes(n_centroids, n_iters, dim, source_cte)
    return f"""
    WITH {', '.join(ctes)},
    qa AS (SELECT * FROM {fin} WHERE vec_id < 20),
    scored AS (
      SELECT qa.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(qa.v, c.v)
                   / (sqrt(list_inner_product(qa.v, qa.v))
                      * sqrt(list_inner_product(c.v, c.v))), 6) AS cos_sim
      FROM qa JOIN {fin} c
        ON qa.centroid_id = c.centroid_id AND qa.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= {k}
    """


@register(
    "pipe_sim_ivf_kmeans",
    oracle=_kmeans_ivf_oracle(n_centroids=8, n_iters=2, dim=64, k=3),
    doc="IVF ANN with a k-means-trained coarse quantizer: 2 Lloyd "
    "iterations as DataFrame aggregations (scaled-BIGINT element means -> "
    "bit-identical centroids, full DuckDB replay) then assign -> "
    "equi-join on cell -> local top-3",
)
def pipe_sim_ivf_kmeans(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_ivf_kmeans(
        e, q, "vec_id", "embedding", n_centroids=8, n_iters=2, k=3
    )


_EMBED_SOURCE_CTE = (
    _EMBED_TFIDF_CTES + ",\n    e AS (SELECT doc_id AS vec_id, embedding AS v FROM emb)"
)


@register(
    "pipe_embed_ivf_topk",
    oracle=_kmeans_ivf_oracle(
        n_centroids=8, n_iters=2, dim=64, k=3, source_cte=_EMBED_SOURCE_CTE
    ),
    doc="the composed raw-text ANN pipeline: documents -> hashing-trick "
    "TF-IDF embedding -> k-means-trained IVF -> top-3 neighbors for the "
    "first 20 docs.  Every stage (tokenize, tf-idf, 2 Lloyd iterations, "
    "cell join, ranking) replays in ONE DuckDB oracle — the loop "
    "dependency VERDICT r6 flagged (ANN only ran from the fixture "
    "embeddings table) is closed",
)
def pipe_embed_ivf_topk(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    # materialize the derived embeddings ONCE: the IVF k-means loop scans
    # its corpus ~6x (seed + 2 Lloyd assignment/update rounds + the final
    # assigns), and without this each scan re-ran the whole tokenize ->
    # tf -> idf-join -> assemble pipeline (9.2 s -> 4.9 s at sf0.1,
    # docs/PLANS.md round-7 A/B).  At 100 TB this is the "land embeddings
    # to parquet first" note made executable.
    # eager=False (r17): the k-means seed job (TakeOrdered over every
    # partition) is the checkpoint's first consumer and materializes it
    # in passing — one fewer job than checkpoint-then-seed, same pin.
    emb = text_ops.embed_text_tfidf(d, "doc_id", "text", dim=64).localCheckpoint(
        eager=False
    )
    q = emb.where(F.col("doc_id") < 20)
    return similarity.topk_cosine_ivf_kmeans(
        emb, q, "doc_id", "embedding", n_centroids=8, n_iters=2, k=3
    )


def _semantic_dedup_oracle(n_centroids: int, n_iters: int, dim: int, threshold: float) -> str:
    ctes, fin = _kmeans_assign_ctes(n_centroids, n_iters, dim)
    return f"""
    WITH {', '.join(ctes)},
    dominated AS (
      SELECT DISTINCT b.vec_id
      FROM {fin} a JOIN {fin} b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE ROUND(list_inner_product(a.v, b.v)
                  / (sqrt(list_inner_product(a.v, a.v))
                     * sqrt(list_inner_product(b.v, b.v))), 6) >= {threshold}
    )
    SELECT f.vec_id, f.centroid_id, (d.vec_id IS NOT NULL) AS is_dup
    FROM {fin} f LEFT JOIN dominated d ON f.vec_id = d.vec_id
    """


@register(
    "pipe_dedup_semantic",
    oracle=_semantic_dedup_oracle(n_centroids=8, n_iters=2, dim=64, threshold=0.35),
    doc="SemDeDup-shaped semantic dedup: k-means cluster the embedding "
    "space, intra-cluster cosine >= threshold marks higher-id rows as "
    "duplicates (min-id survivor); pair join is quadratic only within a "
    "cluster, bounded by the n_centroids knob",
)
def pipe_dedup_semantic(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        e, "vec_id", "embedding", n_centroids=8, n_iters=2, threshold=0.35
    )


@register(
    "pipe_sim_topk_gemm",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.v, c.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= 5
    """,
    doc="brute-force top-5 via per-partition NumPy GEMM (the scale path: "
    "one matmul per Arrow batch, per-batch partial top-k; ~25x the "
    "interpreted HOF dot product at 200k corpus) — same oracle as the "
    "expression version",
)
def pipe_sim_topk_gemm(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_gemm(e, q, "vec_id", "embedding", k=5)


@register(
    "pipe_sim_topk_quantized",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dq AS (
      SELECT vec_id,
             list_transform(v, x ->
               floor(least(greatest(x, -1.0), 1.0) / 1.0 * 127 + 0.5) / 127.0 * 1.0
             ) AS v
      FROM e
    ),
    q AS (SELECT * FROM dq WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.v, c.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM q JOIN dq c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= 5
    """,
    doc="top-5 over int8-quantized embeddings: symmetric scalar "
    "quantization (floor(x*127+0.5) — floor, not ROUND, because Spark "
    "HALF_UP vs DuckDB banker's rounding diverge on the quantization "
    "grid), dequantize, GEMM search; 4-8x fewer embedding bytes through "
    "every downstream shuffle",
)
def pipe_sim_topk_quantized(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_quantized(e, q, "vec_id", "embedding", k=5, clip=1.0)


@register(
    "pipe_dedup_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (SELECT src, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src)
    SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON c.src = d.doc_id
    """,
    doc="duplicate clustering: connected components (min-label propagation) "
    "over the minhash near-dup pair graph; every doc gets a canonical "
    "cluster id (oracle: recursive-CTE transitive closure)",
)
def pipe_dedup_components(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        d, "doc_id", "text", n_hashes=8, rows_per_band=2, shingle_n=3, threshold=0.5
    )
    return dedup.connected_components(pairs, d, "doc_id")


@register(
    "pipe_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (SELECT src, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src),
    labeled AS (
      SELECT d.doc_id, d.n_chars, COALESCE(c.comp, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.src = d.doc_id
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS cluster_size
      FROM labeled
    )
    SELECT doc_id, component, CAST(cluster_size AS BIGINT) AS cluster_size
    FROM ranked WHERE rn = 1
    """,
    doc="end-to-end dedup: minhash pairs -> connected components -> keep the "
    "highest-quality (longest, ties by id) member of each cluster; the "
    "terminal filter of the canonical training-data pipeline",
)
def pipe_dedup_survivors(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        d, "doc_id", "text", n_hashes=8, rows_per_band=2, shingle_n=3, threshold=0.5
    )
    return dedup.dedup_keep_best(d, pairs, "doc_id", "n_chars").select(
        "doc_id", "component", "cluster_size"
    )


# ---------------------------------------------------------------------------
# corpus curation (decontamination, quality gate, packing, mixture)
# ---------------------------------------------------------------------------

#: Shared by pipe_decontaminate AND pipe_decontaminate_bloom: the Bloom
#: prefilter is correctness-preserving (no false negatives; false
#: positives die in the exact join), so both faces owe the SAME output.
_DECON_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 3)
    ),
    g AS (
      SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS g
      FROM sh
    ),
    bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
    hits AS (SELECT g.doc_id, COUNT(*) AS n FROM g JOIN bg USING (g)
             GROUP BY g.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hit_ngrams,
           COALESCE(h.n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    """


@register(
    "pipe_decontaminate",
    oracle=_DECON_ORACLE,
    doc="benchmark n-gram decontamination (GPT-3 appendix-C style): flag "
    "corpus docs sharing any word 3-gram with the held-out set "
    "(doc_id %% 7 = 0 stands in for the benchmark); one broadcast hash "
    "equi-join on 8-byte n-gram hashes — the corpus never shuffles",
)
def pipe_decontaminate(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 7 == 0)
    return curation.decontaminate(d, bench, "doc_id", "text", n=3)


@register(
    "pipe_quality_filter",
    oracle=r"""
    WITH t AS (SELECT doc_id, source, text,
                      string_split_regex(lower(text), '\s+') AS toks
               FROM documents),
    f AS (SELECT source,
            (LEN(toks) BETWEEN 10 AND 100000
             AND CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE)
                 / LEN(toks) BETWEEN 2 AND 12
             AND CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                 / LENGTH(text) <= 0.2) AS keep
          FROM t)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS retention
    FROM f GROUP BY source
    """,
    doc="per-source retention report of the Gopher-style composite quality "
    "gate (length / mean-word-length / punctuation rules); one narrow "
    "projection + one small groupBy(source)",
)
def pipe_quality_filter(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curation.quality_retention(d, "doc_id", "text")


@register(
    "pipe_pack_sequences",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT)
               % 8 AS pack_group
      FROM documents
    ),
    c AS (
      SELECT *,
             SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS prev
      FROM t
    )
    SELECT doc_id, n_tokens, pack_group,
           CAST(prev // CAST(2048 AS BIGINT) AS BIGINT) AS pack_no
    FROM c
    """,
    doc="token-budget shard packing: docs stream into ~2048-token packs, "
    "sequential fill inside 8 parallel hash groups (never a global "
    "single-partition cumulative sum); integer DIV on both engines "
    "(Spark `div`, DuckDB `//`) — exact at any running total, not just "
    "under the double-precision 2^53 bound",
)
def pipe_pack_sequences(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    n_ws_tokens = F.size(F.split(F.col("text"), r"\s+"))
    return curation.pack_sequences(
        d, "doc_id", n_ws_tokens, capacity=2048, n_groups=8
    )


_MIX_SHARES = {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2}
_MIX_BUDGET = 10_000


def _mixture_oracle() -> str:
    case = " ".join(
        f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in sorted(_MIX_SHARES.items())
    )
    return f"""
    WITH base AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS tok
                  FROM documents),
    counts AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS st
               FROM base GROUP BY source),
    rates AS (SELECT source,
        ROUND(LEAST(CAST(1.0 AS DOUBLE),
              (CASE source {case} ELSE CAST(0.0 AS DOUBLE) END)
              * {_MIX_BUDGET} / st), 6) AS sample_rate
      FROM counts),
    u AS (SELECT doc_id, source,
        ROUND((CAST('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 14)
                AS BIGINT) %% 1000000) / CAST(1000000 AS DOUBLE), 6) AS u
      FROM base)
    SELECT u.doc_id, u.source, r.sample_rate, u.u
    FROM u JOIN rates r USING (source)
    WHERE u.u < r.sample_rate
    """.replace("%%", "%")


@register(
    "pipe_mixture_sample",
    oracle=_mixture_oracle(),
    doc="deterministic stratified sampling toward a target source mixture "
    "under a global token budget: per-stratum rates from one tiny agg, "
    "broadcast back, map-side keep iff hash-uniform(id, seed) < rate — "
    "stable across re-runs and partitionings, unlike df.sample()",
)
def pipe_mixture_sample(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    kept = curation.mixture_sample(
        d, "source", "doc_id", "n_chars", _MIX_SHARES, _MIX_BUDGET, seed=42
    )
    return kept.select("doc_id", "source", "sample_rate", "u")


# ---------------------------------------------------------------------------
# training export: split assignment + shard shuffle
# ---------------------------------------------------------------------------

@register(
    "pipe_split_stratified",
    oracle="""
    WITH u AS (
      SELECT source, n_chars,
             ROUND((CAST('0x' || substr(md5('13:' || CAST(doc_id AS VARCHAR)),
                                        1, 14) AS BIGINT)
                    % 1000000) / CAST(1000000 AS DOUBLE), 6) AS u
      FROM documents
    ),
    a AS (
      SELECT source, n_chars,
             CASE WHEN u < 0.8 THEN 'train'
                  WHEN u < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM u
    )
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM a GROUP BY source, split
    """,
    doc="deterministic train/val/test split: hash-threshold assignment "
    "(pure function of doc_id — stable across re-runs, cluster sizes, "
    "and corpus growth, unlike randomSplit), audited as per-(source, "
    "split) document and char counts.  Zero-shuffle assignment; the "
    "audit agg is one tiny map-side-combined exchange",
)
def pipe_split_stratified(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    parts = curation.train_val_test_split(d, "doc_id", (0.8, 0.1, 0.1), seed=13)
    return parts.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "pipe_split_group",
    oracle="""
    WITH u AS (
      SELECT source, n_chars,
             ROUND((CAST('0x' || substr(md5('7:' || source), 1, 14) AS BIGINT)
                    % 1000000) / CAST(1000000 AS DOUBLE), 6) AS u
      FROM documents
    ),
    a AS (
      SELECT source, n_chars,
             CASE WHEN u < 0.6 THEN 'train'
                  WHEN u < 0.8 THEN 'val'
                  ELSE 'test' END AS split
      FROM u
    )
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM a GROUP BY source, split
    """,
    doc="leakage-safe GROUP-aware split (curation.group_aware_split): "
    "the split hash is taken on the correlation unit (here the source "
    "domain) so every row of a group lands in ONE split — "
    "near-duplicates/same-origin docs straddling train and test are "
    "the eval-contamination vector a row-level split cannot close.  "
    "The audit shape itself proves the invariant: grouping by (source, "
    "split) yields exactly one row per source (driver-verified row "
    "count == distinct sources).  Zero-shuffle assignment + one tiny "
    "map-side-combined audit agg",
)
def pipe_split_group(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    parts = curation.group_aware_split(d, "source", (0.6, 0.2, 0.2), seed=7)
    return parts.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "pipe_preference_pairs",
    oracle="""
    WITH ranked AS (
      SELECT source AS "group", doc_id AS _id,
             ROUND(CAST(n_chars AS DOUBLE), 6) AS _score,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ROUND(CAST(n_chars AS DOUBLE), 6) DESC, doc_id ASC
             ) AS _rk,
             COUNT(*) OVER (PARTITION BY source) AS _m
      FROM documents
    ),
    chosen AS (
      SELECT "group", _rk AS pair_rank, _id AS chosen_id, _score AS chosen_score
      FROM ranked WHERE _rk <= 2 AND 2 * _rk <= _m
    ),
    rejected AS (
      SELECT "group" AS group_r, _m + 1 - _rk AS pair_rank_r,
             _id AS rejected_id, _score AS rejected_score
      FROM ranked
    )
    SELECT "group", pair_rank, chosen_id, chosen_score,
           rejected_id, rejected_score,
           ROUND(chosen_score - rejected_score, 6) AS score_gap
    FROM chosen JOIN rejected
      ON "group" = group_r AND pair_rank = pair_rank_r
    WHERE chosen_score - rejected_score >= 1.0
    """,
    doc="preference-pair construction for DPO/reward-model training "
    "(curation.preference_pairs): within each prompt group (here the "
    "source domain) pair the i-th best-scored document with the i-th "
    "worst (i <= 2), dropping pairs whose score gap is under the "
    "margin.  One window pass yields both sides (the i-th worst is "
    "rank m+1-i of the SAME total order) and the self-join input is "
    "rank-filtered to <= 2 rows per group per side — deterministic, "
    "never all-pairs, one shuffle on the group key",
)
def pipe_preference_pairs(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curation.preference_pairs(
        d, "source", "doc_id", "n_chars", max_pairs_per_group=2, margin=1.0
    )


@register(
    "pipe_curriculum_order",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             NTILE(4) OVER (ORDER BY n_chars ASC, doc_id ASC) AS stage
      FROM documents
    )
    SELECT doc_id, n_chars, stage,
           ROW_NUMBER() OVER (
             PARTITION BY stage ORDER BY n_chars ASC, doc_id ASC
           ) AS stage_pos
    FROM s
    """,
    doc="curriculum ordering (curation.curriculum_order): NTILE the "
    "corpus into 4 equal difficulty stages over a score (here doc "
    "length — short/easy first) with a deterministic position inside "
    "each stage; the stream order a curriculum scheduler consumes.  "
    "Total order = (score, id) so the assignment is engine-exact; "
    "NULL scores are refused loudly rather than sorted "
    "engine-dependently",
)
def pipe_curriculum_order(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curation.curriculum_order(d, "doc_id", "n_chars", n_stages=4)


@register(
    "pipe_shard_assign",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('5:' || CAST(doc_id AS VARCHAR)), 1, 14)
                  AS BIGINT) % 16 AS shard,
             CAST('0x' || substr(md5('6:' || CAST(doc_id AS VARCHAR)), 1, 14)
                  AS BIGINT) AS oh
      FROM documents
    )
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY oh, doc_id) - 1
             AS shard_pos
    FROM h
    """,
    doc="deterministic global shuffle into training shards: uniform hash "
    "shard + reproducible in-shard position = a global permutation with "
    "NO global sort (a single-partition ORDER BY would bottleneck at "
    "100 TB); one hash exchange, per-shard windows, one writer task per "
    "shard",
)
def pipe_shard_assign(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curation.shard_assign(d, "doc_id", n_shards=16, seed=5).select(
        "doc_id", "shard", "shard_pos"
    )


@register(
    "pipe_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
    stats AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tok, COUNT(*) AS n_vocab
              FROM vocab),
    model AS (
      SELECT tok,
             ROUND(-LN((tf + 0.5) / (n_tok + 0.5 * n_vocab)), 6) AS nll
      FROM vocab, stats
    )
    SELECT doc_id, COUNT(*) AS n_toks,
           CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM toks JOIN model USING (tok)
    GROUP BY doc_id
    """,
    doc="CCNet-style unigram-LM quality score: the corpus's own token "
    "frequencies are the model (one vocab agg), each document scored by "
    "mean token NLL (one join + one re-agg).  Low = boilerplate, high = "
    "gibberish; the standard middle-band keep filter for pretraining "
    "corpora",
)
def pipe_lm_score(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.unigram_lm_score(d, "doc_id", "text", k=0.5)


@register(
    "pipe_lm_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
    stats AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tok, COUNT(*) AS n_vocab
              FROM vocab),
    model AS (
      SELECT tok,
             ROUND(-LN((tf + 0.5) / (n_tok + 0.5 * n_vocab)), 6) AS nll
      FROM vocab, stats
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
               AS avg_nll
      FROM toks JOIN model USING (tok)
      GROUP BY doc_id
    ),
    bucketed AS (
      SELECT d.lang,
             CASE NTILE(3) OVER (PARTITION BY d.lang
                                 ORDER BY s.avg_nll, s.doc_id)
                  WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             CAST(FLOOR(s.avg_nll * 1000000.0 + 0.5) AS BIGINT) AS micro_nll
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT lang, bucket, COUNT(*) AS n_docs,
           (CAST(SUM(micro_nll) AS DOUBLE) / 1000000.0) / COUNT(*)
             AS mean_nll
    FROM bucketed GROUP BY lang, bucket
    """,
    doc="CCNet-style perplexity bucketing: per-language head/middle/tail "
    "tertiles of the unigram-LM score (NTILE over a per-lang window with "
    "a deterministic doc_id tiebreak).  The standard head-keep / "
    "tail-drop curation policy; per-lang partitioning keeps the window "
    "parallel across languages at scale.  Doc scores quantize to integer "
    "micro-nll via FLOOR(x*1e6+0.5) — explicit IEEE arithmetic identical "
    "in both engines, where engine ROUND() implementations diverged on 2 "
    "of 5000 docs at sf0.1 — and bucket means are exact integer sums",
)
def pipe_lm_buckets(spark, sf_dir):
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    scored = text_ops.unigram_lm_score(d, "doc_id", "text", k=0.5)
    joined = scored.join(d.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    tier = F.ntile(3).over(w)
    bucketed = joined.select(
        "lang",
        F.when(tier == 1, "head").when(tier == 2, "middle").otherwise("tail").alias("bucket"),
        F.floor(F.col("avg_nll") * 1e6 + F.lit(0.5)).alias("micro_nll"),
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            (F.sum("micro_nll").cast("double") / F.lit(1e6))
            / F.count(F.lit(1))
        ).alias("mean_nll"),
    )


#: Shared oracle CTE chain replaying ngram_lm_score (trigram
#: Jelinek-Mercer, add-k per order, BOS chr(2) padding).  DuckDB lists
#: are 1-based: real token j has padded position j+2.
_NGRAM_LM_SCORED = """
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents
    ),
    pad AS (
      SELECT doc_id, tk, list_concat([chr(2), chr(2)], tk) AS pt, len(tk) AS n
      FROM docs
    ),
    emit AS (
      SELECT doc_id,
             unnest(tk) AS w,
             unnest([pt[j+1] FOR j IN range(1, n+1)]) AS ctx1,
             unnest([pt[j] || ' ' || pt[j+1] FOR j IN range(1, n+1)]) AS ctx2
      FROM pad
    ),
    uni AS (SELECT w, COUNT(*) AS tf FROM emit GROUP BY w),
    stats AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tok, COUNT(*) AS n_vocab
              FROM uni),
    big AS (SELECT ctx1, w, COUNT(*) AS c2 FROM emit GROUP BY ctx1, w),
    cbig AS (SELECT ctx1, CAST(SUM(c2) AS BIGINT) AS cc1 FROM big GROUP BY ctx1),
    tri AS (SELECT ctx2, w, COUNT(*) AS c3 FROM emit GROUP BY ctx2, w),
    ctri AS (SELECT ctx2, CAST(SUM(c3) AS BIGINT) AS cc2 FROM tri GROUP BY ctx2),
    tokscore AS (
      SELECT doc_id,
             ROUND(-LN(0.2 * ((tf + 0.5) / (n_tok + 0.5 * n_vocab))
                     + 0.3 * ((c2 + 0.5) / (cc1 + 0.5 * n_vocab))
                     + 0.5 * ((c3 + 0.5) / (cc2 + 0.5 * n_vocab))), 6) AS nll
      FROM emit
      JOIN uni USING (w)
      JOIN big USING (ctx1, w) JOIN cbig USING (ctx1)
      JOIN tri USING (ctx2, w) JOIN ctri USING (ctx2), stats
    ),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_toks,
             CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
               AS avg_nll
      FROM tokscore GROUP BY doc_id
    )
"""


@register(
    "pipe_lm_score_ngram",
    oracle=_NGRAM_LM_SCORED + "\n    SELECT doc_id, n_toks, avg_nll FROM scored",
    doc="interpolated trigram-LM quality score (Jelinek-Mercer "
    "0.2/0.3/0.5, add-k per order, BOS-padded): the higher-order "
    "upgrade the CCNet recipe calls for — word salad that fools the "
    "unigram model now pays for improbable transitions.  Count tables "
    "are Zipf-bounded map-side-combined aggregates; context totals "
    "derive from pair counts, not a second corpus pass; all five "
    "scoring joins are equi-joins",
)
def pipe_lm_score_ngram(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.ngram_lm_score(d, "doc_id", "text", k=0.5)


@register(
    "pipe_lm_buckets_ngram",
    oracle=_NGRAM_LM_SCORED
    + """,
    bucketed AS (
      SELECT d.lang,
             CASE NTILE(3) OVER (PARTITION BY d.lang
                                 ORDER BY s.avg_nll, s.doc_id)
                  WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             CAST(FLOOR(s.avg_nll * 1000000.0 + 0.5) AS BIGINT) AS micro_nll
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT lang, bucket, COUNT(*) AS n_docs,
           (CAST(SUM(micro_nll) AS DOUBLE) / 1000000.0) / COUNT(*)
             AS mean_nll
    FROM bucketed GROUP BY lang, bucket
    """,
    doc="perplexity bucketing over the TRIGRAM score: per-language "
    "head/middle/tail tertiles (same FLOOR micro-int discipline as "
    "pipe_lm_buckets) — the bucketed variant of the CCNet keep policy "
    "re-based on the order-aware model",
)
def pipe_lm_buckets_ngram(spark, sf_dir):
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    scored = text_ops.ngram_lm_score(d, "doc_id", "text", k=0.5)
    joined = scored.join(d.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    tier = F.ntile(3).over(w)
    bucket = (
        F.when(tier == 1, "head").when(tier == 2, "middle").otherwise("tail")
    )
    micro = F.floor(F.col("avg_nll") * 1000000.0 + 0.5).cast("bigint")
    return (
        joined.select("lang", bucket.alias("bucket"), micro.alias("micro_nll"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ((F.sum("micro_nll").cast("double") / 1000000.0) / F.count(F.lit(1))).alias(
                "mean_nll"
            ),
        )
    )




def _ivf_pq_oracle(
    n_centroids: int,
    coarse_iters: int,
    dim: int,
    m: int,
    pq_k: int,
    pq_iters: int,
    k: int,
    rerank_depth: int | None = None,
    nprobe: int = 1,
) -> str:
    """DuckDB replay of operators/pq.py:topk_cosine_ivf_pq — the coarse
    k-means chain (shared generator) PLUS, per subspace, an L2 Lloyd
    chain (seeded by the rank of the first pq_k vectors, squared
    distance spelled ``(x·x) - 2(x·c) + (c·c)`` and rounded exactly as
    the GEMM side does) and finally the ADC score: the sum of per-
    subspace codebook lookups over exact norms.  With ``rerank_depth``
    the ADC ranking only shortlists; the shortlist is re-scored with
    the exact cosine (the operator's IVF-PQ+R mode)."""
    ctes, fin = _kmeans_assign_ctes(n_centroids, coarse_iters, dim)
    sub = dim // m
    ctes.append(f"sdims AS (SELECT unnest(range(1, {sub + 1})) AS pos)")
    d2 = (
        "ROUND(list_inner_product(ej.sv, ej.sv)"
        " - 2*list_inner_product(ej.sv, c.cent)"
        " + list_inner_product(c.cent, c.cent), 6)"
    )
    for j in range(m):
        a, b = j * sub + 1, (j + 1) * sub
        ej = f"e{j}s"
        ctes.append(
            f"{ej} AS (SELECT vec_id, list_slice(v, {a}, {b}) AS sv FROM e)"
        )
        ctes.append(
            f"""p{j}c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, sv AS cent
  FROM (SELECT vec_id, sv FROM {ej} ORDER BY vec_id LIMIT {pq_k}))"""
        )
        for i in range(pq_iters):
            ctes.append(
                f"""pa{j}_{i} AS (
  SELECT vec_id, sv, code FROM (
    SELECT ej.vec_id, ej.sv, c.code,
           ROW_NUMBER() OVER (PARTITION BY ej.vec_id
                              ORDER BY {d2} ASC, c.code) AS rn
    FROM {ej} ej CROSS JOIN p{j}c{i} c) t
  WHERE rn = 1)"""
            )
            ctes.append(
                f"""p{j}c{i + 1} AS (
  SELECT code, list(mm ORDER BY pos) AS cent FROM (
    SELECT a.code, d.pos,
           CAST(SUM(CAST(FLOOR(a.sv[d.pos] * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e9 / COUNT(*) AS mm
    FROM pa{j}_{i} a CROSS JOIN sdims d
    GROUP BY 1, 2) q
  GROUP BY code)"""
            )
        ctes.append(
            f"""pa{j}_fin AS (
  SELECT vec_id, code FROM (
    SELECT ej.vec_id, c.code,
           ROW_NUMBER() OVER (PARTITION BY ej.vec_id
                              ORDER BY {d2} ASC, c.code) AS rn
    FROM {ej} ej CROSS JOIN p{j}c{pq_iters} c) t
  WHERE rn = 1)"""
        )
    code_cols = ", ".join(f"pa{j}_fin.code AS code{j}" for j in range(m))
    code_joins = " ".join(
        f"JOIN pa{j}_fin ON pa{j}_fin.vec_id = e.vec_id" for j in range(m)
    )
    ctes.append(f"cd AS (SELECT e.vec_id, {code_cols} FROM e {code_joins})")
    adc = " + ".join(
        f"list_inner_product(list_slice(qa.v, {j * sub + 1}, {(j + 1) * sub}),"
        f" b{j}.cent)"
        for j in range(m)
    )
    book_joins = " ".join(
        f"JOIN p{j}c{pq_iters} b{j} ON b{j}.code = cd.code{j}" for j in range(m)
    )
    ci_books = f"c{coarse_iters}"
    if nprobe == 1:
        qa = f"qa AS (SELECT * FROM {fin} WHERE vec_id < 20)"
    else:
        # re-rank queries against the TRAINED coarse centroids and keep
        # the nprobe nearest cells — the Spark side's stable-argsort
        # tiebreak is the same (score DESC, centroid_id).
        qa = f"""qr AS (
      SELECT e.vec_id, e.v, c.centroid_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND(list_inner_product(e.v, c.cent)
                        / (sqrt(list_inner_product(e.v, e.v))
                           * sqrt(list_inner_product(c.cent, c.cent))), 6) DESC,
                        c.centroid_id) AS rn
      FROM e CROSS JOIN {ci_books} c
      WHERE e.vec_id < 20
    ),
    qa AS (SELECT vec_id, v, centroid_id FROM qr WHERE rn <= {nprobe})"""
    head = f"""
    WITH {', '.join(ctes)},
    {qa},
    scored AS (
      SELECT qa.vec_id AS query_id, c.vec_id AS neighbor_id,
             qa.v AS qv, c.v AS cv,
             ROUND(({adc})
                   / (sqrt(list_inner_product(qa.v, qa.v))
                      * sqrt(list_inner_product(c.v, c.v))), 6) AS cos_pq
      FROM qa JOIN {fin} c
        ON qa.centroid_id = c.centroid_id AND qa.vec_id <> c.vec_id
      JOIN cd ON cd.vec_id = c.vec_id
      {book_joins}
    )"""
    if rerank_depth is None:
        return (
            head
            + f"""
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_pq FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_pq DESC, neighbor_id) AS rn
      FROM scored) t
    WHERE rn <= {k}
    """
        )
    return (
        head
        + f""",
    shortlist AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_pq DESC, neighbor_id) AS rn_pq
        FROM scored) t
      WHERE rn_pq <= {rerank_depth}
    ),
    rescored AS (
      SELECT query_id, neighbor_id,
             ROUND(list_inner_product(qv, cv)
                   / (sqrt(list_inner_product(qv, qv))
                      * sqrt(list_inner_product(cv, cv))), 6) AS cos_sim
      FROM shortlist
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM rescored) t
    WHERE rn <= {k}
    """
    )


@register(
    "pipe_sim_ivf_pq",
    oracle=_ivf_pq_oracle(
        n_centroids=8, coarse_iters=2, dim=64, m=4, pq_k=16, pq_iters=2, k=3
    ),
    doc="IVF-PQ compressed ANN (Jegou et al. 2011), the memory step "
    "beyond int8: k-means coarse cells prune candidates, 4 per-subspace "
    "16-entry L2 codebooks compress dim-64 vectors to 4 codes, ADC "
    "scores candidates as a sum of literal-codebook lookups over exact "
    "norms.  Every stage — coarse Lloyd loop, per-subspace L2 Lloyd "
    "loops (scaled-BIGINT exact means), compact-rank seeding, encode "
    "argmin, the ADC sum — replays in ONE DuckDB oracle, hash-exact",
)
def pipe_sim_ivf_pq(spark, sf_dir):
    from ..operators import pq

    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return pq.topk_cosine_ivf_pq(
        e, q, "vec_id", "embedding",
        n_centroids=8, coarse_iters=2, m=4, pq_k=16, pq_iters=2, k=3,
    )


@register(
    "pipe_sim_ivf_pq_rerank",
    oracle=_ivf_pq_oracle(
        n_centroids=8, coarse_iters=2, dim=64, m=4, pq_k=16, pq_iters=2,
        k=3, rerank_depth=10,
    ),
    doc="IVF-PQ+R, the production refinement shape (FAISS IVFPQR): the "
    "4-byte ADC probe shortlists depth-10 per query, then ONLY the "
    "shortlist is re-scored with the exact cosine and re-ranked — full "
    "vectors are touched for |queries| x 10 rows, not per candidate.  "
    "Measured agreement@5 with exact-scored IVF on the random-vector "
    "worst case: 0.30 ADC-only -> 0.94 at depth 40 (SCALE.md knob "
    "table).  Same single-oracle replay as pipe_sim_ivf_pq plus the "
    "shortlist/rescore windows",
)
def pipe_sim_ivf_pq_rerank(spark, sf_dir):
    from ..operators import pq

    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return pq.topk_cosine_ivf_pq(
        e, q, "vec_id", "embedding",
        n_centroids=8, coarse_iters=2, m=4, pq_k=16, pq_iters=2, k=3,
        rerank_depth=10,
    )


from ..sources.layout import zorder_key_sql as _zorder_key_sql  # noqa: E402


@register(
    "pipe_layout_zorder",
    oracle=f"""
    SELECT o_orderkey,
           {_zorder_key_sql(
               ['(o_custkey % 1024)',
                '(CAST(FLOOR(o_totalprice) AS BIGINT) % 1024)'],
               bits=10,
           )} AS zkey
    FROM orders
    """,
    doc="Z-order (Morton) layout key over (custkey-bin, totalprice-bin): "
    "the Delta/Iceberg OPTIMIZE ZORDER recipe from plain Spark "
    "primitives (sources/layout.py).  Pure codegen'd long shift/mask "
    "arithmetic, replayed verbatim in DuckDB; FLOOR-before-CAST because "
    "DuckDB's double->bigint cast rounds where Spark truncates.  The "
    "actual skip benefit is measured in tests/test_layout.py: a "
    "clustered write prunes files on BOTH dimensions' min/max stats",
)
def pipe_layout_zorder(spark, sf_dir):
    from ..sources.layout import zorder_key

    o = table(spark, sf_dir, "orders")
    key = zorder_key(
        [
            F.col("o_custkey") % 1024,
            F.floor(F.col("o_totalprice")).cast("bigint") % 1024,
        ],
        bits=10,
    )
    return o.select("o_orderkey", key.alias("zkey"))


@register(
    "pipe_sim_ivf_pq_probe2",
    oracle=_ivf_pq_oracle(
        n_centroids=8, coarse_iters=2, dim=64, m=4, pq_k=16, pq_iters=2,
        k=3, rerank_depth=10, nprobe=2,
    ),
    doc="the full production ANN config — IVF-PQ+R with nprobe=2: each "
    "query probes its two nearest trained cells (recall knob), the "
    "4-byte ADC code shortlists depth-10 over the doubled candidate "
    "set, exact cosine re-ranks the shortlist.  Candidates stay an "
    "equi-join (a neighbor lives in one cell; no dedup pass); the "
    "oracle adds the query-side rn<=2 cell ranking to the full PQ "
    "replay",
)
def pipe_sim_ivf_pq_probe2(spark, sf_dir):
    from ..operators import pq

    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return pq.topk_cosine_ivf_pq(
        e, q, "vec_id", "embedding",
        n_centroids=8, coarse_iters=2, m=4, pq_k=16, pq_iters=2, k=3,
        rerank_depth=10, nprobe=2,
    )


@register(
    "pipe_corpus_health",
    oracle=r"""
    WITH t AS (SELECT doc_id, source, text,
                      string_split_regex(lower(text), '\s+') AS toks,
                      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
               FROM documents),
    f AS (SELECT source, fp,
            (LEN(toks) BETWEEN 10 AND 100000
             AND CAST(list_sum(list_transform(toks, x -> LENGTH(x))) AS DOUBLE)
                 / LEN(toks) BETWEEN 2 AND 12
             AND CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                 / LENGTH(text) <= 0.2) AS keep
          FROM t)
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_unique,
           COUNT(*) - COUNT(DISTINCT fp) AS dup_surplus,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS retention
    FROM f GROUP BY source
    """,
    doc="the per-source corpus health dashboard (daily-report shape): "
    "exact-dup overhang via distinct normalized fingerprints + the "
    "Gopher-gate retention, ONE narrow projection + ONE groupBy(source) "
    "(operators/curation.py:corpus_health_report).  Composes the "
    "fingerprint and quality operators the way an operator actually "
    "monitors a 100 TB corpus",
)
def pipe_corpus_health(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curation.corpus_health_report(d, "doc_id", "text")


def _hard_negatives_oracle(n_centroids: int, n_iters: int, dim: int, k: int) -> str:
    ctes, fin = _kmeans_assign_ctes(n_centroids, n_iters, dim)
    return f"""
    WITH {', '.join(ctes)},
    p AS (SELECT vec_id AS query_id, vec_id + 100 AS positive_id
          FROM embeddings WHERE vec_id < 15),
    qa AS (SELECT a.* FROM {fin} a JOIN p ON p.query_id = a.vec_id),
    scored AS (
      SELECT qa.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(qa.v, c.v)
                   / (sqrt(list_inner_product(qa.v, qa.v))
                      * sqrt(list_inner_product(c.v, c.v))), 6) AS cos_sim
      FROM qa JOIN {fin} c
        ON qa.centroid_id = c.centroid_id AND qa.vec_id <> c.vec_id
    ),
    hits AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored) t
      WHERE rn <= {k + 1}
    )
    SELECT query_id, positive_id, neighbor_id AS negative_id,
           CAST(rn2 AS INTEGER) AS rank, cos_sim FROM (
      SELECT h.query_id, p.positive_id, h.neighbor_id, h.cos_sim,
             ROW_NUMBER() OVER (PARTITION BY h.query_id, p.positive_id
                                ORDER BY h.cos_sim DESC, h.neighbor_id) AS rn2
      FROM hits h JOIN p ON p.query_id = h.query_id
      WHERE h.neighbor_id <> p.positive_id) t
    WHERE rn2 <= {k}
    """


@register(
    "pipe_hard_negatives",
    oracle=_hard_negatives_oracle(n_centroids=8, n_iters=2, dim=64, k=3),
    doc="hard-negative mining for contrastive training (the DPR/SimCSE "
    "recipe: random negatives are too easy): for each (query, positive) "
    "pair, the top-3 corpus items most similar to the query that are "
    "neither the query nor its positive.  Rides the IVF scale path — "
    "k-means cell equi-join candidates, k+1 deep search, broadcast "
    "pairs relation for the exclusion — never a cross product "
    "(operators/similarity.py:hard_negatives).  Full k-means + search + "
    "exclusion + re-rank replayed in one oracle",
)
def pipe_hard_negatives(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    pairs = e.where(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"),
        (F.col("vec_id") + 100).alias("positive_id"),
    )
    return similarity.hard_negatives(
        e, pairs, "vec_id", "embedding", k=3, n_centroids=8, n_iters=2
    )


@register(
    "pipe_mixture_temperature",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             ROUND((CAST('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)),
                                        1, 14) AS BIGINT)
                    % 1000000) / CAST(1000000 AS DOUBLE), 6) AS u
      FROM documents
    ),
    c AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS st FROM t GROUP BY 1),
    tt AS (SELECT CAST(SUM(st) AS BIGINT) AS tot FROM c),
    w AS (SELECT source, st,
                 ROUND(POWER(CAST(st AS DOUBLE) / tot, 0.5), 6) AS w
          FROM c, tt),
    ws AS (SELECT CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS wsum FROM w),
    r AS (SELECT source,
                 ROUND(LEAST(CAST(1.0 AS DOUBLE),
                             (w / wsum) * 200000 / st), 6) AS sample_rate
          FROM w, ws)
    SELECT t.doc_id, t.source, r.sample_rate, t.u
    FROM t JOIN r ON r.source = t.source
    WHERE t.u < r.sample_rate
    """,
    doc="temperature-based mixture reweighting (the XLM-R/mT5 knob): "
    "target shares DERIVED from the data — q_i ∝ p_i^(1/T) over "
    "observed token shares (T=2 here), so low-resource sources boost "
    "without a hand-tuned share table.  The transcendental p^alpha is "
    "rounded to 6 digits before DECIMAL-exact normalization (the "
    "registry's libm discipline); keep rule and hash-uniform identical "
    "to pipe_mixture_sample (operators/curation.py:"
    "temperature_mixture_sample)",
)
def pipe_mixture_temperature(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    kept = curation.temperature_mixture_sample(
        d, "source", "doc_id", "n_chars", temperature=2.0,
        token_budget=200_000, seed=11,
    )
    return kept.select("doc_id", "source", "sample_rate", "u")


@register(
    "pipe_multimodal_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + doc_id % 13 AS BIGINT) AS w,
             CAST(3 + doc_id % 7 AS BIGINT) AS h
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h,
             ((g1.oi * d.h) // 3) * d.w + ((g2.oj * d.w) // 3) AS pidx
      FROM dims d
      CROSS JOIN (SELECT unnest(range(0, 3)) AS oi) g1
      CROSS JOIN (SELECT unnest(range(0, 3)) AS oj) g2
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(SUM((doc_id * 31 + 3 * pidx) % 256) AS DOUBLE) / 9 AS mean_r,
           CAST(SUM((doc_id * 31 + 3 * pidx + 1) % 256) AS DOUBLE) / 9 AS mean_g,
           CAST(SUM((doc_id * 31 + 3 * pidx + 2) % 256) AS DOUBLE) / 9 AS mean_b
    FROM px GROUP BY 1, 2, 3, 4
    """,
    doc="REAL image resize after REAL decode (the thumbnail / model-"
    "input-prep step): PPM/BMP payloads -> pure-Python decode -> "
    "nearest-neighbor resize to 3x3 (integer-exact source mapping "
    "(i*h)//3) -> exact channel means of the RESIZED pixels.  The "
    "oracle replays pixel formula + resize index arithmetic + the "
    "9-pixel sums analytically — a wrong resize index breaks the hash "
    "(operators/multimodal.py:resize_media)",
)
def pipe_multimodal_resize(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id")
    payload = multimodal.synthesize_media(d, "doc_id")
    return multimodal.resize_media(payload, "doc_id", out_h=3, out_w=3)


@register(
    "pipe_multimodal_audio_frames",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             1 + doc_id % 2 AS ch,
             256 + (doc_id % 7) * 64 AS n
      FROM documents),
    w AS (
      SELECT doc_id, ch, n, g.wk
      FROM p CROSS JOIN (SELECT unnest(range(0, 5)) AS wk) g
      WHERE g.wk * 128 < n)
    SELECT doc_id,
           CAST(wk AS INTEGER) AS window_idx,
           CAST(LEAST(n, (wk + 1) * 128) - wk * 128 AS INTEGER) AS n_frames_win,
           sqrt(CAST(list_sum(
                  [ x * x FOR x IN
                    [ ((doc_id*37 + 5*j) % 4096 - 2048)
                      FOR j IN range(wk * 128 * ch,
                                     LEAST(n, (wk + 1) * 128) * ch) ] ])
                AS DOUBLE)
                / ((LEAST(n, (wk + 1) * 128) - wk * 128) * ch)) AS rms
    FROM w
    """,
    doc="windowed audio features (the VAD/loudness-segmentation "
    "primitive): WAV decode -> per-128-frame window RMS, tail window "
    "keeping its TRUE frame count (padding would bias RMS low).  The "
    "oracle replays the sample formula per window analytically — a "
    "wrong window boundary or channel interleave breaks the hash "
    "(operators/multimodal.py:audio_frame_features)",
)
def pipe_multimodal_audio_frames(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select("doc_id")
    payload = multimodal.synthesize_audio(d, "doc_id")
    return multimodal.audio_frame_features(payload, "doc_id", frame_window=128)


@register(
    "pipe_multimodal_scenecut",
    oracle=f"""
    WITH f AS (
      SELECT d.doc_id, x.frame_id, x.mean_r, x.mean_g, x.mean_b
      FROM documents d
      JOIN read_parquet('{_VIDEO_EXPECTED}') x ON d.doc_id = x.doc_id
      WHERE d.doc_id < {_FIXTURE_DOC_LIMIT}
    ),
    l AS (
      SELECT doc_id, frame_id,
             ROUND(ABS(mean_r - LAG(mean_r) OVER w)
                   + ABS(mean_g - LAG(mean_g) OVER w)
                   + ABS(mean_b - LAG(mean_b) OVER w), 6) AS frame_diff
      FROM f
      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_id)
    )
    SELECT doc_id, frame_id, frame_diff,
           COALESCE(frame_diff > 30.0, FALSE) AS is_cut
    FROM l
    """,
    doc="scene-cut detection over the REAL video pipeline: LFV1 clips -> "
    "every-2nd-frame JPEG decode -> L1 distance of consecutive frames' "
    "channel means -> threshold flag (a clip's first frame is never a "
    "cut).  One LAG window per clip; the oracle runs the SAME window "
    "over the encoder-reconstruction fixture, so decode AND segmentation "
    "are hash-verified together "
    "(operators/multimodal.py:detect_scene_cuts)",
)
def pipe_multimodal_scenecut(spark, sf_dir):
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _FIXTURE_DOC_LIMIT)
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    payload = multimodal.synthesize_video(d, "doc_id")
    frames = multimodal.sample_video_frames(payload, every_k=2)
    return multimodal.detect_scene_cuts(frames, threshold=30.0)


# ---------------------------------------------------------------------------
# round-8 extensions: bloom decontamination, keyword extraction, weighted
# sampling, JL projection, distributed PCA
# ---------------------------------------------------------------------------

@register(
    "pipe_decontaminate_bloom",
    oracle=_DECON_ORACLE,
    doc="decontamination behind a Bloom prefilter "
    "(curation.decontaminate_bloom): the bench gram set becomes a "
    "16 KiB deterministic md5-probed bit array built by ONE bit_or "
    "groupBy; ~all non-bench corpus grams short-circuit in the "
    "map-side probe and only survivors reach the exact equi-join.  "
    "Output is IDENTICAL to pipe_decontaminate by construction (no "
    "false negatives; false positives die in the exact join) — the "
    "shared oracle IS the claim.  The 100 TB point: a 10^9-gram bench "
    "set is ~8 GB of hashes (unbroadcastable) but ~128 MB of bloom "
    "bits at 1% FP",
)
def pipe_decontaminate_bloom(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 7 == 0)
    return curation.decontaminate_bloom(d, bench, "doc_id", "text", n=3)


@register(
    "pipe_text_keywords",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           WHERE term != '' GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * ROUND(LN(CAST(n_docs + 1 AS DOUBLE) / (df + 1))
                              + 1.0, 6), 6) AS score
      FROM tf JOIN dfreq USING (term), nd
    ),
    r AS (SELECT doc_id, term, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term ASC) AS rank
          FROM scored)
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score
    FROM r WHERE rank <= 3
    """,
    doc="per-document keyword extraction: top-3 TF-IDF terms with "
    "deterministic (score desc, term asc) tie order — the per-doc dual "
    "of the hashing-trick embedding (text.top_terms_tfidf).  Two "
    "map-side-combinable aggs + a Zipf-bounded broadcast idf join + one "
    "per-doc ROW_NUMBER window",
)
def pipe_text_keywords(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.top_terms_tfidf(d, "doc_id", "text", k=3)


@register(
    "pipe_sample_weighted",
    oracle=r"""
    WITH w AS (
      SELECT source, doc_id,
             CAST(LENGTH(COALESCE(text, '')) AS DOUBLE) AS weight,
             ((CAST('0x' || substr(md5('13:' || CAST(doc_id AS VARCHAR)), 1, 14)
                    AS BIGINT) % 1000000) + 1) / 1000001.0 AS u
      FROM documents
    ),
    k AS (SELECT source, doc_id, weight,
                 ROUND(LN(u) / weight, 6) AS key
          FROM w WHERE weight > 0),
    r AS (SELECT source, doc_id, weight,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY key DESC, doc_id ASC) AS rank
          FROM k)
    SELECT source, doc_id, weight, CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= 20
    """,
    doc="weighted sampling WITHOUT replacement, 20 docs per source, "
    "weight = document length (token-mass-proportional selection — a "
    "uniform row sample under-represents long documents' tokens): the "
    "Efraimidis-Spirakis A-ES top-k by round(ln(u)/w, 6) with a "
    "deterministic md5 uniform (curation.weighted_reservoir_sample).  "
    "One row-local key projection + one per-stratum top-k window = a "
    "single shuffle; no driver reservoir state",
)
def pipe_sample_weighted(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("double").alias("weight"),
    )
    return curation.weighted_reservoir_sample(
        d, "doc_id", "weight", k=20, strata_col="source"
    )


@register(
    "pipe_embed_project",
    oracle="""
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    din AS (SELECT unnest(range(0, 64)) AS i),
    dout AS (SELECT unnest(range(0, 16)) AS j),
    m AS (
      SELECT i, j,
             CASE WHEN CAST('0x' || substr(md5('29:' || CAST(i AS VARCHAR)
                        || ':' || CAST(j AS VARCHAR)), 1, 1) AS BIGINT) % 2 = 0
                  THEN 0.25 ELSE -0.25 END AS w
      FROM din CROSS JOIN dout
    ),
    x AS (SELECT vec_id, d.i AS i, v[d.i + 1] AS x FROM e CROSS JOIN din d)
    SELECT x.vec_id, m.j AS pos,
           CAST(SUM(CAST(FLOOR(x.x * m.w * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e9 AS value
    FROM x JOIN m ON m.i = x.i
    GROUP BY 1, 2
    """,
    doc="Johnson-Lindenstrauss random projection 64 -> 16 dims "
    "(similarity.project_jl): deterministic Achlioptas ±1/sqrt(16) "
    "signs from md5(seed:i:j) — no RNG, the oracle rebuilds the "
    "identical matrix — with every output component an exact "
    "scaled-BIGINT sum of per-term contributions (partition-order-"
    "proof).  The 100 TB front-end for the whole ANN family: project "
    "once, land the 4x narrower vectors, index those.  Driver face is "
    "the posexploded long form (scalar-column contract)",
)
def pipe_embed_project(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    proj = similarity.project_jl(e, "vec_id", "embedding", out_dim=16, seed=29)
    return proj.select(
        "vec_id", F.posexplode("embedding").alias("pos", "value")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), "value")


def _pca_oracle(dim: int = 64, n_iters: int = 4) -> str:
    """DuckDB replay of operators/pca.py:pca_top_component — exact mean +
    covariance via scaled-BIGINT sums, then the power iteration UNROLLED
    (the kmeans/pagerank oracle pattern): each step is the identical
    ``floor(c*v*1e9+0.5)`` matvec, scaled norm, and ROUND(...,6)
    re-normalization the driver-side loop applies."""
    ctes = [
        "e AS (SELECT vec_id, embedding AS v FROM embeddings)",
        "nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e)",
        f"din AS (SELECT unnest(range(0, {dim})) AS i)",
        "x AS (SELECT vec_id, d.i AS i, v[d.i + 1] AS x FROM e CROSS JOIN din d)",
        """mu AS (SELECT i,
      CAST(SUM(CAST(FLOOR(x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9
        / (SELECT n FROM nd) AS mu
      FROM x GROUP BY i)""",
        "xc AS (SELECT x.vec_id, x.i, x.x - mu.mu AS x FROM x JOIN mu USING (i))",
        """c AS (SELECT a.i AS i, b.i AS j,
      CAST(SUM(CAST(FLOOR(a.x * b.x * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9
        / (SELECT n FROM nd) AS c
      FROM xc a JOIN xc b USING (vec_id) GROUP BY 1, 2)""",
        f"v0 AS (SELECT i AS j, ROUND(1.0 / SQRT({dim}), 6) AS val FROM din)",
    ]
    for t in range(1, n_iters + 1):
        ctes.append(
            f"""w{t} AS (SELECT c.i,
      CAST(SUM(CAST(FLOOR(c.c * v.val * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9 AS w
      FROM c JOIN v{t - 1} v ON v.j = c.j GROUP BY c.i)"""
        )
        ctes.append(
            f"""n{t} AS (SELECT SQRT(
      CAST(SUM(CAST(FLOOR(w * w * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) / 1e9) AS nm
      FROM w{t})"""
        )
        ctes.append(
            f"v{t} AS (SELECT i AS j, ROUND(w / (SELECT nm FROM n{t}), 6) AS val "
            f"FROM w{t})"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(j AS INTEGER) AS pos, val AS loading,
           ROUND((SELECT nm FROM n{n_iters}), 6) AS eigenvalue
    FROM v{n_iters}"""
    )


@register(
    "pipe_pca_top",
    oracle=_pca_oracle(dim=64, n_iters=4),
    doc="distributed PCA, top principal component (operators/pca.py): "
    "ONE Arrow crossing reduces the N x 64 embedding table to partial "
    "64x64 integer covariance sums (dim^2 keys shuffle, never the "
    "corpus), then 4 power-iteration steps run driver-side on the tiny "
    "matrix — but with engine-replayable arithmetic per step (scaled-"
    "BIGINT matvec + norm, ROUND(...,6) re-normalization), so the "
    "'iterative eigensolver' is hash-exact against the unrolled oracle.  "
    "The front-door to all-but-the-top embedding cleanup and PCA-"
    "whitened quantization; at 100 TB the corpus is touched exactly "
    "twice (mean + covariance pass)",
)
def pipe_pca_top(spark, sf_dir):
    from ..operators import pca

    e = table(spark, sf_dir, "embeddings")
    return pca.pca_top_component(e, "embedding", n_iters=4)


def _detop_oracle(dim: int = 64, n_iters: int = 4) -> str:
    """All-but-the-top replay: the unrolled PCA chain, then per-vector
    projection coefficients as scaled-BIGINT sums over the CENTERED
    components and the plain-IEEE element update."""
    base = _pca_oracle(dim, n_iters)
    head = base[: base.index("\n    SELECT CAST(j AS INTEGER)")]
    return (
        head
        + f""",
    dots AS (SELECT xc.vec_id,
      CAST(SUM(CAST(FLOOR(xc.x * v.val * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1e9 AS d
      FROM xc JOIN v{n_iters} v ON v.j = xc.i GROUP BY 1)
    SELECT xc.vec_id, xc.i AS pos, xc.x - d.d * v.val AS value
    FROM xc
    JOIN dots d USING (vec_id)
    JOIN v{n_iters} v ON v.j = xc.i"""
    )


@register(
    "pipe_embed_detop",
    oracle=_detop_oracle(dim=64, n_iters=4),
    doc="all-but-the-top embedding cleanup (Mu & Viswanath, ICLR 2018): "
    "center the table and remove each vector's projection on the top "
    "principal component — the dominant direction carries frequency, "
    "not meaning, and stripping it sharpens cosine similarity for the "
    "whole ANN/semdedup family downstream.  Composes "
    "pca.top_component_values (covariance computed ONCE) with "
    "pca.remove_component (one Arrow crossing, zero shuffles); the "
    "oracle replays the entire chain — unrolled power iteration "
    "included — and hash-matches bit for bit.  Driver face is the "
    "posexploded long form",
)
def pipe_embed_detop(spark, sf_dir):
    from ..operators import pca

    e = table(spark, sf_dir, "embeddings")
    v, _lam, mu, n = pca.top_component_values(e, "embedding", n_iters=4)
    if n == 0:
        return spark.createDataFrame([], "vec_id long, pos long, value double")
    stripped = pca.remove_component(e, "vec_id", "embedding", v, mean=mu)
    return stripped.select(
        "vec_id", F.posexplode("embedding").alias("pos", "value")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), "value")


@register(
    "pipe_sketch_cms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ),
    t AS (SELECT term FROM toks WHERE term != ''),
    rows3 AS (SELECT unnest(range(0, 3)) AS p),
    cells AS (
      SELECT p.p AS row,
             CAST('0x' || substr(md5('47:' || term), p.p * 6 + 1, 6) AS BIGINT)
               % 1024 AS col,
             COUNT(*) AS cnt
      FROM t CROSS JOIN rows3 p
      GROUP BY 1, 2
    ),
    probe AS (SELECT DISTINCT term FROM toks WHERE doc_id < 5 AND term != ''),
    est AS (
      SELECT pr.term, MIN(COALESCE(c.cnt, 0)) AS cms_count
      FROM probe pr CROSS JOIN rows3 p
      LEFT JOIN cells c ON c.row = p.p
        AND c.col = CAST('0x' || substr(md5('47:' || pr.term), p.p * 6 + 1, 6)
                         AS BIGINT) % 1024
      GROUP BY 1
    ),
    truth AS (SELECT term, COUNT(*) AS true_count FROM t GROUP BY 1)
    SELECT e.term, e.cms_count, tr.true_count,
           e.cms_count >= tr.true_count AS no_undercount
    FROM est e JOIN truth tr USING (term)
    """,
    doc="count-min sketch frequency estimation (operators/sketch.py): the "
    "token stream collapses into a fixed 3x1024 counter grid — the "
    "groupBy key space is the CELL grid, bounded however large or "
    "skewed the stream, and partial aggregation IS the sketch merge.  "
    "Probe = the first five documents' vocabulary; output carries the "
    "estimate, the exact count, and the CMS one-sided guarantee "
    "(estimate >= truth) as a visible column.  Deterministic md5 probe "
    "rows, so the overestimates themselves are hash-exact vs the "
    "oracle.  At 100 TB: exact vocab tables grow with the vocabulary; "
    "the sketch is kilobytes",
)
def pipe_sketch_cms(spark, sf_dir):
    from ..operators import sketch

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    stream = toks.select("term")
    sk = sketch.cms_build(stream, "term", w=1024, d=3, seed=47)
    probe = toks.where(F.col("doc_id") < 5).select("term").distinct()
    est = sketch.cms_estimate(sk, probe, "term", w=1024, d=3, seed=47)
    truth = stream.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    return est.join(truth, "term").select(
        "term",
        "cms_count",
        "true_count",
        (F.col("cms_count") >= F.col("true_count")).alias("no_undercount"),
    )


@register(
    "pipe_sketch_hll",
    oracle="""
    SELECT event_type AS stratum,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS stratum,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS est_within_5pct
    FROM events
    """,
    doc="mergeable HLL distinct-count sketches (sketch.hll_sketches / "
    "hll_estimate, the Spark-4 DataSketches surface): one KB-sized "
    "sketch per event_type, then the GLOBAL cardinality estimated from "
    "the per-stratum sketches ALONE (hll_union_agg — the raw data is "
    "never re-read; the 'ALL' row is the merge property made visible).  "
    "Sketch binaries are engine-specific, so the face verifies every "
    "estimate against the exact distinct within the lg_k=12 error "
    "bound (the rel_approx_sketch boolean pattern); at 100 TB the "
    "per-day/per-source sketch table replaces COUNT(DISTINCT) re-scans",
)
def pipe_sketch_hll(spark, sf_dir):
    from ..operators import sketch

    ev = table(spark, sf_dir, "events")
    sk = sketch.hll_sketches(ev, "event_type", "user_id", lg_k=12)
    within = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= 0.05 * exact
    )
    exact_per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    per = (
        sketch.hll_estimate(sk, ["event_type"])
        .join(exact_per, "event_type")
        .select(
            F.col("event_type").alias("stratum"),
            "exact_distinct",
            within(F.col("n_distinct_est"), F.col("exact_distinct")).alias(
                "est_within_5pct"
            ),
        )
    )
    exact_all = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    glob = (
        sketch.hll_estimate(sk)
        .crossJoin(exact_all)
        .select(
            F.lit("ALL").alias("stratum"),
            "exact_distinct",
            within(F.col("n_distinct_est"), F.col("exact_distinct")).alias(
                "est_within_5pct"
            ),
        )
    )
    return per.unionAll(glob)


@register(
    "pipe_sketch_quantile",
    oracle=r"""
    WITH binned AS (
      SELECT event_type AS stratum,
             CAST(LEAST(63, GREATEST(0,
                  CAST(FLOOR((value - 0.0) / 8.0) AS INT))) AS INT) AS bin,
             COUNT(*) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    strata AS (
      SELECT stratum, bin, cnt,
             SUM(cnt) OVER (PARTITION BY stratum ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY stratum) AS total
      FROM binned
    ),
    gbins AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt
              FROM binned GROUP BY bin),
    gmerged AS (
      SELECT 'ALL' AS stratum, bin, cnt,
             SUM(cnt) OVER (ORDER BY bin) AS cum,
             SUM(cnt) OVER () AS total
      FROM gbins
    ),
    allrows AS (SELECT * FROM strata UNION ALL SELECT * FROM gmerged),
    qs AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q)
    SELECT stratum, q,
           0.0 + 8.0 * (CAST(bin AS DOUBLE)
             + (q * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
               / CAST(cnt AS DOUBLE)) AS est
    FROM allrows, qs
    WHERE CAST(cum AS DOUBLE) >= q * CAST(total AS DOUBLE)
      AND CAST(cum - cnt AS DOUBLE) < q * CAST(total AS DOUBLE)
    """,
    doc="mergeable quantile histograms (sketch.hist_sketch / "
    "hist_quantiles — the third mergeable-summary leg after CMS and "
    "HLL): per-event-type p50/p90/p99 of value over a fixed 64-bin "
    "[0,512) grid, plus the GLOBAL quantiles computed from the "
    "per-stratum bin rows ALONE (the 'ALL' rows are the merge property "
    "made visible — the raw data is never re-sorted).  Counts are "
    "integers and the interpolation is row-level IEEE arithmetic, so "
    "unlike the HLL face the ESTIMATES themselves hash-compare "
    "bit-for-bit; max error is one bin width by construction",
)
def pipe_sketch_quantile(spark, sf_dir):
    from ..operators import sketch

    ev = table(spark, sf_dir, "events")
    sk = sketch.hist_sketch(ev, "event_type", "value", lo=0.0, hi=512.0, n_bins=64)
    qs = [0.5, 0.9, 0.99]
    per = sketch.hist_quantiles(
        sk, qs, lo=0.0, hi=512.0, n_bins=64, group_cols=["event_type"]
    ).select(F.col("event_type").alias("stratum"), "q", "est")
    glob = sketch.hist_quantiles(sk, qs, lo=0.0, hi=512.0, n_bins=64).select(
        F.lit("ALL").alias("stratum"), "q", "est"
    )
    return per.unionAll(glob)


@register(
    "pipe_sketch_append",
    oracle=r"""
    WITH perday AS (
      SELECT event_type AS stratum,
             epoch_us(ts) // 86400000000 AS day,
             CAST(LEAST(63, GREATEST(0,
                  CAST(FLOOR((value - 0.0) / 8.0) AS INT))) AS INT) AS bin,
             COUNT(*) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    binned AS (SELECT stratum, bin, CAST(SUM(cnt) AS BIGINT) AS cnt
               FROM perday GROUP BY 1, 2),
    ndays AS (SELECT COUNT(DISTINCT day) AS n_days FROM perday),
    strata AS (
      SELECT stratum, bin, cnt,
             SUM(cnt) OVER (PARTITION BY stratum ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY stratum) AS total
      FROM binned
    ),
    gbins AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt
              FROM binned GROUP BY bin),
    gmerged AS (
      SELECT 'ALL' AS stratum, bin, cnt,
             SUM(cnt) OVER (ORDER BY bin) AS cum,
             SUM(cnt) OVER () AS total
      FROM gbins
    ),
    allrows AS (SELECT * FROM strata UNION ALL SELECT * FROM gmerged),
    qs AS (SELECT UNNEST([0.5, 0.99]) AS q)
    SELECT stratum, q,
           0.0 + 8.0 * (CAST(bin AS DOUBLE)
             + (q * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
               / CAST(cnt AS DOUBLE)) AS est,
           n_days
    FROM allrows, qs, ndays
    WHERE CAST(cum AS DOUBLE) >= q * CAST(total AS DOUBLE)
      AND CAST(cum - cnt AS DOUBLE) < q * CAST(total AS DOUBLE)
    """,
    doc="the maintained sketch-store pattern end-to-end in batch "
    "(sketch.sketch_append_batch semantics via the pure "
    "sketch_cells_of merge): every DAILY per-event-type histogram "
    "append is built in one pass (hist_sketch extra_group_cols=[day], "
    "day = epoch-micros div 86400000000 — TZ-proof), the earliest "
    "day's append is deliberately REPLAYED (union of identical "
    "store rows), and the store merge must collapse the replay per "
    "(cell, batch_id) before summing — so the p50/p99 per stratum "
    "plus merged-global 'ALL' rows equal the one-pass sketch's "
    "quantiles exactly, which is what the oracle computes.  A broken "
    "dedup double-counts the replayed day and hash-mismatches.  "
    "n_days proves the store really merged multiple appends.  "
    "Integer cells + IEEE interpolation keep every estimate "
    "hash-exact (the pipe_sketch_quantile recipe); the streaming "
    "twin and fenced compaction are pytest-verified in "
    "tests/test_streaming.py",
)
def pipe_sketch_append(spark, sf_dir):
    from ..operators import sketch
    from ..streaming.events import ts_micros_col

    ev = table(spark, sf_dir, "events")
    evd = ev.withColumn(
        "day", (ts_micros_col(ev) / F.lit(86400000000)).cast("long")
    )
    # every daily append in one pass, in store-row shape
    store = sketch.hist_sketch(
        evd, "event_type", "value", lo=0.0, hi=512.0, n_bins=64,
        extra_group_cols=["day"],
    ).select(
        "event_type",
        "bin",
        "cnt",
        F.col("day").alias("batch_id"),
        F.lit("raw").alias("segment"),
    )
    # a replayed append: the earliest day's rows land a second time,
    # byte-identical (1-row broadcast join, no collect)
    earliest = store.groupBy().agg(F.min("batch_id").alias("batch_id"))
    replay = store.join(F.broadcast(earliest), "batch_id").select(
        *store.columns
    )
    cells = sketch.sketch_cells_of(store.unionByName(replay))
    qs = [0.5, 0.99]
    per = sketch.hist_quantiles(
        cells, qs, lo=0.0, hi=512.0, n_bins=64, group_cols=["event_type"]
    ).select(F.col("event_type").alias("stratum"), "q", "est")
    glob = sketch.hist_quantiles(
        cells, qs, lo=0.0, hi=512.0, n_bins=64
    ).select(F.lit("ALL").alias("stratum"), "q", "est")
    n_days = store.agg(F.countDistinct("batch_id").alias("n_days"))
    return per.unionAll(glob).crossJoin(F.broadcast(n_days))


#: Shared oracle CTE chain replaying NB training + argmax scoring
#: (nbayes.train_naive_bayes / apply_naive_bayes on documents.source);
#: ends at `ranked` — (doc_id, label, score_micro, rn), rn=1 is the
#: prediction.  Used by pipe_nb_domain and the pipe_mixture_domain
#: composition.
_NB_RANKED = r"""
    WITH tk AS (
      SELECT doc_id, source AS label,
             unnest(string_split_regex(lower(text), '\s+')) AS token
      FROM documents
    ),
    toks AS (SELECT doc_id, label, token FROM tk WHERE token <> ''),
    counts AS (SELECT label, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    vocab AS (SELECT DISTINCT token FROM counts),
    vsize AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM vocab),
    tc AS (SELECT label, CAST(SUM(c) AS BIGINT) AS tc
           FROM counts GROUP BY label),
    classes AS (SELECT source AS label, COUNT(*) AS n_docs
                FROM documents GROUP BY 1),
    ntot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    priors AS (
      SELECT label,
             CAST(FLOOR(ROUND(LN(CAST(n_docs AS DOUBLE) / n), 6)
                        * 1000000.0 + 0.5) AS BIGINT) AS prior_micro
      FROM classes, ntot
    ),
    model AS (
      SELECT cl.label, vb.token,
             CAST(FLOOR(ROUND(LN(
                    (CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0)
                    / (CAST(t.tc AS DOUBLE) + 1.0 * v.v)), 6)
                  * 1000000.0 + 0.5) AS BIGINT) AS lp_micro
      FROM classes cl
      CROSS JOIN vocab vb
      LEFT JOIN counts c ON c.label = cl.label AND c.token = vb.token
      JOIN tc t ON t.label = cl.label, vsize v
    ),
    tokscore AS (
      SELECT tks.doc_id, m.label,
             CAST(SUM(m.lp_micro) AS BIGINT) AS tok_micro
      FROM toks tks JOIN model m ON m.token = tks.token
      GROUP BY 1, 2
    ),
    scoredall AS (
      SELECT d.doc_id, p.label,
             p.prior_micro + COALESCE(ts.tok_micro, 0) AS score_micro
      FROM documents d
      CROSS JOIN priors p
      LEFT JOIN tokscore ts
        ON ts.doc_id = d.doc_id AND ts.label = p.label
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score_micro DESC, label ASC) AS rn
      FROM scoredall
    )"""


@register(
    "pipe_nb_domain",
    oracle=_NB_RANKED
    + """
    SELECT doc_id, label AS pred, score_micro FROM ranked WHERE rn = 1
    """,
    doc="in-engine multinomial Naive Bayes domain classifier "
    "(nbayes.train_naive_bayes / apply_naive_bayes): train "
    "P(token|source) with add-1 smoothing over the documents table — "
    "the CLOSED-FORM trained model beside the iterative probe; the "
    "whole fit is one map-side-combinable token-count aggregation — "
    "then argmax-posterior every doc (self-classification face: the "
    "DSIR/CCNet-style domain router used for mixture reweighting).  "
    "Log-probs are ROUND(LN(...),6) then summed as scaled BIGINTs, so "
    "the per-doc scores and deterministic (score DESC, label ASC) "
    "argmax hash-compare exactly; the oracle replays training AND "
    "scoring end-to-end",
)
def pipe_nb_domain(spark, sf_dir):
    from ..operators import nbayes

    d = table(spark, sf_dir, "documents")
    priors, model = nbayes.train_naive_bayes(d, "source", "text")
    return nbayes.apply_naive_bayes(d, "doc_id", "text", priors, model)


@register(
    "pipe_dsir_select",
    oracle=r"""
    WITH rawtk AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    rawg AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('17:' || gram), 1, 14) AS BIGINT)
               % 1024 AS bucket
      FROM (SELECT doc_id,
                   unnest(list_concat(tk,
                     [tk[j] || ' ' || tk[j+1] FOR j IN range(1, len(tk))]))
                     AS gram
            FROM rawtk)
    ),
    tgtg AS (
      SELECT CAST('0x' || substr(md5('17:' || gram), 1, 14) AS BIGINT)
               % 1024 AS bucket
      FROM (SELECT unnest(list_concat(tk,
                     [tk[j] || ' ' || tk[j+1] FOR j IN range(1, len(tk))]))
                     AS gram
            FROM rawtk WHERE source = 'src0')
    ),
    cr AS (SELECT bucket, COUNT(*) AS cr FROM rawg GROUP BY bucket),
    ct AS (SELECT bucket, COUNT(*) AS ct FROM tgtg GROUP BY bucket),
    tr AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr FROM cr),
    tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt FROM ct),
    ratios AS (
      SELECT cr.bucket,
             CAST(FLOOR(ROUND(LN(
                    (CAST(COALESCE(ct.ct, 0) AS DOUBLE) + 1.0)
                    / (CAST(tt.tt AS DOUBLE) + 1024.0)), 6)
                  * 1000000.0 + 0.5) AS BIGINT)
             - CAST(FLOOR(ROUND(LN(
                    (CAST(cr.cr AS DOUBLE) + 1.0)
                    / (CAST(tr.tr AS DOUBLE) + 1024.0)), 6)
                  * 1000000.0 + 0.5) AS BIGINT) AS ratio_micro
      FROM cr LEFT JOIN ct USING (bucket), tr, tt
    ),
    sums AS (
      SELECT g.doc_id, CAST(SUM(r.ratio_micro) AS BIGINT) AS logw_micro
      FROM rawg g JOIN ratios r USING (bucket) GROUP BY g.doc_id
    ),
    weights AS (
      SELECT d.doc_id, COALESCE(s.logw_micro, 0) AS logw_micro
      FROM documents d LEFT JOIN sums s USING (doc_id)
    ),
    keyed AS (
      SELECT doc_id, logw_micro,
             (CAST(logw_micro AS DOUBLE) / 1000000.0)
             + ROUND(-LN(-LN(
                 ((CAST('0x' || substr(md5('13:' || CAST(doc_id AS VARCHAR)),
                        1, 14) AS BIGINT) % 1000000) + 1) / 1000001.0)), 6)
               AS key
      FROM weights
    )
    SELECT doc_id, logw_micro, rank
    FROM (SELECT doc_id, logw_micro,
                 ROW_NUMBER() OVER (ORDER BY key DESC, doc_id ASC) AS rank
          FROM keyed)
    WHERE rank <= 25
    """,
    doc="DSIR data selection (Xie et al. 2023, curation.dsir_weights / "
    "dsir_select): importance log-weights log p_target − log p_raw "
    "under two hashed unigram+bigram bag models (1024 md5 buckets — "
    "the vocabulary is bounded BY CONSTRUCTION, the paper's trick), "
    "then a Gumbel-top-k resample of 25 docs ∝ exp(logw) toward the "
    "src0 target domain.  Bucket log-probs are ROUND(LN,6) micro-int "
    "differences and the Gumbel uses the A-ES deterministic md5 "
    "uniform, so the weights, the draw, and the ranks all replay "
    "hash-exactly; the ratio table broadcasts (≤1024 rows) and "
    "selection is a map-side partial top-k window",
)
def pipe_dsir_select(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    target = d.where(F.col("source") == "src0")
    return curation.dsir_select(
        d, target, "doc_id", "text", k=25, n_buckets=1024
    )


@register(
    "pipe_mixture_domain",
    oracle=_NB_RANKED
    + """,
    nbpred AS (SELECT doc_id, label AS pred FROM ranked WHERE rn = 1),
    t AS (
      SELECT d.doc_id, p.pred, d.n_chars,
             ROUND((CAST('0x' || substr(md5('19:' ||
                    CAST(d.doc_id AS VARCHAR)), 1, 14) AS BIGINT)
                    % 1000000) / CAST(1000000 AS DOUBLE), 6) AS u
      FROM documents d JOIN nbpred p USING (doc_id)
    ),
    c AS (SELECT pred, CAST(SUM(n_chars) AS BIGINT) AS st FROM t GROUP BY 1),
    tt AS (SELECT CAST(SUM(st) AS BIGINT) AS tot FROM c),
    w AS (SELECT pred, st,
                 ROUND(POWER(CAST(st AS DOUBLE) / tot, 0.5), 6) AS w
          FROM c, tt),
    ws AS (SELECT CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS wsum
           FROM w),
    r AS (SELECT pred,
                 ROUND(LEAST(CAST(1.0 AS DOUBLE),
                             (w / wsum) * 200000 / st), 6) AS sample_rate
          FROM w, ws)
    SELECT t.doc_id, t.pred, r.sample_rate, t.u
    FROM t JOIN r ON r.pred = t.pred
    WHERE t.u < r.sample_rate
    """,
    doc="domain-routed mixture sampling — the CCNet/DSIR loop CLOSED in "
    "one chain: the in-engine NB classifier assigns every document a "
    "PREDICTED domain, then temperature mixture sampling (T=2) "
    "reweights over those predictions instead of trusted labels — the "
    "production shape, where incoming web data has no source labels "
    "and the router's output IS the stratum.  The oracle replays NB "
    "training, argmax routing, and the temperature chain end-to-end; "
    "composes pipe_nb_domain with the pipe_mixture_temperature "
    "machinery (model broadcast + tiny rate table broadcast — the "
    "corpus crosses once per stage)",
)
def pipe_mixture_domain(spark, sf_dir):
    from ..operators import nbayes

    d = table(spark, sf_dir, "documents")
    priors, model = nbayes.train_naive_bayes(d, "source", "text")
    # Pin the per-doc predictions (3 narrow columns): the temperature
    # chain consumes the routed frame twice (stratum counts + the
    # keep-join), and without the pin each consumer re-ran the whole
    # NB scoring tokenize/explode/argmax — the baseline plan carried
    # FIVE copies of the apply subtree (50 parquet scans).  One
    # materialization, every consumer reads stored partitions.
    from ..operators.fanout import pin

    pred = pin(nbayes.apply_naive_bayes(d, "doc_id", "text", priors, model))
    routed = d.join(pred.select("doc_id", "pred"), "doc_id")
    kept = curation.temperature_mixture_sample(
        routed, "pred", "doc_id", "n_chars", temperature=2.0,
        token_budget=200_000, seed=19,
    )
    return kept.select("doc_id", "pred", "sample_rate", "u")


@register(
    "pipe_privacy_kanon",
    oracle=r"""
    WITH q AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(FLOOR(value / 50.0) AS BIGINT) AS vbucket,
             user_id
      FROM events
    ),
    classes AS (
      SELECT event_type, day, vbucket, COUNT(*) AS sz,
             COUNT(DISTINCT user_id) AS ndiv
      FROM q GROUP BY 1, 2, 3
    )
    SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
           COUNT(*) AS n_classes,
           CAST(MIN(sz) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           (CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             * 1000000) // CAST(SUM(sz) AS BIGINT) AS risk_ppm,
           CAST(MIN(ndiv) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN ndiv < 2 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_homogeneous
    FROM classes
    """,
    doc="k-anonymity / l-diversity release-gate report "
    "(privacy.k_anonymity_report): equivalence classes over the "
    "(event_type, day, value-bucket) quasi-identifiers with user_id as "
    "the sensitive attribute — rows in classes smaller than k=5 are "
    "re-identifiable to within 5 candidates, classes with fewer than "
    "l=2 distinct users leak the user even when k-anonymous (the "
    "homogeneity attack).  One map-side-combinable groupBy + a bounded "
    "agg over the class-size table; risk_ppm is an exact integer ratio "
    "(div == //), so the whole report hash-verifies.  The structured "
    "sibling of detect/redact_pii: those strip identifiers from text, "
    "this measures the joinability of what remains",
)
def pipe_privacy_kanon(spark, sf_dir):
    from ..operators import privacy
    from ..streaming.events import ts_micros_col

    ev = table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        (ts_micros_col(ev) / F.lit(86400000000)).cast("long").alias("day"),
        F.floor(F.col("value") / F.lit(50.0)).alias("vbucket"),
        "user_id",
    )
    return privacy.k_anonymity_report(
        q,
        ["event_type", "day", "vbucket"],
        k=5,
        sensitive_col="user_id",
        l_threshold=2,
    )


@register(
    "pipe_sketch_joinsize",
    oracle=r"""
    WITH rows3 AS (SELECT unnest(range(0, 3)) AS p),
    ca AS (
      SELECT p.p AS row,
             CAST('0x' || substr(md5('47:' || CAST(user_id AS VARCHAR)),
                  p.p * 6 + 1, 6) AS BIGINT) % 1024 AS col,
             COUNT(*) AS cnt_a
      FROM events CROSS JOIN rows3 p WHERE event_type = 'click'
      GROUP BY 1, 2
    ),
    cb AS (
      SELECT p.p AS row,
             CAST('0x' || substr(md5('47:' || CAST(user_id AS VARCHAR)),
                  p.p * 6 + 1, 6) AS BIGINT) % 1024 AS col,
             COUNT(*) AS cnt_b
      FROM events CROSS JOIN rows3 p WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    dots AS (
      SELECT ca.row, CAST(SUM(ca.cnt_a * cb.cnt_b) AS BIGINT) AS dot
      FROM ca JOIN cb ON cb.row = ca.row AND cb.col = ca.col
      GROUP BY ca.row
    ),
    est AS (
      SELECT CAST(MIN(COALESCE(d.dot, 0)) AS BIGINT) AS join_size_est
      FROM rows3 p LEFT JOIN dots d ON d.row = p.p
    ),
    exact AS (
      SELECT CAST(SUM(a.na * b.nb) AS BIGINT) AS exact_join_size
      FROM (SELECT user_id, COUNT(*) AS na FROM events
            WHERE event_type = 'click' GROUP BY 1) a
      JOIN (SELECT user_id, COUNT(*) AS nb FROM events
            WHERE event_type = 'purchase' GROUP BY 1) b USING (user_id)
    )
    SELECT e.join_size_est, x.exact_join_size,
           e.join_size_est >= x.exact_join_size AS never_undercounts
    FROM est e, exact x
    """,
    doc="join-cardinality estimation from CMS sketches alone "
    "(sketch.cms_join_size — the Cormode-Muthukrishnan inner product): "
    "|clicks JOIN purchases ON user_id| estimated as the MIN over hash "
    "rows of the cell-wise product of the two 3x1024 sketches — two "
    "KB-sized tables join and reduce to ONE row, the raw events are "
    "never re-joined.  Collisions only ADD cross terms, so the "
    "estimate is one-sided (>= true), carried as a verified column "
    "beside the exact size; integer arithmetic end to end, so the "
    "estimate itself is hash-exact.  The 100 TB use is join PLANNING: "
    "pick shuffle partitions / salting / broadcast from sketches "
    "without scanning either side",
)
def pipe_sketch_joinsize(spark, sf_dir):
    from ..operators import sketch

    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    purch = ev.where(F.col("event_type") == "purchase").select("user_id")
    sa = sketch.cms_build(clicks, "user_id", w=1024, d=3, seed=47)
    sb = sketch.cms_build(purch, "user_id", w=1024, d=3, seed=47)
    est = sketch.cms_join_size(sa, sb, d=3)
    exact = (
        clicks.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("na"))
        .join(
            purch.groupBy("user_id").agg(F.count(F.lit(1)).alias("nb")),
            "user_id",
        )
        .agg(F.sum(F.col("na") * F.col("nb")).alias("exact_join_size"))
    )
    return est.crossJoin(exact).select(
        "join_size_est",
        "exact_join_size",
        (F.col("join_size_est") >= F.col("exact_join_size")).alias(
            "never_undercounts"
        ),
    )


def _bt_oracle(epochs: int = 3) -> str:
    """Unrolled replay of the pipe_bt_sources chain: type-token-ratio
    scoring, length-decile contexts, preference-pair construction,
    cross-source win/pair counts, then ``epochs`` Bradley-Terry MM
    updates (btrank.bt_strengths) with the scaled-int term sums and the
    DECIMAL(28,6) mean-1 rescale — the same unrolled-CTE recipe as the
    probe trainer and the PCA power iteration."""
    head = r"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             ROUND(CAST(len(list_distinct(tk)) AS DOUBLE)
                   / CAST(len(tk) AS DOUBLE), 6) AS ttr
      FROM (SELECT doc_id, source, n_chars,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> x <> '') AS tk
            FROM documents)
      WHERE len(tk) > 0
    ),
    ctxd AS (
      SELECT doc_id, source, ttr,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS grp
      FROM scored
    ),
    ranked AS (
      SELECT grp, doc_id, source, ttr,
             ROW_NUMBER() OVER (PARTITION BY grp
                                ORDER BY ttr DESC, doc_id ASC) AS rk,
             COUNT(*) OVER (PARTITION BY grp) AS m
      FROM ctxd
    ),
    prs AS (
      SELECT c.source AS winner, r.source AS loser
      FROM (SELECT grp, rk AS pr, source, ttr AS cs FROM ranked
            WHERE rk <= 5 AND 2 * rk <= m) c
      JOIN (SELECT grp, m + 1 - rk AS pr, source, ttr AS rs
            FROM ranked) r
        ON r.grp = c.grp AND r.pr = c.pr
      WHERE c.cs - r.rs >= 0.000001 AND c.source <> r.source
    ),
    dir AS (SELECT winner AS w, loser AS l, COUNT(*) AS n
            FROM prs GROUP BY 1, 2),
    wins AS (SELECT w AS item, CAST(SUM(n) AS BIGINT) AS wins
             FROM dir GROUP BY w),
    und AS (SELECT LEAST(w, l) AS a, GREATEST(w, l) AS b,
                   CAST(SUM(n) AS BIGINT) AS n
            FROM dir GROUP BY 1, 2),
    sym AS (SELECT a AS i, b AS j, n FROM und
            UNION ALL SELECT b AS i, a AS j, n FROM und),
    kk AS (SELECT CAST(COUNT(DISTINCT i) AS DOUBLE) AS k FROM sym),
    g0 AS (SELECT DISTINCT i, 1.0 AS g FROM sym)"""
    step = r""",
    e{e} AS (
      SELECT s.i,
             ROUND(CAST(COALESCE(MAX(w.wins), 0) AS DOUBLE)
                   / (CAST(SUM(CAST(FLOOR(CAST(s.n AS DOUBLE)
                          / (gi.g + gj.g) * 1000000000.0 + 0.5)
                        AS BIGINT)) AS BIGINT) / 1000000000.0), 6) AS graw
      FROM sym s
      JOIN g{p} gi ON gi.i = s.i
      JOIN g{p} gj ON gj.i = s.j
      LEFT JOIN wins w ON w.item = s.i
      GROUP BY s.i
    ),
    n{e} AS (SELECT CAST(SUM(CAST(graw AS DECIMAL(28,6))) AS DOUBLE) AS s
             FROM e{e}),
    g{e} AS (SELECT i, ROUND(graw * k / s, 6) AS g FROM e{e}, n{e}, kk)"""
    tail = r"""
    SELECT g.i AS item, g.g AS strength6,
           COALESCE(w.wins, 0) AS wins, p.n_pairs
    FROM g{E} g
    LEFT JOIN wins w ON w.item = g.i
    JOIN (SELECT i, CAST(SUM(n) AS BIGINT) AS n_pairs
          FROM sym GROUP BY i) p ON p.i = g.i"""
    return (
        head
        + "".join(step.format(e=e, p=e - 1) for e in range(1, epochs + 1))
        + tail.format(E=epochs)
    )


@register(
    "pipe_bt_sources",
    oracle=_bt_oracle(epochs=3),
    doc="in-engine Bradley-Terry preference-strength fitting "
    "(btrank.bt_strengths, Hunter 2004 MM — the third trained-model "
    "family: iterative MM on SUFFICIENT STATISTICS): rank the 20 "
    "sources by pairwise type-token-ratio wins inside length-decile "
    "contexts (preference_pairs constructs the cross-source duels), "
    "3 MM epochs with per-term scaled-BIGINT denominator sums and the "
    "DECIMAL(28,6) mean-1 rescale, all unrolled in the oracle — "
    "hash-exact like the probe trainer.  Corpus-scale work is two "
    "aggregations (win counts + pair-count matrix); driver state is "
    "O(items²) over the ARMS being ranked, refused loudly past "
    "max_items",
)
def pipe_bt_sources(spark, sf_dir):
    from pyspark.sql.window import Window

    from ..operators import btrank

    d = table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    scored = (
        d.select("doc_id", "source", "n_chars", tk.alias("_tk"))
        .where(F.size("_tk") > 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(
                F.size(F.array_distinct("_tk")).cast("double")
                / F.size("_tk").cast("double"),
                6,
            ).alias("ttr"),
        )
    )
    ctxd = scored.withColumn(
        "ctx", F.ntile(10).over(Window.orderBy("n_chars", "doc_id"))
    )
    pairs = curation.preference_pairs(
        ctxd, "ctx", "doc_id", "ttr", max_pairs_per_group=5, margin=1e-6
    )
    src = d.select("doc_id", "source")
    wl = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("chosen_id"),
                F.col("source").alias("winner"),
            ),
            "chosen_id",
        )
        .join(
            src.select(
                F.col("doc_id").alias("rejected_id"),
                F.col("source").alias("loser"),
            ),
            "rejected_id",
        )
        .where(F.col("winner") != F.col("loser"))
    )
    out, _hist = btrank.bt_strengths(wl, "winner", "loser", epochs=3)
    return out


def _jl_topk_oracle(
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 29,
    n_queries: int = 20,
    depth: int = 10,
    k: int = 3,
) -> str:
    """Replay of similarity.topk_cosine_jl: rebuild the md5-sign matrix,
    project with scaled-BIGINT sums, shortlist by projected cosine, exact
    re-rank on the shortlist only."""
    scale = 1.0 / (out_dim ** 0.5)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    din AS (SELECT unnest(range(0, {in_dim})) AS i),
    dout AS (SELECT unnest(range(0, {out_dim})) AS j),
    m AS (
      SELECT i, j,
             CASE WHEN CAST('0x' || substr(md5('{seed}:' || CAST(i AS VARCHAR)
                        || ':' || CAST(j AS VARCHAR)), 1, 1) AS BIGINT) % 2 = 0
                  THEN {scale!r} ELSE {-scale!r} END AS w
      FROM din CROSS JOIN dout
    ),
    x AS (SELECT vec_id, d.i AS i, v[d.i + 1] AS x FROM e CROSS JOIN din d),
    p AS (
      SELECT x.vec_id, m.j AS j,
             CAST(SUM(CAST(FLOOR(x.x * m.w * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e9 AS val
      FROM x JOIN m ON m.i = x.i GROUP BY 1, 2
    ),
    pv AS (SELECT vec_id, list(val ORDER BY j) AS v FROM p GROUP BY vec_id),
    qp AS (SELECT * FROM pv WHERE vec_id < {n_queries}),
    short AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.v, c.v)
                   / (sqrt(list_inner_product(q.v, q.v))
                      * sqrt(list_inner_product(c.v, c.v))), 6) AS cos_p
      FROM qp q JOIN pv c ON q.vec_id <> c.vec_id
    ),
    sl AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_p DESC, neighbor_id) AS rn
        FROM short) t
      WHERE rn <= {depth}
    ),
    rescored AS (
      SELECT sl.query_id, sl.neighbor_id,
             ROUND(list_inner_product(qe.v, ce.v)
                   / (sqrt(list_inner_product(qe.v, qe.v))
                      * sqrt(list_inner_product(ce.v, ce.v))), 6) AS cos_sim
      FROM sl
      JOIN e qe ON qe.vec_id = sl.query_id
      JOIN e ce ON ce.vec_id = sl.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM rescored) t
    WHERE rn <= {k}
    """


@register(
    "pipe_sim_topk_jl",
    oracle=_jl_topk_oracle(depth=25),
    doc="JL-compressed shortlist + exact re-rank (the projection analogue "
    "of IVF-PQ+R): candidates score in the 16-dim projected space (4x "
    "fewer multiplies per pair), depth-25 shortlist per query, exact "
    "64-dim cosine re-scores the shortlist ONLY "
    "(similarity.topk_cosine_jl).  The full replay — md5 sign matrix, "
    "scaled-int projection, both rankings — is hash-exact.  Recall on "
    "the worst-case random-vector fixture is the measured SCALE.md "
    "ladder (0.22/0.35/0.47/0.65 agreement@3 at depth 10/25/50/100); "
    "clustered real embeddings sit far above it",

)
def pipe_sim_topk_jl(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return similarity.topk_cosine_jl(
        e, q, "vec_id", "embedding", out_dim=16, depth=25, k=3
    )


@register(
    "pipe_text_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 3)
    ),
    g AS (SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS g
          FROM sh),
    gdf AS (SELECT g, COUNT(*) AS df FROM g GROUP BY 1),
    per AS (SELECT g.doc_id, COUNT(*) AS n_grams,
                   CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
            FROM g JOIN gdf USING (g) GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(per.n_grams, 0) AS n_grams,
           COALESCE(per.n_novel, 0) AS n_novel,
           ROUND(CAST(per.n_novel AS DOUBLE) / per.n_grams, 6) AS novelty
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
    doc="per-document n-gram novelty (dedup.ngram_novelty): the fraction "
    "of a doc's distinct word 3-grams appearing in NO other document — "
    "the memorization/duplication diagnostic that flags documents "
    "ASSEMBLED from corpus-repeated content even when no single "
    "near-dup pair fires (the doc-level complement of span dedup).  "
    "One shingle pass, Zipf-bounded gram-df agg, digest equi-join — "
    "no pair space",
)
def pipe_text_novelty(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return dedup.ngram_novelty(d, "doc_id", "text", n=3)


@register(
    "pipe_source_overlap",
    oracle=r"""
    WITH toks AS (
      SELECT source, string_split_regex(lower(text), '\s+') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM (SELECT source, t, unnest(range(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 3)
    ),
    g AS (SELECT DISTINCT source,
                 CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS g
          FROM sh),
    sizes AS (SELECT source, COUNT(*) AS n FROM g GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
      FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b, s.n_shared, sa.n AS n_a, sb.n AS n_b,
           ROUND(CAST(s.n_shared AS DOUBLE) / sa.n, 6) AS overlap_a,
           ROUND(CAST(s.n_shared AS DOUBLE) / sb.n, 6) AS overlap_b
    FROM shared s
    JOIN sizes sa ON sa.source = s.source_a
    JOIN sizes sb ON sb.source = s.source_b
    """,
    doc="source x source shared-content matrix (dedup.source_overlap_matrix): "
    "distinct 3-gram fingerprints shared between every source pair plus "
    "each side's containment ratio — the cross-corpus contamination "
    "dashboard that decides dedup ordering and mixture weights before "
    "any per-document pass.  The corpus reduces ONCE to the distinct "
    "(source, digest) relation; the pair join is digest-keyed and "
    "bounded by cross-source duplicate mass, the output by |sources|^2",
)
def pipe_source_overlap(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return dedup.source_overlap_matrix(d, "source", "text", n=3)


def _schema_drift_oracle() -> str:
    """DuckDB replay of pipe_schema_drift: the two derived snapshots'
    null counts as scalar aggregates, one UNION ALL branch per column
    (``value_cents`` is NULL exactly when the nulled ``value`` is, so
    its count reuses COUNT(value))."""
    branches = [
        # column, status, type_old, type_new, old-null expr, new-null expr
        ("event_id", "kept", "'bigint'", "'bigint'", "z_event_id", "z_event_id"),
        ("event_type", "dropped", "'string'", "NULL", "z_event_type", None),
        ("ts", "kept", "'timestamp_ntz'", "'timestamp_ntz'", "z_ts", "z_ts"),
        ("user_id", "type_changed", "'bigint'", "'string'", "z_user_id", "z_user_id"),
        ("value", "kept", "'double'", "'double'", "z_value", "z_value"),
        ("value_cents", "added", "NULL", "'bigint'", None, "z_value"),
    ]
    parts = []
    for col, status, t_o, t_n, z_o, z_n in branches:
        no = f"os.{z_o}" if z_o else "CAST(NULL AS BIGINT)"
        nn = f"ns.{z_n}" if z_n else "CAST(NULL AS BIGINT)"
        po = (
            f"CASE WHEN os.nr = 0 THEN 0 ELSE os.{z_o} * 1000000 // os.nr END"
            if z_o
            else "CAST(NULL AS BIGINT)"
        )
        pn = (
            f"CASE WHEN ns.nr = 0 THEN 0 ELSE ns.{z_n} * 1000000 // ns.nr END"
            if z_n
            else "CAST(NULL AS BIGINT)"
        )
        delta = f"({pn}) - ({po})" if (z_o and z_n) else "CAST(NULL AS BIGINT)"
        parts.append(
            f"""SELECT '{col}' AS "column", '{status}' AS status,
           CAST({t_o} AS VARCHAR) AS type_old,
           CAST({t_n} AS VARCHAR) AS type_new,
           CAST({no} AS BIGINT) AS n_null_old,
           CAST({nn} AS BIGINT) AS n_null_new,
           CAST({po} AS BIGINT) AS null_ppm_old,
           CAST({pn} AS BIGINT) AS null_ppm_new,
           CAST({delta} AS BIGINT) AS null_ppm_delta
    FROM os, ns"""
        )
    body = "\n    UNION ALL\n    ".join(parts)
    return f"""
    WITH o AS (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
      FROM events WHERE event_id % 5 <> 0
    ),
    n AS (
      SELECT event_id, ts, CAST(user_id AS VARCHAR) AS user_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
      FROM events WHERE event_id % 4 <> 0
    ),
    os AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nr,
             CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS z_event_id,
             CAST(COUNT(*) - COUNT(ts) AS BIGINT) AS z_ts,
             CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS z_user_id,
             CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS z_event_type,
             CAST(COUNT(*) - COUNT(value) AS BIGINT) AS z_value
      FROM o
    ),
    ns AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nr,
             CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS z_event_id,
             CAST(COUNT(*) - COUNT(ts) AS BIGINT) AS z_ts,
             CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS z_user_id,
             CAST(COUNT(*) - COUNT(value) AS BIGINT) AS z_value
      FROM n
    )
    {body}"""


@register(
    "pipe_schema_drift",
    oracle=_schema_drift_oracle(),
    doc="column-level drift between two snapshots of a structured table "
    "(operators/profile.py:schema_drift) — the schema sibling of the "
    "corpus-drift gate and the first check a pipeline runs when an "
    "upstream export changes: added/dropped/type-changed/kept status "
    "per column plus EXACT null accounting (BIGINT counts from ONE "
    "single-pass aggregation per snapshot, integer-ppm rates via div). "
    "The face derives deterministic snapshots of events exercising "
    "every status: event_type dropped, value_cents added, user_id "
    "bigint->string type change, and value nulled on different "
    "deterministic strides (%13 vs %7) so the ppm delta is a real "
    "number.  The oracle replays the null counts as scalar aggregates "
    "with one UNION ALL branch per column",
)
def pipe_schema_drift(spark, sf_dir):
    from ..operators import profile

    ev = table(spark, sf_dir, "events")
    old = ev.where(F.col("event_id") % 5 != 0).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.when(F.col("event_id") % 13 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    nulled = (
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
    )
    new = ev.where(F.col("event_id") % 4 != 0).select(
        "event_id",
        "ts",
        F.col("user_id").cast("string").alias("user_id"),
        nulled.alias("value"),
        (nulled * 100).cast("bigint").alias("value_cents"),
    )
    return profile.schema_drift(old, new)


@register(
    "pipe_drift_numeric",
    oracle=r"""
    WITH o AS (
      SELECT event_type AS stratum, value FROM events
      WHERE event_id % 5 <> 0 AND value IS NOT NULL
    ),
    n AS (
      SELECT event_type AS stratum, value FROM events
      WHERE event_id % 4 <> 0 AND value IS NOT NULL
    ),
    co AS (
      SELECT stratum,
             CAST(LEAST(63, GREATEST(0,
                  CAST(FLOOR((value - 0.0) / 8.0) AS INT))) AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c_old
      FROM o GROUP BY 1, 2
    ),
    cn AS (
      SELECT stratum,
             CAST(LEAST(63, GREATEST(0,
                  CAST(FLOOR((value - 0.0) / 8.0) AS INT))) AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c_new
      FROM n GROUP BY 1, 2
    ),
    tot AS (
      SELECT stratum,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new,
             COALESCE(bins_old, 0) AS bins_old,
             COALESCE(bins_new, 0) AS bins_new
      FROM (SELECT stratum, CAST(SUM(c_old) AS BIGINT) AS n_old,
                   CAST(COUNT(*) AS BIGINT) AS bins_old
            FROM co GROUP BY stratum) a
      FULL JOIN (SELECT stratum, CAST(SUM(c_new) AS BIGINT) AS n_new,
                        CAST(COUNT(*) AS BIGINT) AS bins_new
                 FROM cn GROUP BY stratum) b USING (stratum)
    ),
    pt AS (
      SELECT j.stratum, j.bin,
             ABS(j.c_old * t.n_new - j.c_new * t.n_old) AS cross_abs,
             (CASE WHEN t.n_new = 0 THEN 0
                   ELSE j.c_new * 1000000 // t.n_new END
              - CASE WHEN t.n_old = 0 THEN 0
                     ELSE j.c_old * 1000000 // t.n_old END) AS delta_ppm
      FROM (SELECT stratum, bin,
                   COALESCE(c_old, 0) AS c_old, COALESCE(c_new, 0) AS c_new
            FROM co FULL JOIN cn USING (stratum, bin)) j
      JOIN tot t USING (stratum)
    ),
    summ AS (
      SELECT stratum, CAST(SUM(cross_abs) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS bins_union
      FROM pt GROUP BY stratum
    ),
    top AS (
      SELECT stratum, bin AS top_bin, delta_ppm AS top_delta_ppm
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY stratum
              ORDER BY ABS(delta_ppm) DESC, bin ASC) AS rn
            FROM pt)
      WHERE rn = 1
    )
    SELECT t.stratum,
           t.n_old AS n_values_old, t.n_new AS n_values_new,
           t.bins_old AS n_bins_old, t.bins_new AS n_bins_new,
           COALESCE(s.bins_union, 0) AS n_bins_union,
           CASE WHEN t.n_old = 0 OR t.n_new = 0 THEN CAST(1.0 AS DOUBLE)
                ELSE ROUND(CAST(s.s AS DOUBLE)
                           / (CAST(2.0 AS DOUBLE) * CAST(t.n_old AS DOUBLE)
                              * CAST(t.n_new AS DOUBLE)), 6) END AS tv,
           top.top_bin,
           CAST(COALESCE(top.top_delta_ppm, 0) AS BIGINT) AS top_delta_ppm
    FROM tot t
    LEFT JOIN summ s USING (stratum)
    LEFT JOIN top USING (stratum)
    """,
    doc="numeric-distribution drift, the third leg of the monitoring "
    "trio (corpus_drift = text, schema_drift = structure, this = "
    "values): per-stratum total variation distance between two "
    "snapshots' binned value distributions on the hist_sketch grid "
    "(operators/curation.py:numeric_drift — the report is "
    "corpus_drift's _drift_report VERBATIM over (stratum, bin) cells, "
    "same exact BIGINT cross-product arithmetic), plus the most-moved "
    "bin by exact integer ppm delta.  Snapshots are the same "
    "deterministic event_id strides as pipe_schema_drift; the grid is "
    "pipe_sketch_quantile's [0,512)/64.  NULLs excluded (null drift "
    "is schema_drift's job), out-of-grid clamps to edge bins",
)
def pipe_drift_numeric(spark, sf_dir):
    from ..operators import curation

    ev = table(spark, sf_dir, "events")
    return curation.numeric_drift(
        ev.where(F.col("event_id") % 5 != 0),
        ev.where(F.col("event_id") % 4 != 0),
        "event_type",
        "value",
        0.0,
        512.0,
        64,
    )


@register(
    "pipe_corpus_drift",
    oracle=r"""
    WITH old_docs AS (SELECT source, text FROM documents WHERE doc_id % 7 <> 6),
    new_docs AS (SELECT source, text FROM documents WHERE doc_id % 7 <> 0),
    co AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_old
      FROM (SELECT source,
                   unnest(string_split_regex(lower(text), '\s+')) AS tok
            FROM old_docs)
      GROUP BY source, tok
    ),
    cn AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_new
      FROM (SELECT source,
                   unnest(string_split_regex(lower(text), '\s+')) AS tok
            FROM new_docs)
      GROUP BY source, tok
    ),
    tot AS (
      SELECT source,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new,
             COALESCE(vocab_old, 0) AS vocab_old,
             COALESCE(vocab_new, 0) AS vocab_new
      FROM (SELECT source, CAST(SUM(c_old) AS BIGINT) AS n_old,
                   CAST(COUNT(*) AS BIGINT) AS vocab_old
            FROM co GROUP BY source) o
      FULL JOIN (SELECT source, CAST(SUM(c_new) AS BIGINT) AS n_new,
                        CAST(COUNT(*) AS BIGINT) AS vocab_new
                 FROM cn GROUP BY source) n USING (source)
    ),
    pt AS (
      SELECT j.source, j.tok,
             ABS(j.c_old * t.n_new - j.c_new * t.n_old) AS cross_abs,
             (CASE WHEN t.n_new = 0 THEN 0
                   ELSE j.c_new * 1000000 // t.n_new END
              - CASE WHEN t.n_old = 0 THEN 0
                     ELSE j.c_old * 1000000 // t.n_old END) AS delta_ppm
      FROM (SELECT source, tok,
                   COALESCE(c_old, 0) AS c_old, COALESCE(c_new, 0) AS c_new
            FROM co FULL JOIN cn USING (source, tok)) j
      JOIN tot t USING (source)
    ),
    summ AS (
      SELECT source, CAST(SUM(cross_abs) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS vocab_union
      FROM pt GROUP BY source
    ),
    top AS (
      SELECT source, tok AS top_token, delta_ppm AS top_delta_ppm
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY source
              ORDER BY ABS(delta_ppm) DESC, tok ASC) AS rn
            FROM pt)
      WHERE rn = 1
    )
    SELECT t.source,
           t.n_old AS n_tokens_old, t.n_new AS n_tokens_new,
           t.vocab_old, t.vocab_new,
           COALESCE(s.vocab_union, 0) AS vocab_union,
           CASE WHEN t.n_old = 0 OR t.n_new = 0 THEN CAST(1.0 AS DOUBLE)
                ELSE ROUND(CAST(s.s AS DOUBLE)
                           / (CAST(2.0 AS DOUBLE) * CAST(t.n_old AS DOUBLE)
                              * CAST(t.n_new AS DOUBLE)), 6) END AS tv,
           top.top_token,
           CAST(COALESCE(top.top_delta_ppm, 0) AS BIGINT) AS top_delta_ppm
    FROM tot t
    LEFT JOIN summ s USING (source)
    LEFT JOIN top USING (source)
    """,
    doc="per-source distribution drift between two corpus snapshots "
    "(operators/curation.py:corpus_drift) — the release gate a "
    "recurring crawl runs before swapping training data: total "
    "variation distance between unigram distributions computed EXACTLY "
    "in integers (BIGINT sum of |c_old*N_new - c_new*N_old| cross "
    "products; one double division at the very end), plus the "
    "most-moved token by exact integer ppm share delta with a "
    "token-ascending tiebreak.  The snapshots are deterministic "
    "membership churns of documents (doc_id%7<>6 vs doc_id%7<>0).  "
    "Shape: one explode+groupBy per snapshot, a full-outer join of the "
    "two Zipf-bounded count tables, broadcast totals, one agg + one "
    "window — the corpora scan once each",
)
def pipe_corpus_drift(spark, sf_dir):
    from ..operators import curation

    d = table(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 7 != 6)
    new = d.where(F.col("doc_id") % 7 != 0)
    return curation.corpus_drift(old, new, "text")


# ---------------------------------------------------------------------------
# round-9 driver faces for the previously pytest-only operators
# (round-8 verdict item 2: every oracle-expressible operator gets an
# official CORRECTNESS row; the pytest-only set shrinks to the genuinely
# streaming/filesystem ops)
# ---------------------------------------------------------------------------


@register(
    "pipe_normalize_unicode",
    oracle=r"""
    WITH src AS (
      SELECT doc_id,
             text || ' cafe' || chr(769) || ' No' || chr(776) || 'el'
                  || chr(7) || ' f' || chr(64257) || 'n' AS text
      FROM documents
    ),
    n AS (
      SELECT doc_id, strlen(text) AS n_raw,
             regexp_replace(nfc_normalize(text),
                            '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g') AS norm
      FROM src
    )
    SELECT doc_id, n_raw, strlen(norm) AS n_norm, md5(norm) AS norm_hash FROM n
    """,
    doc="unicode NFC normalization + C0/C1 control stripping "
    "(operators/text.py:normalize_unicode, Arrow-batched stdlib "
    "unicodedata): every doc gets a suffix with DECOMPOSED accents "
    "(e+U+0301, o+U+0308), a BEL control, and the U+FB01 fi-ligature "
    "appended, so the face proves composition actually happened "
    "(byte length shrinks), controls are stripped, and NFC — unlike "
    "NFKC — preserves compatibility chars; DuckDB nfc_normalize + a "
    "codepoint-class regexp replay it, and the md5 over the normalized "
    "UTF-8 pins every byte.  Byte lengths (octet_length/strlen) on "
    "purpose: Spark length() counts UTF-16 units, DuckDB counts "
    "graphemes — one of two cross-engine traps in this face; the other "
    "is NUL: DuckDB nfc_normalize truncates at an embedded NUL iff "
    "non-ASCII follows (property-found, pinned in test_property.py), "
    "so the oracle equivalence holds on NUL-free text — which the "
    "corpus and suffix are.  Previously pytest-only",
)
def pipe_normalize_unicode(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    # decomposed accents + BEL + fi-ligature, via escapes so the
    # source stays ASCII-clean:
    suffix = " cafe\u0301 No\u0308el\u0007 f\ufb01n"
    src = d.select(
        "doc_id", F.concat(F.col("text"), F.lit(suffix)).alias("text")
    ).withColumn("n_raw", F.octet_length("text"))
    norm = text_ops.normalize_unicode(
        src, "text", form="NFC", strip_controls=True, out_col="norm_text"
    )
    return norm.select(
        "doc_id",
        "n_raw",
        F.octet_length("norm_text").alias("n_norm"),
        F.md5("norm_text").alias("norm_hash"),
    )


@register(
    "pipe_sentence_chunks",
    oracle=r"""
    WITH src AS (
      SELECT doc_id,
             regexp_replace(upper(text), '((\S+ ){4}\S+) ', '\1. ', 'g') AS text
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             regexp_replace(text,
               '([.!?][\)\]"'']?)\s+(["''\(\[]?[A-Z0-9])',
               '\1' || chr(1) || '\2', 'g') AS t
      FROM src
    ),
    parts AS (
      SELECT doc_id,
             unnest(string_split(t, chr(1))) AS piece,
             unnest(range(1, len(string_split(t, chr(1))) + 1)) AS idx
      FROM b
    ),
    sent AS (
      SELECT doc_id, trim(piece) AS sentence, idx
      FROM parts WHERE length(trim(piece)) > 0
    ),
    cum AS (
      SELECT doc_id, sentence, idx,
             COALESCE(SUM(length(sentence) + 1) OVER (
               PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM sent
    )
    SELECT doc_id,
           CAST(FLOOR(before / 120.0) AS INTEGER) AS chunk_idx,
           string_agg(sentence, ' ' ORDER BY idx) AS chunk_text,
           COUNT(*) AS n_sents,
           CAST(SUM(length(sentence)) AS BIGINT) AS n_chars
    FROM cum GROUP BY doc_id, CAST(FLOOR(before / 120.0) AS INTEGER)
    """,
    doc="sentence segmentation + sentence-aware chunking "
    "(operators/text.py:split_sentences/chunk_by_sentences): document "
    "text is upper-cased and every 5th token boundary gets a period so "
    "the Latin-script boundary rule ([.!?] + closer, whitespace, "
    "upper/digit opener) has real work; chunks are cumulative-length "
    "buckets of 120 chars, never splitting a sentence.  The oracle "
    "emulates the Java lookbehind/lookahead split in RE2 (no "
    "lookarounds) by rewriting each boundary's whitespace to a "
    "chr(1) sentinel with both context groups preserved, then replays "
    "the window + bucket math; chunk_text is order-pinned by the "
    "round-9 sort_array fix (collect_list alone has no order "
    "guarantee under real partitioning).  Previously pytest-only",
)
def pipe_sentence_chunks(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    sent_text = F.regexp_replace(
        F.upper(F.col("text")), r"((\S+ ){4}\S+) ", "$1. "
    )
    src = d.select("doc_id", sent_text.alias("text"))
    return text_ops.chunk_by_sentences(src, "doc_id", "text", max_chars=120)


@register(
    "pipe_truncate_matryoshka",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v[1:8] AS tv FROM e),
    t AS (
      SELECT vec_id,
             CASE WHEN list_inner_product(tv, tv) = 0 THEN tv
                  ELSE list_transform(tv, x ->
                         x / sqrt(list_inner_product(tv, tv))) END AS nv
      FROM s
    )
    SELECT vec_id, CAST(pos AS INTEGER) AS pos, ROUND(val, 6) AS val FROM (
      SELECT vec_id, unnest(range(0, len(nv))) AS pos, unnest(nv) AS val FROM t
    )
    """,
    doc="matryoshka truncation (Kusupati et al. 2022, "
    "operators/similarity.py:truncate_embeddings): keep the first 8 of "
    "64 dims and restore unit norm — the no-retrain cost/recall knob; "
    "face posexplodes the truncated vector to scalar (vec_id, pos, "
    "val) rows (driver-face contract) with ROUND(...,6) on both "
    "sides.  Slice + renorm replayed as plain SQL list ops; "
    "zero-vector inputs stay zero on both sides.  Previously "
    "pytest-only",
)
def pipe_truncate_matryoshka(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    t = similarity.truncate_embeddings(e, "embedding", dim=8, renormalize=True)
    return t.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.round("val", 6).alias("val"))


@register(
    "pipe_cluster_report",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (SELECT src, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.src = d.doc_id
    ),
    sizes AS (
      SELECT component, COUNT(*) AS cluster_size FROM labeled GROUP BY component
    )
    SELECT cluster_size, COUNT(*) AS n_clusters,
           cluster_size * COUNT(*) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    doc="duplicate-cluster size distribution "
    "(operators/dedup.py:cluster_report): minhash pairs -> connected "
    "components -> (cluster_size, n_clusters, n_docs) — the one-page "
    "'how duplicated is my corpus' answer; oracle extends the "
    "recursive-CTE closure the components face already proves with "
    "the two-level size aggregation.  Previously pytest-only",
)
def pipe_cluster_report(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        d, "doc_id", "text", n_hashes=8, rows_per_band=2, shingle_n=3, threshold=0.5
    )
    labels = dedup.connected_components(pairs, d, "doc_id")
    return dedup.cluster_report(labels, "doc_id")


@register(
    "pipe_warc_robots_clean",
    oracle=f"""
    WITH allpages AS (
      SELECT record_idx, target_uri, text FROM read_parquet('{_WARC_EXPECTED}')
      WHERE doc_id >= -1
    ),
    d(host, allow, prefix) AS (
      VALUES ('example.com', FALSE, '/private'),
             ('example.com', FALSE, '/d/1'),
             ('example.com', TRUE,  '/d/11'),
             ('example.com', TRUE,  '/d/12'),
             ('example.com', FALSE, '/d/12')
    ),
    p AS (
      SELECT record_idx, target_uri, text,
             lower(regexp_extract(target_uri,
               '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)) AS host,
             CASE WHEN regexp_extract(target_uri,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(target_uri,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) END AS path
      FROM allpages
    ),
    j AS (
      SELECT p.record_idx, p.text, d.allow, d.prefix
      FROM p LEFT JOIN d ON p.host = d.host AND starts_with(p.path, d.prefix)
    ),
    w AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY record_idx
        ORDER BY length(prefix) DESC, allow DESC) AS rn
      FROM j
    ),
    docs AS (
      SELECT record_idx, text FROM w
      WHERE rn = 1 AND (allow IS NULL OR allow)
    ),
    lines AS (
      SELECT record_idx,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      FROM docs
    ),
    nz AS (SELECT * FROM lines WHERE len(line) > 0),
    total AS (SELECT COUNT(*) AS n_total FROM docs),
    bp AS (
      SELECT line FROM (
        SELECT line, COUNT(DISTINCT record_idx) AS n_docs
        FROM nz GROUP BY line
      ), total
      WHERE CAST(n_docs AS DOUBLE) / n_total >= 0.5
    ),
    kept AS (SELECT * FROM nz WHERE line NOT IN (SELECT line FROM bp)),
    reb AS (
      SELECT record_idx, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY record_idx
    ),
    orig AS (SELECT record_idx, COUNT(*) AS n_lines FROM nz GROUP BY record_idx)
    SELECT d.record_idx,
           COALESCE(reb.clean_text, '') AS clean_text,
           COALESCE(orig.n_lines, 0) AS n_lines,
           COALESCE(orig.n_lines, 0) - COALESCE(reb.n_kept, 0) AS n_removed
    FROM docs d
    LEFT JOIN orig ON d.record_idx = orig.record_idx
    LEFT JOIN reb ON d.record_idx = reb.record_idx
    """,
    doc="the production crawl-to-clean-text chain WITH the robots gate "
    "(round-8 verdict item 7): WARC records -> robots FULL-precedence "
    "filter on the slim (record_idx, target_uri) page list (real "
    "Disallow:/private parsed from the archive + the synthetic "
    "precedence directives of pipe_robots_precedence) -> left-semi "
    "join back to the records -> HTML text extraction -> "
    "strip_boilerplate over the 412 SURVIVORS (the >=50% boilerplate "
    "threshold is computed over the gated corpus, exactly as a "
    "production pipeline would).  The gate runs BEFORE extraction on "
    "purpose: payload bytes of blocked pages never cross to Python, "
    "and the winner window shuffles only the slim list.  The "
    "localCheckpoint pins the extracted text so strip_boilerplate's "
    "two branches don't re-run the WARC+HTML chain (the round-8 "
    "x8-MapInPandas fix, plan-tested)",
)
def pipe_warc_robots_clean(spark, sf_dir):
    from ..operators import urltools

    recs = ingest.read_warc(spark, _WARC_FIXTURE)
    robots = recs.where(
        (F.col("warc_type") == "response")
        & F.col("target_uri").endswith("/robots.txt")
    ).select(
        "target_uri", F.decode(F.col("payload"), "UTF-8").alias("body")
    )
    directives = urltools.parse_robots_directives(
        robots, "target_uri", "body"
    ).union(
        spark.createDataFrame(
            [
                ("example.com", False, "/d/1"),
                ("example.com", True, "/d/11"),
                ("example.com", True, "/d/12"),
                ("example.com", False, "/d/12"),
            ],
            "host string, allow boolean, prefix string",
        )
    )
    pages = recs.where(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").contains("text/html")
    ).select("record_idx", "target_uri")
    allowed = urltools.filter_robots(pages, "target_uri", directives)
    gated = recs.join(
        allowed.select("record_idx"), "record_idx", "left_semi"
    )
    extracted = (
        ingest.extract_html_text(gated, "payload")
        .select("record_idx", "text")
        .localCheckpoint(eager=False)
    )
    return text_ops.strip_boilerplate(
        extracted, "record_idx", "text", min_doc_frac=0.5
    )


def _probe_oracle(epochs: int = 3, lr: str = "0.5") -> str:
    """Unrolled full-batch gradient-descent replay (DuckDB) for
    pipe_probe_train — the PCA-unroll recipe applied to training: each
    epoch is one CTE computing the scaled-BIGINT per-term gradient sums
    off the previous epoch's 1-row weight CTE, then a ROUND(...,6)
    weight update; the final SELECT unions every (epoch, pos) row."""
    k = 4
    xs = ["x0", "x1", "x2", "x3"]
    z = " + ".join(f"w_{j} * {x}" for j, x in enumerate(xs))
    ctes = [
        r"""feats AS (
      SELECT 1.0 AS x0,
             n_chars / 1000.0 AS x1,
             len(string_split_regex(text, '\s+')) / 100.0 AS x2,
             len(list_distinct(string_split_regex(text, '\s+')))
               / len(string_split_regex(text, '\s+')) AS x3,
             CASE WHEN n_chars > 300 THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    )""",
        "cnt AS (SELECT COUNT(*) AS n FROM feats)",
        "w0 AS (SELECT "
        + ", ".join(f"0.0 AS w_{j}" for j in range(k))
        + ")",
    ]
    for e in range(1, epochs + 1):
        grads = ",\n             ".join(
            f"SUM(CAST(FLOOR((p - y) * d * {x} * 1e9 + 0.5) AS BIGINT)) AS s{j}"
            for j, x in enumerate(xs)
        )
        ctes.append(
            f"""g{e} AS (
      SELECT {grads},
             SUM(CAST(FLOOR((p - y) * (p - y) * 1e9 + 0.5) AS BIGINT)) AS sl
      FROM (
        SELECT f.*, 0.5 + 0.5 * z / (1.0 + abs(z)) AS p,
               0.5 / ((1.0 + abs(z)) * (1.0 + abs(z))) AS d
        FROM (SELECT f.*, {z} AS z FROM feats f, w{e - 1}) f
      )
    )"""
        )
        ups = ", ".join(
            f"ROUND(w_{j} - {lr} * ((s{j} / 1e9) / n), 6) AS w_{j}"
            for j in range(k)
        )
        ctes.append(f"w{e} AS (SELECT {ups} FROM w{e - 1}, g{e}, cnt)")
        ctes.append(
            f"l{e} AS (SELECT ROUND((sl / 1e9) / n, 6) AS loss FROM g{e}, cnt)"
        )
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({e} AS INTEGER) AS epoch, CAST({j} AS INTEGER) AS pos, "
        f"w_{j} AS weight, loss FROM w{e}, l{e}"
        for e in range(1, epochs + 1)
        for j in range(k)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions


@register(
    "pipe_probe_train",
    oracle=_probe_oracle(),
    doc="distributed linear-probe TRAINING (round-8 verdict stretch "
    "item 8, operators/probe.py): a 4-feature quality probe (bias, "
    "chars/1000, tokens/100, distinct-token ratio) fit to the "
    "n_chars>300 label by 3 full-batch gradient epochs — Elliott "
    "rational sigmoid (no transcendentals, so every per-row value is "
    "bit-identical across engines), per-term scaled-BIGINT gradient "
    "sums (one map-side-combinable agg per epoch, driver holds 4 "
    "floats), ROUND(...,6) weight updates.  Output is the full "
    "(epoch, pos, weight, loss) trajectory; the oracle unrolls all 3 "
    "epochs as CTEs off the same arithmetic — an ITERATIVE TRAINER "
    "that is hash-exact, like the PCA power iteration before it.  "
    "Agreement with an independent NumPy fit + actually-learns "
    "assertions in tests/test_probe.py",
)
def pipe_probe_train(spark, sf_dir):
    from ..operators import probe

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    feats = d.select(
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / F.lit(1000.0)).alias("x1"),
        (F.size(toks) / F.lit(100.0)).alias("x2"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("x3"),
        F.when(F.col("n_chars") > 300, 1.0).otherwise(0.0).alias("y"),
    )
    _w, hist = probe.train_linear_probe(
        feats, ["x0", "x1", "x2", "x3"], "y", lr=0.5, epochs=3
    )
    return probe.probe_history_df(spark, hist)


_FIXTURE_DATA_DIR = os.path.dirname(_WARC_EXPECTED)


@register(
    "pipe_file_stats",
    oracle=f"""
    WITH f AS (
      SELECT file_name, num_rows
      FROM parquet_file_metadata('{_FIXTURE_DATA_DIR}/*.parquet')
    ),
    m AS (
      SELECT file_name,
             MIN(CAST(stats_min_value AS BIGINT)) AS lo,
             MAX(CAST(stats_max_value AS BIGINT)) AS hi
      FROM parquet_metadata('{_FIXTURE_DATA_DIR}/*.parquet')
      WHERE path_in_schema = 'doc_id'
      GROUP BY file_name
    )
    SELECT regexp_extract(f.file_name, '([^/]+)$', 1) AS file,
           f.num_rows AS n_rows, 'doc_id' AS col,
           COALESCE(CAST(m.lo AS VARCHAR), 'None') AS min_str,
           COALESCE(CAST(m.hi AS VARCHAR), 'None') AS max_str
    FROM f LEFT JOIN m USING (file_name)
    """,
    doc="parquet-footer layout observability "
    "(sources/layout.py:file_stats_report): per-file row counts and "
    "min/max doc_id ranges read from the FOOTERS of the committed "
    "fixture parquet files (sf-independent, like every fixture face) — "
    "wide per-file ranges on a filter column mean scans can't prune "
    "and a Z-order/compaction rewrite pays for itself.  The oracle is "
    "DuckDB's parquet_metadata()/parquet_file_metadata() over the SAME "
    "footers — two independent parquet readers agreeing on the "
    "statistics bytes, row-group mins folded to file mins on both "
    "sides; files without the column report 'None' (the operator's "
    "uniform-string contract).  Previously pytest-only "
    "(filesystem-metadata-by-nature; the fixture corpus makes it "
    "driver-checkable after all)",
)
def pipe_file_stats(spark, sf_dir):
    from ..sources import layout

    return layout.file_stats_report(spark, _FIXTURE_DATA_DIR, ["doc_id"])


@register(
    "pipe_file_stats_distributed",
    oracle=f"""
    WITH f AS (
      SELECT file_name, num_rows
      FROM parquet_file_metadata('{_FIXTURE_DATA_DIR}/*.parquet')
    ),
    m AS (
      SELECT file_name,
             MIN(CAST(stats_min_value AS BIGINT)) AS lo,
             MAX(CAST(stats_max_value AS BIGINT)) AS hi
      FROM parquet_metadata('{_FIXTURE_DATA_DIR}/*.parquet')
      WHERE path_in_schema = 'doc_id'
      GROUP BY file_name
    )
    SELECT regexp_extract(f.file_name, '([^/]+)$', 1) AS file,
           f.num_rows AS n_rows, 'doc_id' AS col,
           COALESCE(CAST(m.lo AS VARCHAR), 'None') AS min_str,
           COALESCE(CAST(m.hi AS VARCHAR), 'None') AS max_str
    FROM f LEFT JOIN m USING (file_name)
    """,
    doc="the >100k-files path of the footer-stats report "
    "(sources/layout.py:file_stats_report_distributed): the driver "
    "only lists paths; footer opening + row-group folding fans out as "
    "mapInPandas over the file list (NOT binaryFile, which would ship "
    "whole file contents to parse a trailing footer — at 100 TB that "
    "turns a metadata report into a full-corpus read).  Shares "
    "pipe_file_stats' oracle VERBATIM: DuckDB's parquet_metadata() "
    "over the same fixture footers must agree with the distributed "
    "fold exactly, which also pins the distributed path to the "
    "driver-side path (both go through the shared _footer_stats_rows "
    "fold; pytest additionally pins row equality of the two reports)",
)
def pipe_file_stats_distributed(spark, sf_dir):
    from ..sources import layout

    return layout.file_stats_report_distributed(
        spark, _FIXTURE_DATA_DIR, ["doc_id"]
    )


@register(
    "pipe_cluster_embeddings",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cents AS (SELECT vec_id AS centroid_id, v AS cent FROM e ORDER BY vec_id LIMIT 16),
    assign AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.v, cents.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND(list_inner_product(e.v, cents.cent)
                          / (sqrt(list_inner_product(e.v, e.v))
                             * sqrt(list_inner_product(cents.cent, cents.cent))), 6) DESC,
                          cents.centroid_id) AS rn
        FROM e CROSS JOIN cents) t
      WHERE rn = 1
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_inner_product(q.v, c.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))),
                   6) AS cos_sim
      FROM assign q JOIN assign c
        ON q.centroid_id = c.centroid_id AND q.vec_id <> c.vec_id
    ),
    knn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM scored) t
      WHERE rn <= 3
    ),
    edges AS (
      SELECT query_id AS a, neighbor_id AS b FROM knn
      UNION ALL
      SELECT neighbor_id, query_id FROM knn
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, g.b FROM reach r JOIN edges g ON r.dst = g.a
    ),
    comp AS (SELECT src, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src)
    SELECT v.vec_id, COALESCE(c.comp, v.vec_id) AS component
    FROM e v LEFT JOIN comp c ON c.src = v.vec_id
    """,
    doc="corpus topic clustering: k-NN graph (IVF cell join, corpus as "
    "its own query set, k=3 — at most k*n edges, never a pair product) "
    "-> connected components over the neighbor chains "
    "(similarity.knn_graph + cluster_embeddings_knn) — the graph-side "
    "sibling of semantic dedup, labeling every vector with its "
    "content-cluster representative.  The oracle replays the whole "
    "chain: deterministic coarse cells, per-cell kNN ranking, "
    "symmetrized edges, recursive-CTE transitive closure.  Components "
    "are cell-bounded by construction (edges never cross cells), which "
    "also bounds the oracle's closure size",
)
def pipe_cluster_embeddings(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return similarity.cluster_embeddings_knn(
        e, "vec_id", "embedding", k=3, n_centroids=16
    )


@register(
    "pipe_hybrid_rrf",
    oracle=r"""
    WITH qt(query_id, tok) AS (
      VALUES (0, 'spark'), (0, 'join'), (1, 'vector'), (1, 'data'),
             (2, 'table'), (2, 'query'), (3, 'row'), (3, 'hash')
    ),
    d AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
             LEN(string_split_regex(lower(text), '\s+')) AS dl
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM d
    ),
    m AS (
      SELECT doc_id, dl, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM d)
      WHERE tok IN (SELECT tok FROM qt)
      GROUP BY doc_id, dl, tok
    ),
    freq AS (SELECT tok, COUNT(*) AS dfreq FROM m GROUP BY tok),
    sc AS (
      SELECT m.doc_id, m.tok,
             CAST(FLOOR(
               LN((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               * 1000000.0 + 0.5
             ) AS BIGINT) AS s_micro
      FROM m JOIN freq USING (tok), stats
    ),
    lex AS (
      SELECT qt.query_id, sc.doc_id, SUM(s_micro) AS b_micro
      FROM sc JOIN qt ON sc.tok = qt.tok
      GROUP BY qt.query_id, sc.doc_id
    ),
    lexd AS (
      SELECT query_id, doc_id, r FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY b_micro DESC, doc_id) AS r
        FROM lex WHERE doc_id <> query_id) t
      WHERE r <= 10
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 4),
    scoredv AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
             ROUND(list_inner_product(q.v, c.v)
                   / (sqrt(list_inner_product(q.v, q.v))
                      * sqrt(list_inner_product(c.v, c.v))), 6) AS cos_sim
      FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    vecd AS (
      SELECT query_id, doc_id, r FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, doc_id) AS r
        FROM scoredv) t
      WHERE r <= 10
    ),
    f AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / (60 + l.r), 0.0)
                   + COALESCE(1.0 / (60 + v.r), 0.0), 6) AS rrf_score
      FROM lexd l FULL JOIN vecd v
        ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS rn
      FROM f) t
    WHERE rn <= 5
    """,
    doc="hybrid retrieval: per-query BM25 (multi-query surface, "
    "operators/text.py:bm25_scores_multi — per-(doc,term) scores "
    "computed ONCE over the union of query terms, fanned out by a "
    "broadcast join) + brute cosine, each depth-10, fused by "
    "Reciprocal Rank Fusion (Cormack et al. 2009, "
    "operators/retrieval.py): score = round(1/(60+lex_rank) + "
    "1/(60+vec_rank), 6), missing source contributes 0, per-query "
    "top-5.  The seed doc is excluded from its own lexical list "
    "(more-like-this semantics; cosine already id-excludes).  The "
    "oracle replays BOTH sources and the fusion — rank-based fusion "
    "needs no score calibration, which is also what makes it "
    "hash-exact.  At scale swap the vector source for any "
    "topk_cosine_* ANN variant; the fusion is source-agnostic",
)
def pipe_hybrid_rrf(spark, sf_dir):
    from ..operators import retrieval

    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    qt = spark.createDataFrame(
        [
            (0, "spark"), (0, "join"), (1, "vector"), (1, "data"),
            (2, "table"), (2, "query"), (3, "row"), (3, "hash"),
        ],
        "query_id long, term string",
    )
    qv = e.where(F.col("vec_id") < 4)
    return retrieval.hybrid_topk_rrf(d, e, qt, qv, k=5, depth=10)


_ENTROPY_ORACLE = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
cells AS (
  SELECT doc_id, u.tok AS tok, COUNT(*) AS c, MAX(len(tk)) AS nt
  FROM base, UNNEST(tk) AS u(tok)
  GROUP BY doc_id, u.tok
),
per_doc AS (
  SELECT doc_id,
         MAX(nt) AS n_tokens,
         COUNT(*) AS n_types,
         CAST(SUM(CAST(FLOOR(
           (CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))
           * (-ROUND(LN(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE)), 6))
           * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_e6
  FROM cells GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types, entropy_e6,
       CASE WHEN n_types > 1
            THEN LEAST(1.0,
                 ROUND((CAST(entropy_e6 AS DOUBLE) / 1000000)
                       / ROUND(LN(CAST(n_types AS DOUBLE)), 6), 6))
            ELSE 0.0 END AS norm_entropy6
FROM per_doc
"""


@register(
    "pipe_text_entropy",
    oracle=_ENTROPY_ORACLE,
    doc="unigram Shannon entropy (text.token_entropy): the information-"
    "density quality signal beside the Gopher repetition filters — "
    "repetition_stats sees ADJACENT duplicate n-grams, entropy sees "
    "GLOBAL token concentration (keyword stuffing, shuffled "
    "templates).  One explode + two map-side-combinable aggs, no "
    "joins/windows.  Exactness: per-type terms FLOOR((c/n)*"
    "(-ROUND(LN(c/n),6))*1e6+0.5) summed as BIGINT micro-nats "
    "(associative), norm_entropy6 = LEAST(1.0, H/ln(n_types)) via the "
    "identical round-then-divide-then-clamp order in both engines",
)
def pipe_text_entropy(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.token_entropy(d, "doc_id", "text")


_SHARD_BALANCED_ORACLE = """
WITH ranked AS (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(CASE WHEN ((rn - 1) // 8) % 2 = 0
                 THEN (rn - 1) % 8
                 ELSE 7 - ((rn - 1) % 8) END AS INT) AS shard
FROM ranked
"""


@register(
    "pipe_shard_balanced",
    oracle=_SHARD_BALANCED_ORACLE,
    doc="size-balanced training shards (curation.shard_balanced): snake "
    "allocation over the size-sorted corpus — hash sharding balances "
    "ROW counts, this balances TOTAL bytes/tokens per shard so the "
    "data-parallel trainer has no straggler shard.  The global rank is "
    "the two-pass range-partition pattern (curation.global_row_number "
    "— NO single-task window), the snake fold is pure integer "
    "arithmetic over it; the oracle replays both with ROW_NUMBER.  "
    "Deterministic and hash-exact with no rounding",
)
def pipe_shard_balanced(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curation.shard_balanced(d, "doc_id", "n_chars", n_shards=8)


def _mad_oracle(k: float = 3.0) -> str:
    """Replay of profile.mad_outlier_report: the fence coefficient is the
    SAME pre-multiplied double literal (repr-exact), so both engines do
    one multiply against the raw MAD."""
    coeff = repr(float(k) * 1.4826)
    return f"""
WITH src AS (
  SELECT event_type AS g, value AS v FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT g, quantile_cont(v, 0.5) AS med FROM src GROUP BY g
),
dev AS (
  SELECT s.g, s.v, m.med, ABS(s.v - m.med) AS dev
  FROM src s JOIN med m USING (g)
),
mad AS (
  SELECT g, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY g
)
SELECT d.g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MAX(d.med), 6) AS median6,
       ROUND(MAX(m.mad), 6) AS mad6,
       CAST(SUM(CASE WHEN d.dev > {coeff} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (g)
GROUP BY d.g
"""


@register(
    "pipe_mad_outliers",
    oracle=_mad_oracle(3.0),
    doc="median/MAD robust outlier screen (profile.mad_outlier_report), "
    "the 50%-breakdown sibling of rel_outlier_iqr's Tukey fence: "
    "per-group exact median, median absolute deviation, and a "
    "k*1.4826*MAD fence count.  Three 2-column passes with the tiny "
    "per-group medians broadcast back; exact percentile() (approx "
    "sketches would be partition-order-dependent).  The fence "
    "coefficient is ONE repr-exact double literal in both engines, "
    "deviations/comparisons raw IEEE — hash-exact with rounding only "
    "on the reported median6/mad6",
)
def pipe_mad_outliers(spark, sf_dir):
    from ..operators import profile as profile_ops

    ev = table(spark, sf_dir, "events")
    return profile_ops.mad_outlier_report(ev, "event_type", "value", k=3.0)


_UNIMAX_ORACLE = """
WITH sizes AS (
  SELECT source AS strata,
         CAST(COALESCE(SUM(CAST(n_chars AS BIGINT)), 0) AS BIGINT)
           AS stratum_tokens
  FROM documents GROUP BY source
),
staged AS (
  SELECT strata, stratum_tokens, stratum_tokens * 3 AS cap,
         ROW_NUMBER() OVER (ORDER BY stratum_tokens * 3 ASC, strata ASC)
           AS i,
         COALESCE(SUM(stratum_tokens * 3) OVER (
             ORDER BY stratum_tokens * 3 ASC, strata ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prefix,
         COUNT(*) OVER () AS n,
         (SUM(stratum_tokens) OVER ()) * 1 // 2 AS budget
  FROM sizes
),
flags AS (
  SELECT *, (cap * (n - i + 1) <= budget - prefix) AS capped FROM staged
),
summary AS (
  SELECT CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT)
           AS total_capped,
         CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT)
           AS n_capped
  FROM flags
),
calc AS (
  SELECT f.*,
         CASE WHEN f.capped THEN f.cap
              ELSE (CASE WHEN f.n - s.n_capped > 0
                         THEN (f.budget - s.total_capped)
                              // (f.n - s.n_capped)
                         ELSE 0 END)
                 + (CASE WHEN f.i - s.n_capped <=
                         (CASE WHEN f.n - s.n_capped > 0
                               THEN (f.budget - s.total_capped)
                                    % (f.n - s.n_capped)
                               ELSE 0 END)
                         THEN 1 ELSE 0 END)
         END AS alloc
  FROM flags f CROSS JOIN summary s
)
SELECT strata AS source, stratum_tokens, CAST(cap AS BIGINT) AS cap,
       CAST(alloc AS BIGINT) AS alloc,
       CASE WHEN stratum_tokens > 0
            THEN CAST(alloc AS DOUBLE) / CAST(stratum_tokens AS DOUBLE)
            ELSE 0.0 END AS epochs
FROM calc
"""


@register(
    "pipe_mix_unimax",
    oracle=_UNIMAX_ORACLE,
    doc="UniMax mixture allocation (curation.unimax_allocate, Chung "
    "2023): spread the token budget (here total/2) as uniformly as "
    "possible across sources with a hard 3-epoch repetition cap per "
    "source — the principled alternative to temperature mixing (no "
    "tuned exponent, provable low-resource over-repetition bound).  "
    "One map-side-combinable per-source token sum is the only "
    "corpus-scale work; the water-filling windows sort the N-row "
    "source relation (N = #sources, tens by construction).  The "
    "capped set is a sort-prefix (monotone condition), uncapped "
    "sources split the remainder as integers with largest-remainder "
    "leftovers, so allocations sum EXACTLY to min(budget, sum caps); "
    "epochs = alloc/size is the face's only division — hash-exact "
    "with no rounding",
)
def pipe_mix_unimax(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curation.unimax_allocate(
        d, "source", "n_chars", max_epochs=3, budget_frac=(1, 2)
    ).select(
        F.col("strata").alias("source"),
        "stratum_tokens",
        "cap",
        "alloc",
        "epochs",
    )


_KN_ORACLE = """
WITH base AS (
  SELECT doc_id,
         list_concat(list_concat([chr(2)],
           list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                             '\\s+'), x -> x <> '')),
           [chr(3)]) AS pt
  FROM documents
),
eb AS MATERIALIZED (
  SELECT doc_id, pt[u.i] AS w1, pt[u.i + 1] AS w2,
         CAST(COUNT(*) AS BIGINT) AS k_occ
  FROM base, UNNEST(range(1, len(pt))) AS u(i)
  GROUP BY doc_id, pt[u.i], pt[u.i + 1]
),
bc AS MATERIALIZED (
  SELECT w1, w2, CAST(SUM(k_occ) AS BIGINT) AS c FROM eb GROUP BY w1, w2
),
ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot FROM bc GROUP BY w1),
n1f AS (SELECT w1, COUNT(*) AS nfollow FROM bc GROUP BY w1),
ncont AS (SELECT w2, COUNT(*) AS nprec FROM bc GROUP BY w2),
tt AS (SELECT COUNT(*) AS n_types FROM bc),
model AS MATERIALIZED (
  SELECT bc.w1, bc.w2,
         CAST(FLOOR(ROUND(LN(
           ((CAST(bc.c AS DOUBLE) - 0.75) / CAST(ctx.ctot AS DOUBLE))
           + ((0.75 * CAST(n1f.nfollow AS DOUBLE))
              / CAST(ctx.ctot AS DOUBLE))
             * (CAST(ncont.nprec AS DOUBLE)
                / CAST(tt.n_types AS DOUBLE))
         ), 6) * 1000000 + 0.5) AS BIGINT) AS lnp_micro
  FROM bc
  JOIN ctx ON ctx.w1 = bc.w1
  JOIN n1f ON n1f.w1 = bc.w1
  JOIN ncont ON ncont.w2 = bc.w2
  CROSS JOIN tt
),
folded AS (
  SELECT eb.doc_id,
         CAST(SUM(eb.k_occ) AS BIGINT) AS n_bigrams,
         CAST(SUM(eb.k_occ * m.lnp_micro) AS BIGINT) AS logprob_micro
  FROM eb JOIN model m ON m.w1 = eb.w1 AND m.w2 = eb.w2
  GROUP BY eb.doc_id
)
SELECT doc_id, n_bigrams, logprob_micro,
       CAST(logprob_micro AS DOUBLE)
         / CAST(n_bigrams * 1000000 AS DOUBLE) AS avg_logprob,
       ROUND(EXP(-(CAST(logprob_micro AS DOUBLE)
                   / CAST(n_bigrams * 1000000 AS DOUBLE))), 6) AS ppl6
FROM folded
"""


@register(
    "pipe_lm_kneser_ney",
    oracle=_KN_ORACLE,
    doc="interpolated Kneser-Ney bigram LM (text.kn_bigram_lm_score, "
    "D=0.75) trained on the corpus in ONE pass and scoring every "
    "document — the smoothing that beats add-k/Jelinek-Mercer because "
    "its backoff weighs words by DISTINCT-context count (continuation "
    "probability), not raw frequency.  All four model relations (bigram "
    "counts, context totals, follower/predecessor type counts) derive "
    "from one (w1,w2) aggregation; scoring joins the per-doc distinct-"
    "bigram relation (with multiplicities) against the model, never "
    "the raw token stream.  Exactness: P(w2|w1) is fixed-order IEEE "
    "arithmetic over integers, ln rounded-6, folded as k_occ-weighted "
    "BIGINT micro-nats; avg_logprob is one exact division and "
    "ppl6 = ROUND(EXP(-avg),6) — hash-exact",
)
def pipe_lm_kneser_ney(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.kn_bigram_lm_score(d, "doc_id", "text")


_ZIPF_ORACLE = """
WITH toks AS (
  SELECT u.tok
  FROM (SELECT list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                                 '\\s+'),
                           x -> x <> '') AS tk
        FROM documents) b,
       UNNEST(tk) AS u(tok)
),
counts AS MATERIALIZED (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_tokens
  FROM counts
),
ranked AS (
  SELECT CAST(FLOOR(ROUND(LN(CAST(rank AS DOUBLE)), 6) * 1000000 + 0.5)
              AS BIGINT) AS x,
         CAST(FLOOR(ROUND(LN(CAST(c AS DOUBLE)), 6) * 1000000 + 0.5)
              AS BIGINT) AS y
  FROM (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rank
        FROM counts) t
  WHERE rank <= 200
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_fit,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM ranked
),
calc AS (
  SELECT n_fit,
         n_fit * sxy - sx * sy AS num,
         n_fit * sxx - sx * sx AS den_x,
         n_fit * syy - sy * sy AS den_y
  FROM s
)
SELECT c.n_fit, t.n_types, t.n_tokens,
       CASE WHEN c.n_fit < 2 OR c.den_x = 0 OR c.den_y = 0 THEN 0.0
            ELSE -(CAST(c.num AS DOUBLE) / CAST(c.den_x AS DOUBLE))
       END AS alpha,
       CASE WHEN c.n_fit < 2 OR c.den_x = 0 OR c.den_y = 0 THEN 0.0
            ELSE (CAST(c.num AS DOUBLE) / CAST(c.den_x AS DOUBLE))
                 * (CAST(c.num AS DOUBLE) / CAST(c.den_y AS DOUBLE))
       END AS r2
FROM calc c CROSS JOIN totals t
"""


@register(
    "pipe_corpus_zipf",
    oracle=_ZIPF_ORACLE,
    doc="Zipf-law fit (profile.zipf_fit): OLS slope + R^2 of the "
    "log-log rank-frequency curve over the top-200 token types — the "
    "one-number language-health gate (natural text: alpha ~ 1, high "
    "R^2; template spam and generated filler bend the line).  One "
    "map-side-combinable token count (types << tokens by Zipf "
    "itself), a top-k row_number over the TYPE table only (planned "
    "as a distributed TakeOrderedAndProject(200), plan-verified), and "
    "a 1-row reduction. "
    "x/y are ROUND(ln,6) micro-ints; the five OLS sufficient "
    "statistics are BIGINT sums, so alpha and r2 are two/three exact "
    "IEEE operations over integers — hash-exact with no further "
    "rounding",
)
def pipe_corpus_zipf(spark, sf_dir):
    from ..operators import profile

    d = table(spark, sf_dir, "documents")
    return profile.zipf_fit(d, "doc_id", "text", top_k=200)


_KN3_ORACLE = """
WITH base AS (
  SELECT doc_id,
         list_concat(list_concat([chr(2), chr(2)],
           list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                             '\\s+'), x -> x <> '')),
           [chr(3)]) AS pt
  FROM documents
),
td AS MATERIALIZED (
  SELECT doc_id, pt[u.i] AS w1, pt[u.i + 1] AS w2, pt[u.i + 2] AS w3,
         CAST(COUNT(*) AS BIGINT) AS k_occ
  FROM base, UNNEST(range(1, len(pt) - 1)) AS u(i)
  GROUP BY doc_id, pt[u.i], pt[u.i + 1], pt[u.i + 2]
),
c3 AS MATERIALIZED (
  SELECT w1, w2, w3, CAST(SUM(k_occ) AS BIGINT) AS c3
  FROM td GROUP BY w1, w2, w3
),
ctx3 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS ctot3
         FROM c3 GROUP BY w1, w2),
nf3 AS (SELECT w1, w2, COUNT(*) AS nf3 FROM c3 GROUP BY w1, w2),
cont2 AS MATERIALIZED (
  SELECT w2, w3, COUNT(*) AS cont2 FROM c3 GROUP BY w2, w3
),
mid2 AS (SELECT w2, CAST(SUM(cont2) AS BIGINT) AS mid2
         FROM cont2 GROUP BY w2),
nfc AS (SELECT w2, COUNT(*) AS nfc FROM cont2 GROUP BY w2),
npre2 AS (SELECT w3, COUNT(*) AS npre2 FROM cont2 GROUP BY w3),
t2c AS (SELECT COUNT(*) AS t2c FROM cont2),
model AS MATERIALIZED (
  SELECT c3.w1, c3.w2, c3.w3,
         CAST(FLOOR(ROUND(LN(
           ((CAST(c3.c3 AS DOUBLE) - 0.75) / CAST(ctx3.ctot3 AS DOUBLE))
           + ((0.75 * CAST(nf3.nf3 AS DOUBLE))
              / CAST(ctx3.ctot3 AS DOUBLE))
             * (
               ((CAST(cont2.cont2 AS DOUBLE) - 0.75)
                / CAST(mid2.mid2 AS DOUBLE))
               + ((0.75 * CAST(nfc.nfc AS DOUBLE))
                  / CAST(mid2.mid2 AS DOUBLE))
                 * (CAST(npre2.npre2 AS DOUBLE)
                    / CAST(t2c.t2c AS DOUBLE))
             )
         ), 6) * 1000000 + 0.5) AS BIGINT) AS lnp_micro
  FROM c3
  JOIN ctx3 ON ctx3.w1 = c3.w1 AND ctx3.w2 = c3.w2
  JOIN nf3 ON nf3.w1 = c3.w1 AND nf3.w2 = c3.w2
  JOIN cont2 ON cont2.w2 = c3.w2 AND cont2.w3 = c3.w3
  JOIN mid2 ON mid2.w2 = c3.w2
  JOIN nfc ON nfc.w2 = c3.w2
  JOIN npre2 ON npre2.w3 = c3.w3
  CROSS JOIN t2c
),
folded AS (
  SELECT td.doc_id,
         CAST(SUM(td.k_occ) AS BIGINT) AS n_trigrams,
         CAST(SUM(td.k_occ * m.lnp_micro) AS BIGINT) AS logprob_micro
  FROM td JOIN model m
    ON m.w1 = td.w1 AND m.w2 = td.w2 AND m.w3 = td.w3
  GROUP BY td.doc_id
)
SELECT doc_id, n_trigrams, logprob_micro,
       CAST(logprob_micro AS DOUBLE)
         / CAST(n_trigrams * 1000000 AS DOUBLE) AS avg_logprob,
       ROUND(EXP(-(CAST(logprob_micro AS DOUBLE)
                   / CAST(n_trigrams * 1000000 AS DOUBLE))), 6) AS ppl6
FROM folded
"""


@register(
    "pipe_lm_kn_trigram",
    oracle=_KN3_ORACLE,
    doc="interpolated Kneser-Ney TRIGRAM LM (text.kn_trigram_lm_score, "
    "D=0.75) — the full KenLM-shaped recursion over the bigram face: "
    "middle and bottom orders use CONTINUATION counts derived from "
    "the trigram type table (count-of-counts, never raw frequency), "
    "and the probability provably sums to 1 per history (the KN "
    "telescoping identity, test-asserted).  ALL six model relations "
    "derive from one (w1,w2,w3) aggregation — one corpus explode, no "
    "second pass; scoring joins per-doc distinct trigrams with "
    "multiplicities.  Fixed-order IEEE arithmetic + ln ROUND 6 + "
    "k_occ-weighted BIGINT micro-nat folds — hash-exact",
)
def pipe_lm_kn_trigram(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return text_ops.kn_trigram_lm_score(d, "doc_id", "text")


@register(
    "pipe_pack_efficiency",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(text, '\s+')) AS BIGINT) AS tok,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT)
               % 8 AS grp
      FROM documents
    ),
    c AS (
      SELECT grp, tok,
             SUM(tok) OVER (PARTITION BY grp ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS prev
      FROM t
    ),
    caps(capacity) AS (VALUES (CAST(512 AS BIGINT)), (CAST(2048 AS BIGINT)),
                              (CAST(8192 AS BIGINT))),
    pd AS (
      SELECT cap.capacity,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(c.tok) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN c.tok > 0 AND
                  (c.prev + c.tok - 1) // cap.capacity
                  - c.prev // cap.capacity > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
             CAST(SUM(CASE WHEN c.tok > 0 THEN
                  (c.prev + c.tok - 1) // cap.capacity
                  - c.prev // cap.capacity
                  ELSE 0 END) AS BIGINT) AS n_crossings
      FROM c CROSS JOIN caps cap GROUP BY cap.capacity
    ),
    gt AS (SELECT grp, CAST(SUM(tok) AS BIGINT) AS total FROM c GROUP BY grp),
    pg AS (
      SELECT cap.capacity,
             CAST(SUM((gt.total - 1) // cap.capacity + 1) AS BIGINT)
                 AS n_packs,
             CAST(SUM(((gt.total - 1) // cap.capacity + 1)
                       * cap.capacity - gt.total) AS BIGINT)
                 AS tail_waste_tokens
      FROM gt CROSS JOIN caps cap WHERE gt.total > 0 GROUP BY cap.capacity
    )
    SELECT pd.capacity, pd.n_docs, pd.n_tokens,
           COALESCE(pg.n_packs, 0) AS n_packs,
           pd.n_split_docs, pd.n_crossings,
           CASE WHEN pd.n_docs > 0
                THEN ROUND(CAST(pd.n_split_docs AS DOUBLE)
                           / CAST(pd.n_docs AS DOUBLE), 6) END AS split_rate6,
           COALESCE(pg.tail_waste_tokens, 0) AS tail_waste_tokens,
           CASE WHEN COALESCE(pg.n_packs, 0) > 0
                THEN ROUND(CAST(pd.n_tokens AS DOUBLE)
                           / CAST(pg.n_packs * pd.capacity AS DOUBLE), 6)
           END AS fill_rate6
    FROM pd LEFT JOIN pg ON pd.capacity = pg.capacity
    """,
    doc="capacity-sweep packing report (curation.pack_efficiency_report) "
    "— the number a trainer reads BEFORE committing to a context "
    "length: at 512/2048/8192 tokens, how many fixed-capacity "
    "training sequences does the corpus make (ceil(group_total/cap) "
    "per hash group, pack_sequences' token-stream convention), how "
    "many documents get split across a sequence boundary (attention "
    "fragmentation — the capacity-sensitive column; falls as capacity "
    "grows), and how much tail padding do the 8 parallel fill groups "
    "leave.  The prev running total is ONE window computed once "
    "(capacity-independent); the sweep is a scalar explode (rows x 3 "
    "integer tuples) into a map-side-combinable per-capacity "
    "aggregation plus 8x3 rows of group-tail arithmetic — no join "
    "carries text, zero Python.  Integer DIV on both engines (Spark "
    "`div`, DuckDB `//`) — exact at any group total and any capacity, "
    "not just the power-of-two/under-2^53 regime",
)
def pipe_pack_efficiency(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    n_ws_tokens = F.size(F.split(F.col("text"), r"\s+"))
    return curation.pack_efficiency_report(
        d, "doc_id", n_ws_tokens, capacities=(512, 2048, 8192), n_groups=8
    )
