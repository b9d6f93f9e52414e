"""Real subword tokenization: byte-level BPE (GPT-2 family) as an
Arrow-batched Spark operator (SURVEY §2.4 — beyond the reference, which
has no text surface; every prior "token" count in this repo was
whitespace-split, which misstates pretraining token budgets by ~1.3-1.5x).

The algorithm is the published GPT-2 byte-level BPE (Radford et al. 2019;
the byte→unicode table and merge loop are public knowledge from OpenAI's
MIT-licensed ``encoder.py``):

* pre-tokenize into words (contractions, letter runs, digit runs,
  punctuation runs, with the leading-space convention);
* map each word's UTF-8 bytes through a fixed 256-symbol byte→unicode
  bijection (so arbitrary bytes become printable, merge-able symbols);
* repeatedly merge the lowest-ranked adjacent symbol pair until no
  learned merge applies.

Vocabulary ids are DERIVED from the merges file alone: the 256 base byte
symbols take ids 0-255 in sorted-codepoint order, and the symbol created
by merge ``i`` takes id ``256 + i`` — no separate vocab artifact to keep
in sync.  The committed fixture (``fixtures/data/bpe_merges.txt``) is trained by
:func:`train_bpe` on the sf0.001 documents corpus
(``tools/gen_bpe_fixture.py`` regenerates it deterministically).

Spark-first design (the ``functions/inference.py`` pattern):

* ``mapInPandas`` — Arrow batches in, one Python worker call per
  partition; the bytes never round-trip through per-row Python objects.
* **Per-executor tokenizer cache** keyed by the merges digest: the merges
  text ships in the UDF closure (tens of KB), each executor process
  parses it once.
* **Per-word memo** inside the tokenizer: natural-language word
  frequency is Zipfian, so the merge loop runs once per DISTINCT word
  per executor, not once per occurrence.

100 TB notes: tokenization is embarrassingly parallel — no shuffle, no
driver state; memory is bounded by the Arrow batch size plus the word
memo (distinct words per executor, Zipf-bounded).  Chunking over the id
arrays (:func:`chunk_token_ids`) is a pure JVM projection + explode,
zero shuffles, same plan shape as ``text.chunk_documents``.
"""

from __future__ import annotations

import hashlib
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fixtures import fixture_path

#: The committed merges fixture (trained on sf0.001 documents).
DEFAULT_MERGES_PATH = fixture_path("data", "bpe_merges.txt")

#: GPT-2's pre-tokenizer, with ``\p{L}`` → ``[^\W\d_]`` and ``\p{N}`` →
#: ``\d`` (Python ``re`` has no ``\p`` classes; these Unicode-aware
#: equivalents keep letters/digits/punctuation disjoint).
PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→unicode bijection: printable latin ranges map to
    themselves; the remaining 68 bytes map to U+0100.. so every byte is a
    visible, space-free symbol (merge tables stay plain text)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class BPETokenizer:
    """Byte-level BPE encoder over a ranked merge list."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.byte_enc = bytes_to_unicode()
        self.ranks: dict[tuple[str, str], int] = {p: i for i, p in enumerate(merges)}
        if len(self.ranks) != len(merges):
            raise ValueError("duplicate pair in merges list")
        base = sorted(self.byte_enc.values())
        self.vocab: dict[str, int] = {s: i for i, s in enumerate(base)}
        for i, (a, b) in enumerate(merges):
            self.vocab[a + b] = 256 + i
        self._word_memo: dict[str, list[int]] = {}

    def _bpe(self, symbols: list[str]) -> list[str]:
        """Iteratively merge the lowest-ranked adjacent pair (leftmost
        occurrence first).  Equivalent to the merge-all-occurrences
        formulation because a pair created by merge ``r`` can only have
        been learned after ``r`` during training, so its rank is > r —
        the property ``tests/test_tokenize.py`` cross-checks against the
        independent rank-order encoder."""
        parts = symbols
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts = (
                parts[:best_i]
                + [parts[best_i] + parts[best_i + 1]]
                + parts[best_i + 2 :]
            )
        return parts

    def encode_word(self, word: str) -> list[int]:
        ids = self._word_memo.get(word)
        if ids is None:
            symbols = [self.byte_enc[b] for b in word.encode("utf-8")]
            ids = [self.vocab[s] for s in self._bpe(symbols)]
            self._word_memo[word] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for word in PRETOKEN_RE.findall(text or ""):
            out.extend(self.encode_word(word))
        return out


def format_merges(merges: list[tuple[str, str]]) -> str:
    """Merges → text, one ``a b`` pair per line (symbols are space-free
    by byte→unicode construction)."""
    return "".join(f"{a} {b}\n" for a, b in merges)


def parse_merges(text: str) -> list[tuple[str, str]]:
    """Inverse of :func:`format_merges`.  Only a ``#version`` header line
    (the published merges-file convention) is skipped — ``#`` itself is a
    legal BPE symbol (a markdown/C-heavy corpus legitimately learns the
    merge ``('#', '#')``), so blanket ``#``-comment handling would
    silently drop merges and shift every later rank/vocab id."""
    merges: list[tuple[str, str]] = []
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line or line.startswith("#version"):
            continue
        a, sep, b = line.partition(" ")
        if not sep or not b:
            raise ValueError(f"malformed merges line: {line!r}")
        merges.append((a, b))
    return merges


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus — the standard greedy
    trainer (Sennrich et al. 2016): repeatedly merge the most frequent
    adjacent symbol pair over the word-frequency table.  Deterministic:
    ties break on the lexicographically smallest pair.

    Driver-side by design — fixture training runs once, offline, on a
    bounded sample (``tools/gen_bpe_fixture.py``).  The corpus-scale
    face is :func:`train_bpe_distributed`: the word FREQUENCY table
    comes from one distributed groupBy, and the same greedy loop
    (:func:`_greedy_merges`) runs on that Zipf-bounded table, never the
    corpus.
    """
    byte_enc = bytes_to_unicode()
    words: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in PRETOKEN_RE.findall(t or ""):
            key = tuple(byte_enc[b] for b in w.encode("utf-8"))
            words[key] = words.get(key, 0) + 1
    return _greedy_merges(words, n_merges)


def _greedy_merges(
    words: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[str, str]]:
    """The greedy merge loop over a word-frequency table, shared by the
    local and distributed trainers (equivalence by construction — the
    two trainers differ ONLY in how the table is counted)."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        a, b = best
        merged = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for w, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
        merges.append(best)
    return merges


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """Distributed word-frequency table ``(word, count)`` with ``word``
    already byte-level-encoded (the unicode remapping every symbol in
    training/encoding lives in).

    One Arrow-batched ``mapInPandas`` crossing emits per-batch partial
    counts (a Zipf-bounded dict per batch, not a row per token), then
    one map-side-combined groupBy finishes the sum — the only shuffle,
    carrying distinct words, not the corpus.
    """
    byte_enc = bytes_to_unicode()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict[str, int] = {}
            for t in pdf[text_col]:
                for w in PRETOKEN_RE.findall(t or ""):
                    key = "".join(byte_enc[b] for b in w.encode("utf-8"))
                    counts[key] = counts.get(key, 0) + 1
            yield pd.DataFrame(
                {"word": list(counts.keys()), "count": list(counts.values())}
            )

    return (
        df.select(text_col)
        .mapInPandas(gen, "word string, count long")
        .groupBy("word")
        .agg(F.sum("count").alias("count"))
    )


def train_bpe_distributed(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 1,
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Corpus-scale BPE training: distributed word counting + the same
    driver-side greedy merge loop as :func:`train_bpe`.

    This is how production tokenizer trainers actually scale (HF
    tokenizers, SentencePiece): the corpus pass is ONE word-count
    aggregation; the merge loop is quadratic only in the *distinct-word
    table*, which Zipf bounds far below corpus size.  For 100 TB inputs
    bound the driver table explicitly: ``min_count`` drops hapax noise
    (standard practice — rare words can't win a merge anyway) and
    ``max_words`` caps the table at the top-N words by frequency
    (deterministic: ties break on the lexicographically smaller word).

    Returns the ranked merge list — feed it to :class:`BPETokenizer`
    or serialize with the fixture format for :func:`tokenize_bpe`.
    """
    hist = word_histogram(df, text_col)
    if min_count > 1:
        hist = hist.where(F.col("count") >= min_count)
    if max_words is not None:
        hist = hist.orderBy(F.desc("count"), F.asc("word")).limit(max_words)
    words = {tuple(r["word"]): r["count"] for r in hist.collect()}
    return _greedy_merges(words, n_merges)


#: Per-executor-process parsed-tokenizer cache keyed by merges digest
#: (the ``functions/inference.py`` model-cache pattern).
_TOKENIZER_CACHE: dict[str, BPETokenizer] = {}


def _get_tokenizer(digest: str, merges_text: str) -> BPETokenizer:
    tok = _TOKENIZER_CACHE.get(digest)
    if tok is None:
        tok = BPETokenizer(parse_merges(merges_text))
        _TOKENIZER_CACHE[digest] = tok
    return tok


def tokenize_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges_path: str | None = None,
) -> DataFrame:
    """Tokenize ``text_col`` with the byte-level BPE defined by
    ``merges_path`` (default: the committed fixture).

    Returns ``(id_col, n_tokens, token_ids)`` — ``token_ids`` is
    ``array<int>`` ready for :func:`chunk_token_ids` /
    ``curation.pack_sequences``; NULL text tokenizes as the empty
    document (0 tokens), never NULL output.
    """
    path = merges_path or DEFAULT_MERGES_PATH
    with open(path, "r", encoding="utf-8") as fh:
        merges_text = fh.read()
    parse_merges(merges_text)  # validate at plan time, not inside executors
    digest = hashlib.sha256(merges_text.encode("utf-8")).hexdigest()[:16]
    id_type = dict(df.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = _get_tokenizer(digest, merges_text)
        for pdf in batches:
            ids = [tok.encode(t) for t in pdf[text_col].fillna("")]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [len(x) for x in ids],
                    "token_ids": ids,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, n_tokens int, token_ids array<int>"
    )


def chunk_token_ids(
    df: DataFrame,
    id_col: str,
    ids_col: str = "token_ids",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Token-EXACT chunking: fixed-size windows with overlap over a real
    token-id array (the subword upgrade of ``text.chunk_documents``,
    same HuggingFace ``return_overflowing_tokens`` windowing rule).

    Chunk ``i`` covers ids ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; every chunk except the last is
    exactly ``chunk_tokens`` ids, every id belongs to >= 1 chunk.  A
    0-token document yields one empty chunk (so every document survives
    into the chunked relation).  Returns ``(id_col, chunk_id,
    n_chunk_tokens, chunk_ids)``.

    Pure projection + explode over the id array — zero shuffles, no
    Python; the windowing is ``slice`` inside whole-stage codegen.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens, got {overlap}"
        )
    stride = chunk_tokens - overlap
    n = F.size(F.col(ids_col))
    last_chunk = (
        F.when(n <= chunk_tokens, F.lit(0))
        .otherwise(F.ceil((n - chunk_tokens) / stride))
        .cast("int")
    )
    exploded = df.select(
        F.col(id_col),
        F.col(ids_col).alias("_ids"),
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), last_chunk)).alias("chunk_id"),
    )
    return exploded.select(
        F.col(id_col),
        "chunk_id",
        F.greatest(
            F.lit(0),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_id") * stride),
        ).alias("n_chunk_tokens"),
        F.slice(
            F.col("_ids"), F.col("chunk_id") * stride + 1, F.lit(chunk_tokens)
        ).alias("chunk_ids"),
    )
