"""Byte-level BPE tokenizer tests: hand-computable trainer/encoder cases,
cross-check against the independent rank-order encoder from
tools/gen_bpe_fixture.py, and the token-exact chunking invariants."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from lightfusion_spark.operators import tokenize as tk

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from gen_bpe_fixture import reference_encode  # noqa: E402


def test_trainer_hand_case():
    # corpus "aa aa": pre-tokens "aa" and " aa"; pair (a,a) occurs twice,
    # so it merges first; then (Ġ, aa) is the only pair left
    merges = tk.train_bpe(["aa aa"], 10)
    g = tk.bytes_to_unicode()[ord(" ")]
    assert merges == [("a", "a"), (g, "aa")]

    # all-singleton tie: lexicographically smallest pair wins
    first = tk.train_bpe(["ab cd"], 1)
    assert first == [("a", "b")]


def test_encoder_hand_case():
    merges = tk.train_bpe(["aa aa"], 10)
    tok = tk.BPETokenizer(merges)
    g = tk.bytes_to_unicode()[ord(" ")]
    assert tok.encode("aa aa") == [tok.vocab["aa"], tok.vocab[g + "aa"]]
    # leftmost-first merging inside a run: "aaa" -> ["aa", "a"]
    assert tok.encode("aaa") == [tok.vocab["aa"], tok.vocab["a"]]
    assert tok.encode("") == []
    assert tok.encode(None) == []


@pytest.mark.parametrize(
    "text",
    [
        "the fast key order sort table scan",
        "héllo wörld 123!! x_y's  don't",
        "",
        "a" * 257,
        "\n\t  mixed   whitespace\n",
        "汉字 bytes über ß",
    ],
)
def test_matches_independent_rank_order_encoder(text):
    with open(tk.DEFAULT_MERGES_PATH, "r", encoding="utf-8") as fh:
        merges = tk.parse_merges(fh.read())
    tok = tk.BPETokenizer(merges)
    assert tok.encode(text) == reference_encode(text, merges)


def test_ids_round_trip_through_vocab():
    """Decoding the id sequence through the derived vocab reproduces the
    exact input text — token ids lose nothing (byte-level property)."""
    with open(tk.DEFAULT_MERGES_PATH, "r", encoding="utf-8") as fh:
        tok = tk.BPETokenizer(tk.parse_merges(fh.read()))
    inv_vocab = {i: s for s, i in tok.vocab.items()}
    inv_bytes = {c: b for b, c in tok.byte_enc.items()}
    text = "the fast ünïcode 12 batches!!"
    ids = tok.encode(text)
    decoded = bytes(
        inv_bytes[ch] for i in ids for ch in inv_vocab[i]
    ).decode("utf-8")
    assert decoded == text


def test_parse_merges_rejects_malformed():
    with pytest.raises(ValueError, match="malformed"):
        tk.parse_merges("justonesymbol\n")
    with pytest.raises(ValueError, match="duplicate"):
        tk.BPETokenizer([("a", "b"), ("a", "b")])


def test_tokenize_bpe_operator(spark, tmp_path):
    merges_path = str(tmp_path / "merges.txt")
    with open(merges_path, "w", encoding="utf-8") as fh:
        fh.write(tk.format_merges(tk.train_bpe(["aa aa"], 10)))
    df = spark.createDataFrame(
        [(1, "aa aa"), (2, "aaa"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["token_ids"])
        for r in tk.tokenize_bpe(df, "doc_id", "text", merges_path).collect()
    }
    tok = tk.BPETokenizer(tk.train_bpe(["aa aa"], 10))
    assert out[1] == (2, tok.encode("aa aa"))
    assert out[2] == (2, tok.encode("aaa"))
    # NULL and empty text are the empty document, never NULL output
    assert out[3] == (0, [])
    assert out[4] == (0, [])


def test_chunk_token_ids_invariants(spark):
    chunk, overlap = 8, 3
    stride = chunk - overlap
    rows = [(i, list(range(n))) for i, n in enumerate([0, 1, 8, 9, 23, 40])]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    got = (
        tk.chunk_token_ids(df, "doc_id", "token_ids", chunk, overlap)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate([0, 1, 8, 9, 23, 40]):
        chunks = by_doc[i]
        # chunk_ids are dense from 0; windows advance by stride
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            start = c["chunk_id"] * stride
            expect = list(range(start, min(start + chunk, n)))
            assert c["chunk_ids"] == expect
            assert c["n_chunk_tokens"] == len(expect)
            covered.update(expect)
        # every token belongs to >= 1 chunk; every chunk but the last full
        assert covered == set(range(n))
        assert all(c["n_chunk_tokens"] == chunk for c in chunks[:-1])
        # the HF overflow rule: the window BEFORE the last one hasn't
        # reached the end yet (no chunk fully contained in a predecessor)
        if len(chunks) > 1:
            assert (len(chunks) - 2) * stride + chunk < n

    with pytest.raises(ValueError, match="chunk_tokens"):
        tk.chunk_token_ids(df, "doc_id", chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        tk.chunk_token_ids(df, "doc_id", chunk_tokens=4, overlap=4)


def test_tokenize_plan_is_arrow_vectorized(spark):
    """The tokenizer must cross into Python exactly once, Arrow-batched
    (MapInPandas) — never row-pickling BatchEvalPython."""
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        tk.tokenize_bpe(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_distributed_trainer_equals_local(spark):
    """train_bpe_distributed must learn EXACTLY the merges the local
    trainer learns from the same texts — the two differ only in how the
    word histogram is counted (mapInPandas+groupBy vs a Python loop)."""
    from lightfusion_spark.operators.tokenize import (
        BPETokenizer,
        train_bpe,
        train_bpe_distributed,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    sdf = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(300)
    texts = [r["text"] for r in sdf.select("text").collect()]
    local = train_bpe(texts, 30)
    dist = train_bpe_distributed(sdf, "text", 30)
    assert dist == local
    # and the learned merges drive a working encoder
    tok = BPETokenizer(dist)
    ids = tok.encode(texts[0])
    assert ids and all(isinstance(i, int) for i in ids)


def test_distributed_trainer_bounds(spark):
    from lightfusion_spark.operators.tokenize import (
        train_bpe_distributed,
        word_histogram,
    )

    sdf = spark.createDataFrame(
        [("aa bb aa cc aa bb",), ("aa dd",)], "text string"
    )
    hist = {r["word"]: r["count"] for r in word_histogram(sdf, "text").collect()}
    # leading-space pretokens: 'aa' bare at both text starts, twice
    # with the Ġ space marker inside the first text.
    assert hist["aa"] == 2 and hist["Ġaa"] == 2
    # min_count prunes hapax words; max_words keeps top-N by frequency
    m_all = train_bpe_distributed(sdf, "text", 5)
    m_pruned = train_bpe_distributed(sdf, "text", 5, min_count=2)
    assert m_all != m_pruned or len(m_pruned) <= len(m_all)
    m_top = train_bpe_distributed(sdf, "text", 5, max_words=1)
    assert len(m_top) <= 5
