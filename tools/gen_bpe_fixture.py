"""Generate the committed BPE fixtures (deterministic, offline):

* ``fixtures/data/bpe_merges.txt`` — merges trained on the sf0.001 documents
  corpus by ``operators.tokenize.train_bpe``;
* ``fixtures/data/bpe_expected.parquet`` — expected tokenization for every
  DISTINCT document text across sf0.001 + sf0.01 + sf0.1, keyed by
  ``md5(text)`` so the DuckDB oracle joins on content, not ids.

The expected ids are produced by :func:`reference_encode`, an
INDEPENDENT encoder (apply merges in rank order, replacing all
occurrences per pass — the subword-nmt formulation) rather than the
operator's min-rank iterative loop, so the fixture genuinely
cross-checks the production implementation instead of replaying it.

Run: ``python tools/gen_bpe_fixture.py`` (byte-deterministic; re-run to
verify nothing drifts).
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from lightfusion_spark.operators.tokenize import (  # noqa: E402
    PRETOKEN_RE,
    bytes_to_unicode,
    format_merges,
    parse_merges,
    train_bpe,
)

TESTDATA = "/root/testdata"
#: Deliberately BELOW the tiny corpus's saturation point (127 merges, at
#: which every in-vocab word collapses to one token and BPE degenerates
#: into whitespace counting): at 80 merges the corpus tokenizes at ~1.9
#: subword tokens per word, so the token-exact chunk/pack variants are
#: measurably different from the whitespace-based ones.
N_MERGES = 80


def reference_encode(text: str, merges: list[tuple[str, str]]) -> list[int]:
    """Independent byte-level BPE encoder: for each word, apply every
    merge IN RANK ORDER, replacing all occurrences left-to-right per
    pass.  Agrees with the min-rank iterative encoder whenever merges
    come from a greedy trainer (created pairs always rank later than
    their creating merge) — which is exactly the cross-implementation
    property the fixture pins down."""
    byte_enc = bytes_to_unicode()
    base = sorted(byte_enc.values())
    vocab = {s: i for i, s in enumerate(base)}
    for i, (a, b) in enumerate(merges):
        vocab[a + b] = 256 + i
    out: list[int] = []
    for word in PRETOKEN_RE.findall(text or ""):
        parts = [byte_enc[b] for b in word.encode("utf-8")]
        for a, b in merges:
            if len(parts) < 2:
                break
            merged: list[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        out.extend(vocab[p] for p in parts)
    return out


#: pipe_bpe_train's face parameters — the expected-merges fixture must be
#: trained with exactly these.
TRAIN_N_MERGES = 40
TRAIN_MIN_COUNT = 2


def reference_train(texts: list[str], n_merges: int, min_count: int) -> list[tuple[str, str]]:
    """Independent greedy BPE trainer (Sennrich et al.): its own word
    counting, pair counting, and merge application — shares NO code with
    ``_greedy_merges``/``train_bpe_distributed``, so the committed
    expected-merges fixture genuinely cross-checks the distributed
    trainer's word-histogram path AND merge loop instead of replaying
    them.  Ties break to the lexicographically smallest pair (the
    documented deterministic order both sides implement)."""
    from collections import Counter

    byte_enc = bytes_to_unicode()
    freq: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in PRETOKEN_RE.findall(t or ""):
            freq[tuple(byte_enc[b] for b in w.encode("utf-8"))] += 1
    table = {w: c for w, c in freq.items() if c >= min_count}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, c in table.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        ab = best[0] + best[1]
        new_table: dict[tuple[str, ...], int] = {}
        for w, c in table.items():
            out: list[str] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(ab)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            k = tuple(out)
            new_table[k] = new_table.get(k, 0) + c
        table = new_table
    return merges


#: 2^61 - 1 (prime): the corpus-signature modulus shared with the oracle.
SIG_MOD = 2305843009213693951


def corpus_signature(texts: list[str]) -> int:
    """Order-insensitive corpus content signature, recomputable by a
    static DuckDB oracle: ``SUM(first-14-hex of md5(coalesce(text,'')))
    % (2^61-1)``."""
    return (
        sum(
            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:14], 16)
            for t in texts
        )
        % SIG_MOD
    )


def load_texts(sf: str) -> list[str]:
    tbl = pq.read_table(
        os.path.join(TESTDATA, sf, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    return [t if t is not None else "" for _, t in rows]


def main() -> None:
    train_texts = load_texts("sf0.001")
    merges = train_bpe(train_texts, N_MERGES)
    merges_path = os.path.join(REPO_ROOT, "lightfusion_spark", "fixtures", "data", "bpe_merges.txt")
    with open(merges_path, "w", encoding="utf-8") as fh:
        fh.write(format_merges(merges))
    # round-trip check: the file parses back to the exact merge list
    with open(merges_path, "r", encoding="utf-8") as fh:
        assert parse_merges(fh.read()) == merges

    seen: dict[str, tuple[int, str]] = {}
    # training stays sf0.001-only; COVERAGE spans every local scale so the
    # sf0.1 full-corpus parity sweep holds for the BPE queries too
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for text in load_texts(sf):
            fp = hashlib.md5(text.encode("utf-8")).hexdigest()
            if fp in seen:
                continue
            ids = reference_encode(text, merges)
            seen[fp] = (len(ids), " ".join(map(str, ids)))
    # plus the chat-template SEGMENT texts of the conversations fixture
    # (the SFT loss-span face tokenizes per-segment — header "<|role|>\n"
    # and body "content\n" — so the oracle joins segments by content hash
    # exactly like documents)
    import json

    conv_path = os.path.join(
        REPO_ROOT, "lightfusion_spark", "fixtures", "data",
        "conversations.jsonl",
    )
    with open(conv_path, "r", encoding="ascii") as fh:
        for line in fh:
            obj = json.loads(line)
            for m in obj.get("messages") or []:
                role = m.get("role") or ""
                content = m.get("content") or ""
                for text in (f"<|{role}|>\n", content + "\n"):
                    fp = hashlib.md5(text.encode("utf-8")).hexdigest()
                    if fp in seen:
                        continue
                    ids = reference_encode(text, merges)
                    seen[fp] = (len(ids), " ".join(map(str, ids)))

    fps = sorted(seen)
    table = pa.table(
        {
            "fp_md5": pa.array(fps, pa.string()),
            "n_tokens": pa.array([seen[f][0] for f in fps], pa.int32()),
            "token_ids_str": pa.array([seen[f][1] for f in fps], pa.string()),
        }
    )
    out_path = os.path.join(REPO_ROOT, "lightfusion_spark", "fixtures", "data", "bpe_expected.parquet")
    pq.write_table(table, out_path, compression="snappy")

    # Expected MERGE TABLES for pipe_bpe_train, one per local corpus,
    # keyed by a corpus CONTENT SIGNATURE the static oracle string can
    # recompute from the registered views: sum over documents of the
    # first-14-hex-digit md5 of coalesce(text, ''), mod 2^61-1 (DuckDB
    # sums BIGINT into HUGEINT, so no overflow before the mod).  Count
    # alone is NOT an identity — sf0.001 and sf0.01 both hold 500 docs
    # with different content.  An uncovered corpus joins to zero rows
    # and fails the driver's row-count gate loudly.
    t_sig, t_rank, t_left, t_right = [], [], [], []
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        texts = load_texts(sf)
        sig = corpus_signature(texts)
        expected = reference_train(texts, TRAIN_N_MERGES, TRAIN_MIN_COUNT)
        for rank, (a, b) in enumerate(expected):
            t_sig.append(sig)
            t_rank.append(rank)
            t_left.append(a)
            t_right.append(b)
    train_table = pa.table(
        {
            "corpus_sig": pa.array(t_sig, pa.int64()),
            "rank": pa.array(t_rank, pa.int32()),
            "left": pa.array(t_left, pa.string()),
            "right": pa.array(t_right, pa.string()),
        }
    )
    train_path = os.path.join(REPO_ROOT, "lightfusion_spark", "fixtures", "data", "bpe_train_expected.parquet")
    pq.write_table(train_table, train_path, compression="snappy")
    print(
        f"wrote {len(merges)} merges to {merges_path}, "
        f"{len(fps)} expected tokenizations to {out_path}, and "
        f"{len(t_rank)} expected training merges to {train_path}"
    )


if __name__ == "__main__":
    main()
