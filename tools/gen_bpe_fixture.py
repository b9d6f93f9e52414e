"""Generate the committed BPE fixtures (deterministic, offline):

* ``data/bpe_merges.txt`` — merges trained on the sf0.001 documents
  corpus by ``operators.tokenize.train_bpe``;
* ``data/bpe_expected.parquet`` — expected tokenization for every
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
    merges_path = os.path.join(REPO_ROOT, "data", "bpe_merges.txt")
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

    fps = sorted(seen)
    table = pa.table(
        {
            "fp_md5": pa.array(fps, pa.string()),
            "n_tokens": pa.array([seen[f][0] for f in fps], pa.int32()),
            "token_ids_str": pa.array([seen[f][1] for f in fps], pa.string()),
        }
    )
    out_path = os.path.join(REPO_ROOT, "data", "bpe_expected.parquet")
    pq.write_table(table, out_path, compression="snappy")
    print(
        f"wrote {len(merges)} merges to {merges_path} and "
        f"{len(fps)} expected tokenizations to {out_path}"
    )


if __name__ == "__main__":
    main()
