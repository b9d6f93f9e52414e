"""Generate the committed JPEG decode fixture (deterministic, offline):
``fixtures/data/jpeg_expected.parquet`` — for every doc_id in the local corpus
range, the channel means a CORRECT decoder must produce for the
synthetic payload ``synthesize_media(formats=("jpeg",))`` builds.

Expected values come from ``jpegcodec.reconstruct_jpeg`` — the
encoder-side reconstruction (quantize → dequantize → IDCT →
color-back), computed WITHOUT the entropy-coded bitstream — so the
driver's hash compare of ``pipe_multimodal_jpeg`` verifies the layers a
fixture can meaningfully verify: the Huffman/bit-stuffing/marker
plumbing the decoder independently parses.

Run: ``python tools/gen_jpeg_fixture.py`` (byte-deterministic).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from lightfusion_spark.operators.jpegcodec import reconstruct_jpeg  # noqa: E402

#: doc_id range covering every local scale (sf0.1 has doc_id 0..4999).
N_DOCS = 5000


def main() -> None:
    rows = {k: [] for k in ("doc_id", "fmt", "width", "height", "mean_r", "mean_g", "mean_b")}
    for i in range(N_DOCS):
        w, h = 4 + i % 13, 3 + i % 7
        vals = ((i * 31 + np.arange(w * h * 3)) % 256).astype(np.uint8)
        px = reconstruct_jpeg(w, h, vals)
        n = w * h
        sums = px.reshape(n, 3).sum(axis=0, dtype=np.int64)
        rows["doc_id"].append(i)
        rows["fmt"].append("jpeg")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["mean_r"].append(float(sums[0]) / n)
        rows["mean_g"].append(float(sums[1]) / n)
        rows["mean_b"].append(float(sums[2]) / n)
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "mean_r": pa.array(rows["mean_r"], pa.float64()),
            "mean_g": pa.array(rows["mean_g"], pa.float64()),
            "mean_b": pa.array(rows["mean_b"], pa.float64()),
        }
    )
    out = os.path.join(REPO_ROOT, "lightfusion_spark", "fixtures", "data", "jpeg_expected.parquet")
    pq.write_table(table, out, compression="snappy")
    print(f"wrote {N_DOCS} expected JPEG decodes to {out}")


if __name__ == "__main__":
    main()
