"""Generate the committed video frame-sample fixture (deterministic,
offline): ``fixtures/data/video_expected.parquet`` — for every doc_id in the
local corpus range, the per-sampled-frame channel means a CORRECT
decoder must produce for ``synthesize_video``'s LFV1 clips at the
default sampling stride (every 2nd frame).

As with the JPEG fixture, expected values come from
``jpegcodec.reconstruct_jpeg`` (no entropy coding in the loop), so the
``pipe_multimodal_video`` hash verifies the container walk + per-frame
Huffman/marker parsing.

Run: ``python tools/gen_video_fixture.py`` (byte-deterministic).
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

N_DOCS = 5000
EVERY_K = 2


def main() -> None:
    cols = {
        k: []
        for k in (
            "doc_id", "frame_id", "n_frames", "width", "height",
            "mean_r", "mean_g", "mean_b",
        )
    }
    for i in range(N_DOCS):
        w, h = 4 + i % 13, 3 + i % 7
        n_frames = 2 + i % 4
        for f in range(0, n_frames, EVERY_K):
            vals = ((i * 31 + f * 97 + np.arange(w * h * 3)) % 256).astype(np.uint8)
            px = reconstruct_jpeg(w, h, vals)
            n = w * h
            sums = px.reshape(n, 3).sum(axis=0, dtype=np.int64)
            cols["doc_id"].append(i)
            cols["frame_id"].append(f)
            cols["n_frames"].append(n_frames)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["mean_r"].append(float(sums[0]) / n)
            cols["mean_g"].append(float(sums[1]) / n)
            cols["mean_b"].append(float(sums[2]) / n)
    table = pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "frame_id": pa.array(cols["frame_id"], pa.int32()),
            "n_frames": pa.array(cols["n_frames"], pa.int32()),
            "width": pa.array(cols["width"], pa.int32()),
            "height": pa.array(cols["height"], pa.int32()),
            "mean_r": pa.array(cols["mean_r"], pa.float64()),
            "mean_g": pa.array(cols["mean_g"], pa.float64()),
            "mean_b": pa.array(cols["mean_b"], pa.float64()),
        }
    )
    out = os.path.join(REPO_ROOT, "lightfusion_spark", "fixtures", "data", "video_expected.parquet")
    pq.write_table(table, out, compression="snappy")
    print(f"wrote {len(cols['doc_id'])} expected sampled frames to {out}")


if __name__ == "__main__":
    main()
