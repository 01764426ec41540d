"""Materialize the real-photo lake fixture: ``fixtures/photos.parquet``.

Takes the four photos bundled with the Spark distribution
(``data/mllib/images/origin/kittens`` — public Apache-licensed sample
data) and packs them as a parquet BLOB table together with
deterministic derived variants the repo's own encoders produce:

- ``orig``      — the JPEG bytes verbatim            (ids 1..4)
- ``reenc_q60`` — repo-encoder JPEG re-encode, q=60  (ids 101..104,
                  lossy: a planted NEAR-dup of its photo)
- ``ppm``       — P6 re-pack of the decoded raster   (ids 201..204,
                  lossless: an EXACT phash dup of its photo)
- ``bmp``       — 24-bit BMP re-pack                 (ids 301..304,
                  lossless: an EXACT phash dup of its photo)

Schema: (asset_id bigint, photo int, variant text, fmt text,
payload binary). 16 rows, ~350 KB — committed to the repo so the
declared ``multimodal_photo_*`` relations read REAL photo bytes.

The script also prints the ``_PHOTO_EXPECTED`` constants block pasted
into queries.py: per-asset aHash signature words + decoded dimensions
+ byte length, computed here once through the same pure-numpy decoder
the Spark operators use. Decoding is deterministic, so the declared
queries' recompute-from-raw-bytes must reproduce these values exactly
— the oracle VALUES literal pins them (the ann_topk_ivfpq_persisted
proof shape: the round-trip is the oracle-level claim).

Regenerate with:  python tools/gen_photo_fixture.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from overpaint_spark.operators import multimodal as MM  # noqa: E402
from overpaint_spark.operators.jpeg import encode_jpeg  # noqa: E402

KITTENS = Path("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens")
OUT = Path(__file__).resolve().parent.parent / "fixtures" / "photos.parquet"


def encode_ppm(arr: np.ndarray) -> bytes:
    """Binary P6 (RGB) / P5 (gray) pack of an H×W×C uint8 raster —
    lossless, so the decoded pixels (and hence the aHash) are identical
    to the source raster's."""
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit bottom-up uncompressed BMP of an H×W×3 uint8 raster."""
    h, w, c = arr.shape
    if c == 1:
        arr = np.repeat(arr, 3, axis=2)
    row_bytes = (w * 3 + 3) & ~3
    data = np.zeros((h, row_bytes), dtype=np.uint8)
    data[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixels = data.tobytes()
    off = 14 + 40
    size = off + len(pixels)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return hdr + pixels


def main() -> None:
    files = sorted(KITTENS.glob("*.jpg"))
    assert len(files) == 4, files
    rows: list[tuple[int, int, str, str, bytes]] = []
    for photo, f in enumerate(files, start=1):
        payload = f.read_bytes()
        arr = MM.decode_image(payload)
        assert arr is not None, f
        rows.append((photo, photo, "orig", "jpeg", payload))
        rows.append((100 + photo, photo, "reenc_q60", "jpeg", encode_jpeg(arr, quality=60)))
        rows.append((200 + photo, photo, "ppm", "ppm", encode_ppm(arr)))
        rows.append((300 + photo, photo, "bmp", "bmp", encode_bmp(arr)))

    OUT.parent.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {
            "asset_id": pa.array([r[0] for r in rows], pa.int64()),
            "photo": pa.array([r[1] for r in rows], pa.int32()),
            "variant": pa.array([r[2] for r in rows], pa.string()),
            "fmt": pa.array([r[3] for r in rows], pa.string()),
            "payload": pa.array([r[4] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, {len(rows)} assets)")

    print("\n# paste into queries.py — (asset_id, w0, w1, width, height, byte_len)")
    print("_PHOTO_EXPECTED = [")
    for asset_id, _photo, _variant, _fmt, payload in rows:
        arr = MM.decode_image(payload)
        w0, w1 = MM.ahash_words(arr)
        h, w = arr.shape[:2]
        print(f"    ({asset_id}, {w0}, {w1}, {w}, {h}, {len(payload)}),")
    print("]")


if __name__ == "__main__":
    main()
