"""Multimodal (image/audio/video) column handling (SURVEY §7.4.4).

A multimodal asset is an opaque ``binary`` payload plus a typed metadata
struct — the Spark-side contract (schema, partitioning, Arrow batch
shape) is real and tested; the actual codec work is stubbed because the
decode libraries are not in this environment (clearly marked below).
The reference's analog is its type-only treatment of ``bytea`` columns
(listTables.tsx:117): payloads are profiled, never parsed.

Layout at scale: payloads live in their own column so Parquet column
pruning skips them unless explicitly selected; metadata-only pipelines
never read a single payload byte.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, payload binary, media_type string, "
    "meta struct<byte_len: long, sha256: string, width: int, height: int>"
)


def attach_payload(df: DataFrame, id_col: str, content_col: str, media_type: str = "image/fake") -> DataFrame:
    """Wrap a source column as a binary payload column (UTF-8 bytes for
    text sources; real ingest would read files via ``binaryFile``)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.col(content_col).cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake for the image decode step.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload))
    .size; the decode libraries are not installed in this container, so
    dimensions are derived deterministically from the payload length (the
    Spark-side plumbing — batching, schema, partitioning — is what is
    exercised and tested).
    """
    n = len(payload)
    return (1 + n % 1024, 1 + (n // 1024) % 1024)


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction via ``mapInPandas``.

    Output: (asset_id, byte_len, sha256, width, height). Byte length and
    sha256 are real; width/height come from the stubbed decode. One
    narrow pass over the payload column, no shuffle.
    """
    out_schema = "asset_id long, byte_len long, sha256 string, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_fake_decode_dims(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, out_schema)


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched image resize via ``mapInPandas``.

    STUB decode: if PIL is importable the real resize runs; in this
    container it is not, so the output payload is a deterministic fake
    (md5-keystream bytes of exactly ``width*height`` length) — the
    Spark-side contract (schema, batch shape, per-partition statelessness,
    payload-column pruning) is real and tested either way.
    """
    out_schema = "asset_id long, payload binary, width int, height int"

    try:  # pragma: no cover - PIL absent in this environment
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def fake_resized(payload: bytes) -> bytes:
        # md5 in counter mode: deterministic, payload-dependent, exact size
        out = bytearray()
        counter = 0
        while len(out) < width * height:
            out.extend(hashlib.md5(payload + b":" + str(counter).encode()).digest())
            counter += 1
        return bytes(out[: width * height])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if have_pil:  # pragma: no cover
                import io
                from PIL import Image

                payloads = [
                    Image.open(io.BytesIO(p)).resize((width, height)).tobytes()
                    for p in pdf["payload"]
                ]
            else:
                payloads = [fake_resized(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, out_schema)


FEATURE_DIM = 8


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Per-asset feature vector via an Arrow-batched pandas stage.

    STUB encoder: a real build would run a vision/audio encoder over the
    decoded payload here (same ``mapInPandas`` shape, model broadcast per
    executor). The stand-in is deterministic AND cross-engine checkable:
    feature j = first 16 bits of ``md5(payload || ':' || j)`` mapped to
    [-1, 1) — so the whole pipeline, including this pandas stage, is
    hash-verified against the SQL oracle. Output chains directly into
    the similarity operators (array<double> embedding column).
    """
    out_schema = "asset_id long, features array<double>"

    def feat(payload: bytes) -> list[float]:
        out = []
        for j in range(dim):
            h = hashlib.md5(payload + b":" + str(j).encode()).hexdigest()
            out.append(int(h[:4], 16) / 65536.0 * 2.0 - 1.0)
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "features": [feat(p) for p in pdf["payload"]],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, out_schema)


def pcm_window_plan(assets: DataFrame, win: int = 50, hop: int = 25) -> DataFrame:
    """Audio framing plan: window start offsets for a payload interpreted
    as mono little-endian 16-bit PCM — ``n_samples = byte_len // 2``,
    starts at 0, hop, 2·hop, … while a full window fits.

    Entirely JVM-side (length → sequence → explode). Payload bytes are
    read once to measure length, then dropped BEFORE the explode — the
    window relation carries only (asset_id, start_sample), never a
    payload copy per window. (A real ingest persists byte_len in the
    metadata struct, letting this plan skip the payload column
    entirely.) Assets shorter than one window emit no rows.
    """
    n_samples = (F.length(F.col("payload")) / 2).cast("long")
    return (
        assets.select("asset_id", n_samples.alias("n_samples"))
        .filter(F.col("n_samples") >= win)
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_samples") - win, F.lit(hop))
            ).alias("start_sample"),
        )
    )


def pcm_frame_energy(assets: DataFrame, win: int = 50, hop: int = 25) -> DataFrame:
    """Per-window audio energy over raw PCM payloads — the REAL audio
    compute path (``np.frombuffer`` IS the decoder for uncompressed
    s16le PCM; no codec library involved).

    Arrow-batched ``mapInPandas``: each batch reinterprets payload bytes
    as int16 samples, then a cumulative-sum-of-squares makes every
    window's energy O(1). Output is exact integer math (int64 sum of
    squares, max 32767²·win ≪ 2⁶³) so the whole stage — including the
    pandas/numpy inner loop — hash-matches a SQL oracle that recomputes
    samples byte-by-byte. Compressed formats would add one stubbed
    decode call before ``frombuffer``; the framing/energy shape is
    identical. No shuffle: windows explode inside the map stage.
    """
    import numpy as np

    out_schema = "asset_id long, start_sample long, energy long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            starts: list = []
            energies: list = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = len(payload) // 2
                if n < win:
                    continue
                x = np.frombuffer(payload[: 2 * n], dtype="<i2").astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(x * x)))
                win_starts = range(0, n - win + 1, hop)
                ids.extend([aid] * len(win_starts))
                starts.extend(win_starts)
                energies.extend(
                    int(csum[s + win] - csum[s]) for s in win_starts
                )
            yield pd.DataFrame(
                {"asset_id": ids, "start_sample": starts, "energy": energies},
                dtype="int64" if not ids else None,
            )

    return assets.select("asset_id", "payload").mapInPandas(run, out_schema)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB (video path) — plan frame sampling as an exploded index range
    derived from fake stream length; a real build decodes with pyav.
    Demonstrates the explode-per-asset partition shape used for frames.
    """
    n_frames = (F.length(F.col("payload")) % 100 + 1).alias("n_frames")
    return (
        assets.select("asset_id", n_frames)
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )
