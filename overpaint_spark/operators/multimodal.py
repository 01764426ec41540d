"""Multimodal (image/audio/video) column handling (SURVEY §7.4.4).

A multimodal asset is an opaque ``binary`` payload plus a typed metadata
struct. The Spark-side contract (schema, partitioning, Arrow batch
shape) is real and tested, and so is the decode work for every format
that needs no external codec library:

- **audio**: s16le PCM — ``np.frombuffer`` IS the decoder,
- **image**: PPM(P6)/PGM(P5) binary and 24-bit uncompressed BMP —
  :func:`decode_image` below, pure numpy header+raster parsing — plus
  real library-free codec decodes: PNG (non-interlaced 8-bit,
  :func:`_png_decode` below, bounded inflate) and JPEG (baseline +
  progressive, :mod:`overpaint_spark.operators.jpeg`),
- **video**: MJPEG-in-AVI decodes for real — RIFF chunk walk
  (:func:`avi_mjpeg_frames`) feeding the JPEG decoder per frame
  (:func:`decode_video_frames`); other codecs (H.264 etc.) genuinely
  need external libraries and return zero rows / stub dimensions,
  clearly marked where it happens (``_fake_decode_dims``,
  :func:`frame_sample_plan`).

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_decode(payload: bytes):
    """Library-free PNG decode: non-interlaced 8-bit gray / gray+alpha /
    RGB / RGBA, via stdlib ``zlib`` + the five standard scanline filters
    (None/Sub/Up/Average/Paeth) unfiltered into numpy. Palette, 16-bit,
    and Adam7-interlaced images return ``None`` (they are codec-exotic
    enough that a real deployment uses an image library). The per-pixel
    filter loops are pure Python — fine for fixture-scale assets; the
    Spark-side plumbing is identical when a native decoder is dropped
    in."""
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        return None
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) < clen:
            return None
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        return None
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        # dimension cap: a corrupted IHDR must not drive a huge
        # allocation (an executor OOM, not an exception, at scale)
        return None
    stride = w * channels
    need = h * (stride + 1)
    try:
        # bounded inflate: IDAT is untrusted — cap expansion at the
        # exact unfiltered size instead of trusting the deflate stream
        # (a 1 MB zip bomb expands ~1000×)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), need)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1).astype(
            np.int32
        )
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, channels)


def decode_image(payload: bytes):
    """REAL image decode for library-free formats: binary PPM (``P6``,
    RGB) / PGM (``P5``, grayscale), 24-bit uncompressed BMP,
    non-interlaced 8-bit PNG (gray/gray+alpha/RGB/RGBA — stdlib zlib +
    numpy unfiltering, :func:`_png_decode`), and JPEG — baseline AND
    progressive incl. successive approximation (r3: full Huffman +
    IDCT + chroma upsample decoder,
    :mod:`overpaint_spark.operators.jpeg`). No codec library involved.
    Returns an ``H×W×C uint8`` array, or ``None`` when the payload is
    not one of these still formats (video payloads go through
    :func:`decode_video_frames`; exotic stills hit
    ``_fake_decode_dims``)."""
    import numpy as np

    if payload[:8] == _PNG_SIG:
        return _png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from overpaint_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)

    if payload[:2] in (b"P6", b"P5"):
        idx, tokens = 2, []
        while len(tokens) < 3 and idx < len(payload):
            while idx < len(payload) and payload[idx : idx + 1].isspace():
                idx += 1
            if payload[idx : idx + 1] == b"#":  # comment to end-of-line
                while idx < len(payload) and payload[idx] != 0x0A:
                    idx += 1
                continue
            start = idx
            while idx < len(payload) and not payload[idx : idx + 1].isspace():
                idx += 1
            tokens.append(payload[start:idx])
        idx += 1  # the single whitespace byte after maxval
        try:
            w, h, maxval = (int(t) for t in tokens)
        except ValueError:
            return None
        if maxval > 255 or w <= 0 or h <= 0:
            return None
        ch = 3 if payload[:2] == b"P6" else 1
        raw = payload[idx : idx + w * h * ch]
        if len(raw) < w * h * ch:
            return None
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
    if payload[:2] == b"BM" and len(payload) >= 54:
        data_off = int.from_bytes(payload[10:14], "little")
        hdr_size = int.from_bytes(payload[14:18], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if hdr_size < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        bottom_up, h = h > 0, abs(h)
        row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        raw = payload[data_off : data_off + row_bytes * h]
        if len(raw) < row_bytes * h:
            return None
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, row_bytes)[:, : w * 3]
        arr = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        if bottom_up:
            arr = arr[::-1]
        return np.ascontiguousarray(arr)
    return None


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic stand-in for the remaining CODEC formats
    (video, exotic stills): the libraries are not installed in this
    container, so dimensions derive from payload length. PPM/PGM/BMP/
    PNG/JPEG never reach here — :func:`decode_image` handles them for
    real.
    """
    n = len(payload)
    return (1 + n % 1024, 1 + (n // 1024) % 1024)


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction via ``mapInPandas``.

    Output: (asset_id, byte_len, sha256, width, height). Byte length and
    sha256 are real; width/height come from the REAL decoder for
    PPM/PGM/BMP payloads and from the stub for codec formats. One narrow
    pass over the payload column, no shuffle.
    """
    out_schema = "asset_id long, byte_len long, sha256 string, width int, height int"

    def dims_of(p: bytes) -> tuple[int, int]:
        arr = decode_image(p)
        if arr is not None:
            return (arr.shape[1], arr.shape[0])
        return _fake_decode_dims(p)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [dims_of(p) for p in payloads]
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

    REAL for PPM/PGM/BMP payloads: nearest-neighbor resample with numpy
    index arrays on the decoded raster (output raw ``H×W×C`` bytes).
    Codec formats fall back to PIL when importable (absent here) and
    otherwise to a deterministic md5-keystream stand-in — the Spark-side
    contract (schema, batch shape, per-partition statelessness,
    payload-column pruning) is identical on every path.
    """
    import numpy as np

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

    def resized(payload: bytes) -> bytes:
        arr = decode_image(payload)
        if arr is not None:
            ys = np.arange(height) * arr.shape[0] // height
            xs = np.arange(width) * arr.shape[1] // width
            return arr[ys][:, xs].tobytes()
        if have_pil:  # pragma: no cover
            import io
            from PIL import Image

            return Image.open(io.BytesIO(payload)).resize((width, height)).tobytes()
        return fake_resized(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": [resized(p) for p in pdf["payload"]],
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


# ---------------------------------------------------------------------------
# Video: MJPEG-in-AVI — the one video shape decodable library-free, by
# composing RIFF chunk parsing with operators/jpeg.decode_jpeg. Closes
# the last multimodal stub (frame_sample_plan above remains as the
# cheap plan-only operator; real pixel decode lives here).
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """Minimal spec-valid MJPEG AVI writer (fixture generator — no video
    library exists in this container to produce test files): RIFF('AVI ')
    with an hdrl (avih + one video strl, fourcc 'MJPG'), a movi LIST of
    '00dc' JPEG chunks, and an idx1. Frames are H×W or H×W×3 uint8."""
    import struct as _s

    from overpaint_spark.operators.jpeg import encode_jpeg

    payloads = [encode_jpeg(f, quality=90) for f in frames]
    h0, w0 = frames[0].shape[0], frames[0].shape[1]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + _s.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = _s.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # microseconds per frame
        0, 0, 0x10,  # max bytes/sec, padding, flags (HASINDEX)
        len(frames), 0, 1, 0,  # total frames, initial, streams, bufsize
        w0, h0, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + _s.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps,
                                    0, len(frames), 0, 0, 0)
        + _s.pack("<4h", 0, 0, w0, h0)
    )
    strf = _s.pack("<IiiHH4sIiiII", 40, w0, h0, 1, 24, b"MJPG",
                   w0 * h0 * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    idx, off = [], 4  # offsets inside movi, past the 'movi' fourcc
    for p in payloads:
        idx.append(b"00dc" + _s.pack("<III", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) % 2)
    idx1 = chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _s.pack("<I", len(riff_body)) + riff_body


def avi_mjpeg_frames(payload: bytes):
    """RIFF walk → list of JPEG payload bytes, in stream order, from the
    movi LIST's '00dc'/'00db' chunks (compressed / uncompressed DIB
    fourccs — MJPEG uses dc). Refuse-never-throw like every decoder
    here: malformed or non-AVI payloads return []; claimed chunk sizes
    are clamped by slicing, never trusted for allocation."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return []

    # depth cap: a crafted payload can nest a LIST every 12 bytes, so
    # unbounded recursion hits the interpreter limit (RecursionError)
    # around 12 KB of input — an exception the refuse-never-throw
    # contract forbids. Real AVIs nest 3 deep (RIFF → movi → rec );
    # anything past 16 is hostile and its subtree is skipped. Recursion
    # (not a work stack) keeps frames in stream order across sibling
    # 'rec ' lists.
    def walk(buf: bytes, frames: list, depth: int) -> None:
        if depth > 16:
            return
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + size]
            if fourcc == b"LIST" and len(body) >= 4:
                walk(body[4:], frames, depth + 1)
            elif fourcc[2:4] in (b"dc", b"db") and body[:2] == b"\xff\xd8":
                frames.append(body)
            pos += 8 + size + (size % 2)

    frames: list = []
    walk(payload[12:], frames, 1)
    return frames


def decode_video_frames(assets: DataFrame) -> DataFrame:
    """REAL per-frame video decode for MJPEG AVI payloads — the explode
    shape of frame_sample_plan with actual pixels: one Arrow batch of
    payloads in, one row per decoded frame out with dimensions and the
    integer mean luma. Frames that fail JPEG decode are skipped (the
    refuse contract), non-AVI payloads yield zero rows. Per-asset work
    is independent → scales by repartitioning assets; nothing shuffles
    but the (id, idx, dims, luma) rows."""
    import numpy as np
    import pandas as pd

    from overpaint_spark.operators.jpeg import decode_jpeg

    out_schema = (
        "asset_id long, frame_idx int, width int, height int, mean_luma int"
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, ws, hs, lumas = [], [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, jp in enumerate(avi_mjpeg_frames(bytes(payload))):
                    arr = decode_jpeg(jp)
                    if arr is None:
                        continue
                    ids.append(aid)
                    idxs.append(i)
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    if arr.shape[2] == 3:
                        y = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                             + 0.114 * arr[..., 2])
                    else:
                        y = arr[..., 0]
                    lumas.append(int(np.floor(y.mean() + 0.5)))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": pd.Series(lumas, dtype="int32"),
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, out_schema)


# --- perceptual hashing (image near-dup dedup) ------------------------------

PHASH_GRID = 8  # 8×8 block means → 64-bit aHash, packed as two 32-bit words
_PHASH_IMG = 32  # rendered raster is 32×32 grayscale


def ahash_words(arr) -> tuple[int, int]:
    """64-bit average-hash of an ``H×W`` (or ``H×W×1``) uint8 raster,
    packed as two 32-bit words ``(w0, w1)`` — the ⌈bits/32⌉-word
    convention of the Hamming ANN tier (similarity.py sketches).

    Pure INTEGER pipeline (int64 block sums → floor-division means →
    strict-greater threshold against the floor mean-of-means), so the
    hash is deterministic across platforms and BLAS builds. aHash is
    invariant to a uniform brightness shift by construction: every
    block mean and the global mean move together, so no bit flips —
    pinned in tests/test_multimodal.py.
    """
    import numpy as np

    a = np.asarray(arr)
    if a.ndim == 3:
        a = a[..., 0]
    h, w = a.shape
    g = PHASH_GRID
    sums = np.zeros((g, g), dtype=np.int64)
    counts = np.zeros((g, g), dtype=np.int64)
    a64 = a.astype(np.int64)
    rb = [i * h // g for i in range(g + 1)]
    cb = [j * w // g for j in range(g + 1)]
    for i in range(g):
        for j in range(g):
            blk = a64[rb[i] : rb[i + 1], cb[j] : cb[j + 1]]
            sums[i, j] = int(blk.sum())
            counts[i, j] = blk.size
    means = sums // counts
    gmean = int(means.sum()) // (g * g)
    bits = (means > gmean).astype(np.int64).ravel()  # row-major, bit = i*8+j
    w0 = int(sum(int(bits[b]) << b for b in range(32)))
    w1 = int(sum(int(bits[b]) << (b - 32) for b in range(32, 64)))
    return w0, w1


def render_pgm(text: str, size: int = _PHASH_IMG) -> bytes:
    """Deterministic grayscale raster rendered FROM the document text,
    encoded as binary PGM (P5) bytes — the executor-built stand-in for
    a real image column (the multimodal_video_frames AVI pattern, one
    tier simpler). Pixel ``idx``'s value is pure integer arithmetic on
    the text bytes plus a vertical gradient, so the whole
    render→encode→decode→hash pipeline is SQL-mirrorable and the
    declared relation carries a FULL oracle (unlike a codec payload,
    which would be rows-only). The SQL mirror indexes CHARACTERS while
    this side samples UTF-8 BYTES — identical on the ASCII corpus (the
    standing fixture assumption multimodal_metadata's oracle documents);
    non-ASCII text would need the oracle to walk bytes."""
    import numpy as np

    raw = text.encode("utf-8")
    n = len(raw)
    idx = np.arange(size * size, dtype=np.int64)
    # position-dependent multiplier + offset keep block means
    # doc-distinctive (a plain byte-sample render left every doc's
    # raster dominated by the shared gradient — ~20% of ALL pairs
    # landed within Hamming 3, an N²-shaped degenerate relation)
    px = (
        (np.frombuffer(raw, dtype=np.uint8).astype(np.int64))[(idx * 37 + 11) % n]
        * (1 + idx % 7)
        + (idx * idx) % 97
    ) % 256
    body = px.astype(np.uint8).tobytes()
    return b"P5\n%d %d\n255\n" % (size, size) + body


def image_phash(d: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-asset 64-bit perceptual hash: render a deterministic 32×32
    PGM from the text (render_pgm), push the bytes through the REAL
    image decoder (decode_image — actual P5 header+raster parsing, the
    same code path library-free PGM uploads take), then aHash the
    decoded raster (ahash_words). Output: (asset_id, w0, w1) with the
    two 32-bit signature words as BIGINTs.

    ONE Arrow-batched ``mapInPandas`` pass, no shuffle — at 100 TB this
    is embarrassingly parallel scan work, and the payload column never
    leaves the executor. Empty docs are filtered (no raster to render)
    — the oracle mirrors the LENGTH(text) > 0 guard."""
    return (
        d.filter(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col).alias(id_col), text_col)
        .mapInPandas(
            _phash_map(id_col, text_col, payload_fn=render_pgm),
            _PHASH_SCHEMA,
        )
    )


_PHASH_SCHEMA = "asset_id long, w0 long, w1 long"


def _phash_map(id_col: str, payload_col: str, payload_fn=None):
    """Shared Arrow-batched hashing body for BOTH phash fronts: the
    text-render declared query (``payload_fn=render_pgm``) and the
    real-bytes operator (``payload_fn=None`` — the column already
    holds image bytes). Per row: decode_image → ahash_words; rows the
    decoder rejects yield NO output (no signature → no near-dup
    evidence; the ingest gate admits such assets — streaming/phash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, w0s, w1s = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = payload_fn(p) if payload_fn is not None else bytes(p)
                arr = decode_image(payload)
                if arr is None:
                    continue
                w0, w1 = ahash_words(arr)
                ids.append(int(i))
                w0s.append(w0)
                w1s.append(w1)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "w0": pd.Series(w0s, dtype="int64"),
                    "w1": pd.Series(w1s, dtype="int64"),
                }
            )

    return run


def render_payloads(
    d: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(asset_id, payload): the documents' deterministic PGM renders as
    a real BINARY column — the executor-built image-bytes fixture (the
    multimodal_video_frames AVI pattern). Feeding this through
    :func:`image_phash_bytes` must reproduce :func:`image_phash`
    bit-for-bit; the declared ``multimodal_phash_bytes`` relation holds
    that equality to the text front's full SQL oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "payload": [render_pgm(t) for t in pdf[text_col]],
                }
            )

    return (
        d.filter(F.length(F.col(text_col)) > 0)
        .select(F.col(id_col), text_col)
        .mapInPandas(run, "asset_id long, payload binary")
    )


def image_phash_bytes(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-asset 64-bit aHash over REAL image bytes — the production
    front of the phash tier: a ``binary`` payload column (binaryFile
    source, parquet blob, …) flows through the full decoder stack
    (PGM/PPM/BMP/PNG/JPEG incl. progressive — decode_image) and the
    same integer aHash as the declared text-render query, so an index
    built from either front is band-compatible with
    phash_neardup_pairs / build_phash_index / the streaming gate.

    Undecodable payloads produce NO row (no signature; downstream
    gates admit them — the documented unhashable-asset posture). ONE
    Arrow-batched ``mapInPandas`` pass, no shuffle: at 100 TB this is
    embarrassingly parallel scan work and the payload bytes never
    leave the executor. Pinned on Spark's bundled kitten JPEGs in
    tests/test_multimodal.py (hash stability vs direct numpy, format
    invariance, and re-encode near-dup detection)."""
    return assets.select(
        F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(_phash_map("asset_id", "payload"), _PHASH_SCHEMA)


# the perturbation classes the repo's numpy stack can synthesize
# deterministically — the honest-limits probe of the aHash gate: which
# edits survive Hamming ≤ 3 dedup (brightness/scale, by construction)
# and which evade it (any geometric re-layout)
PERTURB_KINDS = (
    "brighten",
    "contrast",
    "crop10",
    "flip_h",
    "rotate90",
    "rotate180",
    "scale_half",
)


def perturb_raster(arr, kind: str):
    """Deterministic pure-numpy perturbation of a decoded raster —
    integer-safe (uint8 in, uint8 out), no resampling kernels, no RNG,
    so the perturbed aHash is a platform-independent constant of the
    input bytes (the _PHOTO_EXPECTED provenance requirement)."""
    import numpy as np

    a = np.asarray(arr)
    if kind == "brighten":  # uniform +20, saturating — aHash-invariant
        return np.clip(a.astype(np.int16) + 20, 0, 255).astype(np.uint8)
    if kind == "contrast":  # 1.25× gain, saturating (integer 5/4)
        return np.clip((a.astype(np.int32) * 5) // 4, 0, 255).astype(np.uint8)
    if kind == "crop10":  # drop a 10% margin on every side
        h, w = a.shape[0], a.shape[1]
        return a[h // 10 : h - h // 10, w // 10 : w - w // 10]
    if kind == "flip_h":
        return a[:, ::-1]
    if kind == "rotate90":
        return np.rot90(a)
    if kind == "rotate180":
        return np.rot90(a, 2)
    if kind == "scale_half":  # 2× decimation (no kernel — deterministic)
        return a[::2, ::2]
    raise ValueError(f"unknown perturbation kind: {kind}")


def phash_perturbed(
    assets: DataFrame,
    kinds: tuple = PERTURB_KINDS,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per (asset, perturbation): the 64-bit aHash of the PERTURBED
    raster — each payload decoded ONCE per Arrow batch row, every
    perturbation hashed from the same in-memory array (never a
    re-decode, never a re-encode). One ``mapInPandas`` pass like
    :func:`image_phash_bytes`; undecodable payloads yield no rows
    (the documented unhashable-asset posture). The declared
    ``multimodal_photo_robustness`` relation joins this against the
    original hashes and aggregates the Hamming distribution per class
    — the "when does phash dedup miss" card."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ks, w0s, w1s = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image(bytes(p))
                if arr is None:
                    continue
                for kind in kinds:
                    w0, w1 = ahash_words(perturb_raster(arr, kind))
                    ids.append(int(i))
                    ks.append(kind)
                    w0s.append(w0)
                    w1s.append(w1)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "perturbation": pd.Series(ks, dtype="object"),
                    "p_w0": pd.Series(w0s, dtype="int64"),
                    "p_w1": pd.Series(w1s, dtype="int64"),
                }
            )

    return assets.select(
        F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(
        run, "asset_id long, perturbation string, p_w0 long, p_w1 long"
    )


def phash_with_perturbed(
    assets: DataFrame,
    kinds: tuple = PERTURB_KINDS,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Original + perturbed aHash from ONE decode pass (r12): per asset
    the payload is decoded once, the pristine raster hashed once, and
    every perturbation hashed from the same in-memory array. Output
    (asset_id, perturbation, w0, w1, p_w0, p_w1) is bit-identical to
    ``phash_perturbed(assets) ⋈ image_phash_bytes(assets)`` on
    asset_id, but pays one decoder pass instead of two and no join —
    the per-class robustness card's whole input in a single
    ``mapInPandas`` scan, payload bytes never shuffled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ks, w0s, w1s, pw0s, pw1s = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image(bytes(p))
                if arr is None:
                    continue
                w0, w1 = ahash_words(arr)
                for kind in kinds:
                    pw0, pw1 = ahash_words(perturb_raster(arr, kind))
                    ids.append(int(i))
                    ks.append(kind)
                    w0s.append(w0)
                    w1s.append(w1)
                    pw0s.append(pw0)
                    pw1s.append(pw1)
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "perturbation": pd.Series(ks, dtype="object"),
                    "w0": pd.Series(w0s, dtype="int64"),
                    "w1": pd.Series(w1s, dtype="int64"),
                    "p_w0": pd.Series(pw0s, dtype="int64"),
                    "p_w1": pd.Series(pw1s, dtype="int64"),
                }
            )

    return assets.select(
        F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(
        run,
        "asset_id long, perturbation string, w0 long, w1 long, "
        "p_w0 long, p_w1 long",
    )


def phash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs by signature Hamming distance ≤
    ``max_hamming``, WITHOUT an all-pairs join: the 64-bit signature is
    cut into four 16-bit bands, and by pigeonhole any pair within
    Hamming distance ``b − 1`` of ``b`` bands shares at least one band
    verbatim (max_hamming ≤ 3 with 4 bands ⇒ zero false negatives) —
    the LSH-banding shape of dedup_minhash_lsh applied to image space.

    Plan: band explode (4 rows/asset) → postings self-join on
    (band_idx, band_value) → distinct candidates → ONE hash-relation
    join back → exact integer popcount filter. All-JVM (xor +
    bit_count inside codegen); candidate volume is collision-bounded,
    never N²."""
    if max_hamming > 3:
        raise ValueError("4 bands guarantee recall only for max_hamming <= 3")
    bands = hashes.select(
        "asset_id",
        F.posexplode(
            F.array(
                F.col("w0").bitwiseAND(F.lit(0xFFFF)),
                F.shiftright("w0", 16).bitwiseAND(F.lit(0xFFFF)),
                F.col("w1").bitwiseAND(F.lit(0xFFFF)),
                F.shiftright("w1", 16).bitwiseAND(F.lit(0xFFFF)),
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("a_id"), F.col("b.asset_id").alias("b_id")
        )
        .distinct()
    )
    ha = hashes.select(
        F.col("asset_id").alias("a_id"),
        F.col("w0").alias("a_w0"),
        F.col("w1").alias("a_w1"),
    )
    hb = hashes.select(
        F.col("asset_id").alias("b_id"),
        F.col("w0").alias("b_w0"),
        F.col("w1").alias("b_w1"),
    )
    hamming = F.bit_count(
        F.col("a_w0").bitwiseXOR(F.col("b_w0"))
    ) + F.bit_count(F.col("a_w1").bitwiseXOR(F.col("b_w1")))
    return (
        cand.join(ha, "a_id")
        .join(hb, "b_id")
        .select("a_id", "b_id", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def persist_phash_index(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Materialize the corpus's perceptual-hash index at ``path``
    (parquet, 16 bytes of signature per asset, repartitioned on w0 so
    the streaming gate's band probes read clustered files) — build
    once per corpus version; every ingest batch probes the stored
    index and the payloads are never re-decoded (the
    persist_dedup_index contract, applied to image space)."""
    image_phash(docs, id_col=id_col, text_col=text_col).repartition(
        "w0"
    ).write.mode("overwrite").parquet(path)


def load_phash_index(spark, path: str) -> DataFrame:
    """(asset_id, w0, w1) — feed to streaming.phash.write_phash_dedup_stream
    or phash_neardup_pairs."""
    return spark.read.parquet(path)
