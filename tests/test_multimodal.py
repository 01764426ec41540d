"""Multimodal binary-column plumbing tests (decode is stubbed; the
Spark-side schema/batching contract is what's under test)."""

import hashlib

import pytest
from pyspark.sql import Row

from overpaint_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def assets(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"document number {i} " + "x" * (i * 7)) for i in range(6)]
    )
    return MM.attach_payload(df, "doc_id", "text")


def test_attach_and_extract_metadata(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello"), Row(doc_id=2, text="x" * 2000)])
    assets = MM.attach_payload(df, "doc_id", "text")
    assert dict(assets.dtypes)["payload"] == "binary"

    meta = {r.asset_id: r for r in MM.extract_metadata(assets).collect()}
    assert meta[1].byte_len == 5
    assert meta[1].sha256 == hashlib.sha256(b"hello").hexdigest()
    assert meta[1].width == 6 and meta[1].height == 1
    assert meta[2].byte_len == 2000
    assert meta[2].width == 1 + 2000 % 1024 and meta[2].height == 2


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a" * 25)])
    assets = MM.attach_payload(df, "doc_id", "text")
    frames = MM.frame_sample_plan(assets, every_n=10).collect()
    # fake n_frames = 25 % 100 + 1 = 26 → indices 0,10,20
    assert [r.frame_idx for r in frames] == [0, 10, 20]


def test_resize_stub_deterministic_shape(spark, assets):
    out = MM.resize_images(assets, width=16, height=4).collect()
    assert len(out) == assets.count()
    for r in out:
        assert len(r.payload) == 16 * 4
        assert (r.width, r.height) == (16, 4)
    # deterministic: same input → same bytes
    again = {r.asset_id: r.payload for r in MM.resize_images(assets, 16, 4).collect()}
    for r in out:
        assert again[r.asset_id] == r.payload


def test_pcm_window_plan_offsets_and_pruning(spark, assets):
    # doc 0 text = "document number 0 " (18 bytes → 9 samples): too short
    # doc 5: 18 + 35 = 53 bytes → 26 samples → starts 0, 8, 16 with win=10/hop=8
    plan = MM.pcm_window_plan(assets, win=10, hop=8)
    rows = {}
    for r in plan.collect():
        rows.setdefault(r.asset_id, []).append(r.start_sample)
    assert 0 not in rows  # shorter than one window → no rows
    assert rows[5] == [0, 8, 16]
    # payload is dropped before the explode: no per-window payload copies
    assert plan.columns == ["asset_id", "start_sample"]
    assert "payload" not in plan._jdf.queryExecution().optimizedPlan().toString().split("Generate")[0]


def test_pcm_frame_energy_matches_numpy(spark, assets):
    import numpy as np

    win, hop = 10, 8
    got = {
        (r.asset_id, r.start_sample): r.energy
        for r in MM.pcm_frame_energy(assets, win=win, hop=hop).collect()
    }
    want = {}
    for r in assets.select("asset_id", "payload").collect():
        n = len(r.payload) // 2
        if n < win:
            continue
        x = np.frombuffer(bytes(r.payload)[: 2 * n], dtype="<i2").astype(np.int64)
        for s in range(0, n - win + 1, hop):
            want[(r.asset_id, s)] = int((x[s : s + win] ** 2).sum())
    assert got == want and len(got) > 0


def test_extract_features_range_and_chain(spark, assets):
    feats = MM.extract_features(assets)
    rows = feats.collect()
    for r in rows:
        assert len(r.features) == MM.FEATURE_DIM
        assert all(-1.0 <= v < 1.0 for v in r.features)
    # chains into the similarity operators as a drop-in embedding column
    from overpaint_spark.operators import similarity as SIM
    renamed = feats.withColumnRenamed("asset_id", "vec_id").withColumnRenamed("features", "embedding")
    topk = SIM.brute_force_topk(renamed, renamed.limit(2), k=2)
    assert topk.count() > 0


def _ppm(w, h, pixels):
    """Binary P6 bytes for an HxWx3 uint8 array."""
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _bmp_24(arr):
    """Bottom-up 24-bit uncompressed BMP bytes for an HxWx3 RGB array."""
    import numpy as np
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):           # bottom-up row order
        row = arr[y, :, ::-1].tobytes()      # RGB -> BGR
        raster.extend(row + b"\x00" * (row_bytes - len(row)))
    data_off = 54
    header = (
        b"BM" + (data_off + len(raster)).to_bytes(4, "little") + b"\x00" * 4
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(raster)


def test_decode_image_real_formats():
    """decode_image is a REAL decoder for PPM/PGM/BMP — no codec libs."""
    import numpy as np
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    got = MM.decode_image(_ppm(7, 5, arr))
    assert got.shape == (5, 7, 3) and (got == arr).all()
    got = MM.decode_image(_bmp_24(arr))
    assert got.shape == (5, 7, 3) and (got == arr).all()
    gray = rng.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    got = MM.decode_image(b"P5\n6 4\n255\n" + gray.tobytes())
    assert got.shape == (4, 6, 1) and (got == gray).all()
    assert MM.decode_image(b"plain text payload") is None


def test_metadata_and_resize_real_for_uncompressed_images(spark):
    """End-to-end through Spark: real dims from the decoder, and the
    nearest-neighbor resize reproduces the numpy reference bytes."""
    import numpy as np
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    rows = [
        Row(asset_id=1, payload=bytearray(_ppm(8, 10, arr)),
            media_type="image/x-portable-pixmap"),
        Row(asset_id=2, payload=bytearray(b"not an image at all"),
            media_type="application/octet-stream"),
    ]
    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA.split(", meta")[0])
    meta = {r.asset_id: r for r in MM.extract_metadata(assets).collect()}
    assert (meta[1].width, meta[1].height) == (8, 10)       # REAL decode
    n = len(b"not an image at all")
    assert (meta[2].width, meta[2].height) == (1 + n % 1024, 1 + n // 1024 % 1024)

    out = {r.asset_id: r for r in MM.resize_images(assets, 4, 5).collect()}
    ys = np.arange(5) * 10 // 5
    xs = np.arange(4) * 8 // 4
    assert bytes(out[1].payload) == arr[ys][:, xs].tobytes()  # numpy reference


def _png(arr, filters=None):
    """Minimal PNG writer for the decoder tests: 8-bit depth, color type
    from channel count, one IDAT, per-row filter types as given (default
    all 0). Forward-applies the standard filters so every decoder branch
    is exercised against a known raster."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    lines = []
    for y, ftype in enumerate(filters):
        cur = flat[y]
        if ftype == 0:
            enc = cur.copy()
        elif ftype == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif ftype == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            enc = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_decode_image_png_all_filters_and_channels():
    """Library-free PNG decode: every scanline filter (None/Sub/Up/
    Average/Paeth) and every 8-bit channel layout round-trips exactly."""
    import numpy as np

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(5, 6, ch), dtype=np.uint8)
        for filters in ([0] * 5, [1] * 5, [0, 2, 2, 2, 2], [3] * 5, [4] * 5,
                        [0, 1, 2, 3, 4]):
            got = MM.decode_image(_png(arr, filters))
            assert got is not None and got.shape == (5, 6, ch)
            assert (got == arr).all(), (ch, filters)


def test_decode_image_png_rejects_unsupported():
    """Palette/16-bit/interlaced PNGs and truncated payloads fall back
    to None (codec-stub path) instead of mis-decoding."""
    import struct
    import zlib

    import numpy as np

    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _png(arr)
    assert MM.decode_image(good) is not None

    def patched_ihdr(**kw):
        vals = {"depth": 8, "color": 2, "interlace": 0}
        vals.update(kw)
        ihdr = struct.pack(">IIBBBBB", 2, 2, vals["depth"], vals["color"], 0, 0,
                           vals["interlace"])
        crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        body = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", crc)
        return good[:8] + body + good[8 + 12 + 13:]

    assert MM.decode_image(patched_ihdr(depth=16)) is None
    assert MM.decode_image(patched_ihdr(color=3)) is None  # palette
    assert MM.decode_image(patched_ihdr(interlace=1)) is None
    assert MM.decode_image(good[: len(good) // 2]) is None


def test_real_photo_corpus_through_pipeline(spark):
    """End-to-end on REAL images: Spark's own bundled photos load via
    the binaryFile source and flow through the Arrow-batched metadata
    and resize stages with the real JPEG decoder — dimensions must be
    the files' true dimensions (not the stub's length-derived fake),
    and every resized payload must be an exact 32×32 RGB raster."""
    import os

    src = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens"
    if not os.path.isdir(src):
        import pytest

        pytest.skip("no spark sample images")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from overpaint_spark.operators import multimodal as MM

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jpg")
        .load(src)
        .select(
            F.row_number().over(Window.orderBy("path")).alias("asset_id"),
            F.col("content").alias("payload"),
            "path",
        )
    )
    meta = {r.asset_id: r for r in MM.extract_metadata(raw).collect()}
    assert len(meta) == 4
    dims = sorted((r.width, r.height) for r in meta.values())
    # true dimensions of the four kitten photos
    assert dims == sorted([(199, 313), (300, 296), (300, 311), (300, 200)])
    for r in MM.resize_images(raw, width=32, height=32).collect():
        assert len(r.payload) == 32 * 32 * 3


def test_avi_mjpeg_roundtrip_pixels():
    """encode_avi_mjpeg → avi_mjpeg_frames → decode_jpeg must recover
    every frame's geometry exactly and pixels within JPEG quantization
    error (gradient frames, gray and RGB)."""
    import numpy as np

    from overpaint_spark.operators.jpeg import decode_jpeg
    from overpaint_spark.operators import multimodal as MM

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:24, 0:32]
    frames = [
        ((yy * 5 + xx * 3 + 40 * i) % 200 + 20).astype(np.uint8)
        for i in range(3)
    ]
    avi = MM.encode_avi_mjpeg(frames, fps=5)
    out = MM.avi_mjpeg_frames(avi)
    assert len(out) == 3
    for i, jp in enumerate(out):
        arr = decode_jpeg(jp)
        assert arr is not None and arr.shape == (24, 32, 1)
        assert np.abs(arr[..., 0].astype(int) - frames[i].astype(int)).mean() < 6

    rgb = [rng.integers(60, 180, size=(16, 16, 3), dtype=np.uint8)
           for _ in range(2)]
    # smooth the random noise so 4:4:4 JPEG stays close
    rgb = [np.repeat(np.repeat(f[::4, ::4], 4, 0), 4, 1) for f in rgb]
    avi = MM.encode_avi_mjpeg(rgb)
    out = MM.avi_mjpeg_frames(avi)
    assert len(out) == 2
    for i, jp in enumerate(out):
        arr = decode_jpeg(jp)
        assert arr is not None and arr.shape == (16, 16, 3)
        assert np.abs(arr.astype(int) - rgb[i].astype(int)).mean() < 10


def test_avi_parser_refuses_malformed():
    """Truncations, wrong magic, lying chunk sizes, and deep LIST
    nesting must yield [] or fewer frames — never an exception."""
    import numpy as np

    from overpaint_spark.operators import multimodal as MM

    f = [np.full((8, 8), 128, dtype=np.uint8)]
    good = MM.encode_avi_mjpeg(f)
    assert MM.avi_mjpeg_frames(b"") == []
    assert MM.avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVE") == []
    assert MM.avi_mjpeg_frames(good[:11]) == []
    for n in range(12, len(good), 13):
        MM.avi_mjpeg_frames(good[:n])  # must not raise
    # lying movi chunk size: claims 4 GB
    evil = bytearray(good)
    i = evil.find(b"00dc")
    evil[i + 4 : i + 8] = (0xFFFFFFF0).to_bytes(4, "little")
    MM.avi_mjpeg_frames(bytes(evil))  # must not raise or allocate 4 GB
    # 5000 correctly-formed nested LISTs: must return [] via the depth
    # cap, NOT raise RecursionError (a LIST per 12 bytes would otherwise
    # blow the interpreter limit at ~12 KB of input)
    nest = b""
    for _ in range(5000):
        nest = b"LIST" + (len(nest) + 4).to_bytes(4, "little") + b"mov " + nest
    assert MM.avi_mjpeg_frames(b"RIFF" + (len(nest) + 4).to_bytes(4, "little")
                               + b"AVI " + nest) == []
    # frames INSIDE a legally-nested rec list must still decode, in
    # stream order relative to top-level frames
    f2 = [np.full((8, 8), 60, dtype=np.uint8),
          np.full((8, 8), 180, dtype=np.uint8)]
    two = MM.encode_avi_mjpeg(f2)
    movi_at = two.find(b"LIST", 12)
    # rebuild: movi containing [frame0, rec[frame1]]
    from overpaint_spark.operators.jpeg import encode_jpeg, decode_jpeg

    def chunk(fcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fcc + len(body).to_bytes(4, "little") + body + pad

    j0, j1 = encode_jpeg(f2[0], quality=90), encode_jpeg(f2[1], quality=90)
    rec = chunk(b"LIST", b"rec " + chunk(b"00dc", j1))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", j0) + rec)
    payload = two[:movi_at] + movi
    payload = b"RIFF" + (len(payload) + 4 - 8).to_bytes(4, "little") + payload[8:]
    out = MM.avi_mjpeg_frames(payload)
    assert len(out) == 2
    assert abs(int(decode_jpeg(out[0])[..., 0].mean()) - 60) <= 3
    assert abs(int(decode_jpeg(out[1])[..., 0].mean()) - 180) <= 3


def test_decode_video_frames_spark(spark):
    """Distributed AVI decode: geometry and mean luma per frame come
    back through mapInPandas; a non-AVI payload contributes zero rows."""
    import numpy as np

    from overpaint_spark.operators import multimodal as MM

    rows = []
    for aid in range(3):
        frames = [
            np.full((8, 16), 50 + 60 * i, dtype=np.uint8)
            for i in range(aid + 1)
        ]
        rows.append((aid, bytearray(MM.encode_avi_mjpeg(frames))))
    rows.append((99, bytearray(b"not a video")))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = MM.decode_video_frames(assets).collect()
    assert {r.asset_id for r in out} == {0, 1, 2}
    assert len(out) == 1 + 2 + 3
    for r in out:
        assert (r.width, r.height) == (16, 8)
        # solid-gray frames: decoded mean luma within quant error
        assert abs(r.mean_luma - (50 + 60 * r.frame_idx)) <= 3


# --- perceptual hashing -----------------------------------------------------


def test_ahash_brightness_shift_invariant():
    """aHash compares block means to their own global mean, so a
    uniform brightness shift flips no bits — the invariance that makes
    it a NEAR-dup hash rather than a byte hash."""
    import numpy as np

    a = (np.arange(1024, dtype=np.int64).reshape(32, 32) * 7 % 200).astype(
        np.uint8
    )
    shifted = np.clip(a.astype(np.int64) + 25, 0, 255).astype(np.uint8)
    assert MM.ahash_words(a) == MM.ahash_words(shifted)


def test_ahash_distinct_images_far():
    import numpy as np

    a = (np.arange(1024, dtype=np.int64).reshape(32, 32) * 7 % 200).astype(
        np.uint8
    )
    rng = np.random.default_rng(0)
    b = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    ha, hb = MM.ahash_words(a), MM.ahash_words(b)
    hamming = bin(ha[0] ^ hb[0]).count("1") + bin(ha[1] ^ hb[1]).count("1")
    assert hamming > 10


def test_ahash_words_fit_32_bits():
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(5):
        w0, w1 = MM.ahash_words(rng.integers(0, 256, (32, 32), dtype=np.uint8))
        assert 0 <= w0 < 2**32 and 0 <= w1 < 2**32


def test_render_pgm_real_decode_roundtrip():
    """The rendered payload is REAL binary PGM: decode_image parses the
    header and raster back to the exact pixels."""
    import numpy as np

    p = MM.render_pgm("some document text for the raster")
    arr = MM.decode_image(p)
    assert arr is not None and arr.shape == (32, 32, 1)
    # re-render must be byte-identical (pure function of the text)
    assert MM.render_pgm("some document text for the raster") == p
    assert arr.dtype == np.uint8


def test_phash_banded_pairs_equal_brute_force(spark):
    """Pigeonhole recall: the 4×16-bit banded postings plan must
    reproduce the brute-force Hamming-≤3 pair set exactly — planted
    near-identical signatures (distance 1..3), one distance-4 pair
    that must NOT appear, and exact duplicates."""
    base = 0b1010_1100_0011_0101_1111_0000_1100_0011
    rows = [
        (0, base, base),
        (1, base ^ 0b1, base),            # d=1
        (2, base, base ^ 0b110),          # d=2
        (3, base ^ 0b1, base ^ 0b110),    # d=3 from 0
        (10, base ^ 0b11, base ^ 0b1100), # d=4 from 0
        (20, base, base),                 # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "asset_id long, w0 long, w1 long")
    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in MM.phash_neardup_pairs(df, max_hamming=3).collect()
    }
    # brute force in python
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            d = bin(a[1] ^ b[1]).count("1") + bin(a[2] ^ b[2]).count("1")
            if d <= 3 and a[0] < b[0]:
                want.add((a[0], b[0], d))
    assert got == want
    assert (0, 20, 0) in got and not any(
        10 in (p[0], p[1]) and 0 in (p[0], p[1]) for p in got
    )


def test_phash_rejects_threshold_past_band_guarantee():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MM.phash_neardup_pairs(None, max_hamming=4)


def test_image_phash_spark_matches_local(spark):
    """The distributed mapInPandas pipeline returns exactly the local
    render→decode→hash composition, and empty docs are dropped."""
    texts = ["alpha beta gamma", "delta epsilon", "", "alpha beta gamma"]
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    got = {r["asset_id"]: (r["w0"], r["w1"]) for r in MM.image_phash(df).collect()}
    assert set(got) == {0, 1, 3}  # the empty doc contributes no row
    for i in (0, 1, 3):
        assert got[i] == MM.ahash_words(MM.decode_image(MM.render_pgm(texts[i])))
    assert got[0] == got[3]  # identical text -> identical hash


def test_phash_clusters_transitive_collapse(spark):
    """Identical renders under distinct ids form ONE cluster keyed by
    the min asset_id; unrelated docs contribute no row."""
    from overpaint_spark.operators.components import connected_components

    t = "the same document text repeated verbatim for every copy here"
    other = "a completely different sentence about rivers and morning light"
    docs = spark.createDataFrame(
        [(5, t, "s"), (9, t, "s"), (30, t, "s"), (40, other, "s")],
        "doc_id long, text string, source string",
    )
    hashes = MM.image_phash(docs)
    pairs = MM.phash_neardup_pairs(hashes, max_hamming=3)
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs.select("a_id", "b_id")).collect()
    }
    assert got == {5: 5, 9: 5, 30: 5}  # 40 has no pair -> no row


def test_phash_index_roundtrip_feeds_the_gate(spark, tmp_path):
    """persist → load → gate: the loaded index must drive the SAME
    admission decisions as the in-memory hash relation."""
    from overpaint_spark.streaming.phash import phash_gate_flags

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} with stable text", "s") for i in range(20)],
        "doc_id long, text string, source string",
    )
    path = str(tmp_path / "phash_index")
    MM.persist_phash_index(corpus, path)
    loaded = MM.load_phash_index(spark, path)
    assert loaded.count() == 20

    incoming = spark.createDataFrame(
        [(100, "corpus document number 3 with stable text", "s"),
         (101, "a brand new never seen sentence about harbors", "s")],
        "doc_id long, text string, source string",
    )
    got = {r["asset_id"]: r["admitted"]
           for r in phash_gate_flags(incoming, loaded).collect()}
    want = {r["asset_id"]: r["admitted"]
            for r in phash_gate_flags(incoming, MM.image_phash(corpus)).collect()}
    assert got == want == {100: False, 101: True}


# --- image_phash_bytes: the real-bytes phash front ---------------------------


def _kittens_dir():
    import os

    src = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens"
    if not os.path.isdir(src):
        import pytest

        pytest.skip("no spark sample images")
    return src


def _load_kittens(spark, src):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jpg")
        .load(src)
        .select(
            F.row_number().over(Window.orderBy("path")).alias("asset_id"),
            F.col("content").alias("payload"),
        )
    )


def test_phash_bytes_real_jpegs_match_direct_numpy(spark):
    """Hash stability on REAL photos: the Spark bytes front must equal
    decode_jpeg + ahash_words computed directly in numpy per file, and
    distinct photos must sit far outside the near-dup radius (measured
    pairwise Hamming >= 11 on the four kittens)."""
    import glob

    from overpaint_spark.operators import multimodal as MM

    src = _kittens_dir()
    want = {}
    for i, f in enumerate(sorted(glob.glob(f"{src}/*.jpg")), start=1):
        arr = MM.decode_image(open(f, "rb").read())
        want[i] = MM.ahash_words(arr)
    got = {
        r["asset_id"]: (r["w0"], r["w1"])
        for r in MM.image_phash_bytes(_load_kittens(spark, src)).collect()
    }
    assert got == want
    ids = sorted(got)
    for a in ids:
        for b in ids:
            if a < b:
                d = bin(got[a][0] ^ got[b][0]).count("1") + bin(
                    got[a][1] ^ got[b][1]
                ).count("1")
                assert d > 3, f"distinct kittens {a},{b} inside radius: {d}"


def test_phash_bytes_reencode_is_near_dup_and_banded_pair_found(spark):
    """A re-encoded copy of a real photo (repo's own JPEG encoder at
    q=60) must land within Hamming <= 3 of the original THROUGH the
    Spark operator, and phash_neardup_pairs must surface exactly the
    planted copy pairs via the banded plan (pigeonhole-exact)."""
    import glob

    from overpaint_spark.operators import multimodal as MM
    from overpaint_spark.operators.jpeg import encode_jpeg

    src = _kittens_dir()
    rows = []
    for i, f in enumerate(sorted(glob.glob(f"{src}/*.jpg")), start=1):
        payload = open(f, "rb").read()
        rows.append((i, payload))
        if i <= 2:  # re-encode two of the four as planted near-dups
            arr = MM.decode_image(payload)
            rows.append((100 + i, encode_jpeg(arr, quality=60)))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    hashes = MM.image_phash_bytes(assets)
    pairs = {
        (r["a_id"], r["b_id"])
        for r in MM.phash_neardup_pairs(hashes).collect()
    }
    assert pairs == {(1, 101), (2, 102)}


def test_phash_bytes_format_invariance_and_undecodable_dropped(spark):
    """The SAME raster hashes identically whether it arrives as JPEG
    bytes re-rendered to PGM or PPM (format must not matter once
    decoded), and an undecodable payload yields NO row — the
    unhashable-asset posture the streaming gate documents."""
    import glob

    import numpy as np

    from overpaint_spark.operators import multimodal as MM

    src = _kittens_dir()
    f = sorted(glob.glob(f"{src}/*.jpg"))[0]
    arr = MM.decode_image(open(f, "rb").read())
    gray = arr[..., 0]
    h, w = gray.shape
    pgm = b"P5\n%d %d\n255\n" % (w, h) + gray.astype(np.uint8).tobytes()
    rgb = np.ascontiguousarray(arr[..., :3]).astype(np.uint8)
    ppm = b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
    assets = spark.createDataFrame(
        [(1, pgm), (2, ppm), (3, b"definitely not an image")],
        "asset_id long, payload binary",
    )
    got = {
        r["asset_id"]: (r["w0"], r["w1"])
        for r in MM.image_phash_bytes(assets).collect()
    }
    want = MM.ahash_words(arr)
    assert got == {1: want, 2: want}  # id 3 dropped: no signature


# --- the committed real-photo lake fixture ----------------------------------


def test_photo_fixture_payloads_decode_for_real_and_match_expected():
    """Every committed fixture payload must decode through the REAL
    decoder (never _fake_decode_dims), carry a distinct sha256 (the
    variants are different byte streams of the same rasters), and
    reproduce the _PHOTO_EXPECTED constants when rehashed directly in
    numpy — the same recompute the declared relations run on Spark."""
    import hashlib

    import pyarrow.parquet as pq

    from overpaint_spark import queries as Q
    from overpaint_spark.operators import multimodal as MM

    t = pq.read_table(Q._PHOTO_FIXTURE).to_pylist()
    assert len(t) == 16
    want = {a: (w0, w1, w, h, bl) for a, w0, w1, w, h, bl in Q._PHOTO_EXPECTED}
    digests = set()
    for row in t:
        payload = row["payload"]
        arr = MM.decode_image(payload)
        assert arr is not None, f"asset {row['asset_id']} hit the stub path"
        w0, w1 = MM.ahash_words(arr)
        h, w = arr.shape[:2]
        assert (w0, w1, w, h, len(payload)) == want[row["asset_id"]]
        digests.add(hashlib.sha256(payload).hexdigest())
    assert len(digests) == 16  # all byte streams distinct


def test_photo_neardups_are_exactly_the_within_photo_pairs(spark):
    """The banded near-dup plan over the real-photo table must surface
    ALL 24 within-photo pairs (lossless re-packs at Hamming 0, q=60
    re-encodes at <= 1) and ZERO cross-photo pairs (distinct kittens
    measured >= 11 apart)."""
    from overpaint_spark import queries as Q

    rows = Q.q_multimodal_photo_neardups(spark, "unused").collect()
    assert len(rows) == 24
    for r in rows:
        assert r["a_id"] % 100 == r["b_id"] % 100, f"cross-photo pair: {r}"
        assert r["hamming"] <= 1


def test_photo_robustness_constants_and_invariance_classes():
    """The robustness card's constants must reproduce from the raw
    fixture bytes through decode → perturb_raster → ahash_words (the
    _PHOTO_EXPECTED recompute discipline), and the invariance story
    they tell must hold: photometric edits (brighten/contrast/
    scale_half) stay within the Hamming ≤ 3 gate for EVERY payload,
    a 10% crop evades it for every payload, and each perturbation
    yields a VALID perturbed raster (non-empty, uint8-ranged)."""
    import pyarrow.parquet as pq

    from overpaint_spark import queries as Q
    from overpaint_spark.operators import multimodal as MM

    orig = {a: (w0, w1) for a, w0, w1, *_ in Q._PHOTO_EXPECTED}
    want = {
        (a, k): (w0, w1) for a, k, w0, w1 in Q._PHOTO_ROBUST_EXPECTED
    }
    assert len(want) == 16 * len(MM.PERTURB_KINDS)

    t = pq.read_table(Q._PHOTO_FIXTURE).to_pylist()
    ham = {}
    for row in t:
        arr = MM.decode_image(row["payload"])
        assert arr is not None
        for kind in MM.PERTURB_KINDS:
            p = MM.perturb_raster(arr, kind)
            assert p.size > 0 and int(p.max()) <= 255 and int(p.min()) >= 0
            w0, w1 = MM.ahash_words(p)
            assert (w0, w1) == want[(row["asset_id"], kind)], (
                row["asset_id"], kind,
            )
            o0, o1 = orig[row["asset_id"]]
            ham[(row["asset_id"], kind)] = bin(o0 ^ w0).count("1") + bin(
                o1 ^ w1
            ).count("1")
    for kind in ("brighten", "contrast", "scale_half"):
        assert all(ham[(a, kind)] <= 3 for a in orig), kind
    assert all(ham[(a, "crop10")] > 3 for a in orig)


def test_multimodal_pipeline_survivors_match_independent_union_find(spark):
    """The composed pipeline witness's keep-rule output must equal an
    INDEPENDENT python union-find over the brute-force Hamming-≤3 pair
    set of the signature literals: min-id per component survives,
    singletons pass through, every asset appears exactly once."""
    from overpaint_spark import queries as Q

    rows = Q.q_multimodal_pipeline(spark, "/root/testdata/sf0.001").collect()
    got = {r.asset_id: (r.component, r.survived) for r in rows}
    assert len(got) == len(rows) == len(Q._PHOTO_EXPECTED)

    sigs = {a: (w0, w1) for a, w0, w1, *_ in Q._PHOTO_EXPECTED}
    parent = {a: a for a in sigs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
                sigs[a][1] ^ sigs[b][1]
            ).count("1")
            if d <= Q._PHASH_MAX_HAMMING:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {a: (find(a), a == find(a)) for a in sigs}
    assert got == want
    # the fixture genuinely exercises both branches: real multi-member
    # clusters AND at least one surviving loser-free singleton
    assert any(not s for _, s in want.values())
    assert any(c == a and s for a, (c, s) in want.items())


def test_phash_with_perturbed_equals_two_pass_join(spark):
    """The r12 fused single-decode operator must be row-identical to
    the two-pass form it replaced (image_phash_bytes ⋈ phash_perturbed
    on asset_id) — the optimization changed the decode count and plan
    shape, never a signature bit."""
    from pyspark.sql import functions as F

    from overpaint_spark import queries as Q

    assets = spark.read.parquet(Q._PHOTO_FIXTURE)
    fused = {
        (r.asset_id, r.perturbation): (r.w0, r.w1, r.p_w0, r.p_w1)
        for r in MM.phash_with_perturbed(assets).collect()
    }
    joined = {
        (r.asset_id, r.perturbation): (r.w0, r.w1, r.p_w0, r.p_w1)
        for r in MM.phash_perturbed(assets)
        .join(MM.image_phash_bytes(assets), "asset_id")
        .select("asset_id", "perturbation", "w0", "w1", "p_w0", "p_w1")
        .collect()
    }
    assert fused == joined
    assert len(fused) == 16 * len(MM.PERTURB_KINDS)
