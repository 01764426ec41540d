"""Baseline JPEG codec: encode→decode round-trips within quantization
error, real-world-file decode, honest refusal of out-of-scope streams,
and the Spark metadata path picking up real JPEG dimensions."""

import os

import numpy as np
import pytest
from pyspark.sql import Row

from overpaint_spark.operators.jpeg import decode_jpeg, encode_jpeg
from overpaint_spark.operators.multimodal import decode_image


def _smooth_gray(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return (128 + 100 * np.sin(yy / 6.0) * np.cos(xx / 9.0)).astype(np.uint8)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            128 + 90 * np.sin(yy / 5.0),
            128 + 90 * np.cos(xx / 7.0),
            128 + 60 * np.sin((xx + yy) / 8.0),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_gray_roundtrip_odd_dims():
    img = _smooth_gray(24, 33)  # not block-aligned: exercises crop
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == (24, 33, 1)
    err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2


def test_rgb_roundtrip_444():
    img = _smooth_rgb(24, 33)
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == (24, 33, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 3


def test_rgb_roundtrip_420_subsampled():
    img = _smooth_rgb(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert dec.shape == (40, 56, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    # chroma is 2x2 box-filtered: looser bound, still tight for smooth data
    assert err.max() <= 40 and err.mean() < 6


def test_restart_interval_roundtrip():
    img = _smooth_rgb(32, 48)
    plain = decode_jpeg(encode_jpeg(img, quality=92))
    with_rst = decode_jpeg(encode_jpeg(img, quality=92, restart_interval=2))
    # RST markers change framing, not content
    assert np.array_equal(plain, with_rst)


def test_refuses_truncated_and_garbage():
    buf = encode_jpeg(_smooth_gray(16, 16))
    assert decode_jpeg(buf[:40]) is None
    assert decode_jpeg(b"not a jpeg at all") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None


_REAL_BASELINE = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/"
    "flower-of-life.jpg"
)
_REAL_PROGRESSIVE = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
_SPARK_IMAGES = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"


@pytest.mark.skipif(not os.path.exists(_REAL_BASELINE), reason="no system jpg")
def test_decodes_real_world_baseline_file():
    buf = open(_REAL_BASELINE, "rb").read()
    out = decode_jpeg(buf)
    assert out is not None and out.shape == (161, 161, 3)
    # white-background image: decoded content must actually look like it
    assert out.mean() > 180


@pytest.mark.skipif(not os.path.exists(_REAL_PROGRESSIVE), reason="no system jpg")
def test_decodes_real_world_progressive_file():
    # spectral-selection-only SOF2 (seven single-component scans)
    out = decode_jpeg(open(_REAL_PROGRESSIVE, "rb").read())
    assert out is not None and out.shape == (58, 493, 3)
    # a white stripe on the node-green background
    assert out.mean() > 200
    center = out[out.shape[0] // 2, out.shape[1] // 2]
    assert (center > 250).all()


@pytest.mark.skipif(not os.path.exists(_SPARK_IMAGES), reason="no spark images")
def test_decodes_real_world_420_photo():
    buf = open(f"{_SPARK_IMAGES}/kittens/DP802813.jpg", "rb").read()
    out = decode_jpeg(buf)
    assert out is not None and out.shape == (313, 199, 3)


@pytest.mark.skipif(not os.path.exists(_SPARK_IMAGES), reason="no spark images")
def test_progressive_refinement_agrees_with_baseline_path():
    """The strongest cross-check available library-free: Spark ships the
    same photo twice — chr30.4.184.jpg (baseline 4:2:0 color) and
    grayscale.jpg (progressive WITH DC/AC successive-approximation
    refinement scans). Decoding both through their entirely separate
    code paths must produce near-identical luma."""
    color = decode_jpeg(
        open(f"{_SPARK_IMAGES}/multi-channel/chr30.4.184.jpg", "rb").read()
    )
    gray = decode_jpeg(
        open(f"{_SPARK_IMAGES}/multi-channel/grayscale.jpg", "rb").read()
    )
    assert color.shape == (215, 300, 3) and gray.shape == (215, 300, 1)
    luma = 0.299 * color[..., 0] + 0.587 * color[..., 1] + 0.114 * color[..., 2]
    g = gray[..., 0].astype(float)
    corr = np.corrcoef(luma.ravel(), g.ravel())[0, 1]
    assert corr > 0.995
    assert np.abs(luma - g).mean() < 6


def test_decode_image_dispatches_jpeg():
    img = _smooth_rgb(16, 24)
    arr = decode_image(encode_jpeg(img, quality=92))
    assert arr is not None and arr.shape == (16, 24, 3)


def test_spark_metadata_reports_real_jpeg_dims(spark):
    from overpaint_spark.operators import multimodal as MM

    payload = encode_jpeg(_smooth_rgb(20, 30), quality=90)
    assets = spark.createDataFrame(
        [Row(asset_id=1, payload=bytearray(payload))],
        "asset_id long, payload binary",
    )
    row = MM.extract_metadata(assets).collect()[0]
    assert (row.width, row.height) == (30, 20)
    assert row.byte_len == len(payload)


def test_fuzz_never_raises():
    """A decoder fed 100 TB of scraped bytes must refuse, never throw —
    an exception inside mapInPandas kills the task. Truncations,
    single-byte corruptions, and magic-prefixed garbage all must return
    None or a valid array."""
    rng = np.random.default_rng(42)
    good = encode_jpeg(_smooth_rgb(24, 33), quality=90, subsample=True,
                       restart_interval=2)
    for n in range(0, len(good), 7):
        decode_jpeg(good[:n])
    for _ in range(300):
        buf = bytearray(good)
        i = int(rng.integers(0, len(buf)))
        buf[i] = int(rng.integers(0, 256))
        out = decode_jpeg(bytes(buf))
        assert out is None or out.dtype == np.uint8
    for _ in range(100):
        n = int(rng.integers(2, 400))
        buf = b"\xff\xd8" + bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        decode_jpeg(buf)


def test_crafted_malformed_segments_refused():
    """Random mutation rarely produces the segment shapes that used to
    escape validation; build them deliberately. Each payload is a
    spec-shaped prefix with one hostile segment: short DQT, truncated
    SOF/DRI/SOS, and a zero sampling factor (divide-by-zero in the
    upsample ratios if it reaches _finish)."""
    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    soi = b"\xff\xd8"
    sof_gray = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                   + bytes([1, 1, 0x11, 0]))
    cases = [
        soi + seg(0xDB, bytes([0]) + bytes(10)),          # DQT 10<64 vals
        soi + seg(0xDB, bytes(66) + bytes([0])),          # 2nd table cut
        soi + seg(0xC0, bytes([8, 0, 8])),                # SOF < 6 bytes
        soi + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([3, 1, 0x11, 0])),              # nc=3, 1 comp
        soi + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([1, 1, 0x01, 0])) + seg(0xDA, bytes(
                      [1, 1, 0x00, 0, 63, 0])),           # h factor = 0
        soi + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([1, 1, 0x10, 0])) + seg(0xDA, bytes(
                      [1, 1, 0x00, 0, 63, 0])),           # v factor = 0
        soi + seg(0xDD, b"\x01"),                         # DRI 1<2 bytes
        soi + sof_gray + seg(0xDA, b"\x01"),              # SOS cut at ns
        soi + sof_gray + seg(0xDA, bytes([2, 1, 0x00])),  # ns=2, 1 pair
        soi + sof_gray + seg(0xDA, bytes([1, 1, 0x00])),  # no Ss/Se/AhAl
        soi + seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([1, 1, 0x11, 0])) + seg(0xDA, b"\x01"),  # prog
    ]
    for payload in cases:
        assert decode_jpeg(payload) is None


def test_hostile_dimensions_capped():
    """A corrupted SOF claiming 65535x65535 must be refused before any
    plane allocation (the OOM would kill the executor, not raise)."""
    import struct

    good = encode_jpeg(_smooth_gray(16, 16), quality=90)
    # rewrite the SOF0 dims in place
    i = good.find(b"\xff\xc0")
    assert i > 0
    buf = bytearray(good)
    buf[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    assert decode_jpeg(bytes(buf)) is None


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker; real encoders emit them before SOS and RSTn. A padded
    stream must decode identically to the unpadded one (pre-fix the
    walk misread FF FF as marker 0xFF and refused the file)."""
    import numpy as np

    img = _smooth_gray(24, 24)
    good = encode_jpeg(img, quality=90, restart_interval=2)

    # pad before every marker segment boundary we can find in the
    # header (after SOI), plus before every RSTn in the entropy data
    out = bytearray()
    i = 0
    while i < len(good):
        if (good[i] == 0xFF and i + 1 < len(good)
                and good[i + 1] not in (0x00,) and good[i + 1] != 0xFF
                and i > 0):
            out += b"\xff\xff"  # two fill bytes before the marker
        out.append(good[i])
        i += 1
    padded = bytes(out)
    a, b = decode_jpeg(good), decode_jpeg(padded)
    assert a is not None and b is not None
    assert np.array_equal(a, b)
