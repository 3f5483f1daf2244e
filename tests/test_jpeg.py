"""Baseline JPEG codec (levsim/extras/jpeg.py): analytic DC-only values,
pixel-tolerance roundtrips, header robustness, and the decode_image sniff
path.  No Spark session needed — the codec is pure NumPy."""

import numpy as np
import pytest

from levsim.extras import jpeg


def _analytic_flat(v: int, q00: int) -> int:
    """Closed-form decoded value of a flat grayscale block: the DC
    coefficient of a flat level-shifted block is 8*(v-128), quantized and
    reconstructed with the codec-wide half-up rounding."""
    s = int(np.floor(8 * (v - 128) / q00 + 0.5))
    return min(255, max(0, int(np.floor(s * q00 / 8.0 + 0.5)) + 128))


def test_flat_gray_matches_closed_form_all_values():
    q00 = int(jpeg.quality_scale(jpeg.STD_LUMA_Q, 90)[0, 0])
    assert q00 == 3  # the constant the driver oracle hardcodes
    for v in range(256):
        img = np.full((16, 16), v, dtype=np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert dec.shape == (16, 16, 3)
        assert (dec == _analytic_flat(v, q00)).all(), v


def test_flat_gray_other_qualities():
    for quality in (50, 75, 95):
        q00 = int(jpeg.quality_scale(jpeg.STD_LUMA_Q, quality)[0, 0])
        for v in (0, 31, 128, 200, 255):
            img = np.full((8, 8), v, dtype=np.uint8)
            dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
            assert (dec == _analytic_flat(v, q00)).all(), (quality, v)


def test_rgb_roundtrip_tolerance():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    # random noise is the worst case for DCT coding; q95 keeps it modest
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 24


def test_smooth_gradient_close():
    y, x = np.mgrid[0:32, 0:40]
    img = np.stack(
        [np.clip(y * 4, 0, 255), np.clip(x * 3, 0, 255),
         np.clip(128 + np.sin(x / 8.0) * 60, 0, 255)], axis=-1
    ).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
    d = np.abs(dec.astype(int) - img.astype(int))
    assert d.mean() < 3.0 and d.max() <= 16


def test_grayscale_single_component_and_odd_sizes():
    rng = np.random.RandomState(11)
    for shape in ((8, 8), (9, 13), (1, 1), (7, 32)):
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        # low-pass the noise so tolerance is meaningful at q90
        img = (img // 4 + 96).astype(np.uint8)
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert dec.shape == (*shape, 3)
        assert (dec[..., 0] == dec[..., 1]).all()  # gray replicated
        assert int(np.abs(dec[..., 0].astype(int) - img.astype(int)).max()) <= 14


def test_orientation_not_flipped():
    # a half-black/half-white image pins row order through the pipeline
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8] = 230
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert dec[:8].mean() > 180 and dec[8:].mean() < 60


def test_reject_invalid_payloads():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")  # no SOS
    good = jpeg.encode_jpeg(np.full((16, 16), 90, dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(good[: len(good) // 2])  # truncated entropy stream
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(np.zeros((4, 4), dtype=np.uint8), quality=0)


def test_decode_image_sniffs_jpeg():
    from levsim.extras import multimodal as mm

    img = np.full((16, 16), 77, dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, quality=90)
    feats = mm.decode_image(payload)  # no fake flag: the REAL path
    assert feats.shape == (mm.FEATURE_DIM,)
    # per-channel means of a flat 77-gray image: 77/127.5 - 1, tolerance
    # covers the quantization step
    assert abs(float(feats[0]) - (77 / 127.5 - 1.0)) < 0.02


def test_restart_interval_roundtrip():
    """DRI/RSTn emission + the decoder's resync path: identical pixels to
    the no-restart stream, across interval sizes that hit the modulo-8
    marker cycling (a 6x6-MCU image at interval 1 emits 35 markers)."""
    rng = np.random.RandomState(3)
    img = (rng.randint(0, 256, size=(48, 48, 3), dtype=np.uint8) // 4 + 96).astype(np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    for interval in (1, 2, 5, 36, 100):
        enc = jpeg.encode_jpeg(img, quality=90, restart_interval=interval)
        assert (jpeg.decode_jpeg(enc) == base).all(), interval
    # markers really are in the stream (and stuffing didn't eat them)
    enc1 = jpeg.encode_jpeg(img, quality=90, restart_interval=1)
    assert any(bytes([0xFF, 0xD0 + k]) in enc1 for k in range(8))


def test_ff_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    code; other encoders emit them, so the header walk must skip runs of
    0xFF (round-4 ADVICE).  Inject fill bytes before every header marker of
    a valid stream and require identical decode."""
    rng = np.random.RandomState(7)
    img = (rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8) // 4 + 96).astype(np.uint8)
    enc = jpeg.encode_jpeg(img, quality=90)
    base = jpeg.decode_jpeg(enc)
    # walk the header segments exactly as a writer would, inserting fill
    # bytes before each marker up to (and including) SOS; entropy-coded
    # data after SOS must stay untouched (0xFF there is stuffed/restart)
    out = bytearray(enc[:2])
    pos = 2
    import struct as _s
    while True:
        assert enc[pos] == 0xFF
        marker = enc[pos + 1]
        out += b"\xff" * 3  # fill run
        if marker == 0xDA:
            out += enc[pos:]
            break
        size = _s.unpack_from(">H", enc, pos + 2)[0]
        out += enc[pos:pos + 2 + size]
        pos += 2 + size
    got = jpeg.decode_jpeg(bytes(out))
    assert (got == base).all()
