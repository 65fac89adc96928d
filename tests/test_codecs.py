"""Codec round-trip + quality gate (input_hint: PSNR >= 40 dB lossy,
exact round-trip lossless). Mirrors the reference's null/round-trip
test posture (src/utils/mod.rs:380-459)."""

import numpy as np
import pytest

from kafka_delta_rs_ray.codecs import FORMATS, decode, encode
from kafka_delta_rs_ray.errors import FormatError
from kafka_delta_rs_ray.functions import phash64, psnr, zcode_from_columns
from kafka_delta_rs_ray.pipelines.synth import make_pattern


def _images():
    rng = np.random.default_rng(7)
    out = {}
    for p in ("flat", "gradient", "checker", "noise"):
        out[p] = make_pattern(p, 64, 64, rng)
    out["odd_size"] = rng.integers(0, 256, (50, 37, 3), dtype=np.uint8)
    out["high_freq"] = (np.indices((64, 64)).sum(0) % 2 * 255).astype(
        np.uint8)[:, :, None] * np.ones(3, np.uint8)
    return out


@pytest.mark.parametrize("name,img", list(_images().items()))
def test_rawz_exact_roundtrip(name, img):
    assert np.array_equal(decode(encode(img, "rawz"), "rawz"), img)


@pytest.mark.parametrize("name,img", list(_images().items()))
def test_dctq_psnr_gate(name, img):
    rec = decode(encode(img, "dctq"), "dctq")
    assert rec.shape == img.shape
    assert psnr(img, rec) >= 40.0, name


def test_unknown_fmt_raises():
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(FormatError):
        encode(img, "jpeg")
    with pytest.raises(FormatError):
        decode(b"garbage!", "rawz")
    with pytest.raises(FormatError):
        decode(b"nonsense-bytes", "dctq")


def test_corrupt_payload_raises():
    # the registry spans modalities: each fmt gets its modality's payload
    payloads = {
        "rawz": np.zeros((16, 16, 3), np.uint8),
        "dctq": np.zeros((16, 16, 3), np.uint8),
        "pcmz": np.zeros(256, np.int16),
        "vraw": np.zeros((4, 16, 16, 3), np.uint8),
    }
    assert set(payloads) == set(FORMATS)
    for fmt in FORMATS:
        buf = encode(payloads[fmt], fmt)
        truncated = buf[: len(buf) // 2]
        with pytest.raises(FormatError):
            decode(truncated, fmt)


def test_phash_deterministic_and_locality():
    rng = np.random.default_rng(1)
    a = make_pattern("gradient", 64, 64, np.random.default_rng(5))
    b = make_pattern("gradient", 64, 64, np.random.default_rng(5))
    assert phash64(a) == phash64(b)  # identical image → identical hash
    n = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert phash64(a) != phash64(n)
    v = phash64(a)
    assert -(2 ** 63) <= v < 2 ** 63


def test_zcode_properties():
    ph = np.array([0, -1, 2 ** 62, -(2 ** 62)], dtype=np.int64)
    w = np.array([32, 64, 128, 256])
    h = np.array([32, 64, 128, 256])
    z = zcode_from_columns(ph, w, h)
    assert z.dtype == np.int64
    assert (z >= 0).all()  # 63-bit codes, always sortable as int64
    # same inputs → same code; different w → different code
    z2 = zcode_from_columns(ph, w, h)
    assert np.array_equal(z, z2)
    z3 = zcode_from_columns(ph, w + 8, h)
    assert (z != z3).any()
