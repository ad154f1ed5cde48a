"""Codec round-trip + PSNR invariant tests (BASELINE.json input_hint:
decoded-pixel PSNR >= 40 dB, exact for lossless)."""

import numpy as np
import pytest

from tscan_ray.sources import codecs


def _tile(seed: int, w: int = 32, h: int = 24) -> np.ndarray:
    rng = np.random.default_rng(seed)
    grad = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
    noise = rng.integers(0, 64, size=(h, w, 3)).astype(np.float64)
    return np.clip(grad + noise, 0, 255).astype(np.uint8)


class TestPng:
    def test_roundtrip_exact(self):
        px = _tile(1)
        data = codecs.encode_png(px)
        out = codecs.decode_png(data)
        assert np.array_equal(px, out)
        assert codecs.psnr_db(px, out) == float("inf")

    def test_magic_sniffing(self):
        px = _tile(2)
        assert np.array_equal(codecs.decode_image(codecs.encode_png(px)), px)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            codecs.decode_png(b"not a png")


class TestFakeJpeg:
    def test_psnr_above_40(self):
        px = _tile(3, 64, 48)
        out = codecs.decode_fake_jpeg(codecs.encode_fake_jpeg(px))
        assert out.shape == px.shape
        p = codecs.psnr_db(px, out)
        assert p >= 40.0, p

    def test_deterministic(self):
        px = _tile(4)
        assert codecs.encode_fake_jpeg(px) == codecs.encode_fake_jpeg(px)


class TestAhash:
    def test_deterministic_and_discriminative(self):
        a = codecs.ahash64(_tile(5))
        b = codecs.ahash64(_tile(5))
        c = codecs.ahash64(_tile(6).transpose(1, 0, 2).copy())  # vertical gradient
        assert a == b
        assert isinstance(a, int)
        assert a != c  # structurally different image -> different hash

    def test_similar_images_close(self):
        px = _tile(7)
        noisy = np.clip(px.astype(np.int16) + 2, 0, 255).astype(np.uint8)
        ha, hb = codecs.ahash64(px), codecs.ahash64(noisy)
        assert bin((ha ^ hb) & (2**64 - 1)).count("1") <= 8
