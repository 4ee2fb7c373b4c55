"""Ports of the reference's image perceptual-hash test suite
(perceptual_test.go) against the REAL image pipeline (functions/image.py):
same fixture constructions, same filter simulations, same thresholds.

* consistency suites            — perceptual_test.go:41-88, 455-501
* filtered-image invariance     — perceptual_test.go:153-231 (dhash<=15,
                                  ahash<=18, phash<=12)
* resized-image invariance      — perceptual_test.go:233-292 (<=20)
* cropped-image tolerance       — perceptual_test.go:294-329
* grayscale consistency         — perceptual_test.go:30-38
* preprocessing option combos   — perceptual_test.go:365-389
* CompareImages                 — perceptual.go:473-498
plus round-trip tests for the dependency-free PPM/PGM/BMP codecs the
reference gets from Go's stdlib image registry.
"""

from __future__ import annotations

import numpy as np
import pytest

from file_deduplicator_spark.functions.audio import hamming64
from file_deduplicator_spark.functions.image import (
    ahash_image,
    bmp_decode,
    bmp_encode,
    box_blur3,
    compare_images,
    dhash_image,
    gamma_correct,
    grayscale_u8,
    hash_bitstring,
    hist_equalize,
    image_decode,
    image_sig_from_bytes,
    pgm_encode,
    phash_image,
    pnm_decode,
    ppm_encode,
    preprocess_image,
)

# ---------------------------------------------------------------------------
# fixtures (the reference's synthetic images, perceptual_test.go:43-47,156-165)
# ---------------------------------------------------------------------------


def gradient_image(n: int = 200) -> np.ndarray:
    """The colorful gradient of perceptual_test.go:156-165."""
    x = np.arange(n)[None, :].repeat(n, axis=0)
    y = np.arange(n)[:, None].repeat(n, axis=1)
    img = np.stack(
        [(x * 255) // n, (y * 255) // n, ((x + y) * 255) // (2 * n)], axis=2
    )
    return img.astype(np.uint8)


def simple_image(n: int = 100) -> np.ndarray:
    """perceptual_test.go:43-47: RGBA{x, y, 100}."""
    x = np.arange(n)[None, :].repeat(n, axis=0) % 256
    y = np.arange(n)[:, None].repeat(n, axis=1) % 256
    return np.stack([x, y, np.full((n, n), 100)], axis=2).astype(np.uint8)


# filter simulations (perceptual_test.go:391-452) — same truncating math


def brightness(img, factor):
    return np.minimum(255, img.astype(np.float64) * factor).astype(np.uint8)


def contrast(img, factor):
    v = (img.astype(np.float64) - 128) * factor + 128
    return np.clip(v, 0, 255).astype(np.uint8)


def saturation(img, factor):
    a = img.astype(np.float64)
    gray = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    out = gray[..., None] + (a - gray[..., None]) * factor
    return np.clip(out, 0, 255).astype(np.uint8)


def color_filter(img, rf, gf, bf):
    a = img.astype(np.float64) * np.array([rf, gf, bf])
    return np.minimum(255, a).astype(np.uint8)


ALGOS = [("dhash", dhash_image, 15), ("ahash", ahash_image, 18), ("phash", phash_image, 12)]


# ---------------------------------------------------------------------------
# consistency (perceptual_test.go:30-38, 41-88, 477-501)
# ---------------------------------------------------------------------------


def test_grayscale_consistency():
    px = np.array([[[100, 150, 200]]], dtype=np.uint8)
    assert grayscale_u8(px)[0, 0] == grayscale_u8(px)[0, 0]
    # luminance formula value: int(0.299*100 + 0.587*150 + 0.114*200)
    assert grayscale_u8(px)[0, 0] == int(0.299 * 100 + 0.587 * 150 + 0.114 * 200)


@pytest.mark.parametrize("name,fn,_t", ALGOS)
def test_hash_consistency(name, fn, _t):
    img = simple_image()
    assert fn(img) == fn(img)
    assert len(hash_bitstring(fn(img))) == 64


def test_solid_color_consistency():
    for c in [(255, 0, 0), (0, 255, 0), (0, 0, 255), (128, 128, 128)]:
        img = np.tile(np.array(c, dtype=np.uint8), (100, 100, 1))
        assert dhash_image(img) == dhash_image(img)


def test_small_images():
    img = np.tile(np.array([100, 150, 200], dtype=np.uint8), (10, 10, 1))
    for _, fn, _t in ALGOS:
        sig = fn(img)
        assert isinstance(sig, int)
        assert len(hash_bitstring(sig)) == 64


def test_similar_images_brightness():
    """perceptual_test.go:112-151: uniform 100 vs uniform 120 — histogram
    equalization maps both to the same flat field, so dHash distance is 0."""
    img1 = np.full((100, 100, 3), 100, dtype=np.uint8)
    img2 = np.full((100, 100, 3), 120, dtype=np.uint8)
    assert hamming64(dhash_image(img1), dhash_image(img2)) <= 15


# ---------------------------------------------------------------------------
# the P1 invariance suites (perceptual_test.go:153-292)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,fn,threshold", ALGOS)
def test_filtered_images(name, fn, threshold):
    base = gradient_image(200)
    base_sig = fn(base)
    filters = {
        "brightness_increase": brightness(base, 1.3),
        "brightness_decrease": brightness(base, 0.7),
        "contrast_increase": contrast(base, 1.5),
        "saturation_boost": saturation(base, 1.5),
        "warm_filter": color_filter(base, 1.2, 1.0, 0.8),
        "cool_filter": color_filter(base, 0.8, 1.0, 1.2),
    }
    for fname, filtered in filters.items():
        dist = hamming64(base_sig, fn(filtered))
        assert dist <= threshold, (
            f"{name} failed for {fname}: distance={dist} (threshold={threshold})"
        )


def test_resized_images():
    """perceptual_test.go:233-292: nearest-sampled resizes, dHash <= 20."""
    n = 200
    x = np.arange(n)[None, :].repeat(n, axis=0)
    y = np.arange(n)[:, None].repeat(n, axis=1)
    base = np.stack([(x * 255) // n, (y * 255) // n, np.full((n, n), 128)], axis=2).astype(np.uint8)
    base_sig = dhash_image(base)
    for name, w, h in [
        ("same_size", 200, 200), ("half_size", 100, 100),
        ("double_size", 400, 400), ("wide", 300, 150), ("tall", 150, 300),
    ]:
        sx = (np.arange(w) * n) // w
        sy = (np.arange(h) * n) // h
        resized = base[np.ix_(sy, sx)]
        dist = hamming64(base_sig, dhash_image(resized))
        assert dist <= 20, f"resized {name}: distance={dist}"


def test_cropped_images():
    """perceptual_test.go:294-329 (warns above 30; we assert the bound)."""
    n, crop = 200, 150
    x = np.arange(n)[None, :].repeat(n, axis=0)
    y = np.arange(n)[:, None].repeat(n, axis=1)
    base = np.stack([(x * 255) // n, (y * 255) // n, np.full((n, n), 128)], axis=2).astype(np.uint8)
    off = (n - crop) // 2
    cropped = base[off:off + crop, off:off + crop]
    dist = hamming64(dhash_image(base), dhash_image(cropped))
    assert dist <= 30, f"center crop distance={dist}"


def test_preprocessing_options():
    """perceptual_test.go:365-389: every option combo returns a valid image."""
    img = np.tile(np.array([100, 150, 200], dtype=np.uint8), (100, 100, 1))
    for g in (False, True):
        for nrm in (False, True):
            for b in (False, True):
                out = preprocess_image(img, apply_gamma=g, apply_normalization=nrm, apply_blur=b)
                assert out.shape == img.shape and out.dtype == np.uint8


# ---------------------------------------------------------------------------
# preprocessing arithmetic parity spot-checks
# ---------------------------------------------------------------------------


def test_gamma_lut_values():
    # uint8(pow(v/255, 1/2.2) * 255) at a few anchors
    img = np.array([[[0, 128, 255]]], dtype=np.uint8)
    out = gamma_correct(img)
    assert out[0, 0, 0] == 0
    assert out[0, 0, 1] == int((128 / 255.0) ** (1 / 2.2) * 255)
    assert out[0, 0, 2] == 255


def test_hist_equalize_flat_field():
    # solid color: cdf[v] = n -> every pixel maps to 255
    img = np.full((10, 10, 3), 57, dtype=np.uint8)
    assert (hist_equalize(img) == 255).all()


def test_box_blur_edges_use_valid_neighbors():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    img[1, 1] = 90
    out = box_blur3(img)
    # corner: 4 in-bounds neighbors, one of them the 90 -> 90 // 4 = 22
    assert out[0, 0, 0] == 90 // 4
    # center: 9 neighbors -> 90 // 9 = 10
    assert out[1, 1, 0] == 90 // 9


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def test_ppm_roundtrip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert (pnm_decode(ppm_encode(img)) == img).all()


def test_pgm_roundtrip_expands_to_rgb():
    rng = np.random.RandomState(8)
    g = rng.randint(0, 256, size=(9, 11), dtype=np.uint8)
    out = pnm_decode(pgm_encode(g))
    assert out.shape == (9, 11, 3)
    assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()


def test_ppm_header_with_comments():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    buf = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert (pnm_decode(buf) == img).all()


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(3, 5, 3), dtype=np.uint8)  # 5*3=15 -> pad to 16
    assert (bmp_decode(bmp_encode(img)) == img).all()


def test_bmp_topdown_raster():
    import struct

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    buf = bytearray(bmp_encode(img))
    # flip to top-down: negate height, reverse the row order of the raster
    (h,) = struct.unpack_from("<i", buf, 22)
    struct.pack_into("<i", buf, 22, -h)
    row_bytes = (2 * 3 + 3) & ~3
    raster = bytes(buf[54:])
    rows = [raster[i * row_bytes:(i + 1) * row_bytes] for i in range(h)]
    buf[54:] = b"".join(reversed(rows))
    assert (bmp_decode(bytes(buf)) == img).all()


def test_image_decode_dispatch_and_errors():
    img = gradient_image(16)
    assert (image_decode(ppm_encode(img)) == img).all()
    assert (image_decode(bmp_encode(img)) == img).all()
    with pytest.raises(ValueError):
        image_decode(b"\x89PNG\r\n\x1a\n not actually supported")


# ---------------------------------------------------------------------------
# CompareImages (perceptual.go:473-498)
# ---------------------------------------------------------------------------


def test_compare_images_similar_and_distinct():
    base = gradient_image(120)
    near = brightness(base, 1.2)
    rng = np.random.RandomState(3)
    far = rng.randint(0, 256, size=(120, 120, 3), dtype=np.uint8)

    r = compare_images(ppm_encode(base), ppm_encode(near), "dhash")
    assert r["distance"] <= 10 and r["isSimilar"]
    assert r["similarity"] >= 100.0 - 10 / 64.0 * 100.0
    assert len(r["hash1"]) == 64

    r2 = compare_images(ppm_encode(base), bmp_encode(far), "dhash")
    assert r2["distance"] > 10 and not r2["isSimilar"]


def test_image_sig_from_bytes_algo_dispatch():
    buf = ppm_encode(gradient_image(64))
    assert image_sig_from_bytes(buf, "dhash") == dhash_image(pnm_decode(buf))
    assert image_sig_from_bytes(buf, "phash") == phash_image(pnm_decode(buf))
    # unknown algorithm falls back to dhash (perceptual.go:428-429)
    assert image_sig_from_bytes(buf, "bogus") == image_sig_from_bytes(buf, "dhash")
