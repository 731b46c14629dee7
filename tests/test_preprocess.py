"""Unit tests for the P1-P12 preprocessing chain
(readur_ray.stages.preprocess vs the reference semantics in
/root/reference/src/ocr/enhanced.rs:123-812)."""

from __future__ import annotations

import numpy as np
import pytest

from readur_ray.stages import preprocess as P


def flat(v, shape=(64, 64)):
    return np.full(shape, v, dtype=np.uint8)


def test_orientation_only_for_wide_images():
    wide = np.zeros((10, 30), dtype=np.uint8)
    out, rotated = P.correct_orientation(wide)
    assert rotated and out.shape == (30, 10)
    tall = np.zeros((30, 10), dtype=np.uint8)
    out, rotated = P.correct_orientation(tall)
    assert not rotated and out.shape == (30, 10)
    # exactly 2.0 ratio is NOT rotated (strict >)
    out, rotated = P.correct_orientation(np.zeros((10, 20), dtype=np.uint8))
    assert not rotated


def test_smart_resize_thresholds():
    big = np.zeros((1000, 4096), dtype=np.uint8)
    out, resized = P.smart_resize(big)
    assert resized and max(out.shape) == 2048
    small = np.zeros((100, 400), dtype=np.uint8)
    out, resized = P.smart_resize(small)
    assert resized and min(out.shape) == 600
    ok = np.zeros((500, 500), dtype=np.uint8)
    out, resized = P.smart_resize(ok)
    assert not resized


def test_quality_stats_flat_vs_noisy():
    s_flat = P.analyze_quality(flat(128))
    assert s_flat.average_brightness == pytest.approx(128.0)
    assert s_flat.contrast_ratio == pytest.approx(0.0)
    assert s_flat.noise_level == pytest.approx(0.0)
    assert s_flat.sharpness == pytest.approx(0.0)

    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, size=(128, 128)).astype(np.uint8)
    s_noisy = P.analyze_quality(noisy)
    assert s_noisy.contrast_ratio > 0.2
    assert s_noisy.noise_level > 0.1
    assert s_noisy.sharpness > 0.1


def test_brightness_bands():
    s = P.PreprocessSettings()
    # very dim → boost 60-b, flat contrast → mult 2.5
    stats = P.QualityStats(40.0, 0.1, 0.0, 1.0)
    out = P.brightness_contrast(flat(40), stats, s)
    assert out[0, 0] == min(255, round((40 + 20.0) * 2.5))
    # bright → no boost, good contrast → 1.2
    stats = P.QualityStats(200.0, 0.5, 0.0, 1.0)
    out = P.brightness_contrast(flat(200), stats, s)
    assert out[0, 0] == min(255, round(200 * 1.2))


def test_histogram_equalization_stretches():
    img = np.concatenate(
        [flat(100, (32, 64)), flat(110, (32, 64))], axis=0
    )
    out = P.histogram_equalization(img)
    vals = sorted(np.unique(out).tolist())
    assert vals[0] in (126, 127) and vals[-1] == 255


def test_contrast_stretch_minmax():
    img = np.concatenate([flat(50, (16, 32)), flat(150, (16, 32))], axis=0)
    out = P.contrast_stretch(img)
    assert out.min() == 0 and out.max() == 255
    assert P.contrast_stretch(flat(77)).max() == 77  # flat unchanged


def test_adaptive_threshold_binarizes():
    img = flat(100)
    img[20:40, 20:40] = 30
    out = P.adaptive_threshold(img, 15)
    assert set(np.unique(out)) <= {0, 255}


def test_unsharp_preserves_border_and_flat():
    img = flat(90)
    out = P.unsharp_sharpen(img)
    assert np.array_equal(out, img)  # flat: 5v-4v = v, borders copied


def test_morphology_removes_salt():
    img = flat(255)
    img[10, 10] = 0  # single dark pixel (pepper on white)
    out = P.morphological_open_close(img)
    assert out[10, 10] == 255


def test_chain_deterministic_and_gated():
    arr = P.synth_gray_image(b"payload-x", 256, 256)
    a1, s1, steps1 = P.preprocess_image(arr)
    a2, s2, steps2 = P.preprocess_image(arr)
    assert np.array_equal(a1, a2) and steps1 == steps2
    # a clean bright high-contrast sharp image skips everything
    rng = np.random.default_rng(1)
    clean = np.where(rng.random((256, 256)) < 0.5, 30, 220).astype(np.uint8)
    _, stats, steps = P.preprocess_image(clean)
    assert not P.needs_enhancement(stats, P.PreprocessSettings()) or steps


def test_engine_integration_records_steps():
    from readur_ray.config import ExtractionConfig
    from readur_ray.stages.engines import HermeticImageOcrEngine
    from readur_ray import synth

    cfg = ExtractionConfig(enable_image_preprocessing=True)
    eng = HermeticImageOcrEngine(cfg)
    payload = synth.img_payload("doc-x", 0, "img_ok")
    res = eng.extract(payload)
    assert res.text
    assert isinstance(res.preprocessing_applied, list)


def test_preprocess_stats_decisions_match_chain_geometry():
    """The driver query's P1/P2 decision columns must agree with what
    correct_orientation + smart_resize actually do at those dims."""
    import hashlib

    for text in ("hello world", "abc", "the table of values", "x" * 500):
        h = hashlib.md5(text.encode()).hexdigest()
        w = 64 + int(h[0:8], 16) % 320
        ht = 64 + int(h[8:16], 16) % 320
        img = np.zeros((ht, w), dtype=np.uint8)
        img2, rotated = P.correct_orientation(img)
        img3, resized = P.smart_resize(img2)
        # query math (pipelines.multimodal.preprocess_stats)
        q_rot = w / ht > 2.0
        w2, h2 = (ht, w) if q_rot else (w, ht)
        mx, mn = max(w2, h2), min(w2, h2)
        scale = 2048.0 / mx if mx > 2048 else (600.0 / mn if mn < 300 else 1.0)
        q_resized = scale != 1.0
        q_out_w = max(1, int(w2 * scale))
        q_out_h = max(1, int(h2 * scale))
        assert q_rot == rotated
        assert q_resized == resized
        assert (q_out_h, q_out_w) == img3.shape
