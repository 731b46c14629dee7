"""Image preprocessing chain P1-P12 as vectorized NumPy kernels.

Re-implements the reference's OCR image-enhancement pipeline
(/root/reference/src/ocr/enhanced.rs:123-812) over uint8 grayscale
arrays, preserving its decision thresholds and step order:

  orientation (P1, :339-350) → smart resize (P2, :354-386) →
  quality analysis (P3, :390-476; >4 MP → every-10th-pixel sampling) →
  needs_enhancement gate (:219-250) → selective steps:
    brightness/contrast (P6, :554-592; brightness < 50 gate :158),
    noise removal (P7, :596-631; noise > 0.25 gate :164),
    adaptive threshold / contrast (P8, :633-680; contrast < 0.2 gate
      :170; > 1.5 MP or panic → histogram-equalization fallback P9
      :683-744, + contrast stretch P10 :747-780 when contrast < 0.3),
    unsharp sharpening (P11, :762-800; sharpness < 0.2 gate :191),
    morphological open+close (P12, :804-812; opt-in & noise > 0.15).

Each step is a pure array→array function (unit-testable); the chain
runs inside the image-OCR actor on decoded arrays — zero-copy from
Arrow binary in the real-decoder path, synthetic deterministic arrays
in the hermetic path (synth_gray_image).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

MAX_FULL_ANALYSIS_PIXELS = 4_000_000
MAX_ADAPTIVE_THRESHOLD_PIXELS = 1_500_000


@dataclass
class QualityStats:
    """P3 output (enhanced.rs:28-36 ImageQualityStats)."""

    average_brightness: float
    contrast_ratio: float
    noise_level: float
    sharpness: float


@dataclass
class PreprocessSettings:
    """The preprocessing-relevant subset of the reference Settings
    (defaults from settings.rs:302-379)."""

    detect_orientation: bool = True
    brightness_boost: float = 0.0        # 0 → data-driven bands
    contrast_multiplier: float = 0.0     # 0 → data-driven bands
    noise_reduction_level: int = 0       # 0 → data-driven level
    sharpening_strength: float = 0.0
    morphological_operations: bool = False
    adaptive_threshold_window_size: int = 0
    quality_threshold_brightness: float = 0.3
    quality_threshold_contrast: float = 0.2
    quality_threshold_noise: float = 0.7
    quality_threshold_sharpness: float = 0.3


# ---------------------------------------------------------------------------
# P1 / P2 — geometry
# ---------------------------------------------------------------------------

def correct_orientation(img: np.ndarray) -> tuple[np.ndarray, bool]:
    """P1: rotate 90° iff width/height > 2.0 (enhanced.rs:343-349)."""
    h, w = img.shape
    if h > 0 and w / h > 2.0:
        return np.rot90(img), True
    return img, False


def smart_resize(img: np.ndarray) -> tuple[np.ndarray, bool]:
    """P2: >2048 px longest edge → downscale to 2048; <300 px shortest
    edge → upscale so it becomes 600 (enhanced.rs:354-386). Nearest-
    neighbor sampling stands in for Lanczos3 (no PIL in container);
    the *decision thresholds* are the contract."""
    h, w = img.shape
    mx, mn = max(w, h), min(w, h)
    if mx > 2048:
        scale = 2048.0 / mx
    elif mn < 300:
        scale = 600.0 / mn
    else:
        return img, False
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64).clip(0, w - 1)
    return img[np.ix_(ys, xs)], True


# ---------------------------------------------------------------------------
# P3-P5 — quality analysis
# ---------------------------------------------------------------------------

def analyze_quality(img: np.ndarray) -> QualityStats:
    """P3+P4+P5 (enhanced.rs:390-550)."""
    h, w = img.shape
    if h * w > MAX_FULL_ANALYSIS_PIXELS:
        sample = img[::10, ::10].astype(np.float64)
    else:
        sample = img.astype(np.float64)
    brightness = float(sample.mean()) if sample.size else 128.0
    variance = float(((sample - brightness) ** 2).mean()) if sample.size else 0.0
    contrast = float(np.sqrt(variance) / 255.0)
    return QualityStats(
        average_brightness=brightness,
        contrast_ratio=contrast,
        noise_level=estimate_noise(img),
        sharpness=estimate_sharpness(img),
    )


def estimate_noise(img: np.ndarray) -> float:
    """P4: |center − 3×3-neighbor-mean| sampled on a 10-px grid inside
    a 5-px margin, normalized by 255 (enhanced.rs:480-514)."""
    h, w = img.shape
    if h <= 10 or w <= 10:
        return 0.0
    f = img.astype(np.float64)
    ys = np.arange(5, h - 5, 10)
    xs = np.arange(5, w - 5, 10)
    if ys.size == 0 or xs.size == 0:
        return 0.0
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    center = f[yy, xx]
    acc = np.zeros_like(center)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc += f[yy + dy, xx + dx]
    return float(np.abs(center - acc / 8.0).mean() / 255.0)


def estimate_sharpness(img: np.ndarray) -> float:
    """P5: mean central-difference gradient magnitude / 255; every
    10th pixel for > 4 MP (enhanced.rs:518-550)."""
    h, w = img.shape
    if h < 3 or w < 3:
        return 0.0
    step = 10 if h * w > MAX_FULL_ANALYSIS_PIXELS else 1
    f = img.astype(np.float64)
    ys = np.arange(1, h - 1, step)
    xs = np.arange(1, w - 1, step)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    gx = (f[yy, xx + 1] - f[yy, xx - 1]) / 2.0
    gy = (f[yy + 1, xx] - f[yy - 1, xx]) / 2.0
    return float(np.sqrt(gx * gx + gy * gy).mean() / 255.0)


def needs_enhancement(stats: QualityStats, s: PreprocessSettings) -> bool:
    """Gate (enhanced.rs:219-250)."""
    user_wants = (
        s.brightness_boost > 0.0
        or s.contrast_multiplier > 1.0
        or s.noise_reduction_level > 1
        or s.sharpening_strength > 0.0
    )
    return (
        stats.average_brightness < s.quality_threshold_brightness
        or stats.contrast_ratio < s.quality_threshold_contrast
        or stats.noise_level > s.quality_threshold_noise
        or stats.sharpness < s.quality_threshold_sharpness
        or user_wants
    )


# ---------------------------------------------------------------------------
# P6-P12 — enhancement steps
# ---------------------------------------------------------------------------

def brightness_contrast(
    img: np.ndarray, stats: QualityStats, s: PreprocessSettings
) -> np.ndarray:
    """P6 (enhanced.rs:554-592): banded boost + multiplier, rounded
    and clamped."""
    b = stats.average_brightness
    if s.brightness_boost > 0.0:
        boost = s.brightness_boost
    elif b < 50.0:
        boost = 60.0 - b
    elif b < 80.0:
        boost = 30.0 - (b - 50.0) * 0.5
    else:
        boost = 0.0
    c = stats.contrast_ratio
    if s.contrast_multiplier > 0.0:
        mult = s.contrast_multiplier
    elif c < 0.2:
        mult = 2.5
    elif c < 0.4:
        mult = 1.8
    else:
        mult = 1.2
    out = np.rint((img.astype(np.float64) + boost) * mult)
    return np.clip(out, 0, 255).astype(np.uint8)


def _median3(img: np.ndarray, radius: int = 1) -> np.ndarray:
    """(2r+1)² median via edge-padded stacked shifts."""
    k = 2 * radius + 1
    pad = np.pad(img, radius, mode="edge")
    h, w = img.shape
    stack = np.stack(
        [pad[dy : dy + h, dx : dx + w] for dy in range(k) for dx in range(k)]
    )
    return np.median(stack, axis=0).astype(np.uint8)


def _gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian (float32, same shape)."""
    radius = max(1, int(3 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-(x**2) / (2 * sigma * sigma))
    kernel /= kernel.sum()
    f = img.astype(np.float64)
    f = np.apply_along_axis(lambda r: np.convolve(r, kernel, mode="same"), 1, f)
    f = np.apply_along_axis(lambda c: np.convolve(c, kernel, mode="same"), 0, f)
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


def noise_removal(
    img: np.ndarray, stats: QualityStats, s: PreprocessSettings
) -> np.ndarray:
    """P7 (enhanced.rs:596-631): level from noise bands (>0.2 → 3,
    >0.1 → 2, else 1) unless user-set; median(+gaussian) per level."""
    if s.noise_reduction_level > 0:
        level = s.noise_reduction_level
    elif stats.noise_level > 0.2:
        level = 3
    elif stats.noise_level > 0.1:
        level = 2
    else:
        level = 1
    if level >= 3:
        return _gaussian_blur(_median3(img, radius=2), 0.8)
    if level == 2:
        return _gaussian_blur(_median3(img, radius=1), 0.5)
    return _median3(img, radius=1)


def adaptive_threshold(img: np.ndarray, window: int) -> np.ndarray:
    """P8 core: binarize against the local mean in a window×window
    box (integral-image box mean)."""
    h, w = img.shape
    r = window // 2
    pad = np.pad(img.astype(np.float64), ((r + 1, r), (r + 1, r)), mode="edge")
    ii = pad.cumsum(axis=0).cumsum(axis=1)
    a = ii[window:, window:]
    b = ii[:-window, window:]
    c = ii[window:, :-window]
    d = ii[:-window, :-window]
    means = (a - b - c + d)[:h, :w] / (window * window)
    return np.where(img.astype(np.float64) >= means, 255, 0).astype(np.uint8)


def histogram_equalization(img: np.ndarray) -> np.ndarray:
    """P9 (enhanced.rs:683-744): CDF lookup table; entries with zero
    CDF stay 0 (the reference's quirk is preserved)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.uint64)
    cdf = hist.cumsum()
    total = img.size
    lookup = np.zeros(256, dtype=np.uint8)
    nz = cdf > 0
    lookup[nz] = ((cdf[nz] / total) * 255.0).astype(np.uint8)
    return lookup[img]


def contrast_stretch(img: np.ndarray) -> np.ndarray:
    """P10 (enhanced.rs:747-780): min-max normalize; flat image
    unchanged."""
    mn, mx = int(img.min()), int(img.max())
    if mx == mn:
        return img
    out = ((img.astype(np.float64) - mn) / (mx - mn)) * 255.0
    return out.astype(np.uint8)


def contrast_enhancement(
    img: np.ndarray, stats: QualityStats, s: PreprocessSettings
) -> np.ndarray:
    """P8 with the reference's window sizing and >1.5 MP / failure
    fallback to P9(+P10) (enhanced.rs:633-744)."""
    h, w = img.shape
    if h * w > MAX_ADAPTIVE_THRESHOLD_PIXELS:
        out = histogram_equalization(img)
        if stats.contrast_ratio < 0.3:
            out = contrast_stretch(out)
        return out
    mn = min(w, h)
    if s.adaptive_threshold_window_size > 0:
        window = s.adaptive_threshold_window_size
    elif stats.contrast_ratio < 0.2:
        window = min(max(mn // 20, 11), 31)
    else:
        window = min(max(mn // 15, 15), 41)
    if window % 2 == 0:
        window += 1
    try:
        return adaptive_threshold(img, window)
    except Exception:
        out = histogram_equalization(img)
        if stats.contrast_ratio < 0.3:
            out = contrast_stretch(out)
        return out


def unsharp_sharpen(img: np.ndarray) -> np.ndarray:
    """P11 (enhanced.rs:762-800): fixed 3×3 kernel
    [[0,-1,0],[-1,5,-1],[0,-1,0]]; border pixels copied unchanged."""
    f = img.astype(np.float64)
    out = f.copy()
    core = (
        5.0 * f[1:-1, 1:-1]
        - f[:-2, 1:-1]
        - f[2:, 1:-1]
        - f[1:-1, :-2]
        - f[1:-1, 2:]
    )
    out[1:-1, 1:-1] = np.clip(np.rint(core), 0, 255)
    return out.astype(np.uint8)


def _erode(img: np.ndarray) -> np.ndarray:
    pad = np.pad(img, 1, mode="edge")
    h, w = img.shape
    stack = np.stack(
        [pad[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
    )
    return stack.min(axis=0)


def _dilate(img: np.ndarray) -> np.ndarray:
    pad = np.pad(img, 1, mode="edge")
    h, w = img.shape
    stack = np.stack(
        [pad[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
    )
    return stack.max(axis=0)


def morphological_open_close(img: np.ndarray) -> np.ndarray:
    """P12 (enhanced.rs:804-812): open (erode→dilate) then close
    (dilate→erode), LInf norm radius 1 == 3×3 structuring element."""
    opened = _dilate(_erode(img))
    return _erode(_dilate(opened))


# ---------------------------------------------------------------------------
# the chain (enhanced.rs:123-210 order and gates)
# ---------------------------------------------------------------------------

def preprocess_image(
    img: np.ndarray, s: PreprocessSettings | None = None
) -> tuple[np.ndarray, QualityStats, list[str]]:
    """Full P1→P12 chain; returns (processed, stats, applied-steps)."""
    s = s or PreprocessSettings()
    applied: list[str] = []
    if s.detect_orientation:
        img, rotated = correct_orientation(img)
        if rotated:
            applied.append("orientation_correction")
    img, resized = smart_resize(img)
    if resized:
        applied.append("smart_resize")
    stats = analyze_quality(img)
    if needs_enhancement(stats, s):
        if stats.average_brightness < 50.0 or s.brightness_boost > 0.0:
            img = brightness_contrast(img, stats, s)
            applied.append("Brightness/contrast correction")
        if stats.noise_level > 0.25 or s.noise_reduction_level > 1:
            img = noise_removal(img, stats, s)
            applied.append("Noise reduction")
        if stats.contrast_ratio < 0.2 or s.adaptive_threshold_window_size > 0:
            img = contrast_enhancement(img, stats, s)
            applied.append("Contrast enhancement")
        if stats.sharpness < 0.2 or s.sharpening_strength > 0.5:
            img = unsharp_sharpen(img)
            applied.append("Image sharpening")
        if s.morphological_operations and stats.noise_level > 0.15:
            img = morphological_open_close(img)
            applied.append("Morphological operations")
    return img, stats, applied


# ---------------------------------------------------------------------------
# hermetic decode — deterministic synthetic grayscale
# ---------------------------------------------------------------------------

def synth_gray_image(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic text-like grayscale page derived from the payload
    digest: light background + dark horizontal 'text lines' + seeded
    noise. Stands in for a real decoder; shape/dtype contract is real."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 225, dtype=np.uint8)
    n_lines = max(1, h // 24)
    for i in range(n_lines):
        y0 = 8 + i * 24
        if y0 + 10 >= h:
            break
        xs = rng.random(w) < 0.6
        img[y0 : y0 + 10, xs] = rng.integers(10, 60)
    noise = rng.normal(0, 6.0, size=(h, w))
    return np.clip(img.astype(np.float64) + noise, 0, 255).astype(np.uint8)
