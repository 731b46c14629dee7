"""Unit tests for the vectorized merge-sort inversion counter that
kendall_tau's discordant-pair decomposition rests on — exactness is
pinned against the O(n²) brute force across sizes spanning the
power-of-two padding boundaries, tie-heavy arrays, and both sorted
extremes."""

import numpy as np

from readur_ray.pipelines.analytics import _inv_count


def _brute(y):
    n = len(y)
    return sum(
        1 for i in range(n) for j in range(i + 1, n) if y[i] > y[j]
    )


def test_inv_count_matches_brute_force():
    rng = np.random.default_rng(42)
    for n in [0, 1, 2, 3, 4, 5, 7, 8, 9, 16, 17, 31, 64, 100, 257, 500]:
        y = rng.integers(0, max(n // 3, 2), size=n).astype(np.int64)
        assert _inv_count(y) == _brute(y), n


def test_inv_count_extremes():
    asc = np.arange(100, dtype=np.int64)
    assert _inv_count(asc) == 0
    desc = asc[::-1].copy()
    assert _inv_count(desc) == 100 * 99 // 2
    ties = np.zeros(50, np.int64)
    assert _inv_count(ties) == 0
    big = np.random.default_rng(7).permutation(5000).astype(np.int64)
    assert _inv_count(big) == _inv_count(big)  # deterministic
    # spot-check a mid-size array against brute force once more
    y = np.random.default_rng(9).integers(0, 40, size=1200).astype(np.int64)
    assert _inv_count(y) == _brute(y)
