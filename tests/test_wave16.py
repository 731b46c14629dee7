"""Round-4 wave-16 kernel properties: the 2-D skyline sweep vs a naive
O(n²) dominance check, and the AllPairs prefix-filter completeness
theorem on arbitrary sets (no Ray needed — these pin the pure kernels
the distributed plans call)."""

from __future__ import annotations

import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")


def _naive_skyline(n: np.ndarray, c: np.ndarray) -> np.ndarray:
    m = len(n)
    keep = np.ones(m, bool)
    for i in range(m):
        for j in range(m):
            if i == j:
                continue
            if (
                n[j] >= n[i]
                and c[j] >= c[i]
                and (n[j] > n[i] or c[j] > c[i])
            ):
                keep[i] = False
                break
    return keep


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_skyline2d_fuzz_vs_naive(pts):
    # tiny value range on purpose: forces heavy ties / duplicate points,
    # the cases where dominance strictness is easy to get wrong
    from readur_ray.pipelines.analytics import _skyline2d

    n = np.array([p[0] for p in pts], np.int64)
    c = np.array([p[1] for p in pts], np.int64)
    got = _skyline2d(n, c)
    want = _naive_skyline(n, c)
    assert got.tolist() == want.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.data(),
)
def test_prefix_filter_never_loses_a_qualifying_pair(data):
    # the AllPairs guarantee ppjoin_exact rests on: for ANY total token
    # order, any pair with J >= PP_NUM/PP_DEN shares a token inside
    # both prefixes of length p = n - ceil(t*n) + 1
    from readur_ray.pipelines.dedup import PP_DEN, PP_NUM, _pp_prefix_len

    universe = list(range(20))
    a = set(data.draw(st.lists(st.sampled_from(universe), min_size=1, max_size=15)))
    b = set(data.draw(st.lists(st.sampled_from(universe), min_size=1, max_size=15)))
    order = data.draw(st.permutations(universe))
    rank = {tok: i for i, tok in enumerate(order)}
    inter = len(a & b)
    union = len(a | b)
    if inter * PP_DEN < union * PP_NUM:
        return  # below threshold: no guarantee claimed
    sa = sorted(a, key=rank.__getitem__)
    sb = sorted(b, key=rank.__getitem__)
    pa = int(_pp_prefix_len(np.int64(len(sa))))
    pb = int(_pp_prefix_len(np.int64(len(sb))))
    assert set(sa[:pa]) & set(sb[:pb]), (sa, sb, pa, pb)


def test_prefix_len_integer_math():
    from readur_ray.pipelines.dedup import _pp_prefix_len

    n = np.arange(1, 200, dtype=np.int64)
    p = _pp_prefix_len(n)
    # p = n - ceil(n/2) + 1 at t=1/2: always within [1, n]
    assert (p >= 1).all() and (p <= n).all()
    import math

    want = n - np.array([math.ceil(x / 2) for x in n]) + 1
    assert (p == want).all()


def test_snm_window_kernel_boundary_copies():
    # ranks 60..67 span the block-63|64 boundary (SNM_BLOCK=64): rows
    # 64..66 are copied into block 0 per the RankRows rule; the kernel
    # must emit every pair with rank diff <= 3 exactly once
    import pyarrow as pa

    from readur_ray.pipelines.dedup import (
        SNM_BLOCK,
        SNM_WINDOW,
        _snm_window_pairs,
    )

    assert SNM_BLOCK == 64 and SNM_WINDOW == 3
    ranks = list(range(60, 68))
    rows = []  # (rank, doc_id=rank*10, g)
    for r in ranks:
        rows.append((r, r * 10, r // SNM_BLOCK))
        g2 = (r - SNM_WINDOW) // SNM_BLOCK
        if g2 != r // SNM_BLOCK and g2 >= 0:
            rows.append((r, r * 10, g2))
    t = pa.table(
        {
            "rank": pa.array([r for r, _, _ in rows], pa.int64()),
            "doc_id": pa.array([d for _, d, _ in rows], pa.int64()),
            "g": pa.array([g for _, _, g in rows], pa.int64()),
        }
    )
    out = _snm_window_pairs(t)
    got = sorted(
        zip(
            out.column("doc_a").to_pylist(),
            out.column("doc_b").to_pylist(),
            out.column("rank_dist").to_pylist(),
        )
    )
    want = sorted(
        (a * 10, b * 10, b - a)
        for a in ranks
        for b in ranks
        if 0 < b - a <= SNM_WINDOW
    )
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=50),      # tf
    st.integers(min_value=1, max_value=500),     # dl
    st.integers(min_value=1, max_value=10_000),  # N
    st.integers(min_value=1, max_value=100),     # avgdl
    st.integers(min_value=1, max_value=10_000),  # df (clamped to N)
)
def test_bm25_fixed_point_matches_float_formula(tf, dl, N, avgdl, df):
    # the integer coefficients (44/20/6/18, x20T) must equal the float
    # BM25 term score with k1=1.2, b=0.75 and the rational idf
    # (N - df + 0.5)/(df + 0.5), to within 1/SCALE quantization
    from readur_ray.pipelines.search import BM25_SCALE

    df = min(df, N)
    T = N * avgdl
    num = (2 * N - 2 * df + 1) * (44 * tf * T) * BM25_SCALE
    den = (2 * df + 1) * (20 * tf * T + 6 * T + 18 * dl * N)
    got = (num // den) / BM25_SCALE
    k1, b = 1.2, 0.75
    idf = (N - df + 0.5) / (df + 0.5)
    sat = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (T / N)))
    want = idf * sat
    assert abs(got - want) <= 2 / BM25_SCALE + 1e-9 * want


def test_snm_pairs_tie_heavy_corpus(ray_session, tmp_path):
    # 200 docs drawn from only 5 distinct texts: masses of duplicate
    # sort keys, so correctness hinges on the (key, doc_id) tie-break
    # inside every bucket and across bucket boundaries
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from readur_ray.pipelines.dedup import SNM_WINDOW, snm_pairs

    rng = np.random.default_rng(3)
    texts5 = [f"{w} common tail words here" for w in
              ("alpha", "beta", "gamma", "delta", "epsilon")]
    n = 200
    ids = rng.permutation(n * 3)[:n]  # non-contiguous, shuffled doc ids
    texts = [texts5[int(i)] for i in rng.integers(0, 5, n)]
    langs = [("en", "de", "fr")[int(i)] for i in rng.integers(0, 3, n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = snm_pairs(str(tmp_path))
    got = sorted(
        (a, b, d)
        for batch in out.iter_batches(batch_format="pyarrow")
        for a, b, d in zip(
            batch.column("doc_a").to_pylist(),
            batch.column("doc_b").to_pylist(),
            batch.column("rank_dist").to_pylist(),
        )
    )
    # naive reference: global (key, doc_id) sort, all pairs within w
    keyed = sorted(
        (f"{lang}|{t.lower()[:12]}", int(i))
        for i, t, lang in zip(ids, texts, langs)
    )
    want = sorted(
        (keyed[i][1], keyed[j][1], j - i)
        for i in range(n)
        for j in range(i + 1, min(i + SNM_WINDOW + 1, n))
    )
    assert got == want


def test_pp_heavy_hitters_df_not_inflated_by_batch_slicing(ray_session, tmp_path):
    # one parquet file with 1400 docs -> blocks bigger than the 1024-row
    # map_batches slice: an unwindowed ListArray.values would count the
    # whole block per slice and inflate df by ~2x
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from readur_ray.functions.textstats import md5_int60
    from readur_ray.pipelines import dedup as D

    n = 1400
    texts = [f"hot shingle here filler{i} filler{i} end" for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    hh = D._pp_heavy_hitters(str(tmp_path))
    key = md5_int60("hot shingle here")
    assert hh[key] == n  # every doc contains it exactly once
