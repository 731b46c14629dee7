"""Measured recall of the approximate ANN paths vs the exact baseline
(sf0.01). The synthetic embeddings are near-uniform — the WORST case
for single-probe ANN — so the floors are low; the point of the test is
(a) the approximate paths return real neighbors, and (b) the learned
k-means quantizer beats the unlearned partitions, i.e. the training
step does something. Measured 2026-08-17: lsh 0.06, ivf_label 0.10,
ivf_kmeans 0.35, embed_lsh 1/59."""

import pytest

from readur_ray.pipelines import similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_pairs(ray_session):
    return {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk(SF).take_all()
    }


def _recall(ds, exact):
    approx = {(r["query_id"], r["neighbor_id"]) for r in ds.take_all()}
    return len(exact & approx) / len(exact)


def test_kmeans_ivf_beats_unlearned_partitions(ray_session, exact_pairs):
    r_label = _recall(similarity.ann_topk_ivf(SF), exact_pairs)
    r_kmeans = _recall(similarity.ann_topk_ivf_kmeans(SF), exact_pairs)
    assert r_kmeans > 0.2
    assert r_kmeans > r_label, (r_kmeans, r_label)


def test_lsh_returns_real_neighbors(ray_session, exact_pairs):
    assert _recall(similarity.ann_topk_lsh(SF), exact_pairs) > 0.0


def test_multiprobe_raises_recall(ray_session, exact_pairs):
    r1 = _recall(similarity.ann_topk_ivf_kmeans(SF), exact_pairs)
    r2 = _recall(similarity.ann_topk_ivf_kmeans_probe2(SF), exact_pairs)
    assert r2 > r1, (r1, r2)


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    """Deterministic CLUSTERED embeddings — the regime real text/image
    embeddings live in (sf tables are near-uniform, the worst case).
    500 vectors in 8 well-separated 64-dim clusters; vec_id layout
    matches the pipelines' contract (ids < 16 are queries, 16-23 seed
    the quantizer) and ids are assigned round-robin so queries and
    anchors cover all clusters."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4242)
    centers = rng.normal(size=(8, 64)) * 5.0
    n = 500
    cluster = np.arange(n) % 8          # round-robin -> ids 0..15 hit 8 clusters
    emb = centers[cluster] + rng.normal(size=(n, 64)) * 0.3
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in emb], pa.list_(pa.float64())
            ),
        }
    )
    d = tmp_path_factory.mktemp("clustered")
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d)


def test_kmeans_ivf_high_recall_on_clustered_embeddings(ray_session, clustered_dir):
    """On clustered data the learned quantizer recovers the structure:
    single-probe recall should be near-perfect (vs 0.35 on uniform)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_topk(clustered_dir).take_all()
    }
    r_kmeans = _recall(similarity.ann_topk_ivf_kmeans(clustered_dir), exact)
    assert r_kmeans >= 0.8, r_kmeans


def _semdedup_rows(ds):
    return sorted(
        (r["vec_id"], r["cell"], r["rep_id"], r["kept"])
        for r in ds.take_all()
    )


def test_semdedup_blockwise_tiling_matches_dense(ray_session):
    """The block × block tiled pairwise (scale path for the round-3
    dense cell² sim matrix) must produce bit-identical components:
    a tiny 7-row tile forces many partial tiles, a huge one degenerates
    to the dense single-tile path."""
    tiny = _semdedup_rows(similarity.semdedup(SF, block=7))
    dense = _semdedup_rows(similarity.semdedup(SF, block=1 << 30))
    assert tiny == dense
    assert len(tiny) > 0


def test_semdedup_nlist_dial(ray_session):
    """nlist is the scale dial (cells ~ corpus / target cell size):
    a 16-cell run still assigns every vector exactly once and keeps
    exactly one representative per (cell, rep) component."""
    rows = _semdedup_rows(similarity.semdedup(SF, nlist=16))
    base = _semdedup_rows(similarity.semdedup(SF))
    assert len(rows) == len(base)  # every vector covered, both ways
    cells = {c for _, c, _, _ in rows}
    assert len(cells) > 8  # the dial actually widened the quantizer
    reps = {(c, rp) for _, c, rp, _ in rows}
    kept = {(c, rp) for _, c, rp, k in rows if k == 1}
    assert reps == kept  # one kept representative per component


def test_prototype_score_rank_contract(ray_session):
    """Structural contract on the data-pruning scores, at a NON-default
    nlist (the dial the oracle can't reach): every vector scored exactly
    once, ranks are a 1..m permutation per cell with d2 non-increasing
    hardest-first, and the whole output is deterministic across runs."""
    import pandas as pd

    def run():
        return (
            similarity.prototype_score(SF, nlist=16)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    a, b = run(), run()
    pd.testing.assert_frame_equal(a, b)
    assert a["vec_id"].is_unique and len(a) == 500
    assert a["cell"].nunique() > 8  # the dial widened the quantizer
    for _, g in a.groupby("cell"):
        g = g.sort_values("hardness_rank")
        assert list(g["hardness_rank"]) == list(range(1, len(g) + 1))
        assert (g["d2_centroid"].diff().dropna() <= 0).all()


def test_knn_graph_tiling_matches_dense(ray_session):
    """The running-top-k tile pass must produce the identical graph to
    a dense single-tile pass — including (d2, neighbor_id) tie-breaks
    at the k-th boundary, which a d2-only partition would get wrong."""
    import pandas as pd

    def rows(block):
        return (
            similarity.knn_graph(SF, block=block)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
            .reset_index(drop=True)
        )

    tiny, dense = rows(7), rows(1 << 30)
    pd.testing.assert_frame_equal(tiny, dense)
    assert (tiny.groupby("vec_id")["rank"].max() <= 3).all()
    assert len(tiny) > 0


def test_centroid_training_memoized(ray_session):
    """One quantizer training per (corpus, nlist, session): semdedup,
    prototype_score, knn_graph and kmeans-IVF share the cached array;
    the nlist dial keys separately."""
    ds = similarity._read_embeddings(SF)
    a = similarity._train_centroids(ds, SF)
    b = similarity._train_centroids(ds, SF)
    assert a is b
    c = similarity._train_centroids(ds, SF, k=16)
    assert c is not a and c.shape[0] == 16


def test_pq_adc_identifies_the_query_cluster(ray_session, clustered_dir):
    """PQ-ADC with 8 codes/subspace collapses same-cluster members to
    identical codes — it cannot rank WITHIN a cluster (ties break by
    id), but every returned neighbor must come from the query's own
    cluster (cluster = vec_id % 8 in the fixture): the codebooks
    recover the cluster structure per subspace."""
    rows = similarity.pq_topk(clustered_dir).take_all()
    assert len(rows) == 16 * 5
    cross = [
        (r["query_id"], r["neighbor_id"])
        for r in rows
        if r["neighbor_id"] % 8 != r["query_id"] % 8
    ]
    assert not cross, cross


def test_pq_uniform_returns_real_neighbors(ray_session, exact_pairs):
    """On near-uniform embeddings (worst case) the ADC ranking still
    recovers a real fraction of the exact top-5 (measured 0.1125)."""
    assert _recall(similarity.pq_topk(SF), exact_pairs) > 0.0


def test_assign_float64_path_is_bit_exact():
    """The BLAS (float64) assignment path must agree with the int64
    reference everywhere the _EXACT_F64_DIM bound claims exactness —
    including exact distance ties (argmin must still pick the lower
    centroid index) and d2 margins of exactly 1 at QUANT-magnitude
    coordinates, where any rounding would flip the winner."""
    import numpy as np

    from readur_ray.pipelines.similarity import QUANT, _assign

    def ref_assign(q, cents):
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        return np.argmin(d2, axis=1)

    rng = np.random.RandomState(7)
    for dim in (64, 256):
        # unit-norm-quantized magnitudes, the production envelope
        q = rng.randint(-QUANT, QUANT, size=(512, dim)).astype(np.int64)
        cents = rng.randint(-QUANT, QUANT, size=(97, dim)).astype(np.int64)
        np.testing.assert_array_equal(_assign(q, cents), ref_assign(q, cents))

    # adversarial: duplicate centroids (exact tie -> first index wins)
    cents = rng.randint(-QUANT, QUANT, size=(8, 256)).astype(np.int64)
    cents[5] = cents[2]
    q = cents[5:6].copy()                # sits exactly ON the tied pair
    assert _assign(q, cents)[0] == 2 == ref_assign(q, cents)[0]

    # adversarial: margin of exactly 1 in d2 at max magnitude
    c0 = np.full((1, 256), QUANT, dtype=np.int64)
    c1 = c0.copy()
    c1[0, 0] -= 1                        # d2 differs by 2*QUANT-1... exactly
    cents = np.vstack([c0, c1])
    q = np.full((1, 256), QUANT, dtype=np.int64)
    q[0, 0] = QUANT - 1                  # nearer c1 by exactly 1... vs 1
    assert _assign(q, cents)[0] == ref_assign(q, cents)[0] == 1
