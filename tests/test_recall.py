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
