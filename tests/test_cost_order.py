"""O1 — cost-ordered (longest-job-first) dispatch before the actor
pool, the streaming remap of the reference's priority dequeue
(/root/reference/src/ocr/queue.rs:165-180)."""

import numpy as np
import pyarrow as pa

from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.extract import (
    classify_batch,
    cost_order_batch,
    load_documents,
    route_filter,
)


def test_cost_order_batch_descending():
    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "est_cost": pa.array([1.0, 9.0, 3.0, 9.0], pa.float64()),
        }
    )
    out = cost_order_batch(batch)
    costs = out.column("est_cost").to_pylist()
    assert costs == sorted(costs, reverse=True)
    # deterministic tiebreak: equal costs ordered by doc_id
    assert out.column("doc_id").to_pylist() == ["b", "d", "c", "a"]


def test_main_branch_blocks_are_cost_descending(ray_session, corpus_dir):
    """Every block flowing into the extractor pool is est_cost-sorted:
    the executor slices batches in order, so heavy docs dispatch first."""
    cfg = ExtractionConfig()
    ds = (
        load_documents(corpus_dir)
        .map_batches(lambda b: classify_batch(b, cfg), batch_format="pyarrow")
        .map_batches(route_filter("main", cfg), batch_format="pyarrow")
        .map_batches(cost_order_batch, batch_format="pyarrow")
    )
    n_checked = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        costs = np.asarray(b.column("est_cost").to_numpy(zero_copy_only=False))
        assert (np.diff(costs) <= 0).all(), "block not cost-descending"
        n_checked += b.num_rows
    assert n_checked > 0
