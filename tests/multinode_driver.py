"""Subprocess driver for the multi-node shape test (round-5 verdict
task #5): boots a 2-node virtual Ray cluster with
``ray.cluster_utils.Cluster`` (one head + one worker, 4 CPUs each) and
runs the REAL extraction DAG across it, proving that `_pool_sizes`
(pipelines/extract.py) and `tuned_executor` (stages/tuning.py)
generalize beyond the single `num_cpus=32` local node: pool mins are
derived from cluster-wide CPU counts, the reservation-allocator budget
scales with `ray.cluster_resources()`, and actors land on BOTH nodes.

Run as `python tests/multinode_driver.py <out_json>` in a fresh
process (the pytest session holds its own single-node Ray; a virtual
cluster needs its own GCS).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_path: str) -> None:
    import ray
    from ray.cluster_utils import Cluster

    gib = 1024 ** 3
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": 4, "object_store_memory": gib // 2},
    )
    cluster.add_node(num_cpus=4, object_store_memory=gib // 2)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        assert int(ray.cluster_resources()["CPU"]) == 8
        assert len(ray.nodes()) == 2

        from readur_ray import synth
        from readur_ray.config import ExtractionConfig
        from readur_ray.pipelines.extract import _pool_sizes, build_extracted

        cfg = ExtractionConfig()
        (mlo, mhi), (plo, phi), mc, pc = _pool_sizes(cfg)

        corpus = "/tmp/multinode_corpus"
        out = "/tmp/multinode_out"
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        synth.write_corpus(corpus, 3000, seed=11, rows_per_file=250)

        # tag every output row with the node that extracted it —
        # placement evidence that the actor pools spanned the cluster
        import pyarrow as pa

        def tag_node(batch: pa.Table) -> pa.Table:
            nid = ray.get_runtime_context().get_node_id()
            return batch.append_column(
                "node_id", pa.array([nid] * batch.num_rows, pa.string())
            )

        ds = build_extracted(corpus, cfg).map_batches(
            tag_node, batch_format="pyarrow"
        )
        ds.write_parquet(out)

        import pyarrow.dataset as pads

        t = pads.dataset(out).to_table(columns=["doc_id", "node_id"])
        doc_ids = set(t.column("doc_id").to_pylist())
        nodes_used = set(t.column("node_id").to_pylist())
        result = {
            "cluster_cpus": int(ray.cluster_resources()["CPU"]),
            "n_nodes": len(ray.nodes()),
            "rows": t.num_rows,
            "unique_docs": len(doc_ids),
            "nodes_used": len(nodes_used),
            "pool_sizes": {
                "main": [mlo, mhi], "page": [plo, phi],
                "main_cpus": mc, "page_cpus": pc,
            },
        }
        with open(out_path, "w") as f:
            json.dump(result, f)
        print(json.dumps(result))
    finally:
        ray.shutdown()
        cluster.shutdown()


if __name__ == "__main__":
    main(sys.argv[1])
