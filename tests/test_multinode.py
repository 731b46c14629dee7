"""Multi-node shape test (round-5 verdict task #5).

The sandbox has no real second machine, so a 2-node VIRTUAL cluster
(`ray.cluster_utils.Cluster`, the harness Ray's own multi-node tests
use) is the strongest available evidence that the extraction DAG's
pool sizing and executor budget aren't `num_cpus=32` single-node
artifacts. The driver runs in a subprocess because the pytest session
already holds a single-node Ray and a virtual cluster needs its own
GCS. Reference behavior being generalized: the reference's worker
pool is per-process (`/root/reference/src/ocr/queue.rs:610-694`);
ours must span nodes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_extraction_dag_spans_two_virtual_nodes(tmp_path):
    out_json = str(tmp_path / "multinode.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "multinode_driver.py"),
         out_json],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "RAY_DISABLE_IMPORT_WARNING": "1"},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    with open(out_json) as f:
        res = json.load(f)

    assert res["cluster_cpus"] == 8
    assert res["n_nodes"] == 2
    # exactly-once across the cluster
    assert res["rows"] == 3000
    assert res["unique_docs"] == 3000
    # placement: extraction work landed on BOTH virtual nodes
    assert res["nodes_used"] == 2, res
    # pool sizing derived from cluster-wide CPUs (8), not a 32-CPU
    # constant: autoscaling mins must stay within the cluster's
    # actor budget (8 CPUs / 0.5 cpu-per-actor = 16 actor slots)
    (mlo, mhi) = res["pool_sizes"]["main"]
    assert 1 <= mlo <= 8, res["pool_sizes"]
    assert mhi <= 16, res["pool_sizes"]
