"""Standalone host-capability probe backing BASELINE.md's drift data.

Measures, at two process counts (default 8 and 32), the host's own
aggregate throughput for (a) pure-Python ALU work and (b) large
memcpy (numpy copy) — the two resources any 8-vs-32-CPU scaling
measurement on this shared VM is bounded by. Prints ONE JSON line:

    python scripts/host_probe.py [lo] [hi]

`alu_ceiling` / `memcpy_ceiling` are aggregate(hi) / (aggregate(lo)
* hi/lo): the best efficiency ANY lo→hi scaling run can measure in
this time window. bench.py --scaling embeds the ALU probe as
`host_alu_ceiling_pre_post`; this script exists so the recorded
window-drift evidence is reproducible on its own.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

SECS = 3.0


def _alu_worker(q):
    t_end = time.perf_counter() + SECS
    n, x = 0, 1.0
    while time.perf_counter() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
        n += 10000
    q.put(n / SECS)


def _memcpy_worker(q):
    import numpy as np

    src = np.ones(16 * 1024 * 1024, dtype=np.float64)  # 128 MB
    t_end = time.perf_counter() + SECS
    n = 0
    while time.perf_counter() < t_end:
        dst = src.copy()
        n += dst.nbytes
    q.put(n / SECS)


def _aggregate(worker, nproc: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return sum(q.get() for _ in ps)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = {"lo_procs": lo, "hi_procs": hi, "secs_per_leg": SECS}
    for name, worker, unit in (
        ("alu", _alu_worker, "ops/s"),
        ("memcpy", _memcpy_worker, "bytes/s"),
    ):
        a_lo = _aggregate(worker, lo)
        a_hi = _aggregate(worker, hi)
        out[f"{name}_aggregate_{lo}"] = round(a_lo, 1)
        out[f"{name}_aggregate_{hi}"] = round(a_hi, 1)
        out[f"{name}_ceiling"] = round(a_hi / (a_lo * hi / lo), 3)
        out[f"{name}_unit"] = unit
    print(json.dumps(out))


if __name__ == "__main__":
    main()
