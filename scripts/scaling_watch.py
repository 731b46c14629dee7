"""Probe-gated scaling-run watcher (round-3 verdict protocol: probe
BEFORE burning legs).

Every PERIOD seconds, measure the host's own 8→32 ALU ceiling
(bench.host_alu_eff); when it reaches THRESHOLD, immediately fire
`bench.py --scaling` and then a full `bench.py` sweep, append both
JSON lines (plus the launch probe) to OUT, and exit. Because the
probe measures the host's *current* capacity — including any load
this repo's own tests put on it — the watcher self-protects: it never
launches into a window the machine can't honour.

    python scripts/scaling_watch.py [threshold] [period_s] [max_hours]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = float(sys.argv[1]) if len(sys.argv) > 1 else 0.88
PERIOD = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
MAX_HOURS = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
OUT = os.environ.get("SCALING_WATCH_OUT", "/tmp/scaling_watch.jsonl")


def main() -> None:
    import bench

    deadline = time.time() + MAX_HOURS * 3600
    while time.time() < deadline:
        ceiling = bench.host_alu_eff(8, 32)
        line = {"ts": time.time(), "probe": ceiling}
        with open(OUT, "a") as f:
            f.write(json.dumps(line) + "\n")
        if ceiling >= THRESHOLD:
            for args in (["--scaling"], []):
                proc = subprocess.run(
                    [sys.executable, "bench.py", *args],
                    capture_output=True,
                    text=True,
                    timeout=3600,
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
                out = proc.stdout.strip().splitlines()
                with open(OUT, "a") as f:
                    f.write(
                        json.dumps(
                            {
                                "ts": time.time(),
                                "launch_probe": ceiling,
                                "args": args,
                                "result": json.loads(out[-1]) if out else None,
                            }
                        )
                        + "\n"
                    )
            return
        time.sleep(PERIOD)


if __name__ == "__main__":
    main()
