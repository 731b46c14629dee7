"""S6 connector scale drive (round-5 verdict task #6): 100k-file
hermetic WebDAV share through discovery, smart-sync planning, and the
full `--ingest-webdav --incremental` CLI path with group chunks.

Measures (JSON lines to stdout; transcribed into BASELINE.md):
  - discover_full: driver-side recursive PROPFIND walk over the share
  - manifest/plan: shallow manifest + W3 decision, cold and warm
    (after mutating MUT_DIRS of the DIRS directories -> "targeted")
  - ingest_full: CLI `--ingest-webdav ... --incremental` first run
    (land 100k DOCUMENTS rows via the download actor pool + extract)
  - ingest_incr: re-run after the mutation — group-chunked targeted
    re-extraction must re-do only the changed files

The stdlib hermetic server recomputes Nextcloud-style directory etags
per request; an etag memo (invalidated on put/delete) keeps the
measurement engine-bound rather than fixture-bound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DIRS = int(os.environ.get("WDSCALE_DIRS", "200"))
FILES_PER_DIR = int(os.environ.get("WDSCALE_FILES", "500"))
MUT_DIRS = 2


def build_tree():
    from webdav_server import WebDavTree

    class MemoTree(WebDavTree):
        """dir_etag is O(total files) per call in the fixture; memoize
        per mutation generation so the 100k-file walk measures the
        CONNECTOR, not the test server."""

        def __init__(self):
            super().__init__()
            self._gen = 0
            self._memo: dict = {}

        def put(self, *a, **k):
            self._gen += 1
            return super().put(*a, **k)

        def delete(self, relpath):
            self._gen += 1
            return super().delete(relpath)

        def file_etag(self, relpath):
            key = ("f", relpath, self._gen)
            if key not in self._memo:
                self._memo[key] = super().file_etag(relpath)
            return self._memo[key]

        def dir_etag(self, dirpath):
            key = ("d", dirpath, self._gen)
            if key not in self._memo:
                self._memo[key] = super().dir_etag(dirpath)
            return self._memo[key]

    tree = MemoTree()
    for d in range(DIRS):
        for f in range(FILES_PER_DIR):
            body = f"dir {d} file {f} " + "payload " * 12
            tree.put(f"/d{d:03d}/f{f:04d}.txt", body.encode(), "text/plain")
    return tree


def mutate(tree) -> int:
    n = 0
    for d in range(MUT_DIRS):
        for f in range(FILES_PER_DIR):
            body = f"dir {d} file {f} CHANGED " + "payload " * 12
            tree.put(f"/d{d:03d}/f{f:04d}.txt", body.encode(), "text/plain")
            n += 1
    return n


def main() -> None:
    from webdav_server import start_server

    from readur_ray.sources.webdav import WebDavClient, plan_webdav_sync

    tree = build_tree()
    n_files = DIRS * FILES_PER_DIR
    url, shutdown = start_server(tree)
    out: dict = {"n_files": n_files, "dirs": DIRS}
    try:
        client = WebDavClient(url)

        t0 = time.perf_counter()
        infos = client.discover("/", recursive=True)
        out["discover_full_sec"] = round(time.perf_counter() - t0, 2)
        out["discovered"] = len(infos)
        assert len(infos) == n_files

        t0 = time.perf_counter()
        plan0, manifest = plan_webdav_sync(client, known={})
        out["plan_cold_sec"] = round(time.perf_counter() - t0, 2)
        out["plan_cold"] = plan0.decision

        t0 = time.perf_counter()
        plan1, _ = plan_webdav_sync(client, known=manifest)
        out["plan_unchanged_sec"] = round(time.perf_counter() - t0, 2)
        out["plan_unchanged"] = plan1.decision
        print(json.dumps({k: out[k] for k in list(out)}), flush=True)

        env = dict(os.environ, PYTHONPATH=REPO)
        run_out = "/tmp/wdscale_out"
        import shutil as _sh

        _sh.rmtree(run_out, ignore_errors=True)
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, "-m", "readur_ray", "--ingest-webdav", url,
             "--out", run_out, "--incremental", "--incr-group", "32",
             "--num-cpus", "16"],
            capture_output=True, text=True, env=env, timeout=3600, cwd=REPO,
        )
        out["ingest_full_sec"] = round(time.perf_counter() - t0, 2)
        assert p.returncode == 0, p.stderr[-3000:]
        out["ingest_full"] = json.loads(p.stdout.strip().splitlines()[-1])
        print(json.dumps({"ingest_full_sec": out["ingest_full_sec"],
                          "summary": out["ingest_full"]}), flush=True)

        n_mut = mutate(tree)
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, "-m", "readur_ray", "--ingest-webdav", url,
             "--out", run_out, "--incremental", "--incr-group", "32",
             "--num-cpus", "16"],
            capture_output=True, text=True, env=env, timeout=3600, cwd=REPO,
        )
        out["ingest_incr_sec"] = round(time.perf_counter() - t0, 2)
        assert p.returncode == 0, p.stderr[-3000:]
        out["ingest_incr"] = json.loads(p.stdout.strip().splitlines()[-1])
        out["n_mutated"] = n_mut
        print(json.dumps({"ingest_incr_sec": out["ingest_incr_sec"],
                          "n_mutated": n_mut,
                          "summary": out["ingest_incr"]}), flush=True)
        print(json.dumps({"webdav_scale": out}), flush=True)
    finally:
        shutdown()


if __name__ == "__main__":
    main()
