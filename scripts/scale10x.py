"""10x-scale empirical proof run (round-5 verdict task #1).

Generates a deterministic sf1-equivalent corpus — N interleaved
extraction docs, an N-row documents table with planted near-dup
families, and an N-row EMB_DIM(=256)-dim embeddings table with
planted semantic dups — then runs the three pipelines whose 100-TB
scale story was so far argued only in docstrings:

  1. the extraction DAG (build_extracted -> write_parquet),
  2. the fuzzy funnel (minhash -> components -> fuzzy_dedup_keep),
  3. semdedup with nlist scaled per its own docstring rule
     (nlist ~= corpus_size / target_cell_rows, cells stay ~2k rows).

A sampler thread records peak total RSS (sum of /proc/<pid>/statm
over all processes), /dev/shm high-water (the plasma object store is
memory-mapped there), and the Ray spill-directory high-water, reset
per phase, so each phase's memory footprint is visible.

Usage:
    python scripts/scale10x.py [--docs 2000000] [--skip-gen]
Run it twice (e.g. --docs 200000 then --docs 2000000) to read the
10x marginal cost directly; results go to stdout as JSON lines and
are transcribed into BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGE = os.sysconf("SC_PAGE_SIZE")


def _total_rss() -> int:
    total = 0
    for p in glob.glob("/proc/[0-9]*/statm"):
        try:
            with open(p) as f:
                total += int(f.read().split()[1])
        except (OSError, IndexError, ValueError):
            continue
    return total * PAGE


def _shm_used() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize


def _spill_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*"):
        for root, _, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    continue
    return total


class Monitor:
    """Peak-tracking sampler; peaks reset per phase."""

    def __init__(self, interval: float = 2.0):
        self.interval = interval
        self._stop = threading.Event()
        self.reset()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def reset(self) -> None:
        self.peak_rss = _total_rss()
        self.peak_shm = _shm_used()
        self.peak_spill = _spill_bytes()

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            self.peak_rss = max(self.peak_rss, _total_rss())
            self.peak_shm = max(self.peak_shm, _shm_used())
            self.peak_spill = max(self.peak_spill, _spill_bytes())

    def snapshot(self) -> dict:
        gib = 1024 ** 3
        return {
            "peak_rss_gib": round(self.peak_rss / gib, 2),
            "peak_shm_gib": round(self.peak_shm / gib, 2),
            "peak_spill_gib": round(self.peak_spill / gib, 2),
        }

    def stop(self) -> None:
        self._stop.set()


# ---------------------------------------------------------------------------
# deterministic sf1-equivalent documents + embeddings tables
# ---------------------------------------------------------------------------

VOCAB_N = 4096          # hashed-int vocabulary, rendered as w<k> tokens
DOC_WORDS = (30, 80)    # uniform doc length range (matches sf docs ~40-60)
BOILER_EVERY = 3        # 1-in-3 docs share the 17-word boilerplate header
CLONE_EVERY = 50        # 1-in-50 docs is a 3-word-edit clone of doc i-1
LANGS = ("en", "de", "fr", "es", "zh")
EMB_DIM = 256           # random-pair cosine std = 1/sqrt(dim); 256 puts
                        # the 0.4 threshold 6 sigma out (~1 accidental
                        # edge per 2e9 pairs) — 64-dim tails are too fat
EMB_CENTERS = 256       # prototype centers in embedding space
EMB_CLONE_EVERY = 40    # 1-in-40 vectors is a near-clone of vec i-1
SHARD = 50_000

_BOILER = " ".join(f"w{(7 * k + 3) % VOCAB_N}" for k in range(17))


def _doc_words(i: int, seed: int) -> np.ndarray:
    rs = np.random.RandomState((seed * 1_000_003 + i) % (2 ** 31))
    n = rs.randint(DOC_WORDS[0], DOC_WORDS[1] + 1)
    return rs.randint(0, VOCAB_N, size=n)

def _render(ws: np.ndarray, boiler: bool) -> str:
    body = " ".join(f"w{int(k)}" for k in ws)
    return (_BOILER + " " + body) if boiler else body


def _doc_shard(n_docs: int, start: int, stop: int, seed: int) -> "object":
    import pyarrow as pa

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    prev_ws: np.ndarray | None = None
    if start > 0 and start % CLONE_EVERY == 1:
        prev_ws = _doc_words(start - 1, seed)
    for i in range(start, stop):
        if i % CLONE_EVERY == 1 and i > 0:
            base = prev_ws if prev_ws is not None else _doc_words(i - 1, seed)
            ws = base.copy()
            rs = np.random.RandomState((seed * 7_000_003 + i) % (2 ** 31))
            for pos in rs.randint(0, len(ws), size=3):  # 3-word edit
                ws[pos] = rs.randint(0, VOCAB_N)
        else:
            ws = _doc_words(i, seed)
        prev_ws = ws
        ids.append(i)
        texts.append(_render(ws, i % BOILER_EVERY == 0))
        langs.append(LANGS[i % len(LANGS)])
        sources.append(f"src{i % 20}")
        n_chars.append(len(texts[-1]))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })


def _emb_shard(start: int, stop: int, seed: int) -> "object":
    import pyarrow as pa

    centers = np.random.RandomState(seed).randn(EMB_CENTERS, EMB_DIM)
    n = stop - start
    rs = np.random.RandomState((seed * 13 + start) % (2 ** 31))
    cells = rs.randint(0, EMB_CENTERS, size=n)
    # weak center signal (alpha=0.15): same-center cosine ~N(0.022,
    # 1/16) — the 0.4 threshold sits 6 sigma out, so only the planted
    # clones are semantic dups, while k-means still has structure.
    # (At 64 dims / strong centers the accidental-edge rate was 1e-2
    # .. 8e-3 and per-cell giant components swallowed the corpus.)
    mat = 0.15 * centers[cells] + rs.randn(n, EMB_DIM)
    for j in range(n):  # planted near-clones of the previous vector
        i = start + j
        if i % EMB_CLONE_EVERY == 1 and j > 0:
            mat[j] = mat[j - 1] + 1e-4 * rs.randn(EMB_DIM)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.astype(np.float32).ravel(), pa.float32()), EMB_DIM
    ).cast(pa.list_(pa.float32()))
    return pa.table({
        "vec_id": pa.array(np.arange(start, stop, dtype=np.int64), pa.int64()),
        "embedding": emb,
        "label": pa.array((cells % 8).astype(np.int32), pa.int32()),
    })


def generate(base: str, n: int, seed: int = 42) -> None:
    """documents.parquet/ and embeddings.parquet/ as sharded DIRS —
    every pipeline reads f"{sf_dir}/documents.parquet", and
    ray.data.read_parquet / pyarrow.dataset accept a directory at
    that path unchanged (resumable layout at real scale)."""
    import ray

    os.makedirs(f"{base}/documents.parquet", exist_ok=True)
    os.makedirs(f"{base}/embeddings.parquet", exist_ok=True)

    @ray.remote
    def doc_part(k: int, s: int, e: int) -> int:
        import pyarrow.parquet as pq

        pq.write_table(_doc_shard(n, s, e, seed),
                       f"{base}/documents.parquet/part-{k:05d}.parquet")
        return e - s

    @ray.remote
    def emb_part(k: int, s: int, e: int) -> int:
        import pyarrow.parquet as pq

        pq.write_table(_emb_shard(s, e, seed),
                       f"{base}/embeddings.parquet/part-{k:05d}.parquet")
        return e - s

    refs = [doc_part.remote(k, s, min(s + SHARD, n))
            for k, s in enumerate(range(0, n, SHARD))]
    refs += [emb_part.remote(k, s, min(s + SHARD, n))
             for k, s in enumerate(range(0, n, SHARD))]
    ray.get(refs)


# ---------------------------------------------------------------------------
# phases
# ---------------------------------------------------------------------------

def _consume(ds) -> int:
    return sum(b.num_rows for b in ds.iter_batches(batch_format="pyarrow"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--skip-extract", action="store_true")
    ap.add_argument("--phases", default="generate,extract,funnel,semdedup",
                    help="comma list: generate,extract,funnel,semdedup")
    ap.add_argument("--target-cell-rows", type=int, default=2000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    n = args.docs
    base = f"/tmp/scale10_{n}"
    corpus = f"/tmp/scale10_corpus_{n}"
    mon = Monitor()
    results: dict = {"docs": n, "num_cpus": args.num_cpus}

    def phase(name: str, fn) -> None:
        mon.reset()
        t0 = time.perf_counter()
        extra = fn() or {}
        dt = round(time.perf_counter() - t0, 1)
        results[name] = {"sec": dt, "docs_per_sec": round(n / dt, 1),
                         **mon.snapshot(), **extra}
        print(json.dumps({name: results[name]}), flush=True)

    want = set(args.phases.split(","))

    if not args.skip_gen and "generate" in want:
        def gen_all():
            from readur_ray import synth

            if want & {"funnel", "semdedup"}:
                generate(base, n)
            if not args.skip_extract and "extract" in want:
                synth.write_corpus_parallel(corpus, n, seed=42,
                                            rows_per_file=20_000)
        phase("generate", gen_all)

    if not args.skip_extract and "extract" in want:
        def extract():
            import shutil

            from readur_ray.config import ExtractionConfig
            from readur_ray.pipelines.extract import build_extracted

            out = f"/tmp/scale10_out_{n}"
            shutil.rmtree(out, ignore_errors=True)
            build_extracted(corpus, ExtractionConfig()).write_parquet(out)
            import pyarrow.dataset as pads

            rows = pads.dataset(out).count_rows()
            assert rows == n, (rows, n)
            return {"rows_out": rows}
        phase("extract_dag", extract)

    if "funnel" in want:
        def funnel():
            from readur_ray.pipelines.curation import fuzzy_dedup_keep

            rows = _consume(fuzzy_dedup_keep(base))
            return {"clusters": rows}
        phase("fuzzy_funnel", funnel)

    if "semdedup" not in want:
        mon.stop()
        print(json.dumps({"scale10x": results}), flush=True)
        return

    def semdedup_phase():
        from readur_ray.pipelines.similarity import semdedup

        nlist = max(8, n // args.target_cell_rows)
        out = semdedup(base, nlist=nlist)
        kept = 0
        total = 0
        for b in out.iter_batches(batch_format="pyarrow"):
            total += b.num_rows
            kept += int(np.sum(b.column("kept").to_numpy(zero_copy_only=False)))
        assert total == n, (total, n)
        return {"nlist": nlist, "kept": kept, "removed": total - kept}
    phase("semdedup", semdedup_phase)

    mon.stop()
    print(json.dumps({"scale10x": results}), flush=True)


if __name__ == "__main__":
    main()
