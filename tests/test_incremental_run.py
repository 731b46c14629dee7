"""run_incremental: manifest-diff-driven skip / full / targeted
re-extraction with etag-validated chunk reuse and deletion cleanup."""

import os

import pyarrow.parquet as pq

from readur_ray import synth
from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.run import file_etag, run_incremental


import pyarrow as pa


def _corpus(n, seed, prefix):
    """make_corpus with per-file doc_id prefixes (ids are positional)."""
    t = synth.make_corpus(n, seed=seed)
    ids = pa.array([f"{prefix}-{v}" for v in t.column("doc_id").to_pylist()])
    return t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids)


def _write_corpus_files(d, specs):
    """specs: {filename: (n_docs, seed)}"""
    os.makedirs(d, exist_ok=True)
    for name, (n, seed) in specs.items():
        pq.write_table(
            _corpus(n, seed, name.split(".")[0]), os.path.join(d, name)
        )


def _final_ids(out):
    t = pq.read_table(os.path.join(out, "final"), columns=["doc_id"])
    return set(t.column("doc_id").to_pylist())


def test_incremental_full_then_skip_then_targeted(ray_session, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cfg = ExtractionConfig()
    specs = {f"s{i}.parquet": (24, i + 1) for i in range(4)}
    _write_corpus_files(inp, specs)

    r1 = run_incremental(inp, out, cfg, group_files=1)
    assert r1["mode"] == "full"
    assert len(r1["executed"]) == 4
    ids1 = _final_ids(out)
    assert len(ids1) == 96

    # unchanged rerun: skipped entirely, nothing re-extracted
    r2 = run_incremental(inp, out, cfg, group_files=1)
    assert r2["mode"] == "skip"

    # mutate ONE of four files (ratio 1/4 <= 0.3) → targeted
    _write_corpus_files(inp, {"s2.parquet": (30, 20)})
    r3 = run_incremental(inp, out, cfg, group_files=1)
    assert r3["mode"] == "targeted"
    assert len(r3["executed"]) == 1
    ids3 = _final_ids(out)
    new_b = set(_corpus(30, 20, "s2").column("doc_id").to_pylist())
    old_b = set(_corpus(24, 3, "s2").column("doc_id").to_pylist())
    assert new_b <= ids3
    assert not (old_b - new_b) & ids3
    # the other five files untouched
    assert set(_corpus(24, 1, "s0").column("doc_id").to_pylist()) <= ids3


def test_incremental_deletion_forces_full_and_cleans_up(ray_session, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cfg = ExtractionConfig()
    _write_corpus_files(inp, {"a.parquet": (30, 1), "b.parquet": (30, 2)})
    run_incremental(inp, out, cfg, group_files=1)
    os.remove(os.path.join(inp, "b.parquet"))

    r = run_incremental(inp, out, cfg, group_files=1)
    assert r["mode"] == "full"
    assert r["removed"], "deleted file's chunk must be dropped"
    ids = _final_ids(out)
    b_ids = set(_corpus(30, 2, "b").column("doc_id").to_pylist())
    a_ids = set(_corpus(30, 1, "a").column("doc_id").to_pylist())
    assert a_ids <= ids
    assert not (b_ids - a_ids) & ids


def test_file_etag_content_based(tmp_path):
    p = str(tmp_path / "x.parquet")
    pq.write_table(synth.make_corpus(10, seed=5), p)
    e1 = file_etag(p)
    assert file_etag(p) == e1          # stable across calls
    os.utime(p, (1, 1))                # mtime change alone is invisible
    assert file_etag(p) == e1
    pq.write_table(synth.make_corpus(11, seed=5), p)
    assert file_etag(p) != e1          # content change is visible


def test_file_etag_sees_tail_edit_same_size(tmp_path):
    """A same-size edit beyond the first 64 KiB (where the parquet
    footer lives) must change the etag — a head-only hash misses it and
    run_incremental would silently serve stale output."""
    p = str(tmp_path / "big.bin")
    data = bytearray(b"\x5a" * 300_000)
    with open(p, "wb") as f:
        f.write(data)
    e1 = file_etag(p)
    data[-100] ^= 0xFF                 # flip one byte near the tail
    with open(p, "wb") as f:
        f.write(data)
    assert os.path.getsize(p) == 300_000
    assert file_etag(p) != e1


def test_file_chunk_id_hashes_full_path():
    from readur_ray.pipelines.run import _file_chunk_id

    a = _file_chunk_id("/data/a/part.parquet")
    b = _file_chunk_id("/data/b/part.parquet")
    assert a != b                      # same basename, different dirs
    assert a.startswith("f") and len(a) == 17  # 64 bits of md5, not crc32


def test_incremental_refuses_foreign_positional_chunks(ray_session, tmp_path):
    """An out_dir previously populated by run_extraction holds
    chunk-<int> dirs; finalize reads the whole extracted/ directory, so
    mixing modes would double every doc — refuse instead."""
    import pytest

    from readur_ray.pipelines.run import run_extract_phase

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cfg = ExtractionConfig()
    _write_corpus_files(inp, {"a.parquet": (12, 1)})
    run_extract_phase(inp, out, cfg, n_chunks=1)
    with pytest.raises(ValueError, match="positional chunks"):
        run_incremental(inp, out, cfg)


def test_incremental_grouped_execution(ray_session, tmp_path):
    """Round-4 group chunks: one pipeline launch per GROUP of pending
    files; a changed member invalidates exactly its group (the other
    group is reused untouched), surviving members regroup, and the
    exactly-once cover holds throughout."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cfg = ExtractionConfig()
    specs = {f"s{i}.parquet": (12, i + 1) for i in range(6)}
    _write_corpus_files(inp, specs)

    # full run: 6 files, groups of 3 -> 2 pipeline launches
    r1 = run_incremental(inp, out, cfg, group_files=3)
    assert r1["mode"] == "full"
    assert len(r1["executed"]) == 2
    assert len(_final_ids(out)) == 72

    # unchanged rerun: skip (no group touched)
    assert run_incremental(inp, out, cfg, group_files=3)["mode"] == "skip"

    # mutate ONE file: its whole group (3 files) re-extracts as one
    # launch; the other group's chunk dir is reused byte-untouched
    chunks = sorted(os.listdir(os.path.join(out, "extracted")))
    mtimes = {
        c: os.path.getmtime(os.path.join(out, "extracted", c))
        for c in chunks
    }
    _write_corpus_files(inp, {"s1.parquet": (20, 99)})
    r2 = run_incremental(inp, out, cfg, group_files=3)
    assert r2["mode"] == "targeted"
    assert len(r2["executed"]) == 1 and len(r2["removed"]) == 1
    after = sorted(os.listdir(os.path.join(out, "extracted")))
    # the re-executed group regroups to the SAME membership, hence the
    # same gid — exclude it; the OTHER group must be byte-untouched
    untouched = [
        c for c in set(chunks) & set(after)
        if c.removeprefix("chunk-") not in r2["executed"]
    ]
    assert untouched, "the unchanged group must survive"
    for c in untouched:
        assert os.path.getmtime(os.path.join(out, "extracted", c)) == mtimes[c]
    ids = _final_ids(out)
    assert len(ids) == 72 - 12 + 20
    new_ids = set(_corpus(20, 99, "s1").column("doc_id").to_pylist())
    assert new_ids <= ids

    # delete a member of the rebuilt group: group invalidated, the two
    # survivors re-extract, and the deleted file's rows leave final/
    os.remove(os.path.join(inp, "s2.parquet"))
    r3 = run_incremental(inp, out, cfg, group_files=3)
    assert len(r3["removed"]) >= 1
    ids3 = _final_ids(out)
    gone = set(_corpus(12, 3, "s2").column("doc_id").to_pylist())
    assert not gone & ids3
    assert len(ids3) == 72 - 12 + 20 - 12


def test_incremental_legacy_filechunks_upgrade(ray_session, tmp_path):
    """A round-3 out_dir (per-file chunks) keeps working under the
    grouped runner: valid legacy chunks are reused, a stale one is
    removed and its file re-extracted inside a new group."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cfg = ExtractionConfig()
    _write_corpus_files(inp, {"a.parquet": (10, 1), "b.parquet": (10, 2),
                              "c.parquet": (10, 3), "d.parquet": (10, 4)})
    run_incremental(inp, out, cfg, group_files=1)   # legacy layout
    _write_corpus_files(inp, {"b.parquet": (15, 9)})  # 1/4 <= 0.3 ratio
    r = run_incremental(inp, out, cfg)              # grouped default
    assert r["mode"] == "targeted"
    assert len(r["executed"]) == 1
    ids = _final_ids(out)
    assert len(ids) == 10 + 15 + 10 + 10
    assert set(_corpus(15, 9, "b").column("doc_id").to_pylist()) <= ids


def test_incremental_sweeps_orphan_chunk_dirs(ray_session, tmp_path):
    # crash window: a chunk dir atomically renamed into place but whose
    # ledger append never ran. On rerun its members re-extract (maybe
    # under a different group id), so the orphan must be swept or its
    # rows double in final/.
    import shutil

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cfg = ExtractionConfig()
    _write_corpus_files(inp, {f"s{i}.parquet": (12, i + 1) for i in range(3)})

    r1 = run_incremental(inp, out, cfg, group_files=2)
    assert r1["mode"] == "full"
    ids1 = _final_ids(out)
    assert len(ids1) == 36

    # simulate the crash artifact: a committed chunk dir cloned under a
    # cid the ledger has never seen, plus a stale tmp dir
    extracted = os.path.join(out, "extracted")
    committed = [d for d in os.listdir(extracted) if d.startswith("chunk-")]
    orphan = os.path.join(extracted, "chunk-gdeadbeefdeadbeef")
    shutil.copytree(os.path.join(extracted, committed[0]), orphan)
    os.makedirs(os.path.join(extracted, ".tmp-chunk-gfeedface"), exist_ok=True)

    # force a re-run (mutate one file) — the orphan and tmp must be gone
    # and final/ must hold exactly one row per doc
    _write_corpus_files(inp, {"s1.parquet": (15, 9)})
    r2 = run_incremental(inp, out, cfg, group_files=2)
    assert r2["mode"] in ("targeted", "full")
    assert not os.path.isdir(orphan)
    assert not os.path.isdir(os.path.join(extracted, ".tmp-chunk-gfeedface"))
    t = pq.read_table(os.path.join(out, "final"), columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids)) == 39  # 12 + 15 + 12, no duplicates
