"""Resumable runner: dedup D1, metrics, ledger, crash-resume equality."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from readur_ray import synth
from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.run import (
    run_extract_phase,
    run_extraction,
    run_finalize_phase,
)
from readur_ray.state import ledger


@pytest.fixture(scope="module")
def sharded_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("sharded")
    synth.write_corpus(str(d), 600, seed=11, rows_per_file=150)  # 4 files
    return str(d)


def _read_final(out_dir):
    t = pq.read_table(os.path.join(out_dir, "final"))
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    return t, rows


def test_full_run_dedup_and_metrics(ray_session, sharded_corpus, tmp_path):
    out = str(tmp_path / "out")
    summary = run_extraction(sharded_corpus, out, ExtractionConfig(), n_chunks=4)
    t, rows = _read_final(out)
    assert len(rows) == 600  # never drop a row
    # duplicates: losers marked, exactly one winner per dup hash
    by_hash = {}
    for r in rows.values():
        if r["file_hash"]:
            by_hash.setdefault(r["file_hash"], []).append(r)
    n_losers = 0
    for h, group in by_hash.items():
        if len(group) > 1:
            winners = [g for g in group if g["dedup_status"] == "kept"]
            losers = [g for g in group if g["dedup_status"] == "skipped_duplicate"]
            assert len(winners) == 1
            assert winners[0]["doc_id"] == min(g["doc_id"] for g in group)
            assert all(g["status"] == "skipped_duplicate" for g in losers)
            assert all(g["spans"] == [] for g in losers)
            n_losers += len(losers)
    assert summary["duplicate_groups"] >= 1
    assert n_losers >= 1
    # metrics present and doc counts add up
    m = pq.read_table(os.path.join(out, "metrics.parquet"))
    assert sum(m.column("docs").to_pylist()) == 600
    # ledger has 4 chunk entries + finalize
    entries = ledger.read_ledger(out)
    assert len([e for e in entries if e["kind"] == "chunk"]) == 4
    assert entries[-1]["kind"] == "finalize"


def test_crash_resume_byte_equal(ray_session, sharded_corpus, tmp_path):
    cfg = ExtractionConfig()
    # reference run in one shot
    ref_out = str(tmp_path / "ref")
    run_extraction(sharded_corpus, ref_out, cfg, n_chunks=4)
    _, ref_rows = _read_final(ref_out)

    # crashed run: stop after 2 chunks, then resume
    out = str(tmp_path / "resumed")
    executed = run_extract_phase(sharded_corpus, out, cfg, n_chunks=4, _stop_after=2)
    assert len(executed) == 2
    assert ledger.committed_chunks(out) == set(executed)
    executed2 = run_extract_phase(sharded_corpus, out, cfg, n_chunks=4)
    assert len(executed2) == 2 and not (set(executed2) & set(executed))
    run_finalize_phase(out, cfg)
    _, rows = _read_final(out)

    assert set(rows) == set(ref_rows)
    for doc_id, ref in ref_rows.items():
        got = rows[doc_id]
        for f in ("spans", "status", "failure_reason", "failure_stage",
                  "word_count", "file_hash", "dedup_status"):
            assert got[f] == ref[f], (doc_id, f)


def test_resume_skips_committed_chunks(ray_session, sharded_corpus, tmp_path):
    out = str(tmp_path / "skip")
    run_extract_phase(sharded_corpus, out, ExtractionConfig(), n_chunks=4)
    before = sorted(glob.glob(os.path.join(out, "extracted", "chunk-*", "*")))
    mtimes = {p: os.path.getmtime(p) for p in before}
    again = run_extract_phase(sharded_corpus, out, ExtractionConfig(), n_chunks=4)
    assert again == []  # nothing re-run
    after = {p: os.path.getmtime(p) for p in before}
    assert mtimes == after


def test_heavy_duplicate_corpus_no_driver_state(ray_session, tmp_path):
    """~50% exact-duplicate corpus (every doc has a twin) — the web-scale
    shape the round-2 broadcast winner dict could not survive. The
    shuffle-based marker must mark exactly one loser per group, keep-first
    by min doc_id, with no corpus-proportional driver state (the code
    path holds none by construction)."""
    corpus = str(tmp_path / "dupcorpus")
    os.makedirs(corpus)
    base = synth.make_corpus(120, seed=9)
    ids = base.column("doc_id").to_pylist()
    import pyarrow as pa

    twin = base.set_column(
        base.schema.get_field_index("doc_id"), "doc_id",
        pa.array([f"z-{i}" for i in ids]),
    )
    pq.write_table(base, os.path.join(corpus, "a.parquet"))
    pq.write_table(twin, os.path.join(corpus, "b.parquet"))

    out = str(tmp_path / "out")
    summary = run_extraction(corpus, out, ExtractionConfig(), n_chunks=2)
    t, rows = _read_final(out)
    assert len(rows) == 240
    by_hash = {}
    for r in rows.values():
        if r["file_hash"]:
            by_hash.setdefault(r["file_hash"], []).append(r)
    n_groups = sum(1 for g in by_hash.values() if len(g) > 1)
    assert n_groups >= 50  # every hashed doc has a twin
    assert summary["duplicate_groups"] == n_groups
    n_losers = 0
    for group in by_hash.values():
        if len(group) == 1:
            assert group[0]["dedup_status"] == "kept"
            continue
        winner_id = min(g["doc_id"] for g in group)
        for g in group:
            if g["doc_id"] == winner_id:
                assert g["dedup_status"] == "kept"
            else:
                assert g["dedup_status"] == "skipped_duplicate"
                assert g["status"] == "skipped_duplicate"
                assert g["spans"] == []
                n_losers += 1
    assert n_losers >= n_groups  # >=1 loser per group (synth dups add more)


def test_requeue_failed_phase(ray_session, tmp_path):
    """D4: recoverable failures are re-extracted into a retry partition."""
    import pyarrow.parquet as pq

    from readur_ray import synth
    from readur_ray.config import ExtractionConfig
    from readur_ray.pipelines.run import run_extraction, run_requeue_phase

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    synth.write_corpus(corpus, 400, seed=21)
    cfg = ExtractionConfig()
    run_extraction(corpus, out, cfg, n_chunks=2)
    res = run_requeue_phase(corpus, out, cfg)
    final = pq.read_table(f"{out}/final", columns=["doc_id", "status", "failure_reason"])
    recoverable_failed = {
        r["doc_id"]
        for r in final.to_pylist()
        if r["status"] == "failed"
        and r["failure_reason"] in ("low_ocr_confidence", "ocr_timeout", "ocr_memory_limit")
    }
    assert res["retried"] == len(recoverable_failed)
    if recoverable_failed:
        retried = pq.read_table(f"{out}/retry/extracted", columns=["doc_id", "status"])
        assert set(retried.column("doc_id").to_pylist()) == recoverable_failed
        # deterministic engines → still failed, but each retried exactly once
        assert retried.num_rows == len(recoverable_failed)

        # merged view: final − retried ∪ retry, exactly once per doc_id
        merged = pq.read_table(res["merged_dir"])
        mrows = {r["doc_id"]: r for r in merged.to_pylist()}
        assert len(mrows) == merged.num_rows == final.num_rows  # exactly-once
        assert set(mrows) == set(final.column("doc_id").to_pylist())
        full_final = {r["doc_id"]: r for r in pq.read_table(f"{out}/final").to_pylist()}
        retry_rows = {
            r["doc_id"]: r
            for r in pq.read_table(f"{out}/retry/extracted").to_pylist()
        }
        for doc_id, row in mrows.items():
            src = retry_rows if doc_id in recoverable_failed else full_final
            exp = src[doc_id]
            for f in ("status", "failure_reason", "word_count", "file_hash"):
                assert row[f] == exp[f], (doc_id, f)


def test_run_extraction_empty_corpus(ray_session, tmp_path):
    """A zero-row corpus (or an all-filtered chunk) must commit empty
    chunks and finalize cleanly: write_parquet of a zero-row dataset
    creates NO directory, which used to crash the atomic chunk-commit
    rename (reproduced), and the finalize read raised on the fileless
    dir. The job must end with an empty final/ and zero-row metrics."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from readur_ray.config import ExtractionConfig
    from readur_ray.pipelines.run import run_extraction
    from readur_ray.schema import DOCUMENTS

    src = tmp_path / "empty_corpus"
    os.makedirs(src)
    pq.write_table(
        pa.table({n: [] for n in DOCUMENTS.names}, schema=DOCUMENTS),
        str(src / "part.parquet"),
    )
    out = tmp_path / "out"
    summary = run_extraction(str(src), str(out), ExtractionConfig(), n_chunks=2)
    assert summary["duplicate_groups"] == 0
    assert summary["metrics_rows"] == 0
    assert os.path.isdir(summary["final_dir"])
    mt = pq.read_table(str(out / "metrics.parquet"))
    assert mt.num_rows == 0 and "pages_ocrd" in mt.column_names


def test_processed_image_lineage_side_table(ray_session, sharded_corpus,
                                            tmp_path):
    """ProcessedImage lineage (document.rs:194-238): with
    save_processed_images + preprocessing on, every completed image doc
    whose preprocessing ran gets a side-table row with a deterministic
    artifact ref, processed dims, and the steps; with the flag off
    (default) the column stays empty and no side table is written."""
    out = str(tmp_path / "pimg_on")
    cfg = ExtractionConfig(
        enable_image_preprocessing=True, save_processed_images=True
    )
    summary = run_extraction(sharded_corpus, out, cfg, n_chunks=2)
    assert summary["processed_image_rows"] > 0
    side = pq.read_table(os.path.join(out, "processed_images"))
    assert summary["processed_image_rows"] == side.num_rows
    rows = side.to_pylist()
    for r in rows:
        assert r["processed_image_ref"].startswith("processed/")
        assert r["processed_image_ref"].endswith(".png")
        assert r["image_width"] > 0 and r["image_height"] > 0
        assert r["file_size"] > 0
        assert r["steps"]
        assert r["media_ref"].startswith("synth://")
    # the side table is exactly the explode of the final/ column
    fin = pq.read_table(
        os.path.join(out, "final"), columns=["doc_id", "processed_images"]
    ).to_pylist()
    want = sorted(
        (d["doc_id"], p["processed_image_ref"])
        for d in fin for p in d["processed_images"]
    )
    assert want == sorted((r["doc_id"], r["processed_image_ref"]) for r in rows)
    # deterministic ref: same payload -> same pointer across runs
    out2 = str(tmp_path / "pimg_on2")
    run_extraction(sharded_corpus, out2, cfg, n_chunks=2)
    side2 = pq.read_table(os.path.join(out2, "processed_images"))
    assert sorted(side2.to_pylist(), key=lambda r: r["doc_id"]) == sorted(
        rows, key=lambda r: r["doc_id"]
    )

    out_off = str(tmp_path / "pimg_off")
    s2 = run_extraction(sharded_corpus, out_off, ExtractionConfig(), n_chunks=2)
    assert s2["processed_image_rows"] == 0
    assert not os.path.exists(os.path.join(out_off, "processed_images"))
    fin_off = pq.read_table(
        os.path.join(out_off, "final"), columns=["processed_images"]
    )
    assert all(not r["processed_images"] for r in fin_off.to_pylist())
