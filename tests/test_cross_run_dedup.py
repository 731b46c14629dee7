"""J1 cross-run dedup: a second run over content already ingested by a
prior run marks it duplicate via the co-partitioned lookup against the
prior final/ — mirroring the reference's point lookup of each new
doc's file_hash against the stored documents
(/root/reference/src/ingestion/document_ingestion.rs:134-169)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from readur_ray import synth
from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.run import run_extraction


@pytest.fixture(scope="module")
def prior_run(tmp_path_factory):
    corpus = tmp_path_factory.mktemp("prior_corpus")
    synth.write_corpus(str(corpus), 200, seed=31, rows_per_file=100)
    out = tmp_path_factory.mktemp("prior_out")
    run_extraction(str(corpus), str(out), ExtractionConfig(), n_chunks=2)
    return str(corpus), str(out)


def test_cross_run_marks_existing_content(ray_session, prior_run, tmp_path):
    prior_corpus, prior_out = prior_run
    # second corpus = one shard of the prior corpus (same content, same
    # doc_ids -> same hashes) + 200 fresh docs from a different seed
    corpus_b = str(tmp_path / "corpus_b")
    os.makedirs(corpus_b)
    shard = sorted(os.listdir(prior_corpus))[0]
    shutil.copy(os.path.join(prior_corpus, shard), corpus_b)
    synth.write_corpus(str(tmp_path / "fresh"), 200, seed=77, rows_per_file=100)
    for i, f in enumerate(sorted(os.listdir(str(tmp_path / "fresh")))):
        shutil.copy(
            os.path.join(str(tmp_path / "fresh"), f),
            os.path.join(corpus_b, f"fresh-{i}.parquet"),
        )

    out_b = str(tmp_path / "out_b")
    run_extraction(
        corpus_b, out_b, ExtractionConfig(), n_chunks=2,
        dedup_against=os.path.join(prior_out, "final"),
    )

    prior = pq.read_table(os.path.join(prior_out, "final"),
                          columns=["file_hash", "status"])
    prior_hashes = {
        h for h in prior.column("file_hash").to_pylist() if h
    }
    final_b = pq.read_table(os.path.join(out_b, "final")).to_pylist()
    assert len(final_b) == 300  # never drop a row

    overlapped = [r for r in final_b if r["file_hash"] in prior_hashes]
    fresh = [r for r in final_b if r["file_hash"]
             and r["file_hash"] not in prior_hashes]
    assert overlapped, "the copied shard must share hashes with the prior run"
    # every doc whose content the prior run already holds is a loser
    for r in overlapped:
        assert r["dedup_status"] == "skipped_duplicate"
        assert r["status"] == "skipped_duplicate"
        assert r["spans"] == []
    # fresh content still resolves keep-first WITHIN the run only
    by_hash: dict = {}
    for r in fresh:
        by_hash.setdefault(r["file_hash"], []).append(r)
    for group in by_hash.values():
        kept = [g for g in group if g["dedup_status"] == "kept"]
        assert len(kept) == 1
        assert kept[0]["doc_id"] == min(g["doc_id"] for g in group)


def test_without_existing_unchanged(ray_session, prior_run, tmp_path):
    """dedup_against=None keeps the original single-run semantics."""
    prior_corpus, prior_out = prior_run
    out2 = str(tmp_path / "out2")
    run_extraction(prior_corpus, out2, ExtractionConfig(), n_chunks=2)
    a = pq.read_table(os.path.join(prior_out, "final"))
    b = pq.read_table(os.path.join(out2, "final"))
    ra = sorted(a.select(["doc_id", "status", "dedup_status"]).to_pylist(),
                key=lambda r: r["doc_id"])
    rb = sorted(b.select(["doc_id", "status", "dedup_status"]).to_pylist(),
                key=lambda r: r["doc_id"])
    assert ra == rb


def test_dedup_against_empty_prior_run(ray_session, tmp_path):
    """A prior run over an empty corpus leaves a fileless final/; a
    second run pointing --dedup-against at it must behave exactly like
    no prior run (used to raise on the read of the fileless dir)."""
    import pyarrow as pa

    from readur_ray.schema import DOCUMENTS

    empty_src = tmp_path / "empty_src"
    os.makedirs(empty_src)
    pq.write_table(
        pa.table({n: [] for n in DOCUMENTS.names}, schema=DOCUMENTS),
        str(empty_src / "p.parquet"),
    )
    empty_out = tmp_path / "empty_out"
    run_extraction(str(empty_src), str(empty_out), ExtractionConfig(), n_chunks=1)

    corpus = tmp_path / "corpus"
    synth.write_corpus(str(corpus), 60, seed=5)
    out = tmp_path / "out"
    s = run_extraction(
        str(corpus), str(out), ExtractionConfig(), n_chunks=2,
        dedup_against=str(empty_out / "final"),
    )
    t = pq.read_table(os.path.join(str(out), "final"))
    assert t.num_rows == 60
    # bit-identical to a run WITHOUT dedup_against: an empty prior can
    # never mark anything (cross-run losers get skipped_duplicate)
    out_ref = tmp_path / "out_ref"
    run_extraction(str(corpus), str(out_ref), ExtractionConfig(), n_chunks=2)
    ref = pq.read_table(os.path.join(str(out_ref), "final"))
    key = lambda r: r["doc_id"]  # noqa: E731
    got_rows = sorted(
        t.select(["doc_id", "status", "dedup_status"]).to_pylist(), key=key
    )
    ref_rows = sorted(
        ref.select(["doc_id", "status", "dedup_status"]).to_pylist(), key=key
    )
    assert got_rows == ref_rows


def test_cross_run_composes_with_incremental(ray_session, prior_run, tmp_path):
    """--incremental --dedup-against compose: the manifest-diff runner's
    finalize rides the same cross-run hash shuffle, so content already
    in the prior run's final/ is marked duplicate in an incremental
    job too."""
    from readur_ray.pipelines.run import run_incremental

    prior_corpus, prior_out = prior_run
    corpus_b = str(tmp_path / "corpus_b")
    os.makedirs(corpus_b)
    shard = sorted(os.listdir(prior_corpus))[0]
    shutil.copy(os.path.join(prior_corpus, shard), corpus_b)
    out = str(tmp_path / "out")
    r = run_incremental(
        corpus_b, out, ExtractionConfig(),
        dedup_against=os.path.join(prior_out, "final"),
    )
    assert r["mode"] == "full"
    t = pq.read_table(os.path.join(out, "final"),
                      columns=["doc_id", "dedup_status"])
    st = t.column("dedup_status").to_pylist()
    assert any(s == "skipped_duplicate" for s in st), (
        "prior-run content must be marked duplicate in the incremental job"
    )
