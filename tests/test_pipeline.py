"""End-to-end pipeline vs oracle: span-sequence equality per document.

The contract (BASELINE.json input_hint): for every input doc_id the
pipeline's output spans must equal the oracle's on
(kind, text, media_ref, offset order), plus status / failure_reason /
failure_stage / confidence / word_count / file_hash; and every input
doc appears exactly once in the output (never-drop-a-row,
/root/reference/src/ocr/queue.rs:336-590 always resolves)."""

import pytest

from readur_ray import oracle
from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.extract import build_extracted


@pytest.fixture(scope="module")
def pipeline_rows(ray_session, corpus_dir):
    cfg = ExtractionConfig(extract_concurrency=2)
    ds = build_extracted(corpus_dir, cfg)
    rows = {r["doc_id"]: r for r in ds.take_all()}
    return rows


@pytest.fixture(scope="module")
def oracle_rows(small_corpus):
    docs = small_corpus.to_pylist()
    return {d["doc_id"]: (oracle.expected_doc(d), d["_cls"]) for d in docs}


def test_accounting_exactly_once(pipeline_rows, oracle_rows):
    assert set(pipeline_rows) == set(oracle_rows)


def test_span_sequence_equality(pipeline_rows, oracle_rows):
    mismatches = []
    for doc_id, (exp, cls) in oracle_rows.items():
        got = pipeline_rows[doc_id]
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["spans"]
        ]
        exp_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["spans"]
        ]
        if got_spans != exp_spans:
            mismatches.append((doc_id, cls, "spans"))
    assert not mismatches, mismatches[:5]


def test_status_and_failure_fields(pipeline_rows, oracle_rows):
    mismatches = []
    for doc_id, (exp, cls) in oracle_rows.items():
        got = pipeline_rows[doc_id]
        for f in ("status", "failure_reason", "failure_stage"):
            if got[f] != exp[f]:
                mismatches.append((doc_id, cls, f, got[f], exp[f]))
    assert not mismatches, mismatches[:5]


def test_preprocessing_lineage_propagates(pipeline_rows):
    """EngineResult.preprocessing_applied reaches the EXTRACTED schema
    (the reference's OcrResult carries it, enhanced.rs:28-36): failed
    docs carry [], completed docs carry each span kind's label."""
    from readur_ray.stages.engines import OCR_STRATEGY_LABELS

    seen_kinds = set()
    for doc_id, got in pipeline_rows.items():
        prep = got["preprocessing_applied"]
        assert isinstance(prep, list)
        if got["status"] != "completed":
            assert prep == [], doc_id
            continue
        kinds = {s["kind"] for s in got["spans"]}
        seen_kinds |= kinds
        if "plain_text" in kinds:
            assert "Plain text read" in prep, doc_id
        if "pdf_text" in kinds:
            assert "PDF text extraction (pdftotext)" in prep, doc_id
        if "pdf_ocr" in kinds:
            assert OCR_STRATEGY_LABELS[0] in prep, doc_id
        if "pdf_bytes" in kinds:
            assert "Direct PDF text extraction (last resort)" in prep, doc_id
        assert len(prep) == len(set(prep)), doc_id  # unique-in-order
    # the corpus must actually exercise the text + both pdf outcomes
    assert {"plain_text", "pdf_text", "pdf_ocr"} <= seen_kinds


def test_confidence_word_count_hash(pipeline_rows, oracle_rows):
    mismatches = []
    for doc_id, (exp, cls) in oracle_rows.items():
        got = pipeline_rows[doc_id]
        if abs(got["confidence"] - exp["confidence"]) > 1e-4:
            mismatches.append((doc_id, cls, "confidence", got["confidence"], exp["confidence"]))
        if got["word_count"] != exp["word_count"]:
            mismatches.append((doc_id, cls, "word_count", got["word_count"], exp["word_count"]))
        if got["file_hash"] != exp["file_hash"]:
            mismatches.append((doc_id, cls, "file_hash"))
    assert not mismatches, mismatches[:5]


def test_duplicates_share_hash(pipeline_rows, small_corpus):
    cls = small_corpus.column("_cls").to_pylist()
    ids = small_corpus.column("doc_id").to_pylist()
    dup_ids = [i for i, c in zip(ids, cls) if c == "dup_content"]
    assert dup_ids
    hashes = {}
    for r in pipeline_rows.values():
        if r["file_hash"]:
            hashes.setdefault(r["file_hash"], []).append(r["doc_id"])
    # every completed dup shares its hash with at least one other doc
    shared = 0
    for d in dup_ids:
        fh = pipeline_rows[d]["file_hash"]
        if fh and len(hashes[fh]) > 1:
            shared += 1
    completed_dups = [d for d in dup_ids if pipeline_rows[d]["status"] == "completed"]
    assert shared == len(completed_dups)


def test_pages_ocrd_matches_oracle(pipeline_rows, oracle_rows):
    """pages_ocrd (north-star metrics field): 0 for plain-text /
    text-layer / byte-scan docs, the OCR'd page count for pdf_ocr
    docs, 1 per image OCR span — summed across spans, 0 on failure;
    the skew-exploded path must sum its page windows back to the
    whole-doc count."""
    mismatches = []
    ocr_docs = 0
    for doc_id, (exp, cls) in oracle_rows.items():
        got = pipeline_rows[doc_id]
        if got["pages_ocrd"] != exp["pages_ocrd"]:
            mismatches.append(
                (doc_id, cls, got["pages_ocrd"], exp["pages_ocrd"])
            )
        if exp["pages_ocrd"] > 0:
            ocr_docs += 1
    assert not mismatches, mismatches[:5]
    assert ocr_docs > 0  # the corpus must exercise the OCR path


def test_pool_sizes_never_reserve_every_cpu(ray_session, monkeypatch):
    """Degenerate nodes: at 2-3 CPUs the two pool floors (main 1 +
    page 1) at num_cpus=1 reserved the whole node and deadlocked the
    scan (reproduced at num_cpus=2); they must drop to fractional
    CPUs so at least one full CPU stays free for stateless tasks."""
    import ray as _ray

    from readur_ray.config import ExtractionConfig
    from readur_ray.pipelines import extract

    cfg = ExtractionConfig()
    for ncpu in (2, 3):
        monkeypatch.setattr(_ray, "cluster_resources", lambda n=ncpu: {"CPU": n})
        m, p, mc, pc = extract._pool_sizes(cfg)
        assert (m, p, mc, pc) == ((1, 1), (1, 1), 0.5, 0.5), ncpu
        assert m[1] * mc + p[1] * pc <= ncpu - 1
    for ncpu in (4, 8, 32):
        monkeypatch.setattr(_ray, "cluster_resources", lambda n=ncpu: {"CPU": n})
        m, p, mc, pc = extract._pool_sizes(cfg)
        assert mc == 0.5 and pc == 0.5
        # the RESERVED floor (pool mins — what the allocator budgets
        # for the whole run) must leave real task headroom: the
        # round-3 fixed main pool reserved ncpu-3 of 32 CPUs and
        # serialized the skew branch behind the main one
        reserved = m[0] * mc + p[0] * pc
        assert reserved <= ncpu * 0.5, ncpu
        # and the max widths still leave ≥1 CPU for stateless tasks
        assert m[1] * mc + 1 <= ncpu - 1, ncpu


def test_tuned_executor_scopes_context(ray_session, monkeypatch):
    """tuned_executor must set the pool-upscale threshold (stock 2.0
    requires 2x backlog before growing) and raise the CPU budget INSIDE
    the block, and restore both on exit — leaving it session-global was
    measured to thrash unrelated shuffle-heavy queries (semdedup 8s ->
    46s in one sweep). Datasets created inside keep the tuned copy."""
    import ray as _ray
    import ray.data as rd
    from ray.data import DataContext

    from readur_ray.stages.tuning import tuned_executor

    ctx = DataContext.get_current()
    before_thr = ctx.autoscaling_config.actor_pool_util_upscaling_threshold
    before_cpu = ctx.execution_options.resource_limits.cpu
    ncpu = int(_ray.cluster_resources()["CPU"])
    with tuned_executor():
        assert (
            ctx.autoscaling_config.actor_pool_util_upscaling_threshold == 1.0
        )
        assert ctx.execution_options.resource_limits.cpu == ncpu * 2.0
        inside = rd.range(4)
    # restored after the block
    assert (
        ctx.autoscaling_config.actor_pool_util_upscaling_threshold
        == before_thr
    )
    assert ctx.execution_options.resource_limits.cpu == before_cpu
    # the dataset created inside keeps its tuned context copy
    assert inside.context.execution_options.resource_limits.cpu == ncpu * 2.0
    outside = rd.range(4)
    assert outside.context.execution_options.resource_limits.cpu == before_cpu
    # env override: factor 1.0 keeps the stock budget
    monkeypatch.setenv("READUR_CPU_BUDGET_FACTOR", "1.0")
    with tuned_executor():
        assert ctx.execution_options.resource_limits.cpu == before_cpu
