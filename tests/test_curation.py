"""Unit tests for the training-data curation suite on crafted corpora
that exercise the edges the synthetic tables barely hit: cross-doc and
within-doc duplicate lines, a doc losing every line, benchmark shingle
overlap, heavy within-doc repetition, and per-stratum quota cuts."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from readur_ray.pipelines import curation


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(
                [r[2] if len(r) > 2 else "srcA" for r in rows], pa.string()
            ),
            "n_chars": pa.array([len(r[1] or "") for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_line_dedup_crafted(ray_session, tmp_path):
    # doc 1: unique owner of "shared" (first occurrence) + a within-doc dup
    # doc 2: loses "shared" to doc 1, keeps its own line
    # doc 3: every line already seen elsewhere -> empty survivor text
    sf = _write_docs(
        tmp_path,
        [
            (1, "shared\nmine\nmine"),
            (2, "shared\nother"),
            (3, "shared\nmine\nother"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.line_dedup(sf).to_pandas().to_dict("records")
    }
    assert out[1]["n_lines"] == 3 and out[1]["kept_lines"] == 2
    assert out[1]["kept_sha256"] == _sha("shared\nmine")
    assert out[2]["n_lines"] == 2 and out[2]["kept_lines"] == 1
    assert out[2]["kept_sha256"] == _sha("other")
    assert out[3]["n_lines"] == 3 and out[3]["kept_lines"] == 0
    assert out[3]["kept_sha256"] == _sha("")


def test_contamination_crafted(ray_session, tmp_path):
    bench_text = "alpha beta gamma delta epsilon"
    sf = _write_docs(
        tmp_path,
        [
            (20, bench_text),                      # benchmark slice (20 % 20 == 0)
            (1, "alpha beta gamma delta zeta"),    # shares 2 of 3 shingles
            (2, "one two three four five"),        # shares none
            (3, ""),                               # zero shingles
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.contamination(sf).to_pandas().to_dict("records")
    }
    assert 20 not in out  # benchmark docs are not scored
    assert out[1]["n_shingles"] == 3 and out[1]["n_overlap"] == 2
    assert out[1]["contaminated"] == 1
    assert out[2]["n_overlap"] == 0 and out[2]["contaminated"] == 0
    assert out[3]["n_shingles"] == 0 and out[3]["contaminated"] == 0


def test_repetition_score_crafted(ray_session, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (1, "foo bar foo bar foo"),   # 4 bigrams, 2 distinct -> repetitive
            (2, "a b c d e"),             # all distinct
            (3, "word"),                  # < 2 words -> zero bigrams
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.repetition_score(sf).to_pandas().to_dict("records")
    }
    assert out[1]["bigrams_total"] == 4 and out[1]["bigrams_distinct"] == 2
    assert out[1]["repetitive"] == 1
    assert out[2]["repetitive"] == 0
    assert out[3]["bigrams_total"] == 0 and out[3]["repetitive"] == 0


def test_stratified_sample_quota_and_determinism(ray_session, tmp_path):
    rows = [(i, f"text {i}", "srcA" if i % 2 else "srcB") for i in range(1, 61)]
    sf = _write_docs(tmp_path, rows)
    df1 = curation.stratified_sample(sf).to_pandas()
    assert df1.groupby("source")["doc_id"].count().to_dict() == {
        "srcA": curation.STRATUM_K,
        "srcB": curation.STRATUM_K,
    }
    df2 = curation.stratified_sample(sf).to_pandas()
    a = df1.sort_values(["source", "doc_id"], ignore_index=True)
    b = df2.sort_values(["source", "doc_id"], ignore_index=True)
    assert a.equals(b)  # same sample on any run/layout


def test_fuzzy_dedup_keep_partition(ray_session):
    sf = "/root/testdata/sf0.001"
    df = curation.fuzzy_dedup_keep(sf).to_pandas()
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    # clusters partition the corpus exactly once
    assert df["group_size"].sum() == n_docs
    assert (df["n_removed"] == df["group_size"] - 1).all()
    assert df["component_id"].is_unique


def test_line_dedup_randomized_vs_naive(ray_session, tmp_path):
    """30-doc corpus of lines drawn from a tiny pool (dense cross-doc
    collisions) checked against a naive single-threaded reference."""
    import random

    rng = random.Random(1234)
    pool = [f"line {i}" for i in range(12)] + [""]
    rows = []
    for d in range(1, 31):
        n = rng.randint(0, 6)
        rows.append((d, "\n".join(rng.choice(pool) for _ in range(n))))
    sf = _write_docs(tmp_path, rows)

    # naive reference: first global occurrence by (doc_id, line_idx)
    seen: set = set()
    expect = {}
    for d, text in rows:  # rows already in doc_id order
        lines = (text or "").split("\n")
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        expect[d] = (len(lines), len(kept), _sha("\n".join(kept)))

    got = {
        r["doc_id"]: (r["n_lines"], r["kept_lines"], r["kept_sha256"])
        for r in curation.line_dedup(sf).to_pandas().to_dict("records")
    }
    assert got == expect
