"""Skew-stress evidence: the hot-key guards must ENGAGE, not merely
exist (FP-Hadoop theme, PAPERS.md). Constructed corpora where one key
dominates, asserting the documented bounds hold."""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

HOT = 600     # copies of the hot document (way past MAX_BUCKET=128)
MED = 50      # a medium near-dup family (under the cap)


def _write(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _skewed_corpus(tmp_path):
    hot = ("every copy of this very hot document repeats the same "
           "thirty words so its hash and every shingle collide "
           "across all six hundred duplicated rows in the corpus")
    med = ("a medium sized family of near duplicates shares this "
           "base text with a tiny suffix that changes per member "
           "keeping them similar but not byte identical at all")
    rows = [(i, hot) for i in range(HOT)]
    rows += [(1000 + i, med + f" tail{i}") for i in range(MED)]
    rows += [(5000, "one completely unrelated document about rivers "
                    "mountains and the weather patterns of autumn")]
    return _write(tmp_path, rows)


def test_exact_dedup_resolves_hot_hash_group(ray_session, tmp_path):
    from readur_ray.pipelines.dedup import exact_dedup

    sf = _skewed_corpus(tmp_path)
    df = exact_dedup(sf).to_pandas()
    hot = df[df["doc_id"] < HOT]
    assert (hot["winner_doc_id"] == 0).all()
    assert (hot["dedup_status"] == "kept").sum() == 1
    assert (hot["dedup_status"] == "skipped_duplicate").sum() == HOT - 1


def test_minhash_hot_bucket_cap_engages(ray_session, tmp_path):
    # 600 identical docs would emit ~180k candidate pairs without the
    # MAX_BUCKET guard; with it, every hot band bucket (600 > 128) is
    # dropped, so the hot family contributes ZERO pairs (exact dedup
    # owns identical docs) while the 50-member family (under the cap)
    # still pairs up
    from readur_ray.pipelines.dedup import minhash_lsh_pairs

    sf = _skewed_corpus(tmp_path)
    df = minhash_lsh_pairs(sf).to_pandas()
    hot_pairs = df[(df["doc_a"] < HOT) & (df["doc_b"] < HOT)]
    assert len(hot_pairs) == 0, "hot-bucket cap did not engage"
    med_pairs = df[
        (df["doc_a"].between(1000, 1000 + MED))
        & (df["doc_b"].between(1000, 1000 + MED))
    ]
    assert len(med_pairs) > 0, "cap over-fired: medium family lost"
    # and the total is nowhere near the quadratic blowup
    assert len(df) < HOT * (HOT - 1) // 20


def test_line_dedup_hot_line_kept_once(ray_session, tmp_path):
    from readur_ray.pipelines.curation import line_dedup

    hot_line = "this exact line appears in every single document"
    rows = [(i, f"{hot_line}\nunique line number {i}") for i in range(300)]
    sf = _write(tmp_path, rows)
    df = line_dedup(sf).to_pandas()
    # every doc has 2 lines; only doc 0 keeps both (the hot line's
    # first occurrence is doc 0 line 1); all others keep just their
    # unique line
    assert (df["n_lines"] == 2).all()
    assert df.loc[df["doc_id"] == 0, "kept_lines"].iloc[0] == 2
    assert (df.loc[df["doc_id"] != 0, "kept_lines"] == 1).all()


def test_jaccard_hot_shingle_guard(ray_session, tmp_path):
    # a shingle present in every doc must be dropped by the
    # MAX_SHINGLE_DOCS inverted-index guard rather than emitting a
    # quadratic pair set
    from readur_ray.pipelines.dedup import ngram_jaccard_pairs

    common = "the common three words"
    rows = [
        (i, f"{common} plus totally distinct content item {i} "
            f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
        for i in range(200)
    ]
    sf = _write(tmp_path, rows)
    df = ngram_jaccard_pairs(sf).to_pandas()
    # documents share only the guarded hot shingles → no pair reaches
    # the Jaccard threshold
    assert len(df) == 0
