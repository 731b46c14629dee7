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


def test_pack_sequences_prefix_sum_and_chunks(ray_session, tmp_path):
    # doc ids deliberately sparse + out of write order: packing must
    # follow doc_id order, not file order, and offsets must be the
    # exact global prefix sum. SEQ_LEN=256; craft token counts that
    # straddle a chunk boundary.
    texts = {
        7: "a " * 300,        # 300 bpe tokens + EOS = 301
        100: "b c d",         # 3 + 1 = 4
        3: "",                # 0 + 1 = 1 (EOS only)
        5000: "x" * 10,       # 1 letter-run token + 1 = 2
    }
    sf = _write_docs(tmp_path, [(i, t) for i, t in texts.items()])
    out = {r["doc_id"]: r for r in curation.pack_sequences(sf).take_all()}
    assert set(out) == set(texts)
    # doc_id order: 3, 7, 100, 5000 with n_tokens 1, 301, 4, 2
    assert [out[i]["n_tokens"] for i in (3, 7, 100, 5000)] == [1, 301, 4, 2]
    assert [out[i]["start_offset"] for i in (3, 7, 100, 5000)] == [0, 1, 302, 306]
    # doc 7 spans offsets 1..301 -> chunks 0 and 1 (boundary at 256)
    assert (out[7]["first_chunk"], out[7]["last_chunk"], out[7]["n_chunks"]) == (
        0, 1, 2,
    )
    assert out[100]["first_chunk"] == out[100]["last_chunk"] == 1


def test_pack_sequences_randomized_contiguity(ray_session, tmp_path):
    # property: sorted by doc_id, each start_offset equals the previous
    # doc's start + n_tokens (no gaps, no overlaps), regardless of how
    # docs scatter across buckets.
    import random

    rng = random.Random(42)
    rows = [
        (rng.randrange(10**9), " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(0, 40))))
        for _ in range(200)
    ]
    rows = list({r[0]: r for r in rows}.values())  # unique doc_ids
    sf = _write_docs(tmp_path, rows)
    got = sorted(curation.pack_sequences(sf).take_all(), key=lambda r: r["doc_id"])
    off = 0
    for r in got:
        assert r["start_offset"] == off
        off += r["n_tokens"]


def _naive_bigrams(rows):
    from collections import Counter

    from readur_ray.functions.textstats import words_of

    c = Counter()
    per_doc = {}
    for doc_id, text, *_ in rows:
        ws = words_of(text or "")
        grams = [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
        per_doc[doc_id] = grams
        c.update(grams)
    return c, per_doc


def test_top_ngrams_vs_naive(ray_session, tmp_path):
    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randrange(12)}" for _ in range(rng.randrange(0, 30))))
        for i in range(150)
    ]
    sf = _write_docs(tmp_path, rows)
    got = curation.top_ngrams(sf).take_all()
    c, _ = _naive_bigrams(rows)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: curation.NGRAM_K]
    got = sorted(got, key=lambda r: r["rank"])
    assert [(r["ngram"], r["cnt"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))


def test_common_ngram_score_vs_naive(ray_session, tmp_path):
    rows = [
        (1, "the cat sat on the cat mat"),
        (2, "zq yx wv"),            # rare bigrams only
        (3, ""),                     # no bigrams -> zeros, flag 0
        (4, "the cat the cat the cat"),
    ]
    sf = _write_docs(tmp_path, rows)
    c, per_doc = _naive_bigrams(rows)
    topv = {g for g, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: curation.NGRAM_V]}
    got = {r["doc_id"]: r for r in curation.common_ngram_score(sf).take_all()}
    assert set(got) == {1, 2, 3, 4}
    for doc_id, grams in per_doc.items():
        tot, com = len(grams), sum(1 for g in grams if g in topv)
        assert got[doc_id]["bigrams_total"] == tot
        assert got[doc_id]["bigrams_common"] == com
        flag = 1 if tot > 0 and com * curation.COMMON_DEN >= tot * curation.COMMON_NUM else 0
        assert got[doc_id]["common"] == flag
    assert got[3]["common"] == 0


def test_training_shuffle_exact_permutation(ray_session, tmp_path):
    # positions within each shard must be exactly 1..shard_size under
    # (md5 rank, doc_id) order — verified against a naive local shuffle.
    import hashlib as _h

    rows = [(i * 13 + 1, f"doc {i}") for i in range(120)]
    sf = _write_docs(tmp_path, rows)
    got = curation.training_shuffle(sf).take_all()
    assert len(got) == len(rows)
    naive = {}
    for doc_id, _ in rows:
        rk = _h.md5(f"shuf:{doc_id}".encode()).hexdigest()
        naive[doc_id] = (int(rk[:8], 16) % curation.SHUF_SHARDS, rk)
    by_shard = {}
    for doc_id, (shard, rk) in naive.items():
        by_shard.setdefault(shard, []).append((rk, doc_id))
    want_pos = {}
    for shard, lst in by_shard.items():
        for pos, (_, doc_id) in enumerate(sorted(lst), 1):
            want_pos[doc_id] = (shard, pos)
    for r in got:
        assert (r["shard"], r["pos"]) == want_pos[r["doc_id"]]


def test_dup_spans_crafted(ray_session, tmp_path):
    # doc 1 and doc 2 share an 8-word passage; doc 3 repeats its own
    # passage twice (within-doc dup counts too); doc 4 is short (<8
    # words -> zero grams); doc 5 is all-unique.
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, passage + " one two three"),
        (2, "x y " + passage),
        (3, passage2 := "p q r s t u v w " + "p q r s t u v w"),
        (4, "too short"),
        (5, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: r for r in curation.dup_spans(sf).take_all()}
    assert set(got) == {1, 2, 3, 4, 5}
    # naive reference
    from collections import Counter

    from readur_ray.functions.textstats import words_of

    allg = Counter()
    per_doc = {}
    for doc_id, text in rows:
        ws = words_of(text)
        grams = [" ".join(ws[i:i + 8]) for i in range(max(len(ws) - 7, 0))]
        per_doc[doc_id] = grams
        allg.update(grams)
    for doc_id, grams in per_doc.items():
        tot = len(grams)
        dup = sum(1 for g in grams if allg[g] >= 2)
        assert got[doc_id]["grams_total"] == tot, doc_id
        assert got[doc_id]["grams_dup"] == dup, doc_id
        flag = 1 if tot > 0 and dup * curation.DUP_DEN >= tot * curation.DUP_NUM else 0
        assert got[doc_id]["dup_flag"] == flag, doc_id
    assert got[4]["grams_total"] == 0 and got[4]["dup_flag"] == 0
    assert got[1]["grams_dup"] >= 1 and got[2]["grams_dup"] >= 1
    assert got[3]["grams_dup"] > 0  # within-doc repetition detected
    assert got[5]["grams_dup"] == 0


def test_mix_weights_skewed_sources(ray_session, tmp_path):
    # sources with doc counts 1 / 4 / 100: sqrt-temperature weights
    # 1 / 2 / 10 -> ppm 1000000*w//13; uniform counts (the sf tables)
    # never exercise the sqrt, so skew is crafted here
    rows = []
    did = 0
    for src, n in (("tiny", 1), ("small", 4), ("big", 100)):
        for _ in range(n):
            rows.append((did, f"text {did}", src))
            did += 1
    sf = _write_docs(tmp_path, rows)
    tbl = curation.mix_weights(sf)
    got = {r["source"]: r for r in tbl.to_pylist()}
    assert got["tiny"]["n_docs"] == 1 and got["tiny"]["weight_sqrt"] == 1
    assert got["small"]["n_docs"] == 4 and got["small"]["weight_sqrt"] == 2
    assert got["big"]["n_docs"] == 100 and got["big"]["weight_sqrt"] == 10
    total = 13
    for src in ("tiny", "small", "big"):
        w = got[src]["weight_sqrt"]
        assert got[src]["weight_ppm"] == w * curation.MIX_PPM // total
    # sqrt-temperature flattens: big is 100x tiny by count, 10x by weight
    assert got["big"]["weight_ppm"] == 10 * got["tiny"]["weight_ppm"]


def test_leakage_split_group_atomic(ray_session, tmp_path):
    # many sources, several docs each: a source's docs must all land
    # in ONE split, and the 80/10/10 thresholds must hold per bucket
    rows = []
    did = 0
    for s in range(40):
        for _ in range(3):
            rows.append((did, f"text {did}", f"origin{s}"))
            did += 1
    sf = _write_docs(tmp_path, rows)
    df = curation.leakage_split(sf).to_pandas()
    assert len(df) == did
    per_src = df.groupby("source")["split"].nunique()
    assert (per_src == 1).all()  # group-atomic: no source straddles splits
    import hashlib as h

    for _, r in df.iterrows():
        b = int(h.md5(f"split:{r['source']}".encode()).hexdigest()[:8], 16) % 100
        assert r["bucket"] == b
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r["split"] == want
    assert set(df["split"]) == {"train", "val", "test"}  # 40 sources hit all three


def test_run_curation_job_matches_query_plan(ray_session, tmp_path):
    # the --curate CLI job must keep exactly the rows the bit-verified
    # training_prep query keeps: en + quality pass, exact-dup losers out
    from readur_ray.pipelines import prep

    rows = [
        (1, "The quick brown fox jumps over the lazy dog and then "
            "the fox rests under a tree with the other animals."),
        (2, "The quick brown fox jumps over the lazy dog and then "
            "the fox rests under a tree with the other animals."),  # dup of 1
        (3, "zzz qqq xxx"),  # junk: fails the quality/lang gate
        (4, "It was the best of times and it was the worst of times "
            "for all of the people in that old and busy city."),
    ]
    sf = _write_docs(tmp_path, [(i, t) for i, t in rows])
    out = tmp_path / "curated_out"
    summary = prep.run_curation(str(tmp_path / "documents.parquet"), str(out))
    assert summary["docs_in"] == 4
    assert summary["docs_in"] == summary["docs_kept"] + summary["docs_dropped"]

    import pyarrow.parquet as pq

    got = pq.read_table(summary["curated_dir"]).to_pandas()
    want = prep.training_prep(sf).to_pandas()
    got = got.sort_values("doc_id", ignore_index=True)[sorted(got.columns)]
    want = want.sort_values("doc_id", ignore_index=True)[sorted(want.columns)]
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["doc_id"]) == {1, 4}  # dup loser 2 and junk 3 dropped


def test_fuzzy_funnel_shares_one_pair_graph(ray_session, monkeypatch):
    """dedup_components and fuzzy_dedup_keep must build the minhash
    pair graph ONCE per corpus (round-3 bench: the keep stage spent
    half its 6.2 s recomputing the shingle→band shuffle verbatim)."""
    from readur_ray.pipelines import dedup as ddp

    ddp._FUNNEL_CACHE.clear()
    calls = {"n": 0, "cc": 0}
    real = ddp.minhash_lsh_pairs
    real_cc = ddp._build_neardup_components

    def counting(sf_dir):
        calls["n"] += 1
        return real(sf_dir)

    def counting_cc(sf_dir, cap):
        calls["cc"] += 1
        return real_cc(sf_dir, cap)

    monkeypatch.setattr(ddp, "minhash_lsh_pairs", counting)
    monkeypatch.setattr(ddp, "_build_neardup_components", counting_cc)
    sf = "/root/testdata/sf0.001"
    n1 = sum(
        b.num_rows
        for b in ddp.neardup_components(sf).iter_batches(batch_format="pyarrow")
    )
    from readur_ray.pipelines.curation import fuzzy_dedup_keep

    n2 = sum(
        b.num_rows
        for b in fuzzy_dedup_keep(sf).iter_batches(batch_format="pyarrow")
    )
    assert n1 > 0 and n2 >= 0
    assert calls["n"] == 1   # second stage reused the materialized graph
    assert calls["cc"] == 1  # ...and the resolved components themselves


def test_quantile_gate_crafted_multifile(ray_session, tmp_path):
    """percentile_disc semantics on a crafted distribution, with the
    corpus split across four parquet fragments so the distinct-length
    combiner must re-aggregate the same (source, n_chars) key across
    batches: srcA holds lengths 1..10 (p10=1, p90=9 -> the length-10
    doc is gated out), srcB holds {5,1,4,2,3} (p10=1, p90=5 -> all
    kept), and duplicates of length 5 straddle fragments."""
    d = tmp_path / "documents.parquet"
    d.mkdir()
    rows = [(i, "x" * i, "srcA") for i in range(1, 11)]
    rows += [(100 + j, "x" * k, "srcB") for j, k in enumerate([5, 1, 4, 2, 3])]
    rows += [(200, "x" * 5, "srcB"), (201, "x" * 5, "srcB")]  # cum dups
    for frag in range(4):
        part = rows[frag::4]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in part], pa.int64()),
                "text": pa.array([r[1] for r in part], pa.string()),
                "lang": pa.array(["en"] * len(part), pa.string()),
                "source": pa.array([r[2] for r in part], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in part], pa.int64()),
            }
        )
        pq.write_table(tbl, str(d / f"part-{frag}.parquet"))

    out = curation.quantile_gate(str(tmp_path)).to_pandas()
    a = out[out["source"] == "srcA"]
    b = out[out["source"] == "srcB"]
    # srcA: n=10 -> lo = v[ceil(1)-1] = 1, hi = v[ceil(9)-1] = 9
    assert set(a["lo_chars"]) == {1} and set(a["hi_chars"]) == {9}
    assert sorted(a["n_chars"]) == list(range(1, 10))  # 10 gated out
    # srcB: n=7 sorted [1,2,3,4,5,5,5] -> lo = v[0] = 1, hi = v[ceil(6.3)-1] = 5
    assert set(b["lo_chars"]) == {1} and set(b["hi_chars"]) == {5}
    assert len(b) == 7  # nothing gated


def test_dedup_substrings_crafted(ray_session, tmp_path):
    """Removal semantics on crafted duplicates: an 8-word passage shared
    by two docs is removed from BOTH (global count >= 2, coverage spans
    all 8 positions); unique surroundings survive; a short doc (< 8
    words) has no grams and is untouched; a within-doc repeat of the
    same 8-gram is also removed."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    sf = _write_docs(
        tmp_path,
        [
            (1, f"intro {shared} outro"),
            (2, f"{shared} tail"),
            (3, "too short to gram"),
            (4, f"{shared} {shared}"),  # within-doc repeat
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.dedup_substrings(sf).to_pandas().to_dict("records")
    }
    assert out[1]["n_words"] == 10 and out[1]["n_removed"] == 8
    assert out[1]["kept_sha256"] == _sha("intro outro")
    assert out[2]["n_words"] == 9 and out[2]["n_removed"] == 8
    assert out[2]["kept_sha256"] == _sha("tail")
    assert out[3]["n_removed"] == 0
    assert out[3]["kept_sha256"] == _sha("too short to gram")
    assert out[4]["n_words"] == 16 and out[4]["n_removed"] == 16
    assert out[4]["kept_sha256"] == _sha("")


def test_dedup_substrings_randomized_vs_naive(ray_session, tmp_path):
    """40-doc corpus of words drawn from a tiny vocab (dense 8-gram
    collisions, within- and cross-doc) checked against a naive
    single-threaded reference of the published semantics: position p
    drops iff some occurrence of a globally duplicated 8-gram covers
    it."""
    import random

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(6)]
    rows = []
    for d in range(1, 41):
        n = rng.randint(0, 24)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    sf = _write_docs(tmp_path, rows)

    from collections import Counter

    from readur_ray.functions.textstats import words_of

    gcount: Counter = Counter()
    grams = {}
    for d, text in rows:
        ws = words_of(text)
        gs = [tuple(ws[i : i + 8]) for i in range(len(ws) - 7)]
        grams[d] = (ws, gs)
        gcount.update(gs)
    expect = {}
    for d, (ws, gs) in grams.items():
        covered = [False] * len(ws)
        for i, g in enumerate(gs):
            if gcount[g] >= 2:
                for p in range(i, i + 8):
                    covered[p] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        expect[d] = (len(ws), sum(covered), _sha(" ".join(kept)))

    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["kept_sha256"])
        for r in curation.dedup_substrings(sf).to_pandas().to_dict("records")
    }
    assert got == expect


def test_quantile_gate_randomized_vs_naive(ray_session, tmp_path):
    """Random lengths over 3 sources checked against a naive
    percentile_disc: sorted v, 1-indexed pos max(ceil(p*n), 1)."""
    import math
    import random

    rng = random.Random(7)
    rows = []
    did = 0
    for s, nsrc in (("sa", 23), ("sb", 7), ("sc", 1)):
        for _ in range(nsrc):
            did += 1
            rows.append((did, "x" * rng.randint(0, 40), s))
    sf = _write_docs(tmp_path, rows)

    by_src: dict = {}
    for d, t, s in rows:
        by_src.setdefault(s, []).append((d, len(t)))
    expect = set()
    for s, docs in by_src.items():
        v = sorted(n for _, n in docs)
        n = len(v)
        lo = v[max(math.ceil(0.1 * n), 1) - 1]
        hi = v[max(math.ceil(0.9 * n), 1) - 1]
        for d, nc in docs:
            if lo <= nc <= hi:
                expect.add((d, s, nc, lo, hi))

    got = {
        (r["doc_id"], r["source"], r["n_chars"], r["lo_chars"], r["hi_chars"])
        for r in curation.quantile_gate(sf).to_pandas().to_dict("records")
    }
    assert got == expect


def test_run_funnel_job_matches_query_plan(ray_session, tmp_path):
    # the --funnel CLI job must write exactly the rows the bit-verified
    # funnel_attribution query produces, and its histogram must sum to
    # the corpus size (every doc attributed exactly once)
    from readur_ray.pipelines import prep

    sf = "/root/testdata/sf0.001"
    out = tmp_path / "funnel_out"
    summary = prep.run_funnel(sf, str(out))
    assert summary["docs_in"] == 500
    assert sum(summary["stages"].values()) == 500
    assert set(summary["stages"]) <= set(prep.STAGES)

    import pandas as pd
    import pyarrow.parquet as pq

    got = (
        pq.read_table(summary["funnel_dir"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = (
        prep.funnel_attribution(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "stage"]], want[["doc_id", "stage"]], check_dtype=False
    )


def test_funnel_attribution_constructed_case(ray_session, tmp_path):
    # a corpus built so every stage fires exactly once, with known
    # precedence: doc 20 is the benchmark slice (20 % 20 == 0), doc 3
    # fails the gate, doc 2 is an exact dup of doc 1, doc 21 is a
    # near-dup (shares almost all shingles with doc 1) but not exact,
    # and docs 1/4 survive everything
    from readur_ray.pipelines import prep

    # texts chosen to share NO word-3-shingle across funnel branches
    # (any shared shingle can seed a MinHash band collision and merge
    # components — which would be correct funnel behavior, but not the
    # one-stage-per-branch construction this test wants)
    good = ("The quick brown fox jumps over a lazy dog and then that "
            "fox rests under its favorite tree beside several calm "
            "animals near this quiet field by an old farm house.")
    near = good.replace("quiet field", "sunny field")
    bench = ("When winter came to our little town every child went "
             "out to play in fresh snow on that big hill while bright "
             "lamps were lit early in each window along main street.")
    # shares bench's long second half → ≥10% shingle overlap with the
    # benchmark slice, but nothing shared with `good` or `other`
    leaky = ("Some folks say during cold months bright lamps were lit "
             "early in each window along main street while every "
             "child went out to play in fresh snow on that big hill.")
    other = ("It was truly both wonderful and terrible back then for "
             "many people living inside one busy ancient city whose "
             "streets stayed full with carts plus very loud voices.")
    rows = [
        (1, good),
        (2, good),           # exact duplicate of 1 → exact_dup
        (3, "zzz qqq xxx"),  # junk → gate
        (4, other),          # independent survivor
        (5, leaky),          # overlaps the benchmark → contaminated
        (20, bench),         # benchmark slice (doc_id % 20 == 0)
        (21, near),          # near-duplicate of 1 → fuzzy_dup
    ]
    _write_docs(tmp_path, rows)
    got = (
        prep.funnel_attribution(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["stage"]
        .to_dict()
    )
    assert got == {
        1: "kept",
        2: "exact_dup",
        3: "gate",
        4: "kept",
        5: "contaminated",
        20: "benchmark",
        21: "fuzzy_dup",
    }


def test_survivorship_merge_crafted(ray_session, tmp_path):
    """Golden-record lanes the tiny fixtures barely reach: a 3-member
    component with a clear majority language, a 2-member component
    whose language counts TIE (lexicographic min must win), and a
    singleton that must emit nothing."""
    from readur_ray.pipelines import dedup as ddp

    ddp._FUNNEL_CACHE.clear()
    ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tb = "one two three four five six seven eight nine ten eleven"
    tc = "completely different vocabulary nothing shared here at all ok"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 10, 11, 20], pa.int64()),
            "text": pa.array([ta, ta, ta, tb, tb, tc], pa.string()),
            "lang": pa.array(["en", "en", "fr", "fr", "de", "en"], pa.string()),
            "source": pa.array(["s"] * 6, pa.string()),
            "n_chars": pa.array([50, 80, 60, 40, 30, 99], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (
        ddp.survivorship_merge(str(tmp_path))
        .to_pandas()
        .sort_values("component_id")
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == [
        {
            "component_id": 1,
            "rep_id": 1,
            "n_members": 3,
            "max_chars": 80,
            "canon_lang": "en",
        },
        {
            "component_id": 10,
            "rep_id": 10,
            "n_members": 2,
            "max_chars": 40,
            "canon_lang": "de",
        },
    ]
