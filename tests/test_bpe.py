"""BPE vocabulary learning: bit-parity with the textbook
single-process reference (the rows-only entry's correctness pin —
iterative string rewriting has no SQL oracle)."""

from __future__ import annotations

import sys
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from readur_ray.functions.textstats import words_of
from readur_ray.pipelines.curation import (
    BPE_MERGES,
    BPE_TOP_WORDS,
    _bpe_learn,
    bpe_merges,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_learn_textbook_example():
    # Sennrich et al. §3.2 shape: 'es' dominates, then 'est', ...
    merges = _bpe_learn(
        [("lowest", 5), ("newest", 6), ("widest", 3)], 3
    )
    assert merges[0] == ("e", "s", 14)
    assert merges[1] == ("es", "t", 14)
    assert merges[2] == ("est", "</w>", 14)


def test_bpe_learn_tie_breaks_lexicographically():
    # (a,b), (b,a) and (a,</w>) all tie at count 2 →
    # ('a','</w>') is the lexicographic minimum ('<' < 'b')
    merges = _bpe_learn([("aba", 2)], 1)
    assert merges[0] == ("a", "</w>", 2)


def test_bpe_merges_matches_naive_reference(ray_session):
    got = bpe_merges(SF_DIR)
    assert list(got.columns) == ["rank", "left", "right", "pair_count"]
    assert len(got) == BPE_MERGES

    # naive single-process reference over the same corpus + same
    # bounded top-V dictionary selection
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for t in texts.column("text").to_pylist():
        c.update(words_of(t or ""))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_WORDS]
    want = _bpe_learn(top, BPE_MERGES)

    got_rows = list(zip(got["left"], got["right"], got["pair_count"]))
    assert got_rows == want


def test_bpe_encode_naive_parity(ray_session):
    """bpe_encode's per-doc BPE token counts must equal a driver-side
    naive apply of the same trained merge table (rows-only entry — this
    parity test is its correctness gate)."""
    import re

    import pyarrow.parquet as pq

    from readur_ray.pipelines.curation import (
        BPE_EOW,
        _bpe_apply,
        bpe_encode,
        bpe_merges,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        bpe_encode(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    merges = bpe_merges(sf)
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(zip(merges["left"], merges["right"]))
    }
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    word_re = re.compile(r"[a-z0-9]+")
    cache: dict = {}
    for _, row in docs.sample(60, random_state=7).iterrows():
        ws = word_re.findall((row["text"] or "").lower())
        want = 0
        for w in ws:
            if w not in cache:
                cache[w] = _bpe_apply(w, ranks)
            want += cache[w]
        sub = got[got["doc_id"] == row["doc_id"]]
        assert len(sub) == 1
        assert int(sub["n_words"].iloc[0]) == len(ws)
        assert int(sub["n_bpe_tokens"].iloc[0]) == want
