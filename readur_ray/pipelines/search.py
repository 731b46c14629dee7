"""Search / suppression / incremental operators (SURVEY §2: F1, F2,
D3, W2, A1, A6).

Re-expressions of the reference's query-shell operators as Ray Data
plans with deterministic integer/string outputs (SQL-oracle exact):

- ``text_search``   — F1 search modes (/root/reference/src/db/documents/
  search.rs:69-128): simple term, exact phrase, boolean AND over
  ``content || ocr_text`` → here documents.text.
- ``search_snippets`` — F2 snippet + highlight offsets (search.rs:
  188-258) with a fixed window (the reference's word-boundary snap is
  kept in the Python kernel and mirrored exactly in SQL).
- ``suppression_antijoin`` — D3 ignored-files anti-join
  (src/db/ignored_files.rs): drop docs whose content hash is in the
  ignored set (deterministic fixture: every 50th doc is "ignored").
- ``incremental_filter`` — W2 polling watermark (src/scheduling/
  watcher.rs:219-264): process only rows past a snapshot watermark.
- ``queue_stats`` — A1/A2/A6 queue statistics (src/ocr/queue.rs:
  804-975): status/failure_reason counts + word totals over the
  text-branch extraction statuses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

SEARCH_TERM = "spark"
SEARCH_PHRASE = "the table"
BOOL_TERMS = ("table", "value")
SNIPPET_WINDOW = 60
IGNORED_EVERY = 50
WATERMARK = "2024-01-20 00:00:00"


def text_search(sf_dir: str) -> "ray.data.Dataset":
    """F1: per-doc match flags for simple / phrase / boolean-AND modes
    plus the simple-mode hit count. All case-sensitive substring
    semantics (the tsquery analog on normalized text)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n_simple = pc.count_substring(text, pattern=SEARCH_TERM).cast(pa.int64())
        phrase = pc.greater(
            pc.count_substring(text, pattern=SEARCH_PHRASE), 0
        )
        booland = pc.and_(
            pc.greater(pc.count_substring(text, pattern=BOOL_TERMS[0]), 0),
            pc.greater(pc.count_substring(text, pattern=BOOL_TERMS[1]), 0),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_hits": n_simple,
                "match_simple": pc.greater(n_simple, 0),
                "match_phrase": phrase,
                "match_boolean": booland,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


RANK_WEIGHTS = ((SEARCH_TERM, 10), (BOOL_TERMS[0], 5), (BOOL_TERMS[1], 1))
PAGE_LIMIT = 20
PAGE_OFFSET = 20


def search_ranked(sf_dir: str) -> "ray.data.Dataset":
    """F1/O2: relevance-ranked search with pagination — the ts_rank +
    LIMIT/OFFSET query of the reference
    (/root/reference/src/db/documents/search.rs:147-151,
    helpers.rs:72-78) with a deterministic integer rank (weighted
    non-overlapping hit counts; all weights/terms fixed).

    Scale plan: score is a vectorized per-batch kernel; each block
    PRUNES to its local top-K (K = offset+limit) before the global
    sort, so the all-to-all sort moves at most K rows per block, and
    the final pagination runs on the K-row result — never on the
    corpus."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    k = PAGE_LIMIT + PAGE_OFFSET

    def score(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        total = None
        for term, w in RANK_WEIGHTS:
            hits = pc.multiply(
                pc.count_substring(text, pattern=term).cast(pa.int64()),
                pa.scalar(w, pa.int64()),
            )
            total = hits if total is None else pc.add(total, hits)
        out = pa.table(
            {"doc_id": batch.column("doc_id"), "rank_score": total}
        ).filter(pc.greater(total, 0))
        if out.num_rows > k:
            idx = pc.sort_indices(
                out,
                sort_keys=[("rank_score", "descending"), ("doc_id", "ascending")],
            )
            out = out.take(idx[:k])
        return out

    def paginate(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch, sort_keys=[("rank_score", "descending"), ("doc_id", "ascending")]
        )
        t = batch.take(idx)
        rnk = pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64), pa.int64())
        t = t.append_column("rnk", rnk)
        return t.filter(
            pc.and_(pc.greater(t.column("rnk"), PAGE_OFFSET),
                    pc.less_equal(t.column("rnk"), PAGE_OFFSET + PAGE_LIMIT))
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["rank_score", "doc_id"], descending=[True, False])
        .limit(k)
        .repartition(1)
        .map_batches(paginate, batch_format="pyarrow")
    )


def search_snippets(sf_dir: str) -> "ray.data.Dataset":
    """F2: for docs containing the term, a fixed-window snippet around
    the FIRST occurrence plus the highlight offset within the snippet.
    start = max(0, pos - SNIPPET_WINDOW//2), len = SNIPPET_WINDOW +
    len(term)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    half = SNIPPET_WINDOW // 2
    span = SNIPPET_WINDOW + len(SEARCH_TERM)

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        pos = pc.find_substring(text, pattern=SEARCH_TERM).to_numpy(
            zero_copy_only=False
        )
        keep = pos >= 0
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        texts = text.to_pylist()
        out_snip, out_hl = [], []
        for t, p in zip(
            (texts[i] for i in np.flatnonzero(keep)), pos[keep]
        ):
            start = max(0, int(p) - half)
            out_snip.append(t[start : start + span])
            out_hl.append(int(p) - start)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "position": pa.array(pos[keep].astype(np.int64), pa.int64()),
                "snippet": pa.array(out_snip, pa.string()),
                "highlight_offset": pa.array(out_hl, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def suppression_antijoin(sf_dir: str) -> "ray.data.Dataset":
    """D3: anti-join against the ignored set (docs with doc_id %
    IGNORED_EVERY == 0 stand in for user-suppressed file hashes; at
    scale the ignored hash set is broadcast once via ray.put and tested
    inside map_batches — an anti-join with no shuffle)."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def build_ignored(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % IGNORED_EVERY == 0
        texts = batch.column("text").to_pylist()
        hashes = [
            hashlib.md5((texts[i] or "").encode()).hexdigest()
            for i in np.flatnonzero(keep)
        ]
        return pa.table({"h": pa.array(hashes, pa.string())})

    ignored = set()
    for b in ds.map_batches(build_ignored, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        ignored.update(b.column("h").to_pylist())
    ref = ray.put(ignored)

    def fn(batch: pa.Table) -> pa.Table:
        ig = ray.get(ref)
        import hashlib as hl

        texts = batch.column("text").to_pylist()
        hashes = [hl.md5((t or "").encode()).hexdigest() for t in texts]
        keep = pa.array([h not in ig for h in hashes], pa.bool_())
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "content_hash": pa.array(hashes, pa.string()),
            }
        )
        return out.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


def incremental_filter(sf_dir: str) -> "ray.data.Dataset":
    """W2: watermark-incremental selection over `events` — only rows
    with ts > WATERMARK, counted per event_type (the snapshot-diff
    analog of the polling watcher's mtime set difference)."""
    import pyarrow.dataset as pads
    from datetime import datetime

    wm = datetime.fromisoformat(WATERMARK)
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type"],
        filter=pads.field("ts") > pa.scalar(wm, pa.timestamp("us")),
    )
    return ds.groupby("event_type").aggregate(Count(alias_name="n_new"))


def queue_stats(sf_dir: str) -> "ray.data.Dataset":
    """A1/A6: status + failure_reason counts and word totals over the
    text-branch extraction statuses (the get_queue_statistics() /
    retry-recommendation analog)."""
    from .textops import extract_status

    ds = extract_status(sf_dir)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": batch.column("status"),
                "failure_reason": batch.column("failure_reason"),
                "words": batch.column("word_count"),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["status", "failure_reason"])
        .aggregate(Count(alias_name="n_docs"), Sum("words", alias_name="total_words"))
    )


# ---------------------------------------------------------------------------
# BM25 scoring (rational-idf, exact fixed-point integers)
# ---------------------------------------------------------------------------

BM25_TERMS = ("hash", "table", "scan", "merge")
BM25_SCALE = 1_000_000     # fixed-point scale of the per-term score
# k1 = 6/5, b = 3/4 folded into integer coefficients (see formula below)


def bm25_scores(sf_dir: str) -> "ray.data.Dataset":
    """Probabilistic IR scoring — BM25 with the RATIONAL idf variant,
    every arithmetic step exact integers so the DuckDB oracle matches
    bit-for-bit (the standard ln() idf is transcendental and
    libm-dependent; the rational form (N−df+½)/(df+½) = (2N−2df+1)/
    (2df+1) keeps BM25's saturation and length-normalization semantics
    while staying oracle-exact — documented variant, not an
    approximation error).

    Per term t and doc d, with tf = term count, dl = doc token count,
    N = corpus docs, T = corpus tokens (avgdl = T/N), k1 = 6/5,
    b = 3/4:

        tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
          = 44·tf·T / (20·tf·T + 6·T + 18·dl·N)      (×20T)

        score_t(d) = floor(SCALE · (2N−2df+1) · 44·tf·T /
                           ((2df+1) · (20·tf·T + 6T + 18·dl·N)))

    and bm25_fp(d) = Σ_t score_t(d), emitted for every doc matching
    ≥ 1 term.

    Plan: pass 1 computes (N, T, df per query term) as per-batch
    partial counts — the driver reads O(#terms) integers (bounded
    broadcast, the top_ngrams contract); pass 2 scores every batch
    vectorized (token counts via one unique+searchsorted against the
    term list) with zero shuffles. At 100 TB both passes stream; the
    int64 headroom assert guards the fixed-point products (T beyond
    ~1e12 tokens switches SCALE down — the documented dial)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    terms = np.array(sorted(BM25_TERMS))

    def stat_partial(batch: pa.Table) -> pa.Table:
        import re

        n_docs, n_tok = 0, 0
        df = np.zeros(len(terms), np.int64)
        for text in batch.column("text").to_pylist():
            ws = re.findall(r"[a-z0-9]+", (text or "").lower())
            n_docs += 1
            n_tok += len(ws)
            u = np.unique(np.asarray(ws, dtype=object))
            idx = np.searchsorted(terms, u)
            idx_c = np.minimum(idx, len(terms) - 1)
            df += np.bincount(
                idx_c[terms[idx_c] == u], minlength=len(terms)
            ).astype(np.int64)
        return pa.table(
            {
                "term": pa.array(["", ""] + list(terms), pa.string()),
                "n": pa.array(
                    np.concatenate(([n_docs, n_tok], df)), pa.int64()
                ),
                "kind": pa.array(
                    ["N", "T"] + ["df"] * len(terms), pa.string()
                ),
            }
        )

    stats: dict[tuple[str, str], int] = {}
    for b in (
        ds.map_batches(stat_partial, batch_format="pyarrow")
        .groupby(["kind", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    ):
        for kind, term, n in zip(
            b.column("kind").to_pylist(),
            b.column("term").to_pylist(),
            b.column("n").to_pylist(),
        ):
            stats[(kind, term)] = n
    N = stats[("N", "")]
    T = stats[("T", "")]
    df_vec = np.array([stats.get(("df", t), 0) for t in terms], np.int64)

    def score(batch: pa.Table) -> pa.Table:
        import re

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_s = [], []
        for doc_id, text in zip(ids, batch.column("text").to_pylist()):
            ws = re.findall(r"[a-z0-9]+", (text or "").lower())
            dl = len(ws)
            u, cnt = np.unique(np.asarray(ws, dtype=object), return_counts=True)
            idx = np.searchsorted(terms, u)
            idx_c = np.minimum(idx, len(terms) - 1)
            hit = terms[idx_c] == u
            if not hit.any():
                continue
            tf = np.zeros(len(terms), np.int64)
            tf[idx_c[hit]] = cnt[hit]
            m = tf > 0
            num = (2 * N - 2 * df_vec[m] + 1) * (44 * tf[m] * T) * BM25_SCALE
            den = (2 * df_vec[m] + 1) * (20 * tf[m] * T + 6 * T + 18 * dl * N)
            assert (num >= 0).all() and num.max(initial=0) < (1 << 62), (
                "fixed-point overflow headroom exceeded — lower BM25_SCALE"
            )
            out_id.append(doc_id)
            out_s.append(int((num // den).sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "bm25_fp": pa.array(out_s, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_SCALE = 1_000_000
RRF_TOP = 20
RANK_BUCKETS = 256


def _exact_desc_ranks(
    scores: "ray.data.Dataset", score_col: str
) -> "ray.data.Dataset":
    """Exact RANK() OVER (ORDER BY score DESC) for a (doc_id, score)
    relation — ties share a rank (1 + #{score' > s}), so the result is
    layout-independent with no tie-break key needed.

    The percentile_rank bucket-grid plan specialised to one global
    group: pass 1 folds per-batch bucket counts (driver reads a
    RANK_BUCKETS-int grid, builds the strictly-greater suffix counts,
    broadcasts once); pass 2 shuffles rows ONCE on their score bucket
    and ranks bucket-locally with one sort + searchsorted. Equal
    scores share a bucket by construction, so ties never straddle the
    suffix boundary."""
    from ray.data.aggregate import Max, Min

    scores = scores.materialize()  # consumed twice; int64 pairs only
    mm = scores.aggregate(Min(score_col), Max(score_col))
    lo, hi = int(mm[f"min({score_col})"]), int(mm[f"max({score_col})"])
    width = (hi - lo) // RANK_BUCKETS + 1

    def bucketed(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "s": pa.array(s, pa.int64()),
                "b": pa.array((s - lo) // width, pa.int64()),
            }
        )

    rows = scores.map_batches(bucketed, batch_format="pyarrow")

    grid = np.zeros(RANK_BUCKETS, dtype=np.int64)
    for b in (
        rows.map_batches(
            lambda t: pa.table(
                {
                    "b": pa.array(
                        np.arange(RANK_BUCKETS, dtype=np.int64), pa.int64()
                    ),
                    "n": pa.array(
                        np.bincount(
                            t.column("b").to_numpy(zero_copy_only=False),
                            minlength=RANK_BUCKETS,
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    ).iter_batches(batch_format="pyarrow"):
        grid += np.bincount(
            b.column("b").to_numpy(zero_copy_only=False),
            weights=b.column("n").to_numpy(zero_copy_only=False),
            minlength=RANK_BUCKETS,
        ).astype(np.int64)
    # strictly-greater suffix: ranks in bucket b start after every row
    # in buckets > b
    above = np.concatenate(
        (np.cumsum(grid[::-1])[::-1][1:], [0])
    ).astype(np.int64)
    above_ref = ray.put(above)

    def rank_part(part_tbl: pa.Table) -> pa.Table:
        gt = ray.get(above_ref)
        s = part_tbl.column("s").to_numpy(zero_copy_only=False)
        bs = part_tbl.column("b").to_numpy(zero_copy_only=False)
        rnk = np.empty(len(s), dtype=np.int64)
        order = np.argsort(bs, kind="stable")
        bounds = np.flatnonzero(
            np.concatenate(([True], bs[order][1:] != bs[order][:-1], [True]))
        )
        for i0, i1 in zip(bounds[:-1], bounds[1:]):
            sel = order[i0:i1]
            vals = np.sort(s[sel])
            rnk[sel] = (
                gt[bs[sel[0]]]
                + (len(vals) - np.searchsorted(vals, s[sel], side="right"))
                + 1
            )
        return pa.table(
            {
                "doc_id": part_tbl.column("doc_id"),
                "rnk": pa.array(rnk, pa.int64()),
            }
        )

    return rows.groupby("b").map_groups(rank_part, batch_format="pyarrow")


def rrf_fusion(sf_dir: str) -> "ray.data.Dataset":
    """Hybrid-retrieval rank fusion — reciprocal rank fusion (RRF,
    Cormack et al. SIGIR 2009) of two independent ranked lists over
    the SAME document corpus: the BM25 lexical list (`bm25_scores`)
    and the char-trigram fuzzy list (the F1 pg_trgm similarity shape),
    fused as  rrf(d) = Σ_lists floor(RRF_SCALE / (RRF_K + rank_l(d)))
    with a missing doc contributing 0 — all integer arithmetic, so the
    DuckDB oracle (rank() window + FULL OUTER JOIN) matches
    bit-for-bit. This is the standard production shape for combining
    lexical and similarity retrieval before a reranker.

    Scale shape: each list's exact ties-share-a-rank RANK() comes from
    the bucket-grid sort-rank (`_exact_desc_ranks` — one bounded grid
    read + one bucket shuffle per list, never a global sort); the
    fusion is one doc_id-keyed coarse shuffle of int64 triples; the
    global top-RRF_TOP is a per-partition prune to RRF_TOP rows before
    ONE final ≤ 64×RRF_TOP-row reduce. Output:
    (doc_id, rrf_fp, rank_lex, rank_tri)."""
    from ..stages.shuffle import N_COARSE_PARTS
    from .extras import FUZZY_QUERY, _char_trigrams

    lex = _exact_desc_ranks(bm25_scores(sf_dir), "bm25_fp")

    qgrams = _char_trigrams(FUZZY_QUERY)
    nq = len(qgrams)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def tri_score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_i, out_s = [], []
        for i, text in zip(ids, batch.column("text").to_pylist()):
            dgrams = _char_trigrams(text or "")
            inter = len(dgrams & qgrams)
            if inter >= 1:
                union = len(dgrams) + nq - inter
                out_i.append(int(i))
                out_s.append(inter * RRF_SCALE // union)
        return pa.table(
            {
                "doc_id": pa.array(out_i, pa.int64()),
                "tri_fp": pa.array(out_s, pa.int64()),
            }
        )

    tri = _exact_desc_ranks(
        docs.map_batches(tri_score, batch_format="pyarrow"), "tri_fp"
    )

    def contrib(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            r = batch.column("rnk").to_numpy(zero_copy_only=False)
            c = RRF_SCALE // (RRF_K + r)
            z = np.zeros(len(ids), dtype=np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "rrf_p": pa.array(c, pa.int64()),
                    "rank_lex_p": pa.array(r if which == "lex" else z, pa.int64()),
                    "rank_tri_p": pa.array(r if which == "tri" else z, pa.int64()),
                    "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
                }
            )

        return fn

    fused = lex.map_batches(contrib("lex"), batch_format="pyarrow").union(
        tri.map_batches(contrib("tri"), batch_format="pyarrow")
    )

    def local_top(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        g = df.groupby("doc_id", sort=False).agg(
            rrf_fp=("rrf_p", "sum"),
            rank_lex=("rank_lex_p", "sum"),
            rank_tri=("rank_tri_p", "sum"),
        ).reset_index()
        g = g.sort_values(
            ["rrf_fp", "doc_id"], ascending=[False, True]
        ).head(RRF_TOP)
        return pa.table(
            {
                "k": pa.array(np.zeros(len(g), np.int64), pa.int64()),
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "rrf_fp": pa.array(g["rrf_fp"].to_numpy(), pa.int64()),
                "rank_lex": pa.array(g["rank_lex"].to_numpy(), pa.int64()),
                "rank_tri": pa.array(g["rank_tri"].to_numpy(), pa.int64()),
            }
        )

    def final_top(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas().sort_values(
            ["rrf_fp", "doc_id"], ascending=[False, True]
        ).head(RRF_TOP)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "rrf_fp": pa.array(df["rrf_fp"].to_numpy(), pa.int64()),
                "rank_lex": pa.array(df["rank_lex"].to_numpy(), pa.int64()),
                "rank_tri": pa.array(df["rank_tri"].to_numpy(), pa.int64()),
            }
        )

    return (
        fused.groupby("part")
        .map_groups(local_top, batch_format="pyarrow")
        .groupby("k")
        .map_groups(final_top, batch_format="pyarrow")
    )


NDCG_K = 10
NDCG_LCM = 2520  # lcm(1..10): 2520//pos is exact for every position


def ndcg_search(sf_dir: str) -> "ray.data.Dataset":
    """Ranking-quality evaluation of the BM25 ranker — one registry
    operator grading another: the bm25_scores ordering (desc, doc_id
    tiebreak) is scored against graded relevance rel = min(total
    query-term tf, 3) with a reciprocal-rank-discounted cumulative
    gain at k=10. The discount is 1/pos instead of 1/log2(pos+1), so
    every DCG term is the exact rational gain·(2520/pos) — 2520 =
    lcm(1..10) makes each term an exact int64 — and nDCG is ONE
    division of two exact integer sums (bit-identical in any engine;
    float log2 discounts cannot be made order-independent under
    check_exact hashing). Tail-seated by design: the ranker is the
    head-adjacent bm25 machinery and the two top-10s are top_docs'
    sort-limit.

    Scale shape: the bm25 two-pass plan verbatim (bounded stats
    broadcast, vectorized scoring, zero shuffles) plus two k-row
    sort-limits; the driver touches exactly 2×k rows. Output per
    position: the ranked doc, its relevance and exact DCG numerator,
    the ideal doc/relevance/numerator, and the final ndcg ratio."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    terms = np.array(sorted(BM25_TERMS))

    def stat_partial(batch: pa.Table) -> pa.Table:
        import re

        n_docs, n_tok = 0, 0
        df = np.zeros(len(terms), np.int64)
        for text in batch.column("text").to_pylist():
            ws = re.findall(r"[a-z0-9]+", (text or "").lower())
            n_docs += 1
            n_tok += len(ws)
            u = np.unique(np.asarray(ws, dtype=object))
            idx = np.searchsorted(terms, u)
            idx_c = np.minimum(idx, len(terms) - 1)
            df += np.bincount(
                idx_c[terms[idx_c] == u], minlength=len(terms)
            ).astype(np.int64)
        return pa.table(
            {
                "term": pa.array(["", ""] + list(terms), pa.string()),
                "n": pa.array(
                    np.concatenate(([n_docs, n_tok], df)), pa.int64()
                ),
                "kind": pa.array(
                    ["N", "T"] + ["df"] * len(terms), pa.string()
                ),
            }
        )

    stats: dict[tuple[str, str], int] = {}
    for b in (
        ds.map_batches(stat_partial, batch_format="pyarrow")
        .groupby(["kind", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    ):
        for kind, term, n in zip(
            b.column("kind").to_pylist(),
            b.column("term").to_pylist(),
            b.column("n").to_pylist(),
        ):
            stats[(kind, term)] = n
    N = stats[("N", "")]
    T = stats[("T", "")]
    df_vec = np.array([stats.get(("df", t), 0) for t in terms], np.int64)

    def score_rel(batch: pa.Table) -> pa.Table:
        import re

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_s, out_r = [], [], []
        for doc_id, text in zip(ids, batch.column("text").to_pylist()):
            ws = re.findall(r"[a-z0-9]+", (text or "").lower())
            dl = len(ws)
            u, cnt = np.unique(np.asarray(ws, dtype=object), return_counts=True)
            idx = np.searchsorted(terms, u)
            idx_c = np.minimum(idx, len(terms) - 1)
            hit = terms[idx_c] == u
            if not hit.any():
                continue
            tf = np.zeros(len(terms), np.int64)
            tf[idx_c[hit]] = cnt[hit]
            m = tf > 0
            num = (2 * N - 2 * df_vec[m] + 1) * (44 * tf[m] * T) * BM25_SCALE
            den = (2 * df_vec[m] + 1) * (20 * tf[m] * T + 6 * T + 18 * dl * N)
            assert (num >= 0).all() and num.max(initial=0) < (1 << 62), (
                "fixed-point overflow headroom exceeded — lower BM25_SCALE"
            )
            out_id.append(doc_id)
            out_s.append(int((num // den).sum()))
            out_r.append(int(min(int(tf.sum()), 3)))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "bm25_fp": pa.array(out_s, pa.int64()),
                "rel": pa.array(out_r, pa.int64()),
            }
        )

    scored = ds.map_batches(score_rel, batch_format="pyarrow").materialize()
    ranked = scored.sort(["bm25_fp", "doc_id"], descending=[True, False]).limit(
        NDCG_K
    ).take_all()
    ideal = scored.sort(["rel", "doc_id"], descending=[True, False]).limit(
        NDCG_K
    ).take_all()

    pos = np.arange(1, len(ranked) + 1, dtype=np.int64)
    w = NDCG_LCM // pos
    r_rel = np.array([r["rel"] for r in ranked], np.int64)
    i_rel = np.array([r["rel"] for r in ideal], np.int64)
    contrib = ((1 << r_rel) - 1) * w
    ideal_contrib = ((1 << i_rel) - 1) * w
    ndcg = float(int(contrib.sum())) / float(int(ideal_contrib.sum()))
    return pa.table(
        {
            "pos": pa.array(pos, pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in ranked], pa.int64()),
            "rel": pa.array(r_rel, pa.int64()),
            "contrib_2520": pa.array(contrib, pa.int64()),
            "ideal_doc_id": pa.array([r["doc_id"] for r in ideal], pa.int64()),
            "ideal_rel": pa.array(i_rel, pa.int64()),
            "ideal_contrib_2520": pa.array(ideal_contrib, pa.int64()),
            "ndcg": pa.array(np.full(len(pos), ndcg), pa.float64()),
        }
    )
