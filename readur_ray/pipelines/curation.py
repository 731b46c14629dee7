"""Web-scale training-data curation operators over ``documents``.

Five pipelines a large-scale pretraining-data team runs that the
reference (a per-document extraction server) has no analog for, each
with a bit-exact DuckDB oracle in ``__ray_entry__.oracle_sql``:

- ``line_dedup``        C4-style global duplicate-line removal: a line
                        survives only at its first global occurrence
                        (min (doc_id, line_idx)), docs are reassembled
                        from surviving lines.
- ``contamination``     benchmark decontamination: fraction of each
                        training doc's word-3-shingles that appear in
                        a held-out benchmark slice (broadcast set).
- ``stratified_sample`` per-source quota sampling by md5 rank — the
                        deterministic "balance the domain mix" step.
- ``repetition_score``  Gopher-style within-doc repetition: duplicate
                        bigram fraction, integer arithmetic.
- ``fuzzy_dedup_keep``  the end of the fuzzy-dedup funnel: MinHash-LSH
                        pairs → connected components → one kept
                        representative + removed-count per cluster.
- ``pack_sequences``    LLM training sequence packing: deterministic
                        global doc order (doc_id), each doc's token
                        span placed at its exact global prefix-sum
                        offset, chunk ids at SEQ_LEN boundaries.
- ``top_ngrams``        corpus-wide heavy hitters: global top-K word
                        bigrams by count (combiner → coarse shuffle →
                        per-partition top-K prune → tiny final reduce).
- ``common_ngram_score`` bigram-LM commonness filter: fraction of each
                        doc's bigram occurrences that land in the
                        corpus's top-V bigram table (the integer-exact
                        stand-in for an n-gram-LM perplexity gate).
- ``training_shuffle``  deterministic global training-order shuffle:
                        md5-rank permutation split into SHUF_SHARDS
                        output shards with the exact 1-based position
                        of every doc inside its shard — reproducible
                        on any cluster layout, unlike random_shuffle.
- ``dup_spans``         exact duplicated-passage detection (the
                        8-gram-granular form of Lee et al. 2022
                        suffix-array substring dedup): per doc, how
                        many of its word-8-gram occurrences appear
                        more than once in the whole corpus.
- ``leakage_split``     leakage-safe train/val/test split keyed on
                        md5(source) — group-atomic (a source never
                        straddles the eval boundary), one streaming
                        pass, no shuffle.
- ``dedup_substrings``  exact substring dedup with REMOVAL (the Lee
                        et al. 2022 cleaning pass at 8-gram
                        granularity): positions covered by any
                        globally duplicated 8-gram occurrence drop,
                        docs reassemble from surviving words.
- ``quantile_gate``     per-source EXACT length-percentile filter
                        ([p10, p90] of n_chars): distinct-length
                        combiner → per-source cumulative pick →
                        broadcast thresholds → one streaming pass
                        (the data-derived outlier-length gate).
- ``mix_weights``       temperature-sampled domain-mixing weights
                        (tau = 0.5): per-source sampling weight
                        proportional to sqrt(n_docs), the p_s ∝ n_s^a
                        rebalance rule of XLM / T5
                        examples-proportional mixing, in exact
                        integer math (isqrt + ppm floor division).

Scale shapes (100 TB):
- line_dedup is TWO coarse shuffles: lines partition by crc32(line)
  for global winner election (one vectorized pass per partition), the
  survivors re-partition by doc_id for reassembly. Line text rides the
  shuffle because reassembly needs it back; everything else is int64.
- contamination broadcasts the BENCHMARK shingle set (eval suites are
  MBs, not TBs — documented contract) via one ``ray.put``; the corpus
  side is a single streaming pass, no shuffle.
- stratified_sample prunes to ≤K rows per (source, block) locally
  before the per-source reduce, so the shuffle moves O(K·blocks) rows,
  never the corpus (same plan as analytics.hash_sample_docs).
- repetition_score is a single pass, no shuffle.
- fuzzy_dedup_keep adds one partial-count combine + tiny coarse
  reduce on top of dedup.neardup_components (already contraction-based).
- pack_sequences is the textbook distributed prefix sum: pass 1 emits
  per-doc token counts bucketed by doc_id RANGE (PACK_BUCKETS buckets,
  width derived from a column-pruned min/max pass); per-bucket totals
  (one int64 per bucket) prefix-sum on the driver and broadcast; pass
  2 shuffles only (doc_id, n_tokens) int64 pairs — never text — and
  finishes each bucket with a local sort + cumsum. Bucket count is the
  memory dial: scale PACK_BUCKETS with n so a bucket's 16 B/doc group
  fits a worker (at 10^12 docs, 2^16 buckets → 244 MB/group).
- top_ngrams / common_ngram_score share one counting plan: per-batch
  Counter COMBINER (bounds the shuffle at one row per distinct bigram
  per batch — Zipf makes this the whole ballgame), coarse crc32 shuffle,
  per-partition sum + top-max(K,V) prune (keys are partition-disjoint,
  so the global top-K survives pruning), final reduce over ≤64·K rows.
  common_ngram_score then broadcasts ONLY the V winning bigrams (one
  ray.put, KBs) and streams the corpus once more — the n-gram-LM-filter
  shape: small model out of a big corpus, applied in a single pass.
- dup_spans is two coarse shuffles of int64-only rows: (doc_id,
  gram_hash, occ) occurrence rows partition by gram hash (per-doc
  Counter combiner folds within-doc repeats before the wire), each
  partition computes exact global gram counts vectorized and sends
  per-doc duplicated-occurrence partials back by doc_id; seed rows
  carry per-doc totals so zero-gram docs still appear. Gram text never
  ships — only 60-bit md5 hashes (the SQL oracle hashes identically,
  so even a collision cannot diverge the comparison).
- mix_weights is the smallest possible shuffle: a per-batch
  value_counts COMBINER emits one row per (source, block); the
  per-source sum over that set is the only exchange. Source
  cardinality is the stratum count (small by the contract
  stratified_sample documents), so the final normalization reads the
  per-source sums — take_all bounded by #sources, never the corpus —
  and emits one row per source.
- training_shuffle reuses the prefix-sum primitive once per shard:
  positions need only per-(shard, rank-prefix-bucket) COUNTS (a
  SHUF_SHARDS×SHUF_RBUCKETS int64 grid) prefix-summed on the driver;
  the rank-prefix bucket is monotone in the md5 rank, so a bucket-local
  sort + arange lands every doc at its exact global in-shard position.
  Only (doc_id, rank) pairs shuffle; bucket count is the memory dial.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.textstats import md5_hex, shingles_of, words_of
from ..stages.shuffle import N_COARSE_PARTS, str_partition

BENCH_MOD = 20        # doc_id % BENCH_MOD == 0 → the held-out benchmark slice
CONTAM_NUM = 1        # contaminated iff n_overlap * 10 >= n_shingles * 1
CONTAM_DEN = 10
STRATUM_K = 20        # sample quota per source stratum
REP_NUM = 1           # repetitive iff (total - distinct) * 5 >= total * 1
REP_DEN = 5


def _read_docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# C4-style global line dedup
# ---------------------------------------------------------------------------

def line_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Global duplicate-line removal with reassembly: per doc the line
    count before/after and sha256 of the surviving text ('\\n'-joined
    in original order). Winner per distinct line = min (doc_id,
    line_idx); later occurrences anywhere (including within the same
    doc) drop."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def line_rows(batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_idx: list[int] = []
        out_line: list[str] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            lines = (text or "").split("\n")
            out_id.extend([doc_id] * len(lines))
            out_idx.extend(range(1, len(lines) + 1))
            out_line.extend(lines)
        # COMBINER (hot-line guard): min-by-(doc_id, line_idx) is
        # associative, so keep only the batch-local first occurrence of
        # each distinct line before the shuffle. Web corpora are full of
        # hot lines ("" and boilerplate repeat billions of times); without
        # this every occurrence lands in one partition — with it the
        # shuffle carries at most one row per distinct line per batch.
        import pandas as pd

        df = (
            pd.DataFrame({"i": out_id, "x": out_idx, "l": out_line})
            .sort_values(["l", "i", "x"], kind="stable")
            .drop_duplicates("l", keep="first")
        )
        lines_u = df["l"].tolist()
        return pa.table(
            {
                "doc_id": pa.array(df["i"].to_numpy(), pa.int64()),
                "line_idx": pa.array(df["x"].to_numpy(), pa.int64()),
                "line": pa.array(lines_u, pa.string()),
                "part": pa.array(str_partition(lines_u), pa.int64()),
            }
        )

    def winners_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["doc_id", "line_idx", "line"]).to_pandas()
        df = df.sort_values(
            ["line", "doc_id", "line_idx"], kind="stable"
        ).drop_duplicates("line", keep="first")
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "line_idx": pa.array(df["line_idx"].to_numpy(), pa.int64()),
                "line": pa.array(df["line"], pa.string()),
                "kind": pa.array(np.ones(len(df), dtype=np.int64), pa.int64()),
                "part": pa.array(
                    df["doc_id"].to_numpy() % N_COARSE_PARTS, pa.int64()
                ),
            }
        )

    kept = (
        docs.map_batches(line_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(winners_part, batch_format="pyarrow")
    )

    # seed rows guarantee every doc appears in reassembly even when all
    # of its lines lost, and carry the pre-dedup line count
    def seed_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_lines = np.array(
            [len((t or "").split("\n")) for t in batch.column("text").to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "line_idx": pa.array(n_lines, pa.int64()),  # carries n_lines
                "line": pa.array([""] * len(ids), pa.string()),
                "kind": pa.array(np.zeros(len(ids), dtype=np.int64), pa.int64()),
                "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
            }
        )

    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")

    def reassemble_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        seed = df[df["kind"] == 0][["doc_id", "line_idx"]].rename(
            columns={"line_idx": "n_lines"}
        )
        keptd = df[df["kind"] == 1].sort_values(
            ["doc_id", "line_idx"], kind="stable"
        )
        agg = (
            keptd.groupby("doc_id", sort=False)
            .agg(
                kept_lines=("line", "size"),
                kept_text=("line", lambda s: "\n".join(s)),
            )
            .reset_index()
        )
        out = seed.merge(agg, on="doc_id", how="left")
        out["kept_lines"] = out["kept_lines"].fillna(0).astype(np.int64)
        out["kept_text"] = out["kept_text"].fillna("")
        sha = [
            hashlib.sha256(t.encode("utf-8")).hexdigest() for t in out["kept_text"]
        ]
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "n_lines": pa.array(out["n_lines"].to_numpy(), pa.int64()),
                "kept_lines": pa.array(out["kept_lines"].to_numpy(), pa.int64()),
                "kept_sha256": pa.array(sha, pa.string()),
            }
        )

    return (
        seeds.union(kept)
        .groupby("part")
        .map_groups(reassemble_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def contamination(sf_dir: str) -> "ray.data.Dataset":
    """Benchmark n-gram overlap: docs with doc_id % BENCH_MOD == 0 form
    the held-out benchmark; every other doc reports how many of its
    distinct word-3-shingles appear in the benchmark set and an integer
    contaminated flag (overlap ≥ 10%).

    The benchmark shingle set is collected once on the driver and
    broadcast with ``ray.put`` — bounded by BENCHMARK size (the
    contract: eval suites are MBs). At 100 TB-corpus/large-benchmark
    scale the same query becomes the shuffle form: explode target
    shingles, coarse-partition by shingle hash, anti-join per
    partition — the jaccard plan with the bench side as the index."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bench_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = ids % BENCH_MOD == 0
        out: set[str] = set()
        for text in batch.filter(pa.array(mask)).column("text").to_pylist():
            out.update(shingles_of(text or "", 3))
        return pa.table({"s": pa.array(sorted(out), pa.string())})

    bench_parts = docs.map_batches(bench_shingles, batch_format="pyarrow")
    bench: set[str] = set()
    for b in bench_parts.iter_batches(batch_format="pyarrow"):
        bench.update(b.column("s").to_pylist())
    bench_ref = ray.put(frozenset(bench))

    def score(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tgt = batch.filter(pa.array(ids % BENCH_MOD != 0))
        out_id, out_n, out_ov, out_flag = [], [], [], []
        for doc_id, text in zip(
            tgt.column("doc_id").to_pylist(), tgt.column("text").to_pylist()
        ):
            sh = shingles_of(text or "", 3)
            n = len(sh)
            ov = sum(1 for s in sh if s in bset)
            out_id.append(doc_id)
            out_n.append(n)
            out_ov.append(ov)
            out_flag.append(1 if n > 0 and ov * CONTAM_DEN >= n * CONTAM_NUM else 0)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_shingles": pa.array(out_n, pa.int64()),
                "n_overlap": pa.array(out_ov, pa.int64()),
                "contaminated": pa.array(out_flag, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stratified (per-source) deterministic sampling
# ---------------------------------------------------------------------------

def stratified_sample(sf_dir: str) -> "ray.data.Dataset":
    """STRATUM_K docs per source with the smallest md5('samp:'||doc_id)
    — the reproducible domain-mix rebalance (same sample on any cluster
    layout, unlike random_sample). Local per-(block, source) top-K
    prune bounds the reduce input at K·blocks rows; the final
    per-source groupby touches only pruned survivors (source
    cardinality is the stratum count — small by contract)."""
    ds = _read_docs(sf_dir, ["doc_id", "source"])

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "source"]).to_pandas()
        df["sample_rank"] = [
            hashlib.md5(f"samp:{i}".encode()).hexdigest() for i in df["doc_id"]
        ]
        df = (
            df.sort_values(["source", "sample_rank", "doc_id"], kind="stable")
            .groupby("source", sort=False)
            .head(STRATUM_K)
        )
        return pa.table(
            {
                "source": pa.array(df["source"], pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "sample_rank": pa.array(df["sample_rank"], pa.string()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["sample_rank", "doc_id"], kind="stable"
        ).head(STRATUM_K)
        return pa.table(
            {
                "source": pa.array(df["source"], pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "sample_rank": pa.array(df["sample_rank"], pa.string()),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# exact per-group percentile length gate
# ---------------------------------------------------------------------------

Q_LO_NUM, Q_LO_DEN = 1, 10    # lower gate: percentile_disc(0.1)
Q_HI_NUM, Q_HI_DEN = 9, 10    # upper gate: percentile_disc(0.9)


def quantile_gate(sf_dir: str) -> "ray.data.Dataset":
    """Per-source exact length-percentile gate: keep documents whose
    ``n_chars`` lies within [p10, p90] of their source's length
    distribution — the Gopher/C4-family outlier-length filter, made
    EXACT and distributed (reference analog: the min/max size filters
    of /root/reference/src/services/file_service.rs, generalized from
    fixed caps to data-derived per-domain thresholds).

    Two-pass plan (the shape that survives 10^12 rows):

    1. thresholds — per-batch ``(source, n_chars)`` pre-count inside
       ``map_batches`` (the combiner: one row per distinct length per
       batch, never one per doc) → ``groupby(source)`` over the
       pre-reduced partials → per-source sorted cumulative count →
       discrete percentile pick. A group's size is bounded by the
       DISCRETE length domain (≤ the 50 MB text cap), not corpus rows.
    2. gate — the per-source threshold table (ONE row per source,
       bounded by the stratum contract stratified_sample documents) is
       the only driver materialization; it is broadcast via one
       ``ray.put`` and applied as a vectorized filter in a single
       streaming pass — no second shuffle.

    Percentile semantics mirror DuckDB's ``percentile_disc(p)``
    exactly: the sorted group's value at 1-indexed position
    ``max(ceil(p*n), 1)`` — integer arithmetic only, so the gate is
    bit-stable under any partitioning."""
    ds = _read_docs(sf_dir, ["source", "n_chars"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "n_chars"]).aggregate(
            [("n_chars", "count")]
        )
        return pa.table(
            {
                "source": g.column("source"),
                "n_chars": g.column("n_chars"),
                "n": g.column("n_chars_count").cast(pa.int64()),
            }
        )

    def thresholds(group: pa.Table) -> pa.Table:
        df = group.to_pandas().groupby("n_chars", sort=True)["n"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cum = df.to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])

        def pick(num: int, den: int) -> int:
            pos = max(-(-(num * n) // den), 1)  # ceil(p*n), 1-indexed
            return int(vals[np.searchsorted(cum, pos, side="left")])

        return pa.table(
            {
                "source": pa.array([group.column("source")[0].as_py()]),
                "lo_chars": pa.array([pick(Q_LO_NUM, Q_LO_DEN)], pa.int64()),
                "hi_chars": pa.array([pick(Q_HI_NUM, Q_HI_DEN)], pa.int64()),
            }
        )

    th_rows = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("source")
        .map_groups(thresholds, batch_format="pyarrow")
        .take_all()  # bounded: one row per source (stratum contract)
    )
    th_ref = ray.put(
        {r["source"]: (r["lo_chars"], r["hi_chars"]) for r in th_rows}
    )

    def gate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        th = ray.get(th_ref)
        # dictionary-encode so Python touches one entry per DISTINCT
        # source in the batch, never one per row
        enc = pc.dictionary_encode(batch.column("source").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary.to_pylist()
        lo_u = np.array([th[s][0] for s in uniq], dtype=np.int64)
        hi_u = np.array([th[s][1] for s in uniq], dtype=np.int64)
        lo, hi = lo_u[codes], hi_u[codes]
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        keep = (nc >= lo) & (nc <= hi)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "source": batch.column("source").filter(pa.array(keep)),
                "n_chars": batch.column("n_chars").filter(pa.array(keep)),
                "lo_chars": pa.array(lo[keep], pa.int64()),
                "hi_chars": pa.array(hi[keep], pa.int64()),
            }
        )

    docs = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])
    return docs.map_batches(gate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# leakage-safe group split
# ---------------------------------------------------------------------------

SPLIT_MOD = 100       # md5(source) bucket space
SPLIT_TRAIN = 80      # bucket < 80 → train
SPLIT_VAL = 90        # 80 ≤ bucket < 90 → val, else test


def leakage_split(sf_dir: str) -> "ray.data.Dataset":
    """Train/val/test assignment keyed on md5 of the GROUP (source),
    not the row: every document from one origin lands in the same
    split, so near-duplicate documents within a source can never
    straddle the train/eval boundary (the leakage mode a per-row
    random split causes). 80/10/10 by ``md5('split:'||source) %
    SPLIT_MOD`` — deterministic on any cluster layout.

    Scale shape (100 TB): one streaming pass, no shuffle — the split
    is a pure function of the source string, so no coordination or
    group materialization is needed (contrast with stratified
    sampling, which must rank within the group).
    """
    docs = _read_docs(sf_dir, ["doc_id", "source"])

    def assign(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        buckets = np.array(
            [
                int(hashlib.md5(f"split:{s}".encode()).hexdigest()[:8], 16)
                % SPLIT_MOD
                for s in srcs
            ],
            dtype=np.int64,
        )
        split = np.where(
            buckets < SPLIT_TRAIN, "train",
            np.where(buckets < SPLIT_VAL, "val", "test"),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# temperature-sampled domain-mixing weights
# ---------------------------------------------------------------------------

MIX_PPM = 1_000_000   # weight resolution: parts-per-million


def mix_weights(sf_dir: str) -> pa.Table:
    """Per-source sampling weight proportional to sqrt(n_docs) — the
    temperature-sampling rebalance p_s ∝ n_s^a (a = 0.5) used for
    multilingual / domain mixing (XLM's alpha-smoothed sampling, T5's
    examples-proportional mixing), kept bit-exact by integer math:
    ``weight_sqrt = isqrt(n_docs)`` (``floor(sqrt(double(n)))`` is
    exact for n < 2^52, far above any per-source doc count) and
    ``weight_ppm = weight_sqrt * MIX_PPM // total_weight``.

    Scale shape (100 TB): a per-batch ``value_counts`` combiner emits
    one int64 row per (source, block) — the only thing that crosses
    the wire — then ``groupby(source).sum`` over that tiny set. The
    final normalization needs the global weight total, so it reads
    the per-source sums with ``take_all`` bounded by #sources (the
    stratum count, small by the same contract ``stratified_sample``
    documents), never the corpus, and returns one row per source.
    """
    import math

    import pyarrow.compute as pc

    ds = _read_docs(sf_dir, ["source"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("source"))
        return pa.table(
            {
                "source": vc.field("values"),
                "n_partial": pa.array(
                    vc.field("counts").to_numpy(zero_copy_only=False), pa.int64()
                ),
            }
        )

    rows = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("source")
        .sum("n_partial")
        .take_all()
    )  # O(#sources) rows by contract
    rows.sort(key=lambda r: r["source"])
    sources = [r["source"] for r in rows]
    n_docs = np.array([r["sum(n_partial)"] for r in rows], dtype=np.int64)
    w = np.array([math.isqrt(int(c)) for c in n_docs], dtype=np.int64)
    total = int(w.sum())
    ppm = np.array([int(x) * MIX_PPM // total for x in w], dtype=np.int64)
    return pa.table(
        {
            "source": pa.array(sources, pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "weight_sqrt": pa.array(w, pa.int64()),
            "weight_ppm": pa.array(ppm, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Gopher-style within-doc repetition
# ---------------------------------------------------------------------------

def repetition_score(sf_dir: str) -> "ray.data.Dataset":
    """Duplicate-bigram fraction per doc in integer arithmetic:
    repetitive iff (total - distinct) * REP_DEN >= total * REP_NUM
    (≥ 20% of word bigrams are repeats). Single streaming pass."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        out_tot, out_dist, out_flag = [], [], []
        for text in batch.column("text").to_pylist():
            ws = words_of(text or "")
            if len(ws) >= 2:
                grams = [f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)]
                tot, dist = len(grams), len(set(grams))
            else:
                tot = dist = 0
            out_tot.append(tot)
            out_dist.append(dist)
            out_flag.append(
                1 if tot > 0 and (tot - dist) * REP_DEN >= tot * REP_NUM else 0
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bigrams_total": pa.array(out_tot, pa.int64()),
                "bigrams_distinct": pa.array(out_dist, pa.int64()),
                "repetitive": pa.array(out_flag, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fuzzy-dedup funnel: components → kept representative per cluster
# ---------------------------------------------------------------------------

def fuzzy_dedup_keep(sf_dir: str) -> "ray.data.Dataset":
    """One row per near-dup cluster: its kept representative (the
    component id — min doc_id by construction), cluster size, and the
    number of docs fuzzy dedup removes. Partial per-batch counts
    combine before the coarse reduce, so the shuffle carries one row
    per (batch, component), never per doc."""
    from .dedup import neardup_components

    comp = neardup_components(sf_dir)

    def partial_counts(batch: pa.Table) -> pa.Table:
        cids = batch.column("component_id").to_numpy(zero_copy_only=False)
        uc, counts = np.unique(cids, return_counts=True)
        return pa.table(
            {
                "component_id": pa.array(uc, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
                "part": pa.array(uc % N_COARSE_PARTS, pa.int64()),
            }
        )

    def final_counts(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["component_id", "cnt"]).to_pandas()
        out = df.groupby("component_id", sort=False)["cnt"].sum().reset_index()
        size = out["cnt"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "component_id": pa.array(out["component_id"].to_numpy(), pa.int64()),
                "group_size": pa.array(size, pa.int64()),
                "n_removed": pa.array(size - 1, pa.int64()),
            }
        )

    return (
        comp.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_counts, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# LLM training sequence packing (distributed prefix sum)
# ---------------------------------------------------------------------------

SEQ_LEN = 256         # tokens per packed training sequence
PACK_BUCKETS = 256    # doc_id range buckets (the scale dial, see module doc)


def pack_sequences(sf_dir: str) -> "ray.data.Dataset":
    """Place every doc's token span (BPE-ish tokens + 1 EOS) at its
    exact global offset under deterministic doc_id order, and report
    which SEQ_LEN-token training chunks it lands in: (doc_id, n_tokens,
    start_offset, first_chunk, last_chunk, n_chunks). Offsets are a
    distributed prefix sum — per-bucket totals to the driver (one int64
    per bucket), cumsum, broadcast, then a bucket-local sort+cumsum."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    from ..functions.textstats import token_stats

    path = f"{sf_dir}/documents.parquet"
    lohi = ray.data.read_parquet(path, columns=["doc_id"]).aggregate(
        Min("doc_id"), Max("doc_id")
    )
    lo, hi = int(lohi["min(doc_id)"]), int(lohi["max(doc_id)"])
    width = (hi - lo) // PACK_BUCKETS + 1

    def tok_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = token_stats(batch.column("text"))["bpe_tokens"].to_numpy(
            zero_copy_only=False
        ) + 1  # +1 EOS per doc
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
                "bucket": pa.array((ids - lo) // width, pa.int64()),
            }
        )

    toks = ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        tok_batch, batch_format="pyarrow"
    )

    # pass 1: per-bucket token totals (PACK_BUCKETS int64s total)
    def bucket_totals(batch: pa.Table) -> pa.Table:
        acc = np.zeros(PACK_BUCKETS, dtype=np.int64)
        np.add.at(
            acc,
            batch.column("bucket").to_numpy(zero_copy_only=False),
            batch.column("n_tokens").to_numpy(zero_copy_only=False),
        )
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "tok_sum": pa.array(acc[nz], pa.int64()),
            }
        )

    totals = np.zeros(PACK_BUCKETS, dtype=np.int64)
    for b in toks.map_batches(bucket_totals, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(
            totals,
            b.column("bucket").to_numpy(zero_copy_only=False),
            b.column("tok_sum").to_numpy(zero_copy_only=False),
        )
    base = np.concatenate(([0], np.cumsum(totals)[:-1]))
    base_ref = ray.put(base)

    # pass 2: bucket-local sort + cumsum on (doc_id, n_tokens) pairs only
    def pack_bucket(part_tbl: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        df = part_tbl.to_pandas().sort_values("doc_id", kind="stable")
        n = df["n_tokens"].to_numpy()
        start = bases[int(df["bucket"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        first_chunk = start // SEQ_LEN
        last_chunk = (start + n - 1) // SEQ_LEN
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "start_offset": pa.array(start, pa.int64()),
                "first_chunk": pa.array(first_chunk, pa.int64()),
                "last_chunk": pa.array(last_chunk, pa.int64()),
                "n_chunks": pa.array(last_chunk - first_chunk + 1, pa.int64()),
            }
        )

    return toks.groupby("bucket").map_groups(pack_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-wide bigram heavy hitters + bigram-LM commonness filter
# ---------------------------------------------------------------------------

NGRAM_K = 50          # heavy-hitter report size
NGRAM_V = 100         # "LM vocabulary": top-V bigrams used for scoring
COMMON_NUM = 1        # common iff bigrams_common * 2 >= bigrams_total * 1
COMMON_DEN = 2


def _bigram_candidates(docs: "ray.data.Dataset", keep: int) -> "ray.data.Dataset":
    """Global bigram counts, pruned to the per-partition top-``keep``
    by (cnt DESC, g ASC). Partitions hold disjoint bigram sets, so the
    global top-``keep`` is a subset of the union of survivors."""

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in batch.column("text").to_pylist():
            ws = words_of(text or "")
            c.update(f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1))
        gs = list(c.keys())
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "cnt": pa.array([c[g] for g in gs], pa.int64()),
                "part": pa.array(str_partition(gs), pa.int64()),
            }
        )

    def reduce_part(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.select(["g", "cnt"]).to_pandas()
        out = df.groupby("g", sort=False)["cnt"].sum().reset_index()
        out = out.sort_values(
            ["cnt", "g"], ascending=[False, True], kind="stable"
        ).head(keep)
        return pa.table(
            {
                "g": pa.array(out["g"], pa.string()),
                "cnt": pa.array(out["cnt"].to_numpy(), pa.int64()),
                "fin": pa.array(np.zeros(len(out), dtype=np.int64), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def top_ngrams(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-wide top-NGRAM_K word bigrams: (ngram, cnt, rank) with
    deterministic (cnt DESC, ngram ASC) ordering. The per-batch Counter
    combiner means the shuffle carries at most one row per distinct
    bigram per batch, and the final reduce sees ≤ 64·K pruned rows."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    cand = _bigram_candidates(docs, NGRAM_K)

    def final(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["g", "cnt"]).to_pandas()
        df = df.sort_values(
            ["cnt", "g"], ascending=[False, True], kind="stable"
        ).head(NGRAM_K)
        return pa.table(
            {
                "ngram": pa.array(df["g"], pa.string()),
                "cnt": pa.array(df["cnt"].to_numpy(), pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(df) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return cand.groupby("fin").map_groups(final, batch_format="pyarrow")


def common_ngram_score(sf_dir: str) -> "ray.data.Dataset":
    """Bigram-LM commonness per doc: how many of its bigram OCCURRENCES
    (with multiplicity) are in the corpus top-NGRAM_V bigram table, and
    an integer `common` flag at ≥ 1/2 — the exact-arithmetic stand-in
    for an n-gram-LM perplexity gate. The broadcast side is V strings
    (one ray.put); the corpus streams once more, no shuffle."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    cand = _bigram_candidates(docs, NGRAM_V)

    rows: list[tuple[int, str]] = []
    for b in cand.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b.column("cnt").to_pylist(), b.column("g").to_pylist()))
    rows.sort(key=lambda t: (-t[0], t[1]))
    topv_ref = ray.put(frozenset(g for _, g in rows[:NGRAM_V]))

    def score(batch: pa.Table) -> pa.Table:
        topv = ray.get(topv_ref)
        out_tot, out_com, out_flag = [], [], []
        for text in batch.column("text").to_pylist():
            ws = words_of(text or "")
            grams = [f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)]
            tot = len(grams)
            com = sum(1 for g in grams if g in topv)
            out_tot.append(tot)
            out_com.append(com)
            out_flag.append(
                1 if tot > 0 and com * COMMON_DEN >= tot * COMMON_NUM else 0
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bigrams_total": pa.array(out_tot, pa.int64()),
                "bigrams_common": pa.array(out_com, pa.int64()),
                "common": pa.array(out_flag, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic global training-order shuffle
# ---------------------------------------------------------------------------

SHUF_SHARDS = 8       # training output shards
SHUF_RBUCKETS = 32    # md5-rank prefix buckets per shard (memory dial)


def training_shuffle(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, shard, pos): the deterministic training-order shuffle.
    rank = md5('shuf:'||doc_id); shard = uint64(rank[:8]) % SHUF_SHARDS;
    pos = exact 1-based position of the doc inside its shard under
    (rank, doc_id) order. Positions come from the prefix-sum primitive:
    the rank's first byte gives a bucket MONOTONE in rank, per-(shard,
    bucket) counts prefix-sum on the driver (a SHUF_SHARDS×SHUF_RBUCKETS
    int64 grid), and each bucket finishes with a local sort + arange."""

    def rank_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rk = [hashlib.md5(f"shuf:{i}".encode()).hexdigest() for i in ids]
        shard = np.array([int(r[:8], 16) % SHUF_SHARDS for r in rk], dtype=np.int64)
        # first byte of the rank: 256 values folded monotonically into
        # SHUF_RBUCKETS buckets (equal first byte -> equal bucket, so
        # bucket boundaries never split a rank tie — md5 ranks are
        # distinct anyway)
        rbucket = np.array(
            [int(r[:2], 16) * SHUF_RBUCKETS // 256 for r in rk], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "rank": pa.array(rk, pa.string()),
                "shard": pa.array(shard, pa.int64()),
                "key": pa.array(shard * SHUF_RBUCKETS + rbucket, pa.int64()),
            }
        )

    docs = _read_docs(sf_dir, ["doc_id"])
    ranked = docs.map_batches(rank_batch, batch_format="pyarrow")

    # pass 1: per-(shard, rbucket) counts -> driver prefix sums per shard
    def key_counts(batch: pa.Table) -> pa.Table:
        uc, counts = np.unique(
            batch.column("key").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "key": pa.array(uc, pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    grid = np.zeros(SHUF_SHARDS * SHUF_RBUCKETS, dtype=np.int64)
    for b in ranked.map_batches(key_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(
            grid,
            b.column("key").to_numpy(zero_copy_only=False),
            b.column("cnt").to_numpy(zero_copy_only=False),
        )
    g2 = grid.reshape(SHUF_SHARDS, SHUF_RBUCKETS)
    bases = np.concatenate(
        (np.zeros((SHUF_SHARDS, 1), dtype=np.int64), np.cumsum(g2, axis=1)[:, :-1]),
        axis=1,
    ).reshape(-1)
    bases_ref = ray.put(bases)

    # pass 2: bucket-local sort + arange at the broadcast base offset
    def place(part_tbl: pa.Table) -> pa.Table:
        bases_ = ray.get(bases_ref)
        df = part_tbl.to_pandas().sort_values(["rank", "doc_id"], kind="stable")
        base = int(bases_[int(df["key"].iloc[0])])
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "shard": pa.array(df["shard"].to_numpy(), pa.int64()),
                "pos": pa.array(
                    base + np.arange(1, len(df) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return ranked.groupby("key").map_groups(place, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact duplicated-passage detection (8-gram granularity)
# ---------------------------------------------------------------------------

DUP_GRAM_N = 8        # words per passage gram
DUP_NUM = 1           # flagged iff grams_dup * 5 >= grams_total * 1
DUP_DEN = 5


def dup_spans(sf_dir: str) -> "ray.data.Dataset":
    """Per doc: total word-8-gram occurrences, how many of those
    occurrences are globally duplicated (the gram appears ≥ 2 times
    corpus-wide, counting multiplicity), and an integer flag at ≥ 20% —
    the copied-passage signal that document-level MinHash misses. Two
    int64-only coarse shuffles; see the module docstring."""
    from ..functions.textstats import md5_int60

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_id, out_gh, out_occ = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = words_of(text or "")
            c: Counter = Counter(
                md5_int60(" ".join(ws[i : i + DUP_GRAM_N]))
                for i in range(len(ws) - DUP_GRAM_N + 1)
            )
            out_id.extend([doc_id] * len(c))
            out_gh.extend(c.keys())
            out_occ.extend(c.values())
        gh = np.array(out_gh, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "gh": pa.array(gh, pa.int64()),
                "occ": pa.array(out_occ, pa.int64()),
                "part": pa.array(gh % N_COARSE_PARTS, pa.int64()),
            }
        )

    def dup_partials(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.select(["doc_id", "gh", "occ"]).to_pandas()
        gtot = df.groupby("gh", sort=False)["occ"].transform("sum")
        dup = (
            df[gtot >= 2]
            .groupby("doc_id", sort=False)["occ"]
            .sum()
            .reset_index()
        )
        ids = dup["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "val": pa.array(dup["occ"].to_numpy().astype(np.int64), pa.int64()),
                "kind": pa.array(np.ones(len(ids), dtype=np.int64), pa.int64()),
                "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
            }
        )

    dup_side = (
        docs.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_partials, batch_format="pyarrow")
    )

    def seed_totals(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tot = np.array(
            [
                max(len(words_of(t or "")) - DUP_GRAM_N + 1, 0)
                for t in batch.column("text").to_pylist()
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "val": pa.array(tot, pa.int64()),
                "kind": pa.array(np.zeros(len(ids), dtype=np.int64), pa.int64()),
                "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
            }
        )

    seeds = docs.map_batches(seed_totals, batch_format="pyarrow")

    def combine_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        tot = df[df["kind"] == 0].set_index("doc_id")["val"]
        dup = df[df["kind"] == 1].groupby("doc_id")["val"].sum()
        dup = dup.reindex(tot.index, fill_value=0)
        t = tot.to_numpy().astype(np.int64)
        d = dup.to_numpy().astype(np.int64)
        flag = ((t > 0) & (d * DUP_DEN >= t * DUP_NUM)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(tot.index.to_numpy(), pa.int64()),
                "grams_total": pa.array(t, pa.int64()),
                "grams_dup": pa.array(d, pa.int64()),
                "dup_flag": pa.array(flag, pa.int64()),
            }
        )

    return (
        seeds.union(dup_side)
        .groupby("part")
        .map_groups(combine_part, batch_format="pyarrow")
    )


def dedup_substrings(sf_dir: str) -> "ray.data.Dataset":
    """Exact substring dedup with REMOVAL (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better" — public; the suffix-array pass, at word-8-gram
    granularity): a word position is dropped iff it is covered by any
    occurrence of a GLOBALLY duplicated 8-gram (appears ≥ 2 times
    corpus-wide, counting multiplicity, within-doc repeats included);
    docs are reassembled from the surviving words. Per doc: word count,
    words removed, sha256 of the ' '-joined surviving lowercased words
    — `dup_spans` detects copied passages, this op CLEANS them.

    Scale shape — two coarse shuffles, int64-only on the gram leg:
    occurrence rows (gh, doc_id, pos) partition by gram hash; each
    partition computes global counts vectorized and emits dup START
    rows (doc_id, pos) back on a doc_id-keyed shuffle, where seed rows
    carry each doc's text once for reassembly (the same union +
    co-partition plan as line_dedup). Unlike dup_spans, removal cannot
    Counter-fold occurrences (every position matters), so a hot gram
    contributes its whole occurrence mass to one partition —
    N_COARSE_PARTS is the dial, and the 60-bit md5 gram hash spreads
    everything else uniformly. Coverage per doc is O(n) via a cumsum
    over start flags, never a per-position scan of starts."""
    from ..functions.textstats import md5_int60

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def occ_rows(batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_gh: list[int] = []
        out_pos: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = words_of(text or "")
            n_g = len(ws) - DUP_GRAM_N + 1
            for i in range(max(n_g, 0)):
                out_gh.append(md5_int60(" ".join(ws[i : i + DUP_GRAM_N])))
                out_pos.append(i + 1)  # 1-indexed, matches the oracle
            out_id.extend([doc_id] * max(n_g, 0))
        gh = np.array(out_gh, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "gh": pa.array(gh, pa.int64()),
                "part": pa.array(gh % N_COARSE_PARTS, pa.int64()),
            }
        )

    def dup_starts(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.select(["doc_id", "pos", "gh"]).to_pandas()
        gtot = df.groupby("gh", sort=False)["gh"].transform("size")
        d = df[gtot >= 2]
        ids = d["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(d["pos"].to_numpy(), pa.int64()),
                "text": pa.array([""] * len(ids), pa.string()),
                "kind": pa.array(np.ones(len(ids), dtype=np.int64), pa.int64()),
                "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
            }
        )

    dup_side = (
        docs.map_batches(occ_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_starts, batch_format="pyarrow")
    )

    def seed_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(np.zeros(len(ids), dtype=np.int64), pa.int64()),
                "text": batch.column("text"),
                "kind": pa.array(np.zeros(len(ids), dtype=np.int64), pa.int64()),
                "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
            }
        )

    seeds = docs.map_batches(seed_rows, batch_format="pyarrow")

    def reassemble(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        starts = df[df["kind"] == 1].groupby("doc_id", sort=False)["pos"]
        starts = {k: v.to_numpy() for k, v in starts}
        out_id, out_n, out_rm, out_sha = [], [], [], []
        for doc_id, text in df[df["kind"] == 0][["doc_id", "text"]].itertuples(
            index=False
        ):
            ws = words_of(text or "")
            n = len(ws)
            s = np.zeros(n + 1, dtype=np.int64)  # 1-indexed start flags
            st = starts.get(doc_id)
            if st is not None:
                s[st] = 1
            c = np.cumsum(s)  # s[0] == 0, so c[p] = sum s[1..p]
            p = np.arange(1, n + 1)
            hi = np.minimum(p, max(n - DUP_GRAM_N + 1, 0))
            lo = np.maximum(p - DUP_GRAM_N + 1, 1)
            covered = c[hi] - c[lo - 1] > 0  # any dup start in [lo, hi]
            kept = [w for w, cv in zip(ws, covered) if not cv]
            out_id.append(doc_id)
            out_n.append(n)
            out_rm.append(int(covered.sum()))
            out_sha.append(hashlib.sha256(" ".join(kept).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_words": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "kept_sha256": pa.array(out_sha, pa.string()),
            }
        )

    return (
        seeds.union(dup_side)
        .groupby("part")
        .map_groups(reassemble, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# distributed uniform bottom-k sampler
# ---------------------------------------------------------------------------

BOTTOMK = 100         # global sample size


def bottomk_sample(sf_dir: str) -> "ray.data.Dataset":
    """Uniform random-without-replacement sample of BOTTOMK docs via
    md5-priority bottom-k (the classic distributed-reservoir
    equivalent: assign each row priority md5(doc_id), keep the k
    smallest — every k-subset is equally likely under the hash's
    uniformity, and the result is independent of partitioning,
    arrival order and cluster layout, unlike an actual reservoir).

    Scale shape: ONE streaming pass. Each batch prunes itself to its
    local bottom-k (argpartition, O(batch) not O(batch log batch)),
    so at most k rows per block survive to the final merge — bottom-k
    is a mergeable sketch (bottom-k of unions == bottom-k of
    bottom-ks), which also makes the sample refreshable across runs:
    union last run's k winners with a new shard's k winners and take
    bottom-k again. The final sort touches <= k * n_blocks pruned
    rows, never the corpus. Complements ``stratified_sample`` (fixed
    quota PER STRATUM) with the global unconditioned sample a
    curation pipeline draws for eval slices and human audits."""
    ds = _read_docs(sf_dir, ["doc_id", "source"])

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pri = np.array([md5_hex(str(i)) for i in ids])
        if len(ids) > BOTTOMK:
            keep = np.argpartition(pri, BOTTOMK)[:BOTTOMK]
        else:
            keep = np.arange(len(ids))
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "source": batch.column("source").take(pa.array(keep)),
                "priority": pa.array(pri[keep], pa.string()),
            }
        )

    return (
        ds.map_batches(local_bottomk, batch_format="pyarrow")
        .sort(["priority", "doc_id"])
        .limit(BOTTOMK)
    )


# ---------------------------------------------------------------------------
# MOSS winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003)
# ---------------------------------------------------------------------------

WINNOW_K = 4   # words per k-gram
WINNOW_W = 4   # grams per winnowing window


def winnow_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """MOSS winnowing: per doc, hash every word-WINNOW_K-gram (60-bit
    md5, the dup_spans convention), slide a WINNOW_W-gram window and
    select the window minimum — rightmost position on ties, the MOSS
    rule — then keep the distinct selections (doc_id, pos, gh).
    Winnowing guarantees any shared run of >= WINNOW_K + WINNOW_W - 1
    words yields a shared fingerprint, with density 2/(w+1) — the
    LOCAL plagiarism/copy detector that complements the document-level
    MinHash and passage-level dup_spans signals.

    Scale shape: a single streaming pass, no shuffle — each doc's
    selection is independent. The sliding-window argmin is one numpy
    pass (reverse-argmin gives the rightmost-tie rule); only selected
    (int64, int64, int64) rows leave the task. Downstream matching is
    one coarse shuffle on gh — the dup_spans plan verbatim."""
    from numpy.lib.stride_tricks import sliding_window_view

    from ..functions.textstats import md5_int60

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def winnow_batch(batch: pa.Table) -> pa.Table:
        out_id, out_pos, out_gh = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = words_of(text or "")
            n_g = len(ws) - WINNOW_K + 1
            if n_g < WINNOW_W:  # no full window → no fingerprints
                continue
            h = np.array(
                [
                    md5_int60(" ".join(ws[i : i + WINNOW_K]))
                    for i in range(n_g)
                ],
                dtype=np.int64,
            )
            wv = sliding_window_view(h, WINNOW_W)
            # rightmost argmin: argmin of the reversed window is the
            # FIRST minimum from the right
            idx = WINNOW_W - 1 - np.argmin(wv[:, ::-1], axis=1)
            pos = np.unique(np.arange(len(wv), dtype=np.int64) + idx)
            out_id.extend([doc_id] * len(pos))
            out_pos.extend(pos + 1)  # 1-based, matching the SQL UNNEST
            out_gh.extend(h[pos])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "gh": pa.array(np.array(out_gh, dtype=np.int64), pa.int64()),
            }
        )

    return docs.map_batches(winnow_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PMI collocation discovery (pointwise mutual information, exact integers)
# ---------------------------------------------------------------------------

PMI_MIN_CNT = 5    # minimum bigram support
PMI_K = 50         # report size
PMI_SCALE = 100    # fixed-point scale for the PMI ratio


def pmi_bigrams(sf_dir: str) -> "ray.data.Dataset":
    """Top-PMI_K collocations: bigrams with support >= PMI_MIN_CNT
    ranked by quantized PMI — the monotone integer surrogate
    ``pmi_q = (cnt_ab · total_words · PMI_SCALE) // (cnt_a · cnt_b)``
    (dropping the log keeps the ranking and the arithmetic exact;
    ties break by cnt DESC then bigram ASC). The collocation signal a
    tokenizer-vocabulary or phrase-mining stage consumes.

    Scale shape: two coarse shuffles, both on crc32(word) — stage 1
    reduces bigram partials by first-word partition and joins cnt_a
    (all occurrences of word w as a unigram AND as a bigram head land
    in part crc32(w), so the join is partition-local); stage 2 re-keys
    by second word, joins cnt_b from the SAME partition map, computes
    pmi_q and prunes to a per-partition top-PMI_K (disjoint bigram
    sets make the global top-K a subset of the survivors); the final
    reduce sorts <= 64·PMI_K rows. total_words is one scalar
    aggregate. Unigram counts are never broadcast — they ride the
    shuffle co-partitioned with the bigrams that need them."""
    from collections import Counter

    docs = _read_docs(sf_dir, ["text"])

    def n_words(batch: pa.Table) -> pa.Table:
        n = sum(len(words_of(t or "")) for t in batch.column("text").to_pylist())
        return pa.table({"n": pa.array([n], pa.int64())})

    total_words = int(
        docs.map_batches(n_words, batch_format="pyarrow").sum("n")
    )

    def partials(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        big: Counter = Counter()
        for text in batch.column("text").to_pylist():
            ws = words_of(text or "")
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
        w1 = [a for a, _ in big] + list(uni)
        w2 = [b for _, b in big] + [""] * len(uni)
        cnt = np.array(
            list(big.values()) + list(uni.values()), dtype=np.int64
        )
        kind = np.concatenate(
            [np.zeros(len(big), np.int64), np.ones(len(uni), np.int64)]
        )
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
                "cnt_a": pa.array(np.zeros(len(cnt), np.int64), pa.int64()),
                "kind": pa.array(kind, pa.int64()),
                "part": pa.array(str_partition(w1), pa.int64()),
            }
        )

    def join_cnt_a(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        uni = df[df["kind"] == 1].groupby("w1")["cnt"].sum()
        big = (
            df[df["kind"] == 0]
            .groupby(["w1", "w2"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        big = big[big["cnt"] >= PMI_MIN_CNT]
        cnt_a = big["w1"].map(uni).to_numpy().astype(np.int64)
        # pass the global unigram counts through unchanged (same part:
        # stage 2 needs cnt_b at part crc32(w2) == crc32(w) here)
        out_w1 = list(big["w1"]) + list(uni.index)
        out_w2 = list(big["w2"]) + [""] * len(uni)
        out_cnt = np.concatenate(
            [big["cnt"].to_numpy().astype(np.int64), uni.to_numpy().astype(np.int64)]
        )
        out_cnt_a = np.concatenate([cnt_a, np.zeros(len(uni), np.int64)])
        kind = np.concatenate(
            [np.zeros(len(big), np.int64), np.ones(len(uni), np.int64)]
        )
        part = np.concatenate(
            [
                str_partition(list(big["w2"])) if len(big) else np.array([], np.int64),
                str_partition(list(uni.index)) if len(uni) else np.array([], np.int64),
            ]
        ).astype(np.int64)
        return pa.table(
            {
                "w1": pa.array(out_w1, pa.string()),
                "w2": pa.array(out_w2, pa.string()),
                "cnt": pa.array(out_cnt, pa.int64()),
                "cnt_a": pa.array(out_cnt_a, pa.int64()),
                "kind": pa.array(kind, pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def join_cnt_b(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        uni = df[df["kind"] == 1].set_index("w1")["cnt"]
        big = df[df["kind"] == 0]
        if not len(big):
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "pmi_q": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        cnt_ab = big["cnt"].to_numpy().astype(np.int64)
        cnt_a = big["cnt_a"].to_numpy().astype(np.int64)
        cnt_b = big["w2"].map(uni).to_numpy().astype(np.int64)
        pmi_q = (cnt_ab * total_words * PMI_SCALE) // (cnt_a * cnt_b)
        t = pd.DataFrame(
            {
                "bigram": big["w1"].to_numpy() + " " + big["w2"].to_numpy(),
                "cnt": cnt_ab,
                "pmi_q": pmi_q,
            }
        ).sort_values(
            ["pmi_q", "cnt", "bigram"], ascending=[False, False, True]
        ).head(PMI_K)
        return pa.table(
            {
                "bigram": pa.array(list(t["bigram"]), pa.string()),
                "cnt": pa.array(t["cnt"].to_numpy(), pa.int64()),
                "pmi_q": pa.array(t["pmi_q"].to_numpy(), pa.int64()),
                "part": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def final_topk(part_tbl: pa.Table) -> pa.Table:
        df = (
            part_tbl.select(["bigram", "cnt", "pmi_q"])
            .to_pandas()
            .sort_values(
                ["pmi_q", "cnt", "bigram"], ascending=[False, False, True]
            )
            .head(PMI_K)
        )
        return pa.table(
            {
                "bigram": pa.array(list(df["bigram"]), pa.string()),
                "cnt": pa.array(df["cnt"].to_numpy(), pa.int64()),
                "pmi_q": pa.array(df["pmi_q"].to_numpy(), pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(df) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(join_cnt_a, batch_format="pyarrow")
        .groupby("part")
        .map_groups(join_cnt_b, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis–Spirakis shape, exact-integer keys)
# ---------------------------------------------------------------------------

WSAMPLE_K = 100


def weighted_sample(sf_dir: str) -> "ray.data.Dataset":
    """Weight-proportional-ish sample: keep the WSAMPLE_K docs with the
    smallest priority = md5_60('wsamp:'||doc_id) // n_chars — the
    integer surrogate of Efraimidis–Spirakis A-ES keys (u^(1/w) order
    ≈ hash/w order): doubling a doc's length doubles its selection
    odds, deterministically and layout-independently. Docs with
    n_chars = 0 are excluded (zero weight).

    Scale shape: identical to bottomk_sample — per-block bottom-k
    prune (priority is a mergeable bottom-k sketch: bottom-k of unions
    == bottom-k of bottom-ks), tiny global sort over <= k·n_blocks
    survivors. The weighted variant a mixture-curation pipeline draws
    when sampling proportional to token mass instead of uniformly."""
    from ..functions.textstats import md5_int60

    ds = _read_docs(sf_dir, ["doc_id", "n_chars"])

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False)
        m = w > 0
        ids, w = ids[m], w[m]
        pri = np.array(
            [md5_int60(f"wsamp:{i}") for i in ids], dtype=np.int64
        ) // w.astype(np.int64)
        if len(ids) > WSAMPLE_K:
            keep = np.argpartition(pri, WSAMPLE_K)[:WSAMPLE_K]
        else:
            keep = np.arange(len(ids))
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "weight": pa.array(w[keep].astype(np.int64), pa.int64()),
                "priority": pa.array(pri[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(local_bottomk, batch_format="pyarrow")
        .sort(["priority", "doc_id"])
        .limit(WSAMPLE_K)
    )


# ---------------------------------------------------------------------------
# distributed BPE vocabulary learning (tokenizer training)
# ---------------------------------------------------------------------------

BPE_TOP_WORDS = 4096   # candidate dictionary cap (the bounded-driver contract)
BPE_MERGES = 16        # merge table size to learn
BPE_EOW = "</w>"       # end-of-word marker (Sennrich et al. 2016)


def _bpe_learn(word_counts: list[tuple[str, int]], n_merges: int):
    """Textbook BPE on a (word, count) dictionary: repeatedly merge the
    most frequent adjacent symbol pair (count DESC, pair ASC tie-break).
    Shared by the pipeline and the pytest naive-reference parity test."""
    from collections import Counter

    seqs = {
        w: tuple(list(w) + [BPE_EOW]) for w, _ in word_counts
    }
    counts = dict(word_counts)
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, seq in seqs.items():
            c = counts[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((left, right, cnt))
        fused = left + right
        for w, seq in seqs.items():
            if left not in seq:
                continue
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def bpe_merges(sf_dir: str):
    """Learn a BPE merge table over the corpus (Sennrich et al. 2016,
    arXiv:1508.07909) — the tokenizer-training stage of an LLM data
    pipeline. Returns (rank, left, right, pair_count) for BPE_MERGES
    merges.

    Scale shape — exactly how production trainers split the work: the
    CORPUS-scale pass is one distributed word count (per-batch Counter
    combiner → crc32(word) coarse shuffle → per-partition totals with
    a top-(BPE_TOP_WORDS/64) prune); the merge loop then runs on the
    BOUNDED word-frequency dictionary (≤ BPE_TOP_WORDS rows — the
    documented driver-read contract, like the k×dim centroid sums),
    never on the corpus. Iterative string rewriting is not
    SQL-expressible, so this entry is rows-only for the driver;
    bit-parity is pinned by pytest against the naive single-process
    reference (same _bpe_learn on a Counter of the same corpus)."""
    import pandas as pd
    from collections import Counter

    docs = _read_docs(sf_dir, ["text"])
    # partitions hold disjoint word sets, so each must keep its own
    # full top-V for the global top-V to be exact: the driver read is
    # bounded at V · N_COARSE_PARTS rows (≤ 262k), never the vocabulary
    per_part_keep = BPE_TOP_WORDS

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column("text").to_pylist():
            c.update(words_of(text or ""))
        wds = list(c)
        return pa.table(
            {
                "w": pa.array(wds, pa.string()),
                "cnt": pa.array([c[w] for w in wds], pa.int64()),
                "part": pa.array(str_partition(wds), pa.int64()),
            }
        )

    def reduce_part(part_tbl: pa.Table) -> pa.Table:
        df = (
            part_tbl.select(["w", "cnt"])
            .to_pandas()
            .groupby("w", sort=False)["cnt"]
            .sum()
            .reset_index()
            .sort_values(["cnt", "w"], ascending=[False, True])
            .head(per_part_keep)
        )
        return pa.table(
            {
                "w": pa.array(list(df["w"]), pa.string()),
                "cnt": pa.array(df["cnt"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    survivors = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
        .to_pandas()
    )
    top = survivors.sort_values(
        ["cnt", "w"], ascending=[False, True], ignore_index=True
    ).head(BPE_TOP_WORDS)
    merges = _bpe_learn(
        list(zip(top["w"], top["cnt"].astype(int))), BPE_MERGES
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(merges) + 1, dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "pair_count": np.array([m[2] for m in merges], dtype=np.int64),
        }
    )


# ---------------------------------------------------------------------------
# content-defined chunking (Gear rolling hash — storage-dedup class)
# ---------------------------------------------------------------------------

CDC_WINDOW = 64        # gear hash effective window (bytes)
CDC_MASK_BITS = 6      # boundary when the rolling hash's low 6 bits are 0
                       # (expected chunk ~64 B — sized to the test corpus;
                       # production uses 12-13 bits for ~4-8 KiB chunks)

_GEAR: np.ndarray | None = None


def _gear_table() -> np.ndarray:
    """256 deterministic 60-bit gear constants (md5-derived — the
    public Gear/FastCDC construction, no RNG, reproducible anywhere)."""
    global _GEAR
    if _GEAR is None:
        import hashlib

        _GEAR = np.array(
            [
                int(hashlib.md5(f"gear:{b}".encode()).hexdigest()[:15], 16)
                for b in range(256)
            ],
            dtype=np.int64,
        )
    return _GEAR


def _cdc_boundaries(data: bytes) -> np.ndarray:
    """Boundary positions (exclusive ends) of content-defined chunks:
    position i ends a chunk when the 64-byte gear hash
    h_i = Σ_{k=0..63} gear[b_{i-k}] << k (mod 2^64) has its low
    CDC_MASK_BITS bits zero. Vectorized as 64 shifted adds — no
    per-byte Python. Pure content-defined (no min/max skip), so
    boundaries are stable under ANY edit outside the 64-byte window —
    the property that makes chunk-level dedup survive insertions."""
    n = len(data)
    if n == 0:
        return np.array([], dtype=np.int64)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    g = _gear_table()[b]
    h = np.zeros(n, dtype=np.int64)
    for k in range(min(CDC_WINDOW, n)):
        # gear values of the byte k positions back, shifted by k
        shifted = np.empty(n, dtype=np.int64)
        shifted[:k] = 0
        shifted[k:] = g[: n - k] if k else g
        with np.errstate(over="ignore"):
            h += shifted << k
    mask = (1 << CDC_MASK_BITS) - 1
    ends = np.flatnonzero((h & mask) == 0) + 1
    if len(ends) == 0 or ends[-1] != n:
        ends = np.concatenate([ends, [n]])
    return ends.astype(np.int64)


def cdc_chunks(sf_dir: str) -> "ray.data.Dataset":
    """Content-defined chunking over document text bytes (Gear rolling
    hash, the FastCDC family) — the storage-dedup primitive: chunk
    boundaries depend only on local content, so identical passages in
    different documents produce identical chunks, and the corpus
    dedupes at chunk grain for incremental transfer/storage. Returns
    (doc_id, chunk_no, length, chunk_hash) per chunk.

    Rows-only for the driver BY DESIGN: the data-dependent rolling
    hash is not SQL-expressible; bit-parity vs a byte-at-a-time naive
    reference is pinned in tests/test_cdc.py. Scale shape: one
    streaming pass, no shuffle (the downstream chunk-level dedup is
    the dup_spans/line_dedup coarse-hash winner plan at chunk grain)."""
    import hashlib

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def chunk_batch(batch: pa.Table) -> pa.Table:
        out_id, out_no, out_len, out_h = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            data = (text or "").encode("utf-8")
            ends = _cdc_boundaries(data)
            starts = np.concatenate([[0], ends[:-1]])
            for no, (s, e) in enumerate(zip(starts, ends), start=1):
                out_id.append(doc_id)
                out_no.append(no)
                out_len.append(int(e - s))
                # hash the raw BYTES (a boundary may split a multi-byte
                # char, so no utf-8 round-trip)
                out_h.append(
                    int(hashlib.md5(bytes(data[s:e])).hexdigest()[:15], 16)
                )
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_no": pa.array(out_no, pa.int64()),
                "length": pa.array(out_len, pa.int64()),
                "chunk_hash": pa.array(np.array(out_h, dtype=np.int64), pa.int64()),
            }
        )

    return docs.map_batches(chunk_batch, batch_format="pyarrow")


COV_K = 4  # selection budget; the oracle unrolls exactly K rounds


def coverage_greedy(sf_dir: str) -> "ray.data.Dataset":
    """Greedy max-coverage data selection over 3-shingle sets — the
    SUBMODULAR-selection class (facility location / coreset picking
    for training-data curation): pick COV_K documents maximizing the
    UNION of covered shingles, one greedy round at a time. Greedy is
    (1 - 1/e)-optimal for monotone submodular objectives (Nemhauser,
    Wolsey & Fisher 1978); the diversity-selection step quality gates
    and dedup cannot express (they score docs independently — this
    objective is a function of the SET chosen so far).

    Output: (round_no, doc_id, gain, covered_total) — the doc picked
    each round, its exact marginal gain |hset \\ covered|, and the
    cumulative covered-universe size. Ties break to min doc_id.

    Scale shape: K streaming passes over the memoized (doc_id, hset)
    materialization shared with ppjoin_exact. Each pass is one
    vectorized map_batches (searchsorted against the SORTED covered
    array — a bounded broadcast: <= sum of the K winners' set sizes,
    one ray.put per round) emitting ONE candidate row per batch (the
    batch-local argmax, carrying its hset), then a driver reduce over
    #batches rows. No shuffle at all; driver state is K ids + the
    covered array. At 10^12 docs the K-pass cost is the dial: lazy
    greedy (Minoux 1978) or stochastic greedy (Mirzasoleiman et al.
    2015) cut passes to ~1 epsilon-approximate pass — the exact
    K-pass form here is the oracle-checkable base case."""
    from .dedup import _gather_slices, _list_col_views, _pp_sets_materialized

    sets = _pp_sets_materialized(sf_dir)
    covered = np.empty(0, np.int64)
    selected: list[int] = []
    rows: list[tuple[int, int, int, int]] = []
    for rnd in range(1, COV_K + 1):
        cov_ref = ray.put(np.sort(covered))
        sel_ref = ray.put(np.array(sorted(selected), dtype=np.int64))

        def best_part(
            batch: pa.Table, cov_ref=cov_ref, sel_ref=sel_ref
        ) -> pa.Table:
            cov = ray.get(cov_ref)
            sel = ray.get(sel_ref)
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            flat, offs = _list_col_views(batch.column("hset"))
            # window to THIS batch's slice (a sliced ListArray's
            # .values spans the whole block)
            flat = flat[offs[0] : offs[-1]]
            offs = offs - offs[0]
            if ids.size == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "gain": pa.array([], pa.int64()),
                        "hset": pa.array([], pa.list_(pa.int64())),
                    }
                )
            # marginal gain: count of hset elements NOT in covered
            # (hsets are distinct-per-doc by construction)
            pos = np.searchsorted(cov, flat)
            pos_c = np.minimum(pos, max(cov.size - 1, 0))
            hit = (cov.size > 0) & (
                cov[pos_c] == flat if cov.size else np.zeros(flat.size, bool)
            )
            new = (~hit).astype(np.int64)
            gains = np.add.reduceat(new, offs[:-1])
            gains[offs[:-1] == offs[1:]] = 0  # reduceat empty-slice quirk
            gains[np.isin(ids, sel)] = -1  # never re-pick a winner
            w = int(np.lexsort((ids, -gains))[0])
            return pa.table(
                {
                    "doc_id": pa.array([int(ids[w])], pa.int64()),
                    "gain": pa.array([int(gains[w])], pa.int64()),
                    "hset": pa.array(
                        [flat[offs[w] : offs[w + 1]].tolist()],
                        pa.list_(pa.int64()),
                    ),
                }
            )

        cands = sets.map_batches(best_part, batch_format="pyarrow").take_all()
        best = min(cands, key=lambda r: (-r["gain"], r["doc_id"]))
        covered = np.union1d(covered, np.asarray(best["hset"], dtype=np.int64))
        selected.append(int(best["doc_id"]))
        rows.append((rnd, int(best["doc_id"]), int(best["gain"]), int(covered.size)))

    return ray.data.from_arrow(
        pa.table(
            {
                "round_no": pa.array([r[0] for r in rows], pa.int64()),
                "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                "gain": pa.array([r[2] for r in rows], pa.int64()),
                "covered_total": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )


HH_K = 40     # heavy = count * HH_K > total tokens (phi = 1/40)
MG_CAP = 64   # per-batch Misra-Gries capacity; error <= n_batch/(MG_CAP+1)


def heavy_hitters_exact(sf_dir: str) -> "ray.data.Dataset":
    """EXACT phi-frequent tokens (count > N/HH_K) via the two-pass
    Misra-Gries guarantee — the sound heavy-hitter class. The
    `top_ngrams` Counter-prune keeps each batch's top-K and can in
    principle drop an item that is never batch-locally hot yet heavy
    globally; Misra-Gries summaries are MERGEABLE with a proven bound
    (Agarwal et al., Mergeable Summaries, PODS'12): per batch the
    summary weight w(x) = max(0, c(x) − t) with t the (MG_CAP+1)-th
    largest batch count satisfies w(x) ≥ c(x) − n_batch/(MG_CAP+1),
    so summed over batches  Σw(x) ≥ C(x) − N/(MG_CAP+1)  and EVERY
    true heavy hitter survives the candidate filter
    Σw·HH_K·(MG_CAP+1) > N·(MG_CAP+1−HH_K). Pass 2 then counts the
    ≤ ~N/(N/HH_K − N/(MG_CAP+1)) ≈ 100 candidates exactly.

    Scale shape: pass 1 emits ≤ MG_CAP summary rows per batch plus a
    1-row total partial — one tiny groupby(token) Sum, driver reads
    only the filtered candidate list; pass 2 is a streaming broadcast
    count (sorted candidate array + searchsorted per batch) and a
    second tiny Sum. No token ever shuffles un-summarized; both
    passes' wire cost is O(batches × MG_CAP) rows total."""
    import re
    from collections import Counter

    from ray.data.aggregate import Sum
    from ..stages.shuffle import N_COARSE_PARTS

    path = f"{sf_dir}/documents.parquet"
    word_re = re.compile(r"[a-z0-9]+")

    def mg_summary(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column("text").to_pylist():
            c.update(word_re.findall((text or "").lower()))
        n_batch = sum(c.values())
        toks = np.array(list(c.keys()), dtype=object)
        cnts = np.array(list(c.values()), dtype=np.int64)
        if len(cnts) > MG_CAP:
            t = np.partition(cnts, len(cnts) - (MG_CAP + 1))[
                len(cnts) - (MG_CAP + 1)
            ]
        else:
            t = 0
        w = cnts - t
        keep = w > 0
        return pa.table(
            {
                "token": pa.array(
                    list(toks[keep]) + ["\x00total"], pa.string()
                ),
                "w": pa.array(
                    np.concatenate((w[keep], [n_batch])), pa.int64()
                ),
            }
        )

    summaries = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(mg_summary, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("w", alias_name="sw"))
        .to_pandas()
    )  # bounded driver read: <= batches x MG_CAP pre-reduced rows,
    #    ~1 row per surviving candidate after the Sum
    n_total = int(summaries.loc[summaries["token"] == "\x00total", "sw"].iloc[0])
    cand = summaries[summaries["token"] != "\x00total"]
    keep = (
        cand["sw"].to_numpy() * HH_K * (MG_CAP + 1)
        > n_total * (MG_CAP + 1 - HH_K)
    )
    cand_arr = np.sort(cand["token"].to_numpy()[keep].astype(object))
    cand_ref = ray.put(cand_arr)

    def exact_counts(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        c: Counter = Counter()
        for text in batch.column("text").to_pylist():
            c.update(word_re.findall((text or "").lower()))
        toks = np.array(list(c.keys()), dtype=object)
        cnts = np.array(list(c.values()), dtype=np.int64)
        if len(cands) == 0 or len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n_p": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(cands, toks)
        pos_c = np.minimum(pos, len(cands) - 1)
        hit = cands[pos_c] == toks
        return pa.table(
            {
                "token": pa.array(list(toks[hit]), pa.string()),
                "n_p": pa.array(cnts[hit], pa.int64()),
            }
        )

    def final_filter(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        keep = n * HH_K > n_total
        return pa.table(
            {
                "token": batch.column("token").filter(pa.array(keep)),
                "n": pa.array(n[keep], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(exact_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_p", alias_name="n"))
        .map_batches(final_filter, batch_format="pyarrow")
    )


def _bpe_apply(word: str, ranks: dict) -> int:
    """Number of BPE symbols `word` encodes to under the trained merge
    table (rank-ordered greedy application — textbook apply step).
    Shared by the pipeline and the naive-parity test."""
    seq = list(word) + [BPE_EOW]
    for (left, right), _rank in sorted(ranks.items(), key=lambda kv: kv[1]):
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return len(seq)


class BpeEncoder:
    """Warm tokenizer actor: the trained merge table is fetched ONCE
    per actor from the object store and every distinct word's encoded
    length is memoized across batches — the stateful-stage pattern
    (ST1): setup in __init__, per-batch work in __call__."""

    def __init__(self, merges_ref):
        self._ranks = {
            (l, r): i for i, (l, r, _c) in enumerate(ray.get(merges_ref))
        }
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        word_re = re.compile(r"[a-z0-9]+")
        ids, n_words, n_toks = [], [], []
        for i, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            ws = word_re.findall((text or "").lower())
            total = 0
            for w in ws:
                got = self._cache.get(w)
                if got is None:
                    got = self._cache[w] = _bpe_apply(w, self._ranks)
                total += got
            ids.append(i)
            n_words.append(len(ws))
            n_toks.append(total)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_toks, pa.int64()),
            }
        )


def bpe_encode(sf_dir: str) -> "ray.data.Dataset":
    """Tokenizer APPLY — encode every document with the merge table
    `bpe_merges` trains, reporting per-doc word and BPE-token counts
    (the token-budget accounting step every training-data pipeline
    runs after tokenizer training; Sennrich et al. 2016 apply phase).

    Scale shape: training happens once (the bpe_merges pipeline — a
    bounded 4096-word dictionary reduce); the merge table (BPE_MERGES
    rows) is ray.put ONCE and applied by a warm ACTOR POOL whose
    per-word encodings memoize across batches (Zipf makes the cache
    hit rate ~1 after the first batches). Iterative string rewriting
    is not SQL-expressible — rows-only by design; bit-parity with the
    naive reference apply is pinned in pytest instead."""
    merges = bpe_merges(sf_dir)  # pandas DataFrame, BPE_MERGES rows
    merges_ref = ray.put(
        list(zip(merges["left"], merges["right"], merges["pair_count"]))
    )
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        BpeEncoder,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_args=(merges_ref,),
    )


QUOTA_BUDGET = 200  # total sample size the apportionment distributes


def quota_sample(sf_dir: str) -> "ray.data.Dataset":
    """Proportional stratified sampling with EXACT Hamilton
    largest-remainder apportionment — the survey-sampling class:
    a fixed total budget B is split across sources as
    q_s = ⌊B·n_s/N⌋ plus one extra seat for the ⌊·⌋-remainder's
    largest values (ties → source ASC) so Σ q_s = B exactly —
    the property `stratified_sample`'s independent per-group rates
    cannot give (their total drifts). Each source then contributes
    its q_s docs with the smallest md5(doc_id) (the deterministic
    bottom-k "random" order `bottomk_sample` pins), rank attached.

    Scale shape: pass 1 is a per-batch source-count combiner → tiny
    groupby — the driver reads ONLY #sources rows, computes the
    apportionment in exact integers and broadcasts the quota dict
    once. Pass 2 is the grouped-bottom-k mergeable prune: each batch
    keeps ≤ q_s rows per source (a group's shuffled footprint is
    q_s × #batches max), ONE coarse source shuffle, finalizer re-runs
    the same kernel. Output: (doc_id, source, rk ≤ quota)."""
    import hashlib

    from ray.data.aggregate import Sum
    from ..stages.shuffle import N_COARSE_PARTS, str_partition

    path = f"{sf_dir}/documents.parquet"

    def src_counts(batch: pa.Table) -> pa.Table:
        t = batch.group_by("source").aggregate([([], "count_all")])
        return pa.table(
            {
                "source": t.column("source"),
                "n_p": t.column("count_all").cast(pa.int64()),
            }
        )

    grid = (
        ray.data.read_parquet(path, columns=["source"])
        .map_batches(src_counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_p", alias_name="ns"))
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )  # bounded driver read: one row per source
    ns = grid["ns"].to_numpy().astype(np.int64)
    n_total = int(ns.sum())
    base = QUOTA_BUDGET * ns // n_total
    rem = QUOTA_BUDGET * ns % n_total
    extra = QUOTA_BUDGET - int(base.sum())
    order = np.lexsort((np.arange(len(ns)), -rem))  # rem DESC, source ASC
    quota = base.copy()
    quota[order[:extra]] += 1
    quotas = dict(zip(grid["source"], quota.astype(int)))
    qref = ray.put(quotas)

    def _prune(ids, srcs, digests, qmap):
        order = np.lexsort((digests, srcs))
        s_sorted = srcs[order]
        idx = np.arange(len(s_sorted), dtype=np.int64)
        flags = np.empty(len(s_sorted), dtype=bool)
        if len(s_sorted):
            flags[0] = True
            flags[1:] = s_sorted[1:] != s_sorted[:-1]
        start = np.maximum.accumulate(np.where(flags, idx, 0))
        rank = idx - start
        caps = np.array([qmap.get(s, 0) for s in s_sorted], dtype=np.int64)
        keep = rank < caps
        return order[keep], rank[keep]

    def local_prune(batch: pa.Table) -> pa.Table:
        qmap = ray.get(qref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        srcs = np.asarray(batch.column("source").to_pylist(), dtype=object)
        digests = np.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids],
            dtype=object,
        )
        kept, _ = _prune(ids, srcs, digests, qmap)
        return pa.table(
            {
                "doc_id": pa.array(ids[kept], pa.int64()),
                "source": pa.array(list(srcs[kept]), pa.string()),
                "digest": pa.array(list(digests[kept]), pa.string()),
                "part": pa.array(
                    str_partition(srcs[kept], N_COARSE_PARTS), pa.int64()
                ),
            }
        )

    def finalize(part_tbl: pa.Table) -> pa.Table:
        qmap = ray.get(qref)
        ids = part_tbl.column("doc_id").to_numpy(zero_copy_only=False)
        srcs = np.asarray(part_tbl.column("source").to_pylist(), dtype=object)
        digests = np.asarray(part_tbl.column("digest").to_pylist(), dtype=object)
        kept, rank = _prune(ids, srcs, digests, qmap)
        return pa.table(
            {
                "doc_id": pa.array(ids[kept], pa.int64()),
                "source": pa.array(list(srcs[kept]), pa.string()),
                "rk": pa.array(rank + 1, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(path, columns=["doc_id", "source"])
        .map_batches(local_prune, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finalize, batch_format="pyarrow")
    )


def weighted_median(sf_dir: str) -> "ray.data.Dataset":
    """Exact WEIGHTED lower median — per return flag, the smallest
    price (integer cents) whose cumulative quantity weight reaches
    half the group's total quantity: the weighted order-statistic
    class (volume-weighted typical price, fairness thresholds —
    `median_by_type` / `quantile_gate` are its weight≡1 special
    case; a quantity-weighted median resists the cheap-line-item
    flood an unweighted median falls for).

    Scale shape — the quantile_gate discrete-domain plan generalized
    to weights: per-batch (flag, cents) → SUM(qty) pre-reduction (one
    row per distinct price per batch, never one per line item) → one
    groupby(flag) over pre-reduced partials → per-group sorted
    cumulative weight → the 2·cum ≥ total pick. A group's shuffled
    size is bounded by the DISCRETE price domain, not corpus rows;
    pure integers end to end. Output:
    (l_returnflag, w_median_cents, total_qty)."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "f": batch.column("l_returnflag"),
                "c": pa.array(cents, pa.int64()),
                "q": pa.array(qty, pa.int64()),
            }
        ).group_by(["f", "c"]).aggregate([("q", "sum")])
        return pa.table(
            {
                "f": t.column("f"),
                "c": t.column("c"),
                "q": t.column("q_sum").cast(pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        df = group.to_pandas().groupby("c", sort=True)["q"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cum = df.to_numpy(dtype=np.int64).cumsum()
        total = int(cum[-1])
        v = int(vals[np.searchsorted(2 * cum, total, side="left")])
        return pa.table(
            {
                "l_returnflag": pa.array(
                    [group.column("f")[0].as_py()], pa.string()
                ),
                "w_median_cents": pa.array([v], pa.int64()),
                "total_qty": pa.array([total], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("f")
        .map_groups(pick, batch_format="pyarrow")
    )


def best_benchmark_match(sf_dir: str) -> "ray.data.Dataset":
    """Leak ATTRIBUTION — for every non-benchmark document, WHICH
    benchmark document it shares the most distinct word-3-shingles
    with (ties → min benchmark id): `contamination` flags that a doc
    overlaps the eval suite; this asymmetric best-match names the
    offending benchmark item, which is what a decontamination report
    hands to a human (and the join key for removing the whole leaked
    family). Docs sharing nothing are omitted.

    Scale shape: the benchmark inverted index (shingle → sorted bench
    ids, CSR layout: one sorted shingle array + offsets + a flat id
    array) is collected once and broadcast with ONE ray.put — bounded
    by benchmark size, the same eval-suites-are-MBs contract
    contamination documents. Scoring is a single streaming pass: per
    doc, searchsorted into the shingle array, gather the touched id
    ranges, one np.unique for per-bench counts, argmax. At a
    benchmark too large to broadcast the same query becomes the
    shuffle form (explode shingles, coarse-partition by shingle hash,
    count per (doc, bench) pair) — the documented dial."""
    from ..functions.textstats import shingles_of

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bench_pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = ids % BENCH_MOD == 0
        out_s, out_b = [], []
        sub = batch.filter(pa.array(mask))
        for bid, text in zip(
            sub.column("doc_id").to_pylist(), sub.column("text").to_pylist()
        ):
            for sh in shingles_of(text or "", 3):
                out_s.append(sh)
                out_b.append(bid)
        return pa.table(
            {
                "s": pa.array(out_s, pa.string()),
                "b": pa.array(out_b, pa.int64()),
            }
        )

    # CSR inverted index on the driver (bounded by benchmark size)
    ss, bb = [], []
    for t in docs.map_batches(bench_pairs, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        ss.extend(t.column("s").to_pylist())
        bb.extend(t.column("b").to_pylist())
    s_arr = np.array(ss, dtype=object)
    b_arr = np.array(bb, dtype=np.int64)
    order = np.lexsort((b_arr, s_arr))
    s_arr, b_arr = s_arr[order], b_arr[order]
    uniq_s, starts = np.unique(s_arr, return_index=True)
    offsets = np.concatenate((starts, [len(s_arr)]))
    idx_ref = ray.put((uniq_s, offsets, b_arr))

    def score(batch: pa.Table) -> pa.Table:
        uq, off, bid = ray.get(idx_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % BENCH_MOD != 0))
        out_d, out_b, out_n = [], [], []
        for doc_id, text in zip(
            sub.column("doc_id").to_pylist(), sub.column("text").to_pylist()
        ):
            sh = np.array(shingles_of(text or "", 3), dtype=object)
            if len(sh) == 0 or len(uq) == 0:
                continue
            pos = np.searchsorted(uq, sh)
            pos_c = np.minimum(pos, len(uq) - 1)
            hit = np.flatnonzero(uq[pos_c] == sh)
            if len(hit) == 0:
                continue
            touched = np.concatenate(
                [bid[off[p] : off[p + 1]] for p in pos_c[hit]]
            )
            benches, counts = np.unique(touched, return_counts=True)
            w = int(np.lexsort((benches, -counts))[0])
            out_d.append(int(doc_id))
            out_b.append(int(benches[w]))
            out_n.append(int(counts[w]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "bench_id": pa.array(out_b, pa.int64()),
                "n_shared": pa.array(out_n, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dataset_card(sf_dir: str) -> "ray.data.Dataset":
    """The dataset-card summary row — the corpus-level fact sheet a
    training-data release ships with (datasheets for datasets, Gebru
    et al. 2021), every figure exact: document count, distinct
    sources and languages, total characters, total and DISTINCT
    corpus tokens, and the exact duplicate-text count
    (docs − distinct md5(text) — 0 certifies the corpus dedup gate).

    Scale shape — three bounded passes, nothing un-reduced reaches
    the driver:
    1. doc scan: per-batch partials (doc count, char sum, distinct
       md5-text lanes pre-deduped per batch) → the lane rows ride ONE
       coarse lane shuffle for an exact global distinct (the
       distinct_users_daily plan on the text-hash axis);
    2. token scan: per-batch distinct-token partial counts → one
       token-keyed shuffle → per-partition (n_distinct, n_total)
       partials (token_diversity's corpus-wide cut);
    3. source/lang domains: tiny per-batch value sets → driver union
       (bounded vocabularies).
    Output: one row (n_docs, n_sources, n_langs, total_chars,
    total_tokens, distinct_tokens, dup_texts)."""
    import hashlib
    import re

    from ray.data.aggregate import Sum
    from ..stages.shuffle import N_COARSE_PARTS

    path = f"{sf_dir}/documents.parquet"
    word_re = re.compile(r"[a-z0-9]+")

    # pass 1: counts + exact distinct text hashes
    def doc_partial(batch: pa.Table) -> pa.Table:
        txts = batch.column("text").to_pylist()
        lanes = np.unique(
            np.array(
                [
                    int(hashlib.md5((t or "").encode()).hexdigest()[:15], 16)
                    for t in txts
                ],
                dtype=np.int64,
            )
        )
        return pa.table(
            {
                "lane": pa.array(lanes, pa.int64()),
                "n_p": pa.array(
                    np.concatenate(([len(txts)], np.zeros(len(lanes) - 1, np.int64)))
                    if len(lanes)
                    else np.array([], np.int64),
                    pa.int64(),
                ),
                "ch_p": pa.array(
                    np.concatenate(
                        (
                            [sum(len(t or "") for t in txts)],
                            np.zeros(len(lanes) - 1, np.int64),
                        )
                    )
                    if len(lanes)
                    else np.array([], np.int64),
                    pa.int64(),
                ),
                "part": pa.array(lanes % N_COARSE_PARTS, pa.int64()),
            }
        )

    def lane_distinct(part_tbl: pa.Table) -> pa.Table:
        lanes = part_tbl.column("lane").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "docs": pa.array(
                    [int(part_tbl.column("n_p").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "chars": pa.array(
                    [int(part_tbl.column("ch_p").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "texts": pa.array([int(len(np.unique(lanes)))], pa.int64()),
            }
        )

    g1 = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(doc_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lane_distinct, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("docs", alias_name="n_docs"),
            Sum("chars", alias_name="total_chars"),
            Sum("texts", alias_name="n_texts"),
        )
        .to_pandas()
    )

    # pass 2: corpus token totals + exact distinct tokens
    def tok_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(word_re.findall((t or "").lower()))
        toks = list(c.keys())
        import zlib

        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n": pa.array(
                    np.array(list(c.values()), np.int64), pa.int64()
                ),
                "part": pa.array(
                    np.array(
                        [zlib.crc32(t.encode()) % N_COARSE_PARTS for t in toks],
                        np.int64,
                    ),
                    pa.int64(),
                ),
            }
        )

    def tok_part(part_tbl: pa.Table) -> pa.Table:
        t = part_tbl.select(["token", "n"]).group_by("token").aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "tt": pa.array(
                    [int(t.column("n_sum").cast(pa.int64()).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "dt": pa.array([t.num_rows], pa.int64()),
            }
        )

    g2 = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(tok_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(tok_part, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("tt", alias_name="total_tokens"),
            Sum("dt", alias_name="distinct_tokens"),
        )
        .to_pandas()
    )

    # pass 3: bounded source/lang domains — per-batch distinct
    # (tag, value) rows, driver union (vocabularies are bounded)
    def domain_rows(batch: pa.Table) -> pa.Table:
        vals: list[tuple[str, str]] = []
        for col in ("source", "lang"):
            for v in set(batch.column(col).to_pylist()):
                if v is not None:
                    vals.append((col, v))
        return pa.table(
            {
                "tag": pa.array([t for t, _ in vals], pa.string()),
                "val": pa.array([v for _, v in vals], pa.string()),
            }
        )

    srcs: set = set()
    langs: set = set()
    for b in (
        ray.data.read_parquet(path, columns=["source", "lang"])
        .map_batches(domain_rows, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for t, v in zip(b.column("tag").to_pylist(), b.column("val").to_pylist()):
            (srcs if t == "source" else langs).add(v)

    n_docs = int(g1["n_docs"].iloc[0])
    out = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_sources": pa.array([len(srcs)], pa.int64()),
            "n_langs": pa.array([len(langs)], pa.int64()),
            "total_chars": pa.array([int(g1["total_chars"].iloc[0])], pa.int64()),
            "total_tokens": pa.array(
                [int(g2["total_tokens"].iloc[0])], pa.int64()
            ),
            "distinct_tokens": pa.array(
                [int(g2["distinct_tokens"].iloc[0])], pa.int64()
            ),
            "dup_texts": pa.array(
                [n_docs - int(g1["n_texts"].iloc[0])], pa.int64()
            ),
        }
    )
    return ray.data.from_arrow(out)


KFOLD_K = 5


def kfold_assignment(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic stratified k-fold assignment — the
    cross-validation prerequisite: fold = md5(doc_id) mod 5 (content-
    independent, so folds are stable under text edits; hash-based, so
    assignment needs no global state), reported as the per (lang,
    fold) cell counts PLUS each lang's fold-balance spread (max −
    min cell) — the imbalance a stratified CV run must tolerate.
    Tail-seated by design: hash_sample's md5-mod primitive folded to
    contingency_grid's cell counts.

    Scale shape: one pass folds (lang, fold, n) partials into a
    bounded |langs|×5 grid; the spread joins through a per-lang
    map_groups over that grid. Output: (lang, fold, n_docs,
    lang_spread)."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        fold = np.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                % KFOLD_K
                for i in ids
            ],
            np.int64,
        )
        g = (
            pd.DataFrame({"lang": lang, "fold": fold, "n": 1})
            .groupby(["lang", "fold"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "fold": pa.array(g["fold"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def spread(grp: pa.Table) -> pa.Table:
        n = grp.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        fold = grp.column("fold").to_numpy(zero_copy_only=False)
        # a fold with ZERO docs in this lang still counts in the spread
        full = np.zeros(KFOLD_K, np.int64)
        full[fold] = n
        sp = int(full.max() - full.min())
        return pa.table(
            {
                "lang": pa.array(
                    [grp.column("lang")[0].as_py()] * len(n), pa.string()
                ),
                "fold": pa.array(fold, pa.int64()),
                "n_docs": pa.array(n, pa.int64()),
                "lang_spread": pa.array(np.full(len(n), sp, np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "fold"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .groupby("lang")
        .map_groups(spread, batch_format="pyarrow")
    )


NEG_K = 4        # negatives per anchor
NEG_PROBES = 8   # deterministic probe budget before giving up


def negative_samples(sf_dir: str) -> "ray.data.Dataset":
    """Contrastive-training negative sampling — per anchor document,
    NEG_K deterministic negatives from a DIFFERENT source: candidate
    ids come from md5(doc, probe) mod N (stateless, reproducible —
    the training_shuffle discipline), candidates join to their source
    through one id co-partition, same-source collisions are dropped,
    and the first NEG_K survivors by probe order win. The
    materialized (anchor, negative) table a contrastive trainer
    streams. Tail-seated by design: hash_sample's md5 probing + the
    suppression-antijoin polarity on the source lane.

    Scale shape: candidates are n·NEG_PROBES int rows; ONE
    co-partition on the candidate id attaches sources (documents is
    fact-scale — never broadcast); the per-anchor top-k by probe
    order runs in a bounded per-anchor group. Output: (doc_id,
    neg_rank, neg_doc_id, anchor_source, neg_source)."""
    import hashlib

    from ray.data.aggregate import Max as _Max
    from ..stages.shuffle import N_COARSE_PARTS

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    n_docs = int(docs.count())

    def cand_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        anchors, probes, cands, asrc = [], [], [], []
        for i, s in zip(ids, src):
            for r in range(NEG_PROBES):
                c = (
                    int(
                        hashlib.md5(f"neg:{i}:{r}".encode()).hexdigest()[:15],
                        16,
                    )
                    % n_docs
                )
                anchors.append(int(i))
                probes.append(r)
                cands.append(c)
                asrc.append(s)
        return pa.table(
            {
                "key": pa.array(cands, pa.int64()),
                "anchor": pa.array(anchors, pa.int64()),
                "probe": pa.array(probes, pa.int64()),
                "anchor_source": pa.array(asrc, pa.string()),
                "neg_source": pa.array([""] * len(cands), pa.string()),
                "side": pa.array(np.ones(len(cands), np.int64), pa.int64()),
                "part": pa.array(
                    np.asarray(cands, np.int64) % N_COARSE_PARTS, pa.int64()
                ),
            }
        )

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ids)
        return pa.table(
            {
                "key": pa.array(ids, pa.int64()),
                "anchor": pa.array(np.zeros(n, np.int64), pa.int64()),
                "probe": pa.array(np.zeros(n, np.int64), pa.int64()),
                "anchor_source": pa.array([""] * n, pa.string()),
                "neg_source": batch.column("source"),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
            }
        )

    def attach(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("key")["neg_source"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="key", how="inner", rsuffix="_b")
        keep = m["anchor_source"] != m["neg_source_b"]
        m = m[keep]
        anchors = m["anchor"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "anchor": pa.array(anchors, pa.int64()),
                "probe": pa.array(
                    m["probe"].to_numpy().astype(np.int64), pa.int64()
                ),
                "neg": pa.array(
                    m["key"].to_numpy().astype(np.int64), pa.int64()
                ),
                "anchor_source": pa.array(m["anchor_source"], pa.string()),
                "neg_source": pa.array(m["neg_source_b"], pa.string()),
                "apart": pa.array(anchors % N_COARSE_PARTS, pa.int64()),
            }
        )

    def topk_part(part_tbl: pa.Table) -> pa.Table:
        # one vectorized (anchor, probe)-sort + head per partition —
        # never a per-anchor Python call
        import pandas as pd

        df = (
            part_tbl.select(
                ["anchor", "probe", "neg", "anchor_source", "neg_source"]
            )
            .to_pandas()
            .sort_values(["anchor", "probe"], kind="mergesort")
        )
        df["neg_rank"] = df.groupby("anchor", sort=False).cumcount()
        df = df[df["neg_rank"] < NEG_K]
        return pa.table(
            {
                "doc_id": pa.array(
                    df["anchor"].to_numpy().astype(np.int64), pa.int64()
                ),
                "neg_rank": pa.array(
                    df["neg_rank"].to_numpy().astype(np.int64), pa.int64()
                ),
                "neg_doc_id": pa.array(
                    df["neg"].to_numpy().astype(np.int64), pa.int64()
                ),
                "anchor_source": pa.array(df["anchor_source"], pa.string()),
                "neg_source": pa.array(df["neg_source"], pa.string()),
            }
        )

    return (
        docs.map_batches(cand_side, batch_format="pyarrow")
        .union(docs.map_batches(doc_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("apart")
        .map_groups(topk_part, batch_format="pyarrow")
    )


def ngram_novelty(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc n-gram novelty — of a document's DISTINCT word-8-grams,
    the fraction whose global FIRST occurrence (min doc_id corpus-wide)
    is this document, in basis points: the temporal-staleness /
    memorization proxy a crawl curator reads before adding a snapshot
    (a doc novel in bp ≈ 0 is pure syndication; dup_spans' multiplicity
    flag cannot say WHO coined the passage). Docs with fewer than 8
    words carry no gram and are excluded, mirrored in the oracle.
    Tail-seated by design: dup_spans' gram rows with line_dedup's
    min-winner rule.

    Scale shape: distinct (doc, gram) rows shuffle ONCE by gram hash —
    each gram's owner (min doc) is exact within its partition — and
    per-partition (doc, novel, total) partials reduce in one
    groupby(doc_id).Sum(); gram text never leaves the batch (60-bit
    md5). Output: (doc_id, grams_distinct, grams_novel, novelty_bp)."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import md5_int60, words_of
    from ..stages.shuffle import N_COARSE_PARTS

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        out_id, out_gh = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = words_of(text or "")
            gs = {
                md5_int60(" ".join(ws[i : i + DUP_GRAM_N]))
                for i in range(len(ws) - DUP_GRAM_N + 1)
            }
            out_id.extend([doc_id] * len(gs))
            out_gh.extend(gs)
        gh = np.array(out_gh, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "gh": pa.array(gh, pa.int64()),
                "part": pa.array(gh % N_COARSE_PARTS, pa.int64()),
            }
        )

    def part_fold(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.select(["doc_id", "gh"]).to_pandas()
        owner = df.groupby("gh", sort=False)["doc_id"].transform("min")
        novel = (
            df[df["doc_id"] == owner]
            .groupby("doc_id", sort=False)
            .size()
            .rename("novel")
        )
        total = df.groupby("doc_id", sort=False).size().rename("total")
        m = pd.concat([total, novel], axis=1).fillna(0).reset_index()
        return pa.table(
            {
                "doc_id": pa.array(
                    m["doc_id"].to_numpy().astype(np.int64), pa.int64()
                ),
                "novel": pa.array(
                    m["novel"].to_numpy().astype(np.int64), pa.int64()
                ),
                "total": pa.array(
                    m["total"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        nv = batch.column("novel").to_numpy(zero_copy_only=False)
        tt = batch.column("total").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "grams_distinct": pa.array(tt.astype(np.int64), pa.int64()),
                "grams_novel": pa.array(nv.astype(np.int64), pa.int64()),
                "novelty_bp": pa.array(nv * 10_000 // tt, pa.int64()),
            }
        )

    return (
        docs.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_fold, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            _Sum("novel", alias_name="novel"), _Sum("total", alias_name="total")
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def quantile_normalize(sf_dir: str) -> "ray.data.Dataset":
    """Quantile normalization of per-source length distributions —
    every doc's n_chars is replaced by the GLOBAL n_chars value at
    the same relative rank (rank r of n_s within a source maps to
    global position r·(N−1) // (n_s−1); a single-doc source maps to
    the global median position), the batch-effect correction
    (Bolstad et al. 2003) that makes sources comparable before any
    length-based gate: after it, every source has the SAME length
    distribution by construction. Ranks order by (n_chars, doc_id)
    so ties are deterministic. Tail-seated by design: snm_pairs'
    exact-global-rank machinery bent into a per-source transform.

    Scale shape: within-source ranks come from the (source, n_chars)
    COUNT GRID (driver prefix-sums the bounded grid, broadcasts the
    bases; each (source, value) cell local-sorts its doc_ids for the
    tie offset — cells co-locate in one groupby); the global
    position→value lookup is a searchsorted against the broadcast
    (value, cumcount) grid, O(1) per doc, never a global sort
    barrier. Output: (doc_id, source, n_chars, src_rank,
    normalized_chars)."""
    from ray.data.aggregate import Count as _Count

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )

    grid = (
        docs.groupby(["source", "n_chars"])
        .aggregate(_Count(alias_name="c"))
        .take_all()  # bounded: the (source, value) count grid
    )
    per_src: dict[str, list[tuple[int, int]]] = {}
    for r in grid:
        per_src.setdefault(r["source"], []).append(
            (int(r["n_chars"]), int(r["c"]))
        )
    bases: dict[tuple[str, int], int] = {}
    n_src: dict[str, int] = {}
    gvals: dict[int, int] = {}
    for s, cells in per_src.items():
        run = 0
        for v, c in sorted(cells):
            bases[(s, v)] = run
            run += c
            gvals[v] = gvals.get(v, 0) + c
        n_src[s] = run
    vs = np.array(sorted(gvals), dtype=np.int64)
    cum = np.cumsum([gvals[int(v)] for v in vs]).astype(np.int64)
    n_all = int(cum[-1])
    bref = ray.put((bases, n_src, vs, cum, n_all))

    def cell_ranks(grp: pa.Table) -> pa.Table:
        bases_, n_src_, vs_, cum_, n_ = ray.get(bref)
        s = grp.column("source")[0].as_py()
        v = int(grp.column("n_chars")[0].as_py())
        ids = np.sort(
            grp.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        rank = bases_[(s, v)] + np.arange(len(ids), dtype=np.int64)
        ns = n_src_[s]
        g = (
            rank * (n_ - 1) // (ns - 1)
            if ns > 1
            else np.full(len(ids), (n_ - 1) // 2, np.int64)
        )
        norm = vs_[np.searchsorted(cum_, g + 1)]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array([s] * len(ids), pa.string()),
                "n_chars": pa.array(
                    np.full(len(ids), v, np.int64), pa.int64()
                ),
                "src_rank": pa.array(rank, pa.int64()),
                "normalized_chars": pa.array(
                    norm.astype(np.int64), pa.int64()
                ),
            }
        )

    return docs.groupby(["source", "n_chars"]).map_groups(
        cell_ranks, batch_format="pyarrow"
    )


NDL_LEVELS = ("raw", "lower", "ws_collapse", "alnum", "bag")


def normalization_dedup_ladder(sf_dir: str) -> "pd.DataFrame":
    """Canonicalization LADDER for exact dedup — how many more
    duplicate docs each normalization step surfaces: md5 groups of
    (1) raw text, (2) lowercased, (3) whitespace-collapsed+trimmed,
    (4) lowercase alphanumerics+single-space only, (5) the sorted
    WORD BAG (order-free). Every real ingestion pipeline picks a
    rung on this ladder (the reference hashes raw bytes; C4
    normalizes; bag-level catches shuffled boilerplate), and the
    ladder read — n_dup_docs per level, monotone nondecreasing — is
    the evidence for how aggressive to go before near-dup methods
    take over (`dedup_exact` is rung 1; `dedup_minhash_lsh` starts
    where rung 5 stops). Output (level_id, level, n_docs, n_groups,
    n_dup_docs, max_group).

    Scale shape: one streaming pass computes all five digests per
    doc (vectorized regex/string kernels + one md5 each), emitting
    (level, digest) rows pre-counted per batch; one coarse
    crc32(digest) exchange folds group censuses per level (a
    digest's rows co-locate), then a ≤ 5·64-row fold. Payload text
    never shuffles."""
    import hashlib as _hashlib
    import re as _re

    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..stages.shuffle import str_partition

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    ws_re = _re.compile(r"\s+")
    al_re = _re.compile(r"[^a-z0-9 ]")

    def digests(batch: pa.Table) -> pa.Table:
        import collections

        texts = batch.column("text").to_pylist()
        c: collections.Counter = collections.Counter()
        for t in texts:
            t = t or ""
            lower = t.lower()
            wsc = ws_re.sub(" ", t).strip()
            aln = ws_re.sub(" ", al_re.sub("", lower)).strip()
            bag = " ".join(sorted(aln.split()))
            for lid, variant in enumerate(
                (t, lower, wsc, aln, bag)
            ):
                c[
                    (lid, _hashlib.md5(variant.encode()).hexdigest())
                ] += 1
        keys = list(c.keys())
        return pa.table(
            {
                "lid": pa.array([k[0] for k in keys], pa.int64()),
                "h": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
                "part": pa.array(
                    str_partition([k[1] for k in keys]), pa.int64()
                ),
            }
        )

    def census(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = (
            part_tbl.to_pandas()
            .groupby(["lid", "h"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        g = df.groupby("lid")["n"]
        agg = pd.DataFrame(
            {
                "n_docs": g.sum(),
                "n_groups": g.count(),
                "max_group": g.max(),
            }
        ).reset_index()
        return pa.table(
            {
                "level_id": pa.array(
                    agg["lid"].to_numpy(np.int64), pa.int64()
                ),
                "n_docs": pa.array(
                    agg["n_docs"].to_numpy(np.int64), pa.int64()
                ),
                "n_groups": pa.array(
                    agg["n_groups"].to_numpy(np.int64), pa.int64()
                ),
                "max_group": pa.array(
                    agg["max_group"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    rows = (
        docs.map_batches(digests, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: census(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("level_id")
        .aggregate(
            _Sum("n_docs", alias_name="n_docs"),
            _Sum("n_groups", alias_name="n_groups"),
            _Max("max_group", alias_name="max_group"),
        )
        .take_all()  # bounded: 5 level rows
    )
    df = pd.DataFrame(rows).sort_values("level_id", ignore_index=True)
    df["level"] = [NDL_LEVELS[int(i)] for i in df["level_id"]]
    df["n_dup_docs"] = df["n_docs"] - df["n_groups"]
    for c in ["level_id", "n_docs", "n_groups", "n_dup_docs", "max_group"]:
        df[c] = df[c].astype("int64")
    return df[
        ["level_id", "level", "n_docs", "n_groups", "n_dup_docs",
         "max_group"]
    ]


def dedup_quality_shift(sf_dir: str) -> "pd.DataFrame":
    """Does fuzzy dedup BIAS quality? — exact quality-score moment
    sums for KEPT (component representative, doc_id ==
    component_id) vs REMOVED docs under the MinHash near-dup
    components: (grp, n, sum_q, sum_q2, mean_q_x1000). Keep-first
    dedup implicitly assumes duplicates are exchangeable; if
    removed docs score systematically lower (boilerplate-heavy
    copies) the dedup is quality-POSITIVE, if higher it is eating
    good variants — this is the one-table answer, the audit
    CCNet-style pipelines run before trusting min-id keep policy.
    `fuzzy_dedup_keep` chooses the survivors; this scores the
    choice.

    Scale shape: the memoized component assignment and the
    streaming quality pass meet in ONE doc-key tagged co-partition
    (slim int columns); the 2×4 moment cells fold out. No driver
    state beyond two rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import quality_scores
    from ..pipelines.dedup import neardup_components
    from ..stages.shuffle import N_COARSE_PARTS

    comp = neardup_components(sf_dir)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def comp_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        c = batch.column("component_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc": pa.array(d, pa.int64()),
                "kept": pa.array((d == c).astype(np.int64), pa.int64()),
                "q": pa.array(np.zeros(len(d), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(d), np.int64), pa.int64()),
                "part": pa.array(d % N_COARSE_PARTS, pa.int64()),
            }
        )

    def q_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        q = (
            quality_scores(batch.column("text").combine_chunks())[
                "quality_score"
            ]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc": pa.array(d, pa.int64()),
                "kept": pa.array(np.zeros(len(d), np.int64), pa.int64()),
                "q": pa.array(q, pa.int64()),
                "side": pa.array(np.zeros(len(d), np.int64), pa.int64()),
                "part": pa.array(d % N_COARSE_PARTS, pa.int64()),
            }
        )

    def join_fold(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = part_tbl.to_pandas()
        qmap = dict(
            zip(df[df["side"] == 0]["doc"], df[df["side"] == 0]["q"])
        )
        cr = df[df["side"] == 1]
        q = np.array([qmap[d] for d in cr["doc"]], np.int64)
        kept = cr["kept"].to_numpy(np.int64)
        rows = []
        for g in (0, 1):
            m = kept == g
            rows.append(
                (g, int(m.sum()), int(q[m].sum()), int((q[m] ** 2).sum()))
            )
        arr = np.array(rows, np.int64)
        return pa.table(
            {
                "kept": pa.array(arr[:, 0], pa.int64()),
                "n": pa.array(arr[:, 1], pa.int64()),
                "sum_q": pa.array(arr[:, 2], pa.int64()),
                "sum_q2": pa.array(arr[:, 3], pa.int64()),
            }
        )

    rows = (
        docs.map_batches(q_rows, batch_format="pyarrow")
        .union(comp.map_batches(comp_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(
            lambda g: join_fold(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("kept")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("sum_q", alias_name="sum_q"),
            _Sum("sum_q2", alias_name="sum_q2"),
        )
        .take_all()  # bounded: 2 group rows
    )
    df = pd.DataFrame(rows).sort_values("kept", ignore_index=True)
    df["grp"] = ["removed" if int(k) == 0 else "kept" for k in df["kept"]]
    for c in ["n", "sum_q", "sum_q2"]:
        df[c] = df[c].astype("int64")
    df["mean_q_x1000"] = np.where(
        df["n"] > 0, df["sum_q"] * 1000 // df["n"], 0
    ).astype("int64")
    return df[["grp", "n", "sum_q", "sum_q2", "mean_q_x1000"]]
