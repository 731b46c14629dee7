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
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.textstats import shingles_of, words_of
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
