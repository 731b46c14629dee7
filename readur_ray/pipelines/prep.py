"""Composite training-data prep pipeline — the end-to-end flow an LLM
data team runs over a raw corpus, composed from this repo's kernels in
ONE streaming Dataset plan:

    read (pruned) → per-batch text stats (quality / lang-ID / token
    counts, all vectorized RE2) → quality+language gate → exact-dedup
    keep-first → kept rows with their stats.

Scale shape: one pass computes every per-doc stat (no re-scans); the
only shuffle is the dedup's coarse hash partition over (hash, doc_id,
4 small ints) — text never shuffles, nothing lands on the driver. The
whole pipeline is mirrored by one composed SQL oracle, so the
composition itself (filter-before-dedup ordering, tie-breaks) is
bit-verified, not just the pieces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textstats import md5_hex, predict_lang, quality_scores, stopword_hits
from .dedup import N_COARSE_PARTS

MIN_QUALITY = 3
KEEP_LANG = "en"


def training_prep(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return training_prep_plan(ds)


def training_prep_plan(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """The funnel as a plan over any (doc_id, text) Dataset — shared by
    the driver query above and the ``--curate`` CLI job."""

    def stats_and_gate(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").combine_chunks()
        texts = pc.fill_null(texts, "")
        q = quality_scores(texts)
        lang = predict_lang(stopword_hits(texts))
        keep = pc.and_(
            pc.greater_equal(q["quality_score"], MIN_QUALITY),
            pc.equal(lang, KEEP_LANG),
        )
        t = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "ws_tokens": q["ws_tokens"],
                "chars": q["chars"],
                "quality_score": q["quality_score"],
            }
        ).filter(keep)
        # hash AFTER the gate: only surviving rows pay the md5
        hexes = [md5_hex(x or "") for x in t.column("text").to_pylist()]
        part = np.array(
            [int(h[:8], 16) % N_COARSE_PARTS for h in hexes], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "ws_tokens": t.column("ws_tokens"),
                "chars": t.column("chars"),
                "quality_score": t.column("quality_score"),
                "content_hash": pa.array(hexes, pa.string()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def dedup_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(
            ["doc_id", "ws_tokens", "chars", "quality_score", "content_hash"]
        ).to_pandas()
        win = df.groupby("content_hash")["doc_id"].transform("min").to_numpy()
        kept = df[win == df["doc_id"].to_numpy()]
        return pa.table(
            {
                "doc_id": pa.array(kept["doc_id"].to_numpy(), pa.int64()),
                "ws_tokens": pa.array(kept["ws_tokens"].to_numpy(), pa.int64()),
                "chars": pa.array(kept["chars"].to_numpy(), pa.int64()),
                "quality_score": pa.array(
                    kept["quality_score"].to_numpy(), pa.int64()
                ),
                "content_hash": pa.array(kept["content_hash"], pa.string()),
            }
        )

    return (
        ds.map_batches(stats_and_gate, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
    )


def run_curation(input_path: str, out_dir: str) -> dict:
    """One-shot curation JOB over any documents-shaped parquet
    (doc_id:int64, text:string): quality/lang gate → exact-dedup
    keep-first → partitioned parquet of kept doc ids + stats under
    ``out_dir/curated``. Counts are metadata-only reads (no second
    scan of the corpus); the curation itself is the same single
    streaming plan the bit-verified ``training_prep`` query runs."""
    import os
    import shutil

    ds = ray.data.read_parquet(input_path, columns=["doc_id", "text"])
    n_in = ds.count()  # parquet metadata, no scan
    out = os.path.join(out_dir, "curated")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    training_prep_plan(ds).write_parquet(out)
    n_kept = ray.data.read_parquet(out).count()
    return {
        "docs_in": n_in,
        "docs_kept": n_kept,
        "docs_dropped": n_in - n_kept,
        "curated_dir": out,
    }


# ---------------------------------------------------------------------------
# full-funnel stage attribution (the complete curation pipeline, audited)
# ---------------------------------------------------------------------------

_K_BASE = 0      # per-doc flags: v = gate_pass + 2*benchmark
_K_EXACT = 1     # exact-dedup winner marker
_K_FUZZY = 2     # fuzzy-dedup winner marker
_K_CONTAM = 3    # contamination flag: v = contaminated
_K_CAND = 10     # transient: exact candidate keyed by content hash
_K_COMP = 20     # transient: doc → component id

STAGES = ("benchmark", "gate", "exact_dup", "fuzzy_dup", "contaminated", "kept")


def funnel_attribution(sf_dir: str) -> "ray.data.Dataset":
    """The WHOLE curation funnel with per-document attribution: every
    input doc gets the stage that removed it (or 'kept') —
    benchmark-slice exclusion → quality/language gate (the
    training_prep gate verbatim) → exact dedup (min doc_id per
    md5(text) among remaining) → fuzzy near-dup dedup (full-corpus
    MinHash-LSH connected component; min REMAINING doc_id per
    component survives) → benchmark decontamination (shingle-overlap
    flag). The audit table a curation run ships with its output —
    RefinedWeb/Dolma-style funnel reporting — and the proof that the
    STAGE COMPOSITION (precedence, tie-breaks, survivor scoping) is
    bit-exact, not just each stage alone.

    Scale shape: markers are tiny int64 rows co-partitioned on
    doc_id % P; the funnel adds three coarse shuffles of its own
    (exact winners on crc32(hash), component winners on
    component % P, final assembly on doc_id % P) on top of the
    memoized component build and the streaming contamination pass —
    text never rides a funnel shuffle. No driver state."""
    from .curation import BENCH_MOD, contamination
    from .dedup import neardup_components

    P = N_COARSE_PARTS
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def base_rows(batch: pa.Table) -> pa.Table:
        """Per doc: bench/gate flags (marker rows) + exact-dedup
        candidate rows (gate survivors only) keyed by content hash."""
        texts = pc.fill_null(batch.column("text").combine_chunks(), "")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        q = quality_scores(texts)["quality_score"].to_numpy(zero_copy_only=False)
        lang = predict_lang(stopword_hits(texts)).to_numpy(zero_copy_only=False)
        gate = (q >= MIN_QUALITY) & (lang == KEEP_LANG)
        bench = ids % BENCH_MOD == 0
        out_id = [ids]
        out_kind = [np.full(len(ids), _K_BASE, np.int64)]
        out_v = [gate.astype(np.int64) + 2 * bench.astype(np.int64)]
        out_part = [ids % P]
        cand = np.flatnonzero(gate & ~bench)
        tl = texts.to_pylist()
        hexes = [md5_hex(tl[int(i)]) for i in cand]
        out_id.append(ids[cand])
        out_kind.append(np.full(len(cand), _K_CAND, np.int64))
        out_v.append(
            np.array([int(h[:15], 16) for h in hexes], dtype=np.int64)
        )  # 60-bit hash prefix: the dedup key (collision-free at corpus
        #    scale is NOT assumed — both sides key on the same prefix)
        out_part.append(
            np.array([int(h[:8], 16) % P for h in hexes], dtype=np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "kind": pa.array(np.concatenate(out_kind), pa.int64()),
                "v": pa.array(np.concatenate(out_v), pa.int64()),
                "part": pa.array(
                    np.concatenate(out_part).astype(np.int64), pa.int64()
                ),
            }
        )

    base = docs.map_batches(base_rows, batch_format="pyarrow").materialize()

    def exact_winners(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        df = df[df["kind"] == _K_CAND]
        if not len(df):
            return _empty_marker()
        win = df.groupby("v")["doc_id"].transform("min").to_numpy()
        ids = df["doc_id"].to_numpy()
        kept = ids[win == ids]
        return _marker(kept, _K_EXACT, np.ones(len(kept), np.int64), kept % P)

    exact = (
        base.groupby("part")
        .map_groups(exact_winners, batch_format="pyarrow")
        .materialize()
    )

    comp = neardup_components(sf_dir)

    def comp_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cid = batch.column("component_id").to_numpy(zero_copy_only=False)
        return _marker(ids, _K_COMP, cid.astype(np.int64), ids % P)

    def attach_comp(part_tbl: pa.Table) -> pa.Table:
        """exact winners ⋈ components (co-partitioned on doc) →
        (component, doc) rows keyed by component for the winner pick."""
        import pandas as pd

        df = part_tbl.to_pandas()
        cids = df[df["kind"] == _K_COMP].set_index("doc_id")["v"]
        surv = df[df["kind"] == _K_EXACT]["doc_id"].to_numpy()
        cid = cids.loc[surv].to_numpy().astype(np.int64)
        return _marker(surv, _K_COMP, cid, cid % P)

    def fuzzy_winners(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        if not len(df):
            return _empty_marker()
        win = df.groupby("v")["doc_id"].transform("min").to_numpy()
        ids = df["doc_id"].to_numpy()
        kept = ids[win == ids]
        return _marker(kept, _K_FUZZY, np.ones(len(kept), np.int64), kept % P)

    # materialized: Ray's sort-shuffle samples boundaries in a second
    # pass, which would re-execute this whole chain (and the
    # contamination pass below) once more inside the final assembly
    fuzzy = (
        exact.union(comp.map_batches(comp_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach_comp, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fuzzy_winners, batch_format="pyarrow")
        .materialize()
    )

    def contam_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        flag = batch.column("contaminated").to_numpy(zero_copy_only=False)
        return _marker(ids, _K_CONTAM, flag.astype(np.int64), ids % P)

    contam = contamination(sf_dir).map_batches(
        contam_rows, batch_format="pyarrow"
    ).materialize()

    def decide(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        flags = df[df["kind"] == _K_BASE].set_index("doc_id")["v"]
        ids = flags.index
        v = flags.to_numpy()
        in_exact = ids.isin(df[df["kind"] == _K_EXACT]["doc_id"])
        in_fuzzy = ids.isin(df[df["kind"] == _K_FUZZY]["doc_id"])
        contam_f = (
            df[df["kind"] == _K_CONTAM]
            .set_index("doc_id")["v"]
            .reindex(ids, fill_value=0)
            .to_numpy()
        )
        stage = np.select(
            [
                (v & 2) != 0,
                (v & 1) == 0,
                ~in_exact,
                ~in_fuzzy,
                contam_f == 1,
            ],
            ["benchmark", "gate", "exact_dup", "fuzzy_dup", "contaminated"],
            default="kept",
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.to_numpy().astype(np.int64), pa.int64()),
                "stage": pa.array(stage.astype(str), pa.string()),
            }
        )

    return (
        base.union(exact, fuzzy, contam)
        .groupby("part")
        .map_groups(decide, batch_format="pyarrow")
    )


def _marker(ids, kind, v, part) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64), pa.int64()),
            "kind": pa.array(np.full(len(ids), kind, np.int64), pa.int64()),
            "v": pa.array(np.asarray(v, dtype=np.int64), pa.int64()),
            "part": pa.array(np.asarray(part, dtype=np.int64), pa.int64()),
        }
    )


def _empty_marker() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )


def run_funnel(input_dir: str, out_dir: str) -> dict:
    """One-shot funnel-attribution JOB: run the full audited curation
    funnel over ``input_dir/documents.parquet`` and write the per-doc
    stage table to ``out_dir/funnel`` (partitioned parquet), returning
    the stage histogram — the audit artifact a curation run ships.
    Same plan as the bit-verified ``funnel_attribution`` query."""
    import os
    import shutil
    from collections import Counter

    out = os.path.join(out_dir, "funnel")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ds = funnel_attribution(input_dir)
    ds.write_parquet(out)
    counts: Counter = Counter()
    for b in ray.data.read_parquet(out, columns=["stage"]).iter_batches(
        batch_format="pyarrow"
    ):
        vc = b.column("stage").value_counts()
        for item in vc:
            counts[item["values"].as_py()] += item["counts"].as_py()
    return {
        "docs_in": sum(counts.values()),
        "stages": dict(sorted(counts.items())),
        "funnel_dir": out,
    }
