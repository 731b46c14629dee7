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
