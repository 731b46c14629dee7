"""Resumable end-to-end runner: extract → dedup (D1) → metrics.

Phases (each a separate streaming job over parquet, so no phase holds
the corpus in memory and a crash resumes at chunk granularity):

1. **extract** — input files are split into chunks; each uncommitted
   chunk runs the extraction DAG and writes
   ``out/extracted/chunk-<k>/`` atomically (tmp dir + rename), then a
   ledger line commits it. Committed chunks are skipped on resume —
   whole input fragments are pruned at the read.
2. **dedup** (D1, /root/reference/src/ingestion/document_ingestion.rs:
   121-169 keep-first semantics, deterministic winner = min doc_id) —
   one coarse-hash shuffle of the extracted stream on
   crc32(file_hash): every doc sharing a hash lands in the same
   partition, where winners are resolved and losers marked vectorized.
   No driver state — the loser set on a web corpus (20-50% exact
   dupes) is corpus-proportional and cannot be broadcast.
3. **finalize** — re-stream extracted output, apply dedup marks
   (policy 'skip' empties loser spans and sets status
   'skipped_duplicate'; 'track' keeps spans, marks
   'tracked_duplicate'; 'allow' skips the pass) → ``out/final/``; then
   aggregate per-partition metrics (A5 analog: status / failure_reason
   counts, confidence histogram, word + pages-OCR'd totals per part_id,
   /root/reference/migrations/20250620100001_add_ocr_queue.sql:33-46)
   → ``out/metrics.parquet``.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_CONFIG, ExtractionConfig
from ..state import ledger
from .extract import build_extracted


def _input_chunks(input_path: str, n_chunks: int) -> list[list[str]]:
    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path}")
    n = min(n_chunks, len(files))
    return [files[i::n] for i in range(n)]


def _has_parquet(path: str) -> bool:
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


_PIMG_TABLE = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("processed_image_ref", pa.string()),
        ("image_width", pa.int32()),
        ("image_height", pa.int32()),
        ("file_size", pa.int64()),
        ("steps", pa.list_(pa.string())),
    ]
)


def _read_extracted_or_empty(path: str, columns: list[str] | None = None):
    """read_parquet that tolerates a committed-but-EMPTY chunk dir:
    a zero-row write_parquet creates no files (reproduced on an empty
    input corpus / a chunk whose rows were all filtered), and a plain
    read_parquet over it raises. Falls back to a zero-row dataset with
    the EXTRACTED schema so downstream plans still see the columns."""
    if _has_parquet(path):
        if columns is not None:
            return ray.data.read_parquet(path, columns=columns)
        return ray.data.read_parquet(path)
    from ..schema import EXTRACTED

    tbl = pa.table({n: [] for n in EXTRACTED.names}, schema=EXTRACTED)
    if columns is not None:
        tbl = tbl.select(columns)
    return ray.data.from_arrow(tbl)


def run_extract_phase(
    input_path: str,
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    n_chunks: int = 4,
    _stop_after: int | None = None,
) -> list[int]:
    """Run uncommitted chunks; returns the chunk ids executed."""
    chunks = _input_chunks(input_path, n_chunks)
    done = ledger.committed_chunks(out_dir)
    executed = []
    extracted_root = os.path.join(out_dir, "extracted")
    os.makedirs(extracted_root, exist_ok=True)
    for k, files in enumerate(chunks):
        if k in done:
            continue
        t0 = time.perf_counter()
        tmp = os.path.join(extracted_root, f".tmp-chunk-{k}")
        final = os.path.join(extracted_root, f"chunk-{k}")
        shutil.rmtree(tmp, ignore_errors=True)
        ds = build_extracted(files, cfg)
        ds.write_parquet(tmp)
        os.makedirs(tmp, exist_ok=True)  # zero-row writes create no dir
        # commit: atomic rename + ledger line
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        out = _read_extracted_or_empty(final, columns=["status"])
        counts = {r["status"]: r["count()"] for r in out.groupby("status").count().take_all()}
        ledger.append_entry(
            out_dir,
            {
                "kind": "chunk", "chunk": k, "input_files": files,
                "rows": sum(counts.values()), "status_counts": counts,
                "wall_sec": round(time.perf_counter() - t0, 3),
            },
        )
        executed.append(k)
        if _stop_after is not None and len(executed) >= _stop_after:
            break
    return executed


def count_duplicate_groups(extracted_dir: str) -> int:
    """Number of file_hash groups with >1 doc — a scalar, computed with
    the partial-agg pattern over an ids-only projection; never a dict."""
    proj = _read_extracted_or_empty(extracted_dir, columns=["doc_id", "file_hash"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch.column("file_hash"), ""))
        if batch.num_rows == 0:
            return pa.table({"file_hash": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = batch.group_by("file_hash").aggregate([("doc_id", "count")])
        return pa.table({
            "file_hash": g.column("file_hash"),
            "n": g.column("doc_id_count").cast(pa.int64()),
        })

    return (
        proj.map_batches(partial, batch_format="pyarrow")
        .groupby("file_hash")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
        )
        .count()
    )


_DEDUP_PART_COL = "_dedup_part"


def mark_duplicates(
    ds: "ray.data.Dataset",
    policy: str,
    num_parts: int = 64,
    existing: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """D1 keep-first dedup marking with ZERO driver state (replaces the
    round-2 broadcast winner dict, which held one entry per duplicate
    group — unbounded on web corpora where 20-50% of docs are exact
    dupes; /root/reference/src/ingestion/document_ingestion.rs:121-169).

    One coarse-hash shuffle: each row is assigned
    crc32(file_hash) % num_parts — rows with no hash (failed docs,
    never duplicates) spread by crc32(doc_id) so they don't pile into
    one hot partition — so every doc sharing a file_hash lands in the
    same partition, where winner = min(doc_id) is resolved and losers
    are marked, all vectorized. Scale note: a partition materializes
    ~corpus/num_parts rows (spans included); size num_parts so that
    fits a worker heap — the shuffle moves the corpus once, which is
    the price of a join against a loser set too large to broadcast.

    ``existing`` is the CROSS-RUN half of J1: the reference's ingest
    looks each new doc's file_hash up against the already-stored
    documents (document_ingestion.rs:134-169 via crud.rs:117-136).
    Here a prior run's (file_hash) projection rides the SAME shuffle as
    schema-padded sentinel rows (doc_id = "" sorts before every real
    id, so existing content always wins) and every new doc sharing a
    hash is marked a loser — co-partitioned, never a broadcast set."""
    loser_status = "tracked_duplicate" if policy == "track" else "skipped_duplicate"
    keep_spans = policy == "track"

    if existing is not None:
        schema = ds.schema().base_schema

        def pad_existing(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols: dict = {}
            for f in schema:
                if f.name == "file_hash":
                    cols[f.name] = batch.column("file_hash").cast(f.type)
                elif f.name == "doc_id":
                    cols[f.name] = pa.array([""] * n, f.type)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            cols["_existing"] = pa.array(np.ones(n, dtype=bool))
            return pa.table(cols)

        ex = existing.map_batches(
            lambda b: b.filter(pc.not_equal(b.column("file_hash"), "")),
            batch_format="pyarrow",
        ).map_batches(pad_existing, batch_format="pyarrow")
        ds = ds.map_batches(
            lambda b: b.append_column(
                "_existing", pa.array(np.zeros(b.num_rows, dtype=bool))
            ),
            batch_format="pyarrow",
        ).union(ex)

    def add_part(batch: pa.Table) -> pa.Table:
        import zlib

        keys = pc.if_else(
            pc.equal(batch.column("file_hash"), ""),
            batch.column("doc_id"), batch.column("file_hash"),
        )
        part = pa.array(
            [zlib.crc32(k.encode()) % num_parts for k in keys.to_pylist()],
            pa.int32(),
        )
        return batch.append_column(_DEDUP_PART_COL, part)

    def mark_partition(t: pa.Table) -> pa.Table:
        import pandas as pd

        t = t.drop_columns([_DEDUP_PART_COL]).combine_chunks()
        ex_hashes: set | None = None
        if "_existing" in t.schema.names:
            ex_mask = t.column("_existing").to_numpy(zero_copy_only=False)
            ex_hashes = set(
                t.filter(pa.array(ex_mask)).column("file_hash").to_pylist()
            )
            t = (
                t.filter(pa.array(~ex_mask))
                .drop_columns(["_existing"])
                .combine_chunks()
            )
            if t.num_rows == 0:
                return t
        h = t.column("file_hash").to_pandas()
        ids = t.column("doc_id").to_pandas()
        hashed = (h != "").to_numpy()
        loser = np.zeros(len(t), dtype=bool)
        if hashed.any():
            df = pd.DataFrame({"h": h[hashed], "i": ids[hashed]})
            g = df.groupby("h")["i"]
            sub_loser = (g.transform("size") > 1) & (df["i"] != g.transform("min"))
            if ex_hashes:
                sub_loser |= df["h"].isin(ex_hashes)
            loser[np.flatnonzero(hashed)] = sub_loser.to_numpy()
        if not loser.any():
            return t
        mask = pa.array(loser)
        cols = {name: t.column(name) for name in t.schema.names}
        cols["status"] = pc.if_else(mask, "skipped_duplicate", t.column("status"))
        cols["dedup_status"] = pc.if_else(mask, loser_status, t.column("dedup_status"))
        if not keep_spans:
            spans = t.column("spans").chunk(0)  # t.combine_chunks() ran above
            kept = spans.filter(pc.invert(mask))
            emptied = pa.array([[]] * int(loser.sum()), type=spans.type)
            order = np.empty(len(t), dtype=np.int64)
            order[np.flatnonzero(~loser)] = np.arange((~loser).sum())
            order[np.flatnonzero(loser)] = (~loser).sum() + np.arange(loser.sum())
            cols["spans"] = pa.concat_arrays(
                [kept, emptied.cast(spans.type)]
            ).take(pa.array(order))
        return pa.table(cols, schema=t.schema)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby(_DEDUP_PART_COL)
        .map_groups(mark_partition, batch_format="pyarrow")
    )


_CONF_BUCKETS = [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 101]


def metrics_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial metrics keyed by (part_id, status, failure_reason,
    conf_bucket) — the pre-aggregate before the tiny groupby."""
    batch = batch.combine_chunks()
    conf = batch.column("confidence").to_numpy(zero_copy_only=False)
    bucket = np.digitize(conf, _CONF_BUCKETS) - 1
    key = pa.table({
        "part_id": batch.column("part_id"),
        "status": batch.column("status"),
        "failure_reason": batch.column("failure_reason"),
        "conf_bucket": pa.array(bucket.astype(np.int32)),
        "words": batch.column("word_count").cast(pa.int64()),
        "pages": batch.column("pages_ocrd").cast(pa.int64()),
        "proc_ms": batch.column("processing_time_ms"),
    })
    g = key.group_by(["part_id", "status", "failure_reason", "conf_bucket"]).aggregate(
        [("words", "sum"), ("pages", "sum"), ("proc_ms", "sum"), ("status", "count")]
    )
    return pa.table({
        "part_id": g.column("part_id"),
        "status": g.column("status"),
        "failure_reason": g.column("failure_reason"),
        "conf_bucket": g.column("conf_bucket"),
        "docs": g.column("status_count").cast(pa.int64()),
        "words": g.column("words_sum"),
        "pages": g.column("pages_sum"),
        "proc_ms": g.column("proc_ms_sum"),
    })


def run_finalize_phase(
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    dedup_against: str | None = None,
) -> dict:
    """``dedup_against``: path to a PRIOR run's final/ dir — its
    (file_hash) projection joins the dedup shuffle so content already
    ingested there is marked duplicate here (J1 cross-run lookup)."""
    extracted_dir = os.path.join(out_dir, "extracted")
    final_dir = os.path.join(out_dir, "final")
    dup_groups = 0
    ds = _read_extracted_or_empty(extracted_dir)
    if cfg.dedup_policy != "allow":
        dup_groups = count_duplicate_groups(extracted_dir)
        existing = (
            _read_extracted_or_empty(dedup_against, columns=["file_hash"])
            if dedup_against
            else None
        )
        if dup_groups or existing is not None:
            ds = mark_duplicates(ds, cfg.dedup_policy, existing=existing)
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)  # zero-row writes create no dir
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)

    metrics = (
        _read_extracted_or_empty(
            final_dir,
            columns=["part_id", "status", "failure_reason", "confidence",
                     "word_count", "pages_ocrd", "processing_time_ms"],
        )
        .map_batches(metrics_partial, batch_format="pyarrow")
        .groupby(["part_id", "status", "failure_reason", "conf_bucket"])
        .aggregate(
            Sum("docs", alias_name="docs"),
            Sum("words", alias_name="words"),
            Sum("pages", alias_name="pages_ocrd"),
            Sum("proc_ms", alias_name="proc_ms"),
        )
    )
    metric_rows = metrics.take_all()
    metrics_table = (
        pa.Table.from_pylist(metric_rows)
        if metric_rows
        else pa.table(
            {
                "part_id": pa.array([], pa.int32()),
                "status": pa.array([], pa.string()),
                "failure_reason": pa.array([], pa.string()),
                "conf_bucket": pa.array([], pa.int32()),
                "docs": pa.array([], pa.int64()),
                "words": pa.array([], pa.int64()),
                "pages_ocrd": pa.array([], pa.int64()),
                "proc_ms": pa.array([], pa.int64()),
            }
        )
    )
    import pyarrow.parquet as pq

    pq.write_table(metrics_table, os.path.join(out_dir, "metrics.parquet"))

    pimg_rows = 0
    if cfg.save_processed_images:
        # ProcessedImage side table (db/images.rs create_processed_image):
        # explode the per-doc lineage lists into one row per processed
        # artifact — a pruned-column streaming pass, never the payloads
        def explode_pimgs(batch: pa.Table) -> pa.Table:
            out = {"doc_id": [], "media_ref": [], "processed_image_ref": [],
                   "image_width": [], "image_height": [], "file_size": [],
                   "steps": []}
            for doc_id, lst in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("processed_images").to_pylist(),
            ):
                for r in lst or []:
                    out["doc_id"].append(doc_id)
                    for k in ("media_ref", "processed_image_ref",
                              "image_width", "image_height", "file_size",
                              "steps"):
                        out[k].append(r[k])
            return pa.table(out, schema=_PIMG_TABLE)

        pimg_dir = os.path.join(out_dir, "processed_images")
        ptmp = pimg_dir + ".tmp"
        shutil.rmtree(ptmp, ignore_errors=True)
        pimg_ds = _read_extracted_or_empty(
            final_dir, columns=["doc_id", "processed_images"]
        ).map_batches(explode_pimgs, batch_format="pyarrow")
        pimg_ds.write_parquet(ptmp)
        os.makedirs(ptmp, exist_ok=True)
        shutil.rmtree(pimg_dir, ignore_errors=True)
        os.rename(ptmp, pimg_dir)
        pimg_rows = sum(
            b.num_rows for b in _read_extracted_or_empty(
                pimg_dir, columns=["doc_id"]
            ).iter_batches(batch_format="pyarrow")
        )

    summary = {
        "duplicate_groups": dup_groups,
        "final_dir": final_dir,
        "metrics_rows": metrics_table.num_rows,
        "processed_image_rows": pimg_rows,
    }
    ledger.append_entry(out_dir, {"kind": "finalize", **summary})
    # W6: fold chunk entries older than the TTL into one snapshot line
    # (the reference's 7-day completed-item cleanup, queue.rs:1085-1098)
    ledger.compact_ledger(out_dir)
    return summary


def _retryable_mask(batch: pa.Table) -> "pa.Array":
    """status == failed AND failure_reason recoverable — the D4
    selection predicate. The retried set is DEFINED by this predicate
    over the final output, which is what makes the merged view joinless:
    a final row is superseded iff the predicate holds for it."""
    from ..functions.errors import RECOVERABLE_REASONS

    return pc.and_(
        pc.equal(batch.column("status"), "failed"),
        pc.is_in(
            batch.column("failure_reason"),
            value_set=pa.array(sorted(RECOVERABLE_REASONS)),
        ),
    )


def run_requeue_phase(
    input_path: str, out_dir: str, cfg: ExtractionConfig = DEFAULT_CONFIG
) -> dict:
    """D4 requeue-failed (/root/reference/src/ocr/queue.rs:978-1082):
    re-extract the docs whose failure_reason is RECOVERABLE, then emit
    the merged view (final − retried ∪ retry).

    Plan, zero driver state:
    1. retry ids = predicate rows of final (column-pruned read);
    2. input rows to re-extract are selected by a co-partitioned
       SEMI-JOIN on crc32(doc_id) — input rows union'd with id rows
       (schema-padded), matched inside each partition — never a
       broadcast id set;
    3. re-run the extraction DAG over the selected input → `retry/`;
    4. merged view `merged/` = final rows NOT matching the predicate
       ∪ retry rows — joinless, because the retried set is exactly the
       predicate's extension over final (exactly-once per doc_id)."""
    from .extract import build_extracted

    final_dir = os.path.join(out_dir, "final")
    retry_dir = os.path.join(out_dir, "retry")
    merged_dir = os.path.join(out_dir, "merged")

    failed = ray.data.read_parquet(
        final_dir, columns=["doc_id", "status", "failure_reason"]
    )

    def sel(batch: pa.Table) -> pa.Table:
        return batch.filter(_retryable_mask(batch)).select(["doc_id"])

    retry_ids_ds = failed.map_batches(sel, batch_format="pyarrow").materialize()
    n_retry = retry_ids_ds.count()
    if n_retry == 0:
        ledger.append_entry(out_dir, {"kind": "requeue", "retried": 0})
        return {"retried": 0, "retry_dir": None, "merged_dir": None}

    # --- co-partitioned semi-join: input rows whose doc_id is retryable
    from ..stages.shuffle import partitioned_map, str_partition

    inp = ray.data.read_parquet(input_path)
    inp_schema = inp.schema()

    def pad_ids(batch: pa.Table) -> pa.Table:
        cols: dict = {}
        for f in inp_schema.base_schema:    # exact input column order
            cols[f.name] = (
                batch.column("doc_id") if f.name == "doc_id"
                else pa.nulls(batch.num_rows, f.type)
            )
        cols["_is_id"] = pa.array(np.ones(batch.num_rows, dtype=bool))
        return pa.table(cols)

    def pad_input(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_is_id", pa.array(np.zeros(batch.num_rows, dtype=bool))
        )

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part",
            pa.array(str_partition(batch.column("doc_id").to_pylist()), pa.int64()),
        )

    def semi_join(part_tbl: pa.Table) -> pa.Table:
        is_id = part_tbl.column("_is_id").to_numpy(zero_copy_only=False)
        ids = part_tbl.column("doc_id").to_pandas()
        wanted = set(ids[is_id])
        keep = (~is_id) & ids.isin(wanted).to_numpy()
        return part_tbl.filter(pa.array(keep)).drop_columns(["_is_id", "part"])

    selected = partitioned_map(
        inp.map_batches(pad_input, batch_format="pyarrow").union(
            retry_ids_ds.map_batches(pad_ids, batch_format="pyarrow")
        ),
        add_part,
        semi_join,
    )

    tmp = retry_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    retry_input = os.path.join(tmp, "input")
    selected.write_parquet(retry_input)
    out = build_extracted(retry_input, cfg)
    out.write_parquet(os.path.join(tmp, "extracted"))
    shutil.rmtree(retry_dir, ignore_errors=True)
    os.rename(tmp, retry_dir)

    # --- merged view: final − predicate rows ∪ retry rows (joinless)
    keep_final = ray.data.read_parquet(final_dir).map_batches(
        lambda b: b.filter(pc.invert(_retryable_mask(b))), batch_format="pyarrow"
    )
    retry_rows = ray.data.read_parquet(os.path.join(retry_dir, "extracted"))
    mtmp = merged_dir + ".tmp"
    shutil.rmtree(mtmp, ignore_errors=True)
    keep_final.union(retry_rows).write_parquet(mtmp)
    shutil.rmtree(merged_dir, ignore_errors=True)
    os.rename(mtmp, merged_dir)

    ledger.append_entry(
        out_dir, {"kind": "requeue", "retried": n_retry, "merged": True}
    )
    return {"retried": n_retry, "retry_dir": retry_dir, "merged_dir": merged_dir}


def run_extraction(
    input_path: str,
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    n_chunks: int = 4,
    dedup_against: str | None = None,
) -> dict:
    """Full resumable run. Safe to call again after a crash."""
    run_extract_phase(input_path, out_dir, cfg, n_chunks)
    return run_finalize_phase(out_dir, cfg, dedup_against=dedup_against)


def file_etag(path: str) -> str:
    """Content-based file etag: size + md5 of the first AND last 64 KiB.
    The head catches prepended/row-group-0 edits; the TAIL is where the
    parquet footer/metadata lives, so any rewrite — including a
    same-size value edit in a late row group — changes the etag without
    reading multi-GB files. mtime is deliberately excluded: replays and
    copies must not look like edits."""
    import hashlib

    st = os.stat(path)
    h = hashlib.md5(str(st.st_size).encode())
    with open(path, "rb") as f:
        h.update(f.read(65536))
        if st.st_size > 65536:
            f.seek(max(65536, st.st_size - 65536))
            h.update(f.read(65536))
    return h.hexdigest()


def _file_chunk_id(path: str) -> str:
    """128-bit-derived chunk id (md5 of the full path, 64 bits kept).
    crc32-of-basename was a birthday bomb: ~50% collision odds at ~77k
    files, and a collision silently overwrites another file's rows."""
    import hashlib

    return f"f{hashlib.md5(path.encode()).hexdigest()[:16]}"


# How many pending input files one incremental pipeline execution
# covers. 1 reproduces the round-3 per-file behavior (finest targeted
# granularity, one DAG + actor-pool spin-up PER FILE — measured 11m24s
# for a 101-shard 200k-doc full run where the positional 8-chunk runner
# takes ~3m). The default trades that fixed cost against re-run
# amplification: a changed file re-extracts its whole group (≤ the
# dial), everything else stays reused. At shard counts in the millions
# this dial is what keeps the number of pipeline launches sane.
INCR_GROUP_FILES = int(os.environ.get("READUR_INCR_GROUP", "16"))


def _group_chunk_id(paths: list[str]) -> str:
    """Membership-derived group id: deterministic for resume (the same
    pending slice regroups to the same id after a crash)."""
    import hashlib

    return f"g{hashlib.md5('|'.join(paths).encode()).hexdigest()[:16]}"


def run_incremental(
    input_path: str,
    out_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    finalize: bool = True,
    group_files: int | None = None,
    dedup_against: str | None = None,
) -> dict:
    """W2+W3+W4 combined: snapshot-diff the input FILE manifest against
    the previous run's, decide skip / full / targeted with the
    reference's smart-sync table (state.sync.plan_sync), re-extract
    only what changed, and keep the output consistent with deletions.

    Remap note: the reference's targeted scan saves WebDAV directory
    LISTING cost; with a flat file manifest the listing is free, so
    here full-vs-targeted converge to "which files re-extract" — the
    decision table is kept for semantic parity, and etag-validated
    chunks give resume-after-input-mutation correctness the positional
    chunking of run_extract_phase cannot (a changed file's chunk
    re-runs because its ETAG no longer matches, not because its
    position moved).

    Execution granularity (round 4): pending files run in GROUPS of
    ``group_files`` (default INCR_GROUP_FILES) — one pipeline launch
    per group instead of per file. The ledger records each group's full
    {path: etag} membership; a group is reused only while EVERY member
    matches, so a changed/deleted member invalidates exactly its group
    (dir removed, surviving members regrouped and re-extracted).
    Invariant the finalize scan relies on: every input file is covered
    by exactly one live chunk dir."""
    import json

    from ..state.sync import plan_sync

    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = [input_path]
    current = {f: file_etag(f) for f in files}
    manifest_path = os.path.join(out_dir, "manifest.json")
    previous: dict[str, str] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            previous = json.load(fh)

    plan = plan_sync(previous, current)
    result: dict = {"mode": plan.decision, "changed": plan.changed,
                    "new": plan.new, "deleted": plan.deleted}
    if plan.decision == "skip":
        ledger.append_entry(out_dir, {"kind": "incremental", "mode": "skip"})
        return result

    extracted_root = os.path.join(out_dir, "extracted")
    if not previous and os.path.isdir(extracted_root):
        # first incremental run over a dir previously populated by the
        # positional runner (or vice versa): foreign chunk-* dirs would
        # double every doc in final/ because finalize reads the whole
        # directory. Refuse loudly rather than emit duplicates.
        foreign = [
            d for d in sorted(os.listdir(extracted_root))
            if d.startswith("chunk-")
            and not d.startswith(("chunk-f", "chunk-g"))
        ]
        if foreign:
            raise ValueError(
                f"out_dir {out_dir!r} holds positional chunks {foreign} from "
                "run_extraction; incremental file-chunks would duplicate "
                "their rows in final/. Use a fresh out_dir or delete them."
            )

    os.makedirs(extracted_root, exist_ok=True)
    removed = []

    # legacy per-file chunks (round-3 runs): reusable while the file's
    # etag matches; a mismatch on a still-present file is re-extracted
    # below (possibly inside a group), so its stale dir must go now
    legacy_etags = ledger.committed_etags(out_dir)
    covered: set[str] = set()
    for f in files:
        cid = _file_chunk_id(f)
        dirp = os.path.join(extracted_root, f"chunk-{cid}")
        if cid in legacy_etags:
            if legacy_etags[cid] == current[f] and os.path.isdir(dirp):
                covered.add(f)
            elif os.path.isdir(dirp):
                shutil.rmtree(dirp)
                removed.append(cid)
    for f in plan.deleted:  # legacy chunks of vanished files
        cid = _file_chunk_id(f)
        gone = os.path.join(extracted_root, f"chunk-{cid}")
        if os.path.isdir(gone):
            shutil.rmtree(gone)
            removed.append(cid)

    # group chunks: reusable only while EVERY member file still exists
    # with a matching etag — otherwise the whole group's dir goes and
    # its surviving members regroup with the rest of the pending set
    committed_group_map = ledger.committed_groups(out_dir)
    for cid, members in committed_group_map.items():
        dirp = os.path.join(extracted_root, f"chunk-{cid}")
        ok = os.path.isdir(dirp) and all(
            current.get(p) == e for p, e in members.items()
        )
        if ok:
            covered.update(members)
        else:
            if os.path.isdir(dirp):
                shutil.rmtree(dirp)
            removed.append(cid)
    # orphan chunks: a crash BETWEEN a chunk dir's atomic rename and
    # its ledger append leaves a dir no ledger entry owns. Its members
    # are not in `covered`, so they re-extract — possibly under a
    # DIFFERENT group id — and the orphan dir would double their rows
    # in final/ (finalize reads the whole extracted/ tree). Sweep every
    # incremental chunk dir the ledger doesn't know, plus stale tmps.
    ledgered = set(legacy_etags) | set(committed_group_map)
    for d in sorted(os.listdir(extracted_root)):
        full = os.path.join(extracted_root, d)
        if d.startswith(".tmp-chunk-"):
            shutil.rmtree(full, ignore_errors=True)
        elif (
            d.startswith(("chunk-f", "chunk-g"))
            and os.path.isdir(full)
            and d[len("chunk-"):] not in ledgered
        ):
            shutil.rmtree(full)
            removed.append(d[len("chunk-"):])

    if removed:
        ledger.append_entry(
            out_dir, {"kind": "incremental_removed", "chunks": removed}
        )

    pending = [f for f in files if f not in covered]
    group_n = max(1, INCR_GROUP_FILES if group_files is None else group_files)
    executed = []
    for i in range(0, len(pending), group_n):
        grp = pending[i:i + group_n]
        cid = _file_chunk_id(grp[0]) if len(grp) == 1 else _group_chunk_id(grp)
        final = os.path.join(extracted_root, f"chunk-{cid}")
        t0 = time.perf_counter()
        tmp = os.path.join(extracted_root, f".tmp-chunk-{cid}")
        shutil.rmtree(tmp, ignore_errors=True)
        build_extracted(grp, cfg).write_parquet(tmp)
        os.makedirs(tmp, exist_ok=True)  # zero-row writes create no dir
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        entry = {
            "chunk": cid, "input_files": grp,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }
        if len(grp) == 1:
            entry.update(kind="filechunk", etag=current[grp[0]])
        else:
            entry.update(
                kind="groupchunk", etags={p: current[p] for p in grp}
            )
        ledger.append_entry(out_dir, entry)
        executed.append(cid)

    tmp_manifest = manifest_path + ".tmp"
    with open(tmp_manifest, "w") as fh:
        json.dump(current, fh, sort_keys=True)
    os.replace(tmp_manifest, manifest_path)

    result["executed"] = executed
    result["removed"] = removed
    if finalize:
        result["summary"] = run_finalize_phase(
            out_dir, cfg, dedup_against=dedup_against
        )
    return result
