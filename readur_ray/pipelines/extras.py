"""Remaining SURVEY §2 operators as query pipelines: M1-M3 MIME
detection, pg_trgm-style fuzzy similarity (F1 fuzzy mode), the
retry-selection predicate DSL (§2.11), and per-partition extraction
metrics (A5).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..functions.mime import are_mime_types_compatible, detect_mime_from_content

FUZZY_QUERY = "spark query plan"
FUZZY_THRESHOLD_NUM = 3    # similarity >= 3/100 (pg_trgm default is 0.3;
FUZZY_THRESHOLD_DEN = 100  # the tiny fixture vocab needs a lower bar)


def _char_trigrams(s: str) -> set[str]:
    """Distinct character 3-grams of the lowercased string (whole-string
    windows; strings shorter than 3 contribute themselves)."""
    s = s.lower()
    if len(s) < 3:
        return {s} if s else set()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def fuzzy_search(sf_dir: str) -> "ray.data.Dataset":
    """F1 fuzzy mode (pg_trgm similarity(), /root/reference/src/db/
    documents/search.rs:117-128): char-trigram Jaccard between each
    doc and the query string, integer-threshold filtered. Outputs
    integer intersection/size columns only (oracle-exact)."""
    qgrams = _char_trigrams(FUZZY_QUERY)
    nq = len(qgrams)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        ids, inter_out, nd_out = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            dgrams = _char_trigrams(text or "")
            inter = len(dgrams & qgrams)
            union = len(dgrams) + nq - inter
            if union > 0 and inter * FUZZY_THRESHOLD_DEN >= union * FUZZY_THRESHOLD_NUM:
                ids.append(doc_id)
                inter_out.append(inter)
                nd_out.append(len(dgrams))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "intersection": pa.array(inter_out, pa.int64()),
                "n_doc_trigrams": pa.array(nd_out, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def retry_selection(sf_dir: str) -> "ray.data.Dataset":
    """§2.11 retry-selection DSL (/root/reference/src/routes/
    documents_ocr_retry.rs:20-61): predicate builder over
    lang ∈ {…} AND size range AND source prefix, with a LIMIT —
    compiled to pushed-down filters + vectorized masks + limit."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.is_in(batch.column("lang"), value_set=pa.array(["en", "de"])),
                pc.and_(
                    pc.greater_equal(batch.column("n_chars"), 200),
                    pc.less_equal(batch.column("n_chars"), 1500),
                ),
            ),
            pc.starts_with(batch.column("source"), pattern="src1"),
        )
        return batch.filter(keep)

    # deterministic LIMIT: order by doc_id (not block arrival order)
    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
        .limit(50)
    )


def mime_detection(sf_dir: str) -> "ray.data.Dataset":
    """M1-M3 over synthetic payload prefixes derived from each doc
    (magic bytes > trusted server type > extension; compatibility
    check against the declared type). Deterministic fixture: the
    payload prefix, claimed extension and server type are keyed off
    doc_id so every lattice path is exercised."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    prefixes = [b"%PDF-1.4\n", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0",
                b"PK\x03\x04", b"plain text here"]
    exts = ["pdf", "png", "jpg", "zip", "txt"]
    servers = ["application/pdf", "application/octet-stream", "image/jpg",
               "", "text/plain"]

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        detected, declared, compat = [], [], []
        for doc_id in ids:
            k = doc_id % 5
            payload = prefixes[k] + str(doc_id).encode()
            server = servers[(doc_id // 5) % 5]
            filename = f"doc{doc_id}.{exts[k]}"
            d = detect_mime_from_content(payload, filename, server)
            detected.append(d)
            declared.append(server)
            compat.append(bool(server) and are_mime_types_compatible(d, server))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "detected_mime": pa.array(detected, pa.string()),
                "server_mime": pa.array(declared, pa.string()),
                "compatible": pa.array(compat, pa.bool_()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def metrics_parquet_dir(sf_dir: str) -> str:
    """Deterministic scratch path the oracle SQL reads back (the
    extraction itself is hermetic-engine work no SQL can mirror, so the
    oracle verifies the metrics AGGREGATION over the materialized e2e
    output — bucket edges, groupby, sums — in DuckDB).

    Deliberately sf-agnostic: oracle_sql() strings are built without
    knowing the sf_dir the harness will pass to queries(), so the
    oracle must read whatever run the query JUST wrote. One fixed dir
    gives exactly that (the harness always runs the Ray query before
    its oracle); an sf-keyed dir made a check at sf0.001 compare
    against a stale sf0.01 run — same group structure (statuses and
    confidences key off doc_id), different sf-dependent word totals."""
    del sf_dir
    return "/tmp/readur_ray_metrics/extracted"


def extraction_metrics(sf_dir: str) -> "ray.data.Dataset":
    """A5 per-partition extraction metrics (ocr_metrics analog,
    /root/reference/migrations/20250620100001_add_ocr_queue.sql:33-46)
    over the flagship e2e run: per (part_id, status) doc counts, word
    totals and confidence-bucket histogram — partial-aggregated inside
    map_batches before the tiny groupby. The e2e output is first
    materialized to metrics_parquet_dir(sf_dir) so the DuckDB oracle
    can recompute the identical aggregation from the same rows."""
    import shutil

    from .e2e import extraction_e2e

    out_dir = metrics_parquet_dir(sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # materialize ONLY the metric inputs (4 narrow columns — the spans
    # never hit disk here; the oracle needs the same rows, not the text)
    extraction_e2e(sf_dir).select_columns(
        ["part_id", "status", "confidence", "word_count", "pages_ocrd"]
    ).write_parquet(out_dir)
    ds = ray.data.read_parquet(
        out_dir,
        columns=["part_id", "status", "confidence", "word_count", "pages_ocrd"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        bucket = np.clip((conf // 10).astype(np.int64), 0, 10)
        t = pa.table(
            {
                "part_id": batch.column("part_id").cast(pa.int64()),
                "status": batch.column("status"),
                "conf_bucket": pa.array(bucket, pa.int64()),
                "words": batch.column("word_count").cast(pa.int64()),
                "pages": batch.column("pages_ocrd").cast(pa.int64()),
            }
        )
        g = t.group_by(["part_id", "status", "conf_bucket"]).aggregate(
            [("words", "sum"), ("pages", "sum"), ("words", "count")]
        )
        return pa.table(
            {
                "part_id": g.column("part_id"),
                "status": g.column("status"),
                "conf_bucket": g.column("conf_bucket"),
                "words": g.column("words_sum"),
                "pages": g.column("pages_sum"),
                "n": g.column("words_count").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["part_id", "status", "conf_bucket"])
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("words", alias_name="total_words"),
            Sum("pages", alias_name="total_pages_ocrd"),
        )
    )


# ---------------------------------------------------------------------------
# semi-structured JSON field extraction (ETL over the props column)
# ---------------------------------------------------------------------------

PROPS_K_PATTERN = r'"k":\s*(?P<k>-?\d+)'


def json_props_extract(sf_dir: str) -> "ray.data.Dataset":
    """Extract the integer field `k` from the events' JSON `props`
    column — the semi-structured-ETL scalar class (§2.9 family):
    vectorized RE2 extraction (pyarrow extract_regex; the oracle runs
    the identical pattern through DuckDB regexp_extract), no Python
    per-row loop, one streaming pass. Returns (event_id, event_type,
    k)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "props"],
    )

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), PROPS_K_PATTERN)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "k": k,
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")
