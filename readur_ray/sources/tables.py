"""Table-format adapter: Lance first, parquet fallback.

The north-star input is a Lance table of interleaved documents; this
container has no `lance`/`pylance` wheel, so the reader resolves the
format at runtime — `ray.data.read_lance` when the dataset is a
`.lance` directory AND the lance library imports, else
`ray.data.read_parquet` with the same column pruning / row filter /
block-count arguments. Every pipeline reads through here, so a Lance
deployment is a data-path change only.
"""

from __future__ import annotations

import os

import ray.data


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_dataset(path) -> bool:
    if not isinstance(path, str):  # list of parquet files (chunked runner)
        return False
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table(
    path: str,
    columns: list[str] | None = None,
    row_filter=None,
    override_num_blocks: int | None = None,
    row_filter_sql: str | None = None,
) -> "ray.data.Dataset":
    """Format-dispatching read with pushdown. `row_filter` is a
    pyarrow.dataset expression (the parquet reader's pushdown form);
    `row_filter_sql` is the SAME predicate as a SQL string, which is
    what `ray.data.read_lance` pushes down. Callers with a filter pass
    both spellings; omitting `row_filter_sql` on a Lance dataset is
    still CORRECT whenever the caller re-applies the predicate
    in-stream (extraction's route_filter does) — only the row-group
    pruning is lost."""
    if is_lance_dataset(path):
        if not lance_available():
            raise NotImplementedError(
                f"{path} is a Lance dataset but the lance library is not "
                "installed in this environment; install pylance or convert "
                "to parquet."
            )
        kwargs = {}
        if columns is not None:
            kwargs["columns"] = columns
        if override_num_blocks is not None:
            kwargs["override_num_blocks"] = override_num_blocks
        if row_filter_sql is not None:
            kwargs["filter"] = row_filter_sql
        return ray.data.read_lance(path, **kwargs)
    return ray.data.read_parquet(
        path,
        columns=columns,
        filter=row_filter,
        override_num_blocks=override_num_blocks,
    )


def write_table(ds: "ray.data.Dataset", path: str, fmt: str = "auto") -> str:
    """Format-dispatching SINK (the S9 analog of read_table): write a
    Dataset as Lance when requested/available, else partitioned
    parquet. 'auto' prefers Lance only when the library is importable —
    the format choice is a data-path change, mirroring the reader.
    Returns the format actually written."""
    if fmt == "lance" or (fmt == "auto" and lance_available()):
        if not lance_available():
            raise NotImplementedError(
                "lance output requested but the lance library is not "
                "installed; use fmt='parquet'."
            )
        ds.write_lance(path)
        return "lance"
    ds.write_parquet(path)
    return "parquet"


def jsonl_roundtrip(sf_dir: str) -> "pa.Table":
    """JSON-Lines source/sink roundtrip — the format-coverage proof
    for the engine's newline-delimited-JSON path: the documents
    projection streams OUT through ``Dataset.write_json`` (one shard
    per block — the partitioned, resumable layout every sink here
    uses) and back IN through ``ray.data.read_json``, and the
    checksum aggregate (docs, Σdoc_id, Σn_chars, Σ|text| recomputed
    from the decoded strings) must equal the same aggregate DuckDB
    computes on the original parquet — newline/quote/unicode
    escaping included, or the text-length sum drifts. Scale shape:
    write and read both stream block-parallel; the only global step
    is a 4-int aggregate."""
    import shutil

    import numpy as np
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum as _Sum

    out_dir = "/tmp/readur_roundtrip_jsonl"
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    ).write_json(out_dir)

    back = ray.data.read_json(out_dir)

    def fold(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        tl = pc.sum(
            pc.utf8_length(batch.column("text").cast(pa.string()))
        ).as_py() or 0
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "sum_doc_id": pa.array(
                    [int(pc.sum(batch.column("doc_id").cast(pa.int64())).as_py() or 0)],
                    pa.int64(),
                ),
                "sum_n_chars": pa.array(
                    [int(pc.sum(batch.column("n_chars").cast(pa.int64())).as_py() or 0)],
                    pa.int64(),
                ),
                "sum_text_len": pa.array([int(tl)], pa.int64()),
            }
        )

    agg = (
        back.map_batches(fold, batch_format="pyarrow")
        .aggregate(
            _Sum("n_docs", alias_name="n_docs"),
            _Sum("sum_doc_id", alias_name="sum_doc_id"),
            _Sum("sum_n_chars", alias_name="sum_n_chars"),
            _Sum("sum_text_len", alias_name="sum_text_len"),
        )
    )
    import pyarrow as pa

    return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in agg.items()})


def csv_roundtrip(sf_dir: str) -> "pa.Table":
    """CSV source/sink roundtrip — the sibling of jsonl_roundtrip for
    the quoted-CSV path: documents stream out through
    ``Dataset.write_csv`` (block-parallel shards) and back in through
    ``ray.data.read_csv``; embedded quotes, commas and newlines in
    the text column all ride RFC-4180 quoting, and the same 4-int
    checksum (with Σ|text| recomputed from the PARSED strings) must
    equal the parquet-side oracle. Scale shape: identical to the
    JSONL twin — streaming both ways, one bounded aggregate."""
    import shutil

    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum as _Sum

    out_dir = "/tmp/readur_roundtrip_csv"
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    ).write_csv(out_dir)

    back = ray.data.read_csv(out_dir)

    def fold(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        tl = pc.sum(
            pc.utf8_length(batch.column("text").cast(pa.string()))
        ).as_py() or 0
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "sum_doc_id": pa.array(
                    [int(pc.sum(batch.column("doc_id").cast(pa.int64())).as_py() or 0)],
                    pa.int64(),
                ),
                "sum_n_chars": pa.array(
                    [int(pc.sum(batch.column("n_chars").cast(pa.int64())).as_py() or 0)],
                    pa.int64(),
                ),
                "sum_text_len": pa.array([int(tl)], pa.int64()),
            }
        )

    agg = (
        back.map_batches(fold, batch_format="pyarrow")
        .aggregate(
            _Sum("n_docs", alias_name="n_docs"),
            _Sum("sum_doc_id", alias_name="sum_doc_id"),
            _Sum("sum_n_chars", alias_name="sum_n_chars"),
            _Sum("sum_text_len", alias_name="sum_text_len"),
        )
    )
    import pyarrow as pa

    return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in agg.items()})
