"""Commit ledger for resumable runs (north_rule checkpoint contract).

The reference keeps queue state durable in Postgres so a restart never
re-processes completed work (/root/reference/src/ocr/queue.rs:148-285,
stale-job recovery queue.rs:1101-1121). The Ray engine's equivalent is
a per-chunk commit ledger over a partitioned output layout:

    out_dir/
      extracted/chunk-<k>/part-*.parquet   (written atomically: tmp dir
                                            + rename, then ledger append)
      ledger.jsonl                          one line per committed chunk:
                                            {chunk, input_files, rows,
                                             status_counts, wall_sec}
      final/  metrics.parquet               dedup-marked output + metrics

A chunk is a group of INPUT FILES, so a resumed run prunes whole file
groups at the read (never re-reads committed fragments) — the
anti-join of input fragments vs committed ledger rows happens on the
driver over file names, not over 10^12 rows.
"""

from __future__ import annotations

import json
import os


def ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, "ledger.jsonl")


def read_ledger(out_dir: str) -> list[dict]:
    p = ledger_path(out_dir)
    if not os.path.exists(p):
        return []
    entries = []
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def committed_chunks(out_dir: str) -> set[int]:
    return {e["chunk"] for e in read_ledger(out_dir) if e.get("kind") == "chunk"}


def append_entry(out_dir: str, entry: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(ledger_path(out_dir), "a") as f:
        f.write(json.dumps(entry, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())
