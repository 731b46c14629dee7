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
import time

COMPACTION_TTL_SECONDS = 7 * 86400  # reference: 7-day completed-item TTL


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
    out: set[int] = set()
    for e in read_ledger(out_dir):
        if e.get("kind") == "chunk":
            out.add(e["chunk"])
        elif e.get("kind") == "snapshot":
            out.update(e["chunks"])
    return out


def committed_etags(out_dir: str) -> dict[str, str]:
    """{file-chunk id: etag} for committed incremental file-chunks,
    replayed in ledger order so later commits / removals / compaction
    snapshots compose correctly."""
    etags: dict[str, str] = {}
    for e in read_ledger(out_dir):
        kind = e.get("kind")
        if kind == "snapshot":
            etags.update(e.get("etags", {}))
        elif kind == "filechunk":
            etags[e["chunk"]] = e.get("etag")
        elif kind == "incremental_removed":
            for cid in e.get("chunks", []):
                etags.pop(cid, None)
    return etags


def committed_groups(out_dir: str) -> dict[str, dict[str, str]]:
    """{group-chunk id: {member path: etag}} for committed incremental
    GROUP chunks (several input files extracted in one pipeline run).
    Unlike per-file chunks, a group's id is not derivable from any one
    path, so the ledger carries the full membership; replayed in ledger
    order like committed_etags."""
    groups: dict[str, dict[str, str]] = {}
    for e in read_ledger(out_dir):
        kind = e.get("kind")
        if kind == "snapshot":
            groups.update(e.get("groups", {}))
        elif kind == "groupchunk":
            groups[e["chunk"]] = dict(e.get("etags", {}))
        elif kind == "incremental_removed":
            for cid in e.get("chunks", []):
                groups.pop(cid, None)
    return groups


def append_entry(out_dir: str, entry: dict) -> None:
    entry.setdefault("ts", time.time())
    os.makedirs(out_dir, exist_ok=True)
    with open(ledger_path(out_dir), "a") as f:
        f.write(json.dumps(entry, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def compact_ledger(
    out_dir: str, ttl_seconds: float = COMPACTION_TTL_SECONDS, now: float | None = None
) -> int:
    """W6 — completed-item TTL compaction
    (/root/reference/src/ocr/queue.rs:1085-1098: DELETE completed items
    older than 7 days). The ledger analog folds aged entries — positional
    ``chunk`` commits, incremental ``filechunk`` commits (their
    chunk→etag map survives in the snapshot so resume keeps working),
    removal / bookkeeping lines, plus any prior snapshot — into ONE
    snapshot line, then atomically rewrites the file (tmp + rename —
    the same crash-safety rule as chunk commits). Returns the number of
    entries folded away."""
    entries = read_ledger(out_dir)
    if not entries:
        return 0
    now = time.time() if now is None else now
    cutoff = now - ttl_seconds
    old_chunks: set[int] = set()
    etags: dict[str, str] = {}
    groups: dict[str, dict[str, str]] = {}
    rows = 0
    n_folded = 0
    keep: list[dict] = []
    for e in entries:
        kind = e.get("kind")
        aged = e.get("ts", now) <= cutoff
        if kind == "snapshot":
            old_chunks.update(e.get("chunks", []))
            etags.update(e.get("etags", {}))
            groups.update(e.get("groups", {}))
            rows += e.get("rows", 0)
            n_folded += 1
        elif kind == "chunk" and aged:
            old_chunks.add(e["chunk"])
            rows += e.get("rows", 0)
            n_folded += 1
        elif kind == "filechunk" and aged:
            etags[e["chunk"]] = e.get("etag")
            n_folded += 1
        elif kind == "groupchunk" and aged:
            groups[e["chunk"]] = dict(e.get("etags", {}))
            n_folded += 1
        elif kind == "incremental_removed" and aged:
            for cid in e.get("chunks", []):
                etags.pop(cid, None)
                groups.pop(cid, None)
            n_folded += 1
        elif kind in ("finalize", "incremental", "requeue") and aged:
            n_folded += 1  # bookkeeping only — no state to carry
        else:
            keep.append(e)
    if n_folded <= 1:
        return 0  # nothing to fold (a lone snapshot is already compact)
    snapshot = {
        "kind": "snapshot", "chunks": sorted(old_chunks), "rows": rows,
        "ts": now,
    }
    if etags:
        snapshot["etags"] = dict(sorted(etags.items()))
    if groups:
        snapshot["groups"] = {k: groups[k] for k in sorted(groups)}
    p = ledger_path(out_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        for e in [snapshot, *keep]:
            f.write(json.dumps(e, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)
    return n_folded
