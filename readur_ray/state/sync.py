"""Smart-sync planning (W3) — full-vs-targeted re-scan decisions.

Re-expresses the reference's SmartSyncService decision logic
(/root/reference/src/services/webdav/smart_sync.rs:64-157) over
snapshot manifests instead of a live WebDAV walk: the engine keeps a
per-directory etag manifest from the previous run (the ledger analog
of the `webdav_directories` table) and compares it against the current
listing's etags. The decision table is the reference's exactly:

- no known directories               → FULL deep scan (first run)
- no changed / new / deleted dirs    → SKIP sync entirely
- change_ratio > 0.3, or > 5 new, or any deleted → FULL deep scan
- else                               → TARGETED scan of changed + new

ETag equality uses the reference's RFC-7232 semantics
(/root/reference/src/webdav_xml_parser.rs:538-666): normalize (trim,
strip repeated ``W/`` weak markers, strip surrounding quotes), weak
comparison when either side is weak, strong otherwise.

The plan turns into a PUSHED-DOWN row filter on the scan
(``targeted_row_filter`` → ``load_documents(row_filter=…)``), so a
targeted sync never reads the unchanged 99% of a 100 TB corpus —
the decision costs one shallow manifest diff, not a data pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

CHANGE_RATIO_THRESHOLD = 0.3
MAX_NEW_FOR_TARGETED = 5


def normalize_etag(etag: str) -> str:
    result = etag.strip()
    while result.startswith(("W/", "w/")):
        result = result[2:].strip()
    if result.startswith('"') and result.endswith('"') and len(result) > 1:
        result = result[1:-1]
    return result


def is_weak_etag(etag: str) -> bool:
    return etag.strip().startswith(("W/", "w/"))


def etags_match(a: str, b: str) -> bool:
    """smart_compare: weak comparison if either side is weak (values
    equal after normalization), RFC-7232 strong comparison otherwise
    (values equal AND neither weak — which, given neither is weak,
    also reduces to normalized equality)."""
    return normalize_etag(a) == normalize_etag(b)


@dataclass
class SyncPlan:
    decision: str                       # 'skip' | 'full' | 'targeted'
    targets: list[str] = field(default_factory=list)
    changed: list[str] = field(default_factory=list)
    new: list[str] = field(default_factory=list)
    deleted: list[str] = field(default_factory=list)


def plan_sync(
    known: dict[str, str],
    discovered: dict[str, str],
    folder: str = "",
    change_ratio_threshold: float = CHANGE_RATIO_THRESHOLD,
    max_new_for_targeted: int = MAX_NEW_FOR_TARGETED,
) -> SyncPlan:
    """Decide skip / full / targeted from the manifest diff (the
    shallow-discovery comparison of smart_sync.rs:82-156)."""
    relevant = {p: e for p, e in known.items() if p.startswith(folder)}
    scoped = {p: e for p, e in discovered.items() if p.startswith(folder)}
    if not relevant:
        return SyncPlan("full")

    changed = sorted(
        p for p, e in scoped.items()
        if p in relevant and not etags_match(relevant[p], e)
    )
    new = sorted(p for p in scoped if p not in relevant)
    deleted = sorted(p for p in relevant if p not in scoped)

    if not changed and not new and not deleted:
        return SyncPlan("skip", changed=changed, new=new, deleted=deleted)

    total_changes = len(changed) + len(new) + len(deleted)
    change_ratio = total_changes / max(len(relevant), 1)
    if (
        change_ratio > change_ratio_threshold
        or len(new) > max_new_for_targeted
        or deleted
    ):
        return SyncPlan("full", changed=changed, new=new, deleted=deleted)
    return SyncPlan(
        "targeted", targets=changed + new, changed=changed, new=new,
        deleted=deleted,
    )


def targeted_row_filter(plan: SyncPlan, column: str = "source"):
    """pyarrow.dataset expression selecting only the plan's target
    directories — pushed into the parquet scan (row-group pruning) so
    a targeted sync reads only the changed slice."""
    import pyarrow.dataset as pads

    if plan.decision == "full":
        return None
    if plan.decision == "skip" or not plan.targets:
        # match-nothing sentinel (pyarrow rejects an empty isin list)
        return pads.field(column).isin(["\x00__none__"])
    return pads.field(column).isin(plan.targets)
