"""Per-user settings multiplicity (reference Settings rows).

The reference stores one ``Settings`` row per user
(/root/reference/src/models/settings.rs:7-65) and the OCR pipeline
reads the owning user's row per document. The Ray remap: the frozen
base ``ExtractionConfig`` carries ``user_overrides`` (nested tuples so
the dataclass stays hashable); each extraction ACTOR materializes the
per-user configs ONCE in ``__init__`` via this store (never per batch
or per row), and rows carrying an optional ``user_id`` column resolve
their effective config with a dict lookup.

At 10^12 docs the user table is still small (users ≪ docs) so a
per-actor dict is the right shape — the same broadcast-small-side rule
as the LSH anchor matrices.
"""

from __future__ import annotations

import dataclasses

from ..config import ExtractionConfig


class SettingsStore:
    """user_id → effective ExtractionConfig, built once per actor."""

    def __init__(self, base: ExtractionConfig):
        self.base = base
        self._by_user: dict[str, ExtractionConfig] = {
            user: dataclasses.replace(base, **dict(kvs))
            for user, kvs in base.user_overrides
        }

    def for_user(self, user_id: str | None) -> ExtractionConfig:
        if user_id is None:
            return self.base
        return self._by_user.get(user_id, self.base)
