"""Registry package: the driver-contract implementation.

__ray_entry__.py stays the driver's import surface; the 12k-line
bodies moved here in round 5 (no module over 6k lines):
queries_all.py (ordered registry), oracles_a.py / oracles_b.py
(DuckDB mirrors, split at a statement boundary no local live
range crosses), common.py (shared SQL fragments).
"""

from __future__ import annotations

from .queries_all import queries  # noqa: F401


def oracle_sql() -> dict[str, str]:
    from . import oracles_a, oracles_b

    sql: dict[str, str] = {}
    oracles_a.add(sql)
    oracles_b.add(sql)
    return sql
