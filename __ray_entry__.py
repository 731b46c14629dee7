"""Driver contract: entry() / queries() / oracle_sql().

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/shutdown() here or in any callable.

Every queries() entry is a Ray-Data-first pipeline from
readur_ray.pipelines.*; each SQL-expressible one has a DuckDB oracle
below built from the SAME deterministic primitives (RE2 regexes, md5 /
sha256 hex, integer cents / integer ratio thresholds), so values match
bit-for-bit. Non-SQL-expressible entries (the full interleaved
extraction DAG with hermetic media engines) are listed in queries()
only → the driver records a rows-only check for them.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from readur_ray.registry import oracle_sql, queries  # noqa: F401


def entry() -> Any:
    """Flagship pipeline: interleaved corpus derived from sf0.001
    documents → full extraction DAG (text / media / skew branches)."""
    from readur_ray.pipelines.e2e import extraction_e2e

    return extraction_e2e("/root/testdata/sf0.001")
