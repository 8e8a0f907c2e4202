"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in beamium_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: tokenized sequences
    (derived deterministically from documents doc_ids) → derive/parse/
    relabel → windowed rollup with gap-fill → 1m tier rows."""
    from beamium_ray.queries import flagship_rollup_1m

    return flagship_rollup_1m("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 and
    the training-data op set (see beamium_ray.queries)."""
    from beamium_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for every SQL-expressible query (names and
    column names match the Ray results exactly)."""
    from beamium_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
