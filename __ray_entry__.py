"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay pipeline on sf0.001-scale fixtures;
``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL (same column names) for each
SQL-expressible entry. The driver owns the Ray session — nothing here calls
``ray.init`` / ``ray.shutdown``.

CDC / near-dup queries run over OUR deterministic transcript fixtures
(BASELINE.json ``input_hint`` shape); both the Ray side and the oracle SQL
read the same /tmp parquet files, materialized idempotently at import (pure
function of (scale, seed) — byte-identical regardless of which side runs
first).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ml_data_pipeline_ray.context import tune_data_context
from ml_data_pipeline_ray.pipelines import build_oracle_sql, build_queries
from ml_data_pipeline_ray.pipelines.fixture_paths import fixture_paths

# the driver owns the Ray session; tune block sizing for it (no ray.init here)
tune_data_context()

# materialize the fixture sets both sides read (idempotent, seeded)
for _scale in ("tiny", "small"):
    fixture_paths(_scale)
    fixture_paths(_scale, evolve=True)


def entry() -> Any:
    """Flagship pipeline: CDC changelog replay into a partitioned lake with
    exactly-once commit; returns the converged final table as a Dataset."""
    from ml_data_pipeline_ray.pipelines.cdc_queries import cdc_replay
    return cdc_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
