"""Deterministic on-disk locations of the CDC transcript fixtures.

The driver's correctness harness runs each Ray query AND its DuckDB oracle
SQL over the same inputs. For CDC queries the input is OUR generated
changelog (BASELINE.json ``input_hint`` shape), so both sides read the same
deterministic path under ``/tmp`` — the generator is a pure function of
(scale, seed), so whichever side runs first can materialize it.
"""

from __future__ import annotations

import os

from ..fixtures import ensure_fixture_set

FIX_BASE = "/tmp/mdpr_fixtures"
SEED = 42
N_FILES = 16

#: sf directory name -> fixture scale (FIXTURES.md scales)
SCALE_FOR_SF = {"sf0.001": "tiny", "sf0.01": "small", "sf0.1": "bench"}


def scale_for_sf_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return SCALE_FOR_SF.get(base, "small")


def fixture_paths(scale: str, evolve: bool = False) -> dict[str, str]:
    """Idempotently materialize + return the fixture set for a scale."""
    root = os.path.join(FIX_BASE, scale + ("_evolved" if evolve else ""))
    n_files = 64 if scale == "xxbench" else N_FILES
    return ensure_fixture_set(root, scale=scale, seed=SEED, n_files=n_files,
                              evolve=evolve)


def changelog_glob(scale: str, evolve: bool = False) -> str:
    root = os.path.join(FIX_BASE, scale + ("_evolved" if evolve else ""))
    return os.path.join(root, "changelog", "*.parquet")


def transcripts_glob(scale: str) -> str:
    return os.path.join(FIX_BASE, scale, "transcripts", "*.parquet")
