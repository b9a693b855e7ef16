"""Independent oracle replay of a CDC changelog (pandas; no Ray).

Defines the semantics the engine must match (FIXTURES.md F2 oracle):
per key ``(conv_id, turn_idx)`` the winner is the event with max ``lsn``,
tie-broken by op precedence ``delete > update > insert`` (engine rule —
the reference is silent on ties, SURVEY.md §4 "Ordering"); keys whose
winner is a ``delete`` are absent from the final table; output is sorted
by ``(conv_id, turn_idx)`` (stable turn ordering for equality checks).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_OP_RANK = {"insert": 0, "update": 1, "delete": 2}

FINAL_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def oracle_replay(changelog: pa.Table | pd.DataFrame,
                  extra_columns: list[str] | None = None) -> pd.DataFrame:
    """Replay a changelog to its final table state (the ground truth)."""
    df = changelog.to_pandas() if isinstance(changelog, pa.Table) else changelog.copy()
    df["_rank"] = df["op"].map(_OP_RANK)
    df = df.sort_values(["lsn", "_rank"], kind="mergesort")
    winners = df.groupby(["conv_id", "turn_idx"], as_index=False, sort=False).tail(1)
    live = winners[winners["op"] != "delete"]
    cols = FINAL_COLUMNS + (extra_columns or [])
    out = (live[[c for c in cols if c in live.columns]]
           .sort_values(["conv_id", "turn_idx"], kind="mergesort")
           .reset_index(drop=True))
    return out
