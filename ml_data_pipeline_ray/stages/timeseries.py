"""Time-series operators: frequency parsing, regularity detection, gap fill
(SURVEY.md S9 parity — the reference's timeseries source is a stub but its
options surface defines the semantics: frequency strings like "5min"
(``ml-data/ml-data-readers/src/timeseries.rs:46-122``), regular/irregular
metadata (``:222-226``), and fill methods Forward/Backward/Linear/Zero/Nan
(``:172-184``)).

Ray-native shape: per-key gap fill is ``groupby(key).map_groups`` over
ts-sorted groups — the partitioning assumption is one key's series fits one
group (standard for per-entity series)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

_FREQ_RE = re.compile(r"^\s*(\d+)?\s*(ns|us|ms|s|sec|min|h|hr|d|day|w)\s*$", re.I)

_UNIT_NS = {
    "ns": 1, "us": 1_000, "ms": 1_000_000,
    "s": 1_000_000_000, "sec": 1_000_000_000,
    "min": 60 * 1_000_000_000, "h": 3_600 * 1_000_000_000,
    "hr": 3_600 * 1_000_000_000, "d": 86_400 * 1_000_000_000,
    "day": 86_400 * 1_000_000_000, "w": 7 * 86_400 * 1_000_000_000,
}

FILL_METHODS = ("forward", "backward", "linear", "zero", "nan")


def parse_frequency(freq: str) -> int:
    """'5min' / '1 h' / 's' → nanoseconds (reference ``timeseries.rs:46-122``)."""
    m = _FREQ_RE.match(freq)
    if not m:
        raise ValueError(f"unparseable frequency {freq!r}")
    count = int(m.group(1) or 1)
    return count * _UNIT_NS[m.group(2).lower()]


def infer_regularity(ts: pd.Series) -> dict:
    """Is the series regular? Returns {regular, freq_ns (mode gap), n_gaps}."""
    t = ts.sort_values().to_numpy(dtype="datetime64[ns]").astype(np.int64)
    if t.size < 2:
        return {"regular": True, "freq_ns": 0, "n_gaps": 0}
    gaps = np.diff(t)
    vals, counts = np.unique(gaps, return_counts=True)
    mode = int(vals[counts.argmax()])
    irregular = int((gaps != mode).sum())
    return {"regular": irregular == 0, "freq_ns": mode, "n_gaps": irregular}


def fill_gaps(df: pd.DataFrame, ts_col: str, value_cols: list[str],
              freq: str, method: str = "forward") -> pd.DataFrame:
    """Regularize one series onto the freq grid and fill missing values.

    Methods mirror the reference's enum: forward/backward/linear/zero/nan."""
    if method not in FILL_METHODS:
        raise ValueError(f"unknown fill method {method!r}")
    freq_ns = parse_frequency(freq)
    df = df.sort_values(ts_col)
    idx = pd.DatetimeIndex(df[ts_col])
    full = pd.date_range(idx.min(), idx.max(), freq=pd.Timedelta(freq_ns, "ns"))
    out = df.set_index(ts_col).reindex(full)
    cols = out[value_cols]
    if method == "forward":
        cols = cols.ffill()
    elif method == "backward":
        cols = cols.bfill()
    elif method == "linear":
        cols = cols.interpolate(method="linear")
    elif method == "zero":
        cols = cols.fillna(0.0)
    out[value_cols] = cols
    out.index.name = ts_col
    return out.reset_index()


def regularize_per_key(ds: rd.Dataset, key: str, ts_col: str,
                       value_cols: list[str], freq: str,
                       method: str = "forward") -> rd.Dataset:
    """Distributed per-key gap fill: one shuffle on ``key``, then each series
    regularizes independently inside ``map_groups``."""
    other = [key] + value_cols

    def fix(g: pd.DataFrame) -> pd.DataFrame:
        filled = fill_gaps(g, ts_col, value_cols, freq, method)
        filled[key] = g[key].iloc[0]
        return filled[[key, ts_col] + value_cols]

    return ds.select_columns([c for c in set(other + [ts_col])]) \
             .groupby(key).map_groups(fix, batch_format="pandas")
