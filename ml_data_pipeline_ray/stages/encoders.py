"""Fitted preprocessing encoders (reference T11 parity — the `categorical` /
`numeric` transform families are declared-only crates there, and
``OneHotEncoder`` is the reference README's canonical pipeline example,
``ml-data/README.md:94``).

Ray-native fit/transform: *fit* is a distributed pass producing a small
state object (vocabulary / moments); *transform* broadcasts that state and
runs vectorized per batch. No shared mutable state — the two-pass pattern is
the scalable replacement for the reference's in-loop fitted transforms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


class OneHotEncoder:
    """One-hot expansion of a categorical string column.

    ``fit`` collects the sorted distinct vocabulary (one distributed
    ``unique``); ``transform`` appends one int8 0/1 column per category,
    named ``{col}_{value}``. Unknown values at transform time map to all
    zeros (standard encoder semantics)."""

    def __init__(self, col: str):
        self.col = col
        self.categories: list[str] | None = None

    def fit(self, ds: rd.Dataset) -> "OneHotEncoder":
        self.categories = sorted(v for v in ds.unique(self.col) if v is not None)
        return self

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        assert self.categories is not None, "fit first"
        col = batch.column(self.col)
        for cat in self.categories:
            ind = pc.cast(pc.equal(col, cat), pa.int8())
            ind = pc.fill_null(ind, 0)
            batch = batch.append_column(f"{self.col}_{cat}", ind)
        return batch

    def transform(self, ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(self.transform_batch, batch_format="pyarrow",
                              zero_copy_batch=True)


class StandardScaler:
    """(x - mean) / std per column; moments from one distributed aggregate
    pass (sum, sum of squares, count — mergeable, no full materialization).

    ``stabilize_decimals=d`` declares that the input values lie on a
    d-decimal grid: the fitted sums are snapped back onto that grid
    (``round(sum * 10^d) / 10^d``; squares on the 2d grid), which removes
    partial-sum-ordering ulp noise and makes the fit bit-reproducible across
    parallelism levels and engines."""

    def __init__(self, cols: list[str], stabilize_decimals: int | None = None):
        self.cols = cols
        self.stabilize_decimals = stabilize_decimals
        self.stats: dict[str, tuple[float, float]] | None = None

    def fit(self, ds: rd.Dataset) -> "StandardScaler":
        def sq(batch: pa.Table) -> pa.Table:
            for c in self.cols:
                batch = batch.append_column(
                    f"_sq_{c}", pc.multiply(batch[c], batch[c]))
            return batch

        aggs = []
        for c in self.cols:
            aggs += [Sum(c, alias_name=f"s_{c}"), Sum(f"_sq_{c}", alias_name=f"q_{c}")]
        aggs.append(Count(alias_name="n"))
        row = (ds.map_batches(sq, batch_format="pyarrow", zero_copy_batch=True)
               .aggregate(*aggs))
        n = row["n"]
        self.stats = {}
        for c in self.cols:
            s, q = row[f"s_{c}"], row[f"q_{c}"]
            if self.stabilize_decimals is not None:
                g1 = 10.0 ** self.stabilize_decimals
                g2 = 10.0 ** (2 * self.stabilize_decimals)
                s = np.round(s * g1) / g1
                q = np.round(q * g2) / g2
            mean = s / n
            var = max(q / n - mean * mean, 0.0)
            self.stats[c] = (mean, float(np.sqrt(var)) or 1.0)
        return self

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        assert self.stats is not None, "fit first"
        for c in self.cols:
            mean, std = self.stats[c]
            scaled = pc.divide(pc.subtract(batch[c], mean), std if std else 1.0)
            batch = batch.set_column(batch.column_names.index(c), c, scaled)
        return batch

    def transform(self, ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(self.transform_batch, batch_format="pyarrow",
                              zero_copy_batch=True)


class MinMaxScaler:
    """(x - min) / (max - min) per column (distributed min/max fit)."""

    def __init__(self, cols: list[str]):
        self.cols = cols
        self.ranges: dict[str, tuple[float, float]] | None = None

    def fit(self, ds: rd.Dataset) -> "MinMaxScaler":
        aggs = []
        for c in self.cols:
            aggs += [Min(c, alias_name=f"lo_{c}"), Max(c, alias_name=f"hi_{c}")]
        row = ds.aggregate(*aggs)
        self.ranges = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in self.cols}
        return self

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        assert self.ranges is not None, "fit first"
        for c in self.cols:
            lo, hi = self.ranges[c]
            span = (hi - lo) or 1.0
            scaled = pc.divide(pc.subtract(batch[c], lo), span)
            batch = batch.set_column(batch.column_names.index(c), c, scaled)
        return batch

    def transform(self, ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(self.transform_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
