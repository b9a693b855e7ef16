"""Distinct set operations over Datasets: union/intersect/except (U1).

The reference implies multi-file union only (``factory.rs:52-136``); union is
``Dataset.union``. Intersect/except are built the shuffle-minimal way: tag
each side with a presence bit, ONE ``groupby(cols)`` shuffle over the
distinct-candidate rows (pre-deduped per batch so only unique rows move),
then a vectorized per-group presence test.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _tag(side: int, cols: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        # per-batch pre-dedup: only distinct rows enter the shuffle
        batch = batch.select(cols).group_by(cols).aggregate([])
        return batch.append_column(
            "_side", pa.array([side] * batch.num_rows, pa.int8()))
    return fn


def _reduce(anti: bool, cols: list[str]):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        sides = g["_side"]
        has_a, has_b = (sides == 0).any(), (sides == 1).any()
        keep = (has_a and not has_b) if anti else (has_a and has_b)
        if keep:
            return g.head(1)[cols]
        return g.head(0)[cols]
    return fn


def intersect_distinct(a: rd.Dataset, b: rd.Dataset,
                       cols: list[str]) -> rd.Dataset:
    """Rows (projected to ``cols``, distinct) present in BOTH datasets."""
    both = a.map_batches(_tag(0, cols), batch_format="pyarrow").union(
        b.map_batches(_tag(1, cols), batch_format="pyarrow"))
    return both.groupby(cols).map_groups(_reduce(False, cols),
                                         batch_format="pandas")


def except_distinct(a: rd.Dataset, b: rd.Dataset,
                    cols: list[str]) -> rd.Dataset:
    """Distinct rows of ``a`` (projected to ``cols``) absent from ``b``."""
    both = a.map_batches(_tag(0, cols), batch_format="pyarrow").union(
        b.map_batches(_tag(1, cols), batch_format="pyarrow"))
    return both.groupby(cols).map_groups(_reduce(True, cols),
                                         batch_format="pandas")
