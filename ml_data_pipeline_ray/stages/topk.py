"""Distributed top-k without a global sort (SURVEY.md O3).

``Dataset.sort(...).limit(k)`` pays a full range-partitioned sort shuffle for
k rows. Per-block top-k inside ``map_batches`` followed by one tiny driver
merge moves at most ``k x num_blocks`` rows — the classic reduction. Ties
must be broken by the caller's full key list for determinism.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def topk(ds: rd.Dataset, by: list[str], k: int,
         descending: list[bool] | bool = True) -> pd.DataFrame:
    """Exact top-k rows of ``ds`` under lexicographic order over ``by``."""
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    ascending = [not d for d in descending]

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    cand = ds.map_batches(block_topk, batch_format="pandas").to_pandas()
    return (cand.sort_values(by, ascending=ascending, kind="mergesort")
            .head(k).reset_index(drop=True))


def grouped_topk(ds: rd.Dataset, group: str, by: list[str], k: int,
                 descending: list[bool] | bool = True) -> pd.DataFrame:
    """Exact per-``group`` top-k under lexicographic order over ``by``.

    Map-side pruning: each block keeps at most k rows PER GROUP it contains
    (one vectorized groupby-head, no per-group Python), so at most
    ``k x groups-per-block x num_blocks`` candidate rows leave the scan —
    input-sized data never shuffles. The driver merge then re-applies the
    same head-k per group over the (tiny) candidate set. For a group-key
    cardinality too large for a driver merge, feed the candidates to ONE
    ``groupby(group)`` shuffle instead — the map-side prune is what matters
    at scale."""
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    ascending = [not d for d in descending]
    keys = [group] + by
    asc = [True] + ascending

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(keys, ascending=asc, kind="mergesort")
        return s.groupby(group, sort=False).head(k)

    cand = ds.map_batches(block_topk, batch_format="pandas").to_pandas()
    return (cand.sort_values(keys, ascending=asc, kind="mergesort")
            .groupby(group, sort=False).head(k).reset_index(drop=True))
