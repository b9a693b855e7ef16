"""HyperLogLog approximate distinct count (the sketches family, P6).

Map-side partials: each batch emits ONE row holding its 2^p register
array; partials merge by element-wise max (associative + commutative, so
any combine order — and any row partitioning — yields the IDENTICAL
sketch: the estimate is deterministic for a given dataset). The driver
holds only 2^p bytes; at 100 TB the shuffle-free register pass replaces a
full `unique()` exchange when ±1.6% (p=12) accuracy is enough.

Estimator: the classic bias-corrected harmonic mean (Flajolet et al. 2007)
with the small-range linear-counting correction. No SQL oracle by design —
DuckDB's approx_count_distinct is a different HLL implementation with a
different hash, so estimates differ; accuracy is asserted against exact
distinct counts in tests instead (rows-only driver check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .joins import _hash_cols

P = 12                          #: 2^12 registers → ~1.63% standard error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


class _HLLPartial:
    """Per-batch register maxima as one list<uint8> row."""

    def __init__(self, on: list[str]):
        self.on = on

    def __call__(self, batch: pa.Table) -> pa.Table:
        regs = np.zeros(M, dtype=np.uint8)
        if batch.num_rows:
            h = _hash_cols(batch, self.on)
            idx = (h >> np.uint64(64 - P)).astype(np.int64)
            # rank = leading zeros of the remaining 64-P bits, +1 — exact
            # leading-zero count via shift bisection (float log2 is lossy
            # for the top bits of a uint64)
            rank = np.ones(len(h), dtype=np.uint8)
            v = h << np.uint64(P)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = v < (np.uint64(1) << np.uint64(64 - shift))
                rank[mask] += shift
                v[mask] = v[mask] << np.uint64(shift)
            rank = np.minimum(rank, 64 - P + 1).astype(np.uint8)
            np.maximum.at(regs, idx, rank)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(regs, pa.uint8()), M)
        return pa.table({"regs": arr.cast(pa.list_(pa.uint8()))})


def approx_distinct(ds: rd.Dataset, on: list[str]) -> int:
    """Deterministic HLL estimate of the distinct count of ``on``."""
    parts = ds.select_columns(on).map_batches(
        _HLLPartial(on), batch_format="pyarrow", zero_copy_batch=True)
    regs = np.zeros(M, dtype=np.uint8)
    for b in parts.iter_batches(batch_size=64, batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        col = t.column("regs")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        np.maximum(regs, flat.reshape(-1, M).max(axis=0), out=regs)
    est = _ALPHA * M * M / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)            # linear counting
    return int(round(est))


def approx_distinct_df(ds: rd.Dataset, on: list[str]) -> pd.DataFrame:
    return pd.DataFrame({"column": ["+".join(on)],
                         "approx_distinct": [approx_distinct(ds, on)]})
