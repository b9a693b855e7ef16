"""Int8 embedding quantization (beyond-reference LLM-pipeline surface).

Per-vector symmetric int8 quantization — the standard memory-reduction
step before ANN indexing (4× smaller vectors, matmul-able as int8):

1. grid:  ``g_i = floor(x_i * 1024)`` — float32 inputs are exactly
   representable in float64, the ×1024 product is exact, floor is exact,
   so ``g`` is a deterministic int64 independent of platform/BLAS (the
   same integer-grid contract the k-means stage uses);
2. scale: ``s = max_i |g_i|`` per vector (zero vector → all-zero codes);
3. code:  ``q_i = sign(g_i) * ((|g_i| * 127) // s)`` ∈ [-127, 127] —
   all-integer, and every operation is kept on NON-NEGATIVE integers
   before the sign is re-applied because numpy ``//`` floors while SQL
   engines truncate toward zero: on ``|g|`` the two agree bit-for-bit,
   so a DuckDB oracle reproduces the codes exactly;
4. witness: ``err_i = |127 * g_i - q_i * s|`` (int64) — the exact
   reconstruction-error numerator (the dequantized value is
   ``q_i * s / (127 * 1024)``), so any rounding / sign / scale bug
   changes an integer an oracle can re-derive.

Everything is a pure per-batch kernel: no shuffle, no state, no RNG —
quantization parallelizes embarrassingly at any corpus size. The grouped
stats reduction ships 4 int64s per (label, block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

GRID = 1024
QMAX = 127


def _vectors(batch: pa.Table, col: str) -> tuple[np.ndarray, int]:
    """(n, dim) float64 view of a list<float> column (zero-copy flatten)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    flat = arr.values.to_numpy(zero_copy_only=False)
    dim = len(flat) // n if n else 0
    return flat.astype(np.float64).reshape(n, dim), dim


def quantize_int8(batch: pa.Table, vec_col: str = "embedding",
                  out_col: str = "q") -> pa.Table:
    """Append int8 codes (list<int8>), the per-vector int64 ``scale``
    (max |grid| value) and the exact int64 reconstruction-error sum
    ``err_sum`` to the batch."""
    x, dim = _vectors(batch, vec_col)
    g = np.floor(x * GRID).astype(np.int64)
    s = np.abs(g).max(axis=1)                       # (n,)
    safe = np.where(s == 0, 1, s)
    absq = (np.abs(g) * QMAX) // safe[:, None]
    q = np.sign(g) * absq
    q[s == 0] = 0
    err = np.abs(QMAX * g - q * s[:, None]).sum(axis=1)
    n = len(s)
    codes = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
        pa.array(q.reshape(-1).astype(np.int8)))
    batch = batch.append_column(out_col, codes)
    batch = batch.append_column("scale", pa.array(s))
    batch = batch.append_column("err_sum", pa.array(err))
    return batch


def quantization_stats(ds: rd.Dataset, vec_col: str = "embedding",
                       label_col: str = "label") -> "pd.DataFrame":
    """Per-label quantization summary: vector count, exact sums of codes /
    |codes| / scales / reconstruction-error numerators. Map-side partial
    sums (4 int64s per label per block) + a tiny driver reduce — nothing
    input-sized moves."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        t = quantize_int8(batch, vec_col)
        labels = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        q = t.column("q")
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        n = len(labels)
        flat = q.values.to_numpy(zero_copy_only=False).astype(np.int64)
        dim = len(flat) // n if n else 0
        qs = flat.reshape(n, dim).sum(axis=1)
        qa = np.abs(flat).reshape(n, dim).sum(axis=1)
        uniq, inv = np.unique(labels, return_inverse=True)

        def isum(vals: np.ndarray) -> np.ndarray:
            # int64 accumulation (np.add.at) — float64 bincount weights
            # lose exactness past 2^53 at scale
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, inv, vals.astype(np.int64))
            return acc

        out = {
            "label": uniq,
            "n": np.bincount(inv).astype(np.int64),
            "sum_q": isum(qs),
            "sum_abs_q": isum(qa),
            "sum_scale": isum(
                t.column("scale").to_numpy(zero_copy_only=False)),
            "sum_err": isum(
                t.column("err_sum").to_numpy(zero_copy_only=False)),
        }
        return pa.table({k: pa.array(np.asarray(v, np.int64))
                         for k, v in out.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = (parts.groupby("label", sort=True).sum().reset_index())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out
