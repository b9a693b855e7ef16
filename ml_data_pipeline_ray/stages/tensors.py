"""Tensor-typed column kernels (reference ``DenseTensor`` / ``SparseTensor``,
``ml-data/ml-data-core/src/tensor.rs:20-38,429-453``; ``DataType::Tensor`` /
``SparseTensor``, ``schema.rs:63-66``).

Arrow mapping (SURVEY.md §1.3): a dense tensor column is
``pa.fixed_shape_tensor`` (or its ``fixed_size_list`` storage); a sparse
tensor column is the per-row COO struct

    struct< indices: list<int32>, values: list<T> >  (+ the fixed dim D
    carried in the field metadata-free schema — shape is part of the
    operator contract, matching the reference where shape lives on the
    ``SparseTensor`` value, not the type)

Both converters are fully vectorized (one ``np.flatnonzero`` over the
batch's value buffer; list offsets from a cumulative sum — no per-row
Python), so they run as zero-copy-in ``map_batches`` stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _dense_ndarray(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, D) view of a fixed_shape_tensor / fixed_size_list column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if hasattr(arr, "to_numpy_ndarray"):           # tensor extension array
        return arr.to_numpy_ndarray()
    t = arr.type
    if not pa.types.is_fixed_size_list(t):
        raise TypeError(f"dense tensor column must be fixed_size_list or "
                        f"fixed_shape_tensor, got {t}")
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), t.list_size)


def dense_to_sparse(col: pa.ChunkedArray | pa.Array,
                    threshold: float = 0.0) -> pa.StructArray:
    """Dense tensor column → per-row COO sparse struct, keeping entries with
    ``|value| > threshold`` (the standard sparsification contract)."""
    m = _dense_ndarray(col)
    n, d = m.shape
    mask = np.abs(m) > threshold
    flat_idx = np.flatnonzero(mask.ravel())
    values = m.ravel()[flat_idx]
    indices = (flat_idx % d).astype(np.int32)
    counts = mask.sum(axis=1)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    idx_list = pa.ListArray.from_arrays(pa.array(offsets), pa.array(indices))
    val_list = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(values, pa.from_numpy_dtype(m.dtype)))
    return pa.StructArray.from_arrays([idx_list, val_list],
                                      names=["indices", "values"])


def sparse_to_dense(col: pa.ChunkedArray | pa.Array, dim: int,
                    value_type: pa.DataType | None = None) -> pa.Array:
    """Per-row COO sparse struct → dense ``fixed_size_list`` column of width
    ``dim`` (zeros where no entry)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    idx_list = arr.field("indices")
    val_list = arr.field("values")
    n = len(arr)
    offsets = idx_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    idx = idx_list.values.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = val_list.values.to_numpy(zero_copy_only=False)
    out = np.zeros(n * dim, dtype=vals.dtype if value_type is None
                   else value_type.to_pandas_dtype())
    # row id of each entry: searchsorted over the offsets
    rows = np.searchsorted(offsets, np.arange(idx.size), side="right") - 1
    out[rows * dim + idx] = vals
    vt = pa.from_numpy_dtype(out.dtype) if value_type is None else value_type
    return pa.FixedSizeListArray.from_arrays(pa.array(out, vt), dim)
