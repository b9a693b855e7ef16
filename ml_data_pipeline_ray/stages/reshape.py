"""Reshape operators: pivot (long→wide), unpivot/melt (wide→long), and
regex-token explode (flat_map: one row per token with its position).

The reference's transform surface is row-preserving maps + filters
(`ml-data/ml-data-core/src/pipeline.rs` Transform trait — 1 batch in,
1 batch out); reshapes are a standard relational/corpus extension built
Ray-Data-first:

- :func:`pivot_counts` — ONE ``groupby`` shuffle; the per-batch map emits one
  indicator/partial-sum column per pivot value, so one grouped sum
  map-side-combines before the exchange (shuffle bytes ~ groups × values,
  not input rows). Pivot values must be supplied (or discovered with a
  distinct pass by the caller) — the output schema of a distributed pivot
  must be known before execution.
- :func:`unpivot` — shuffle-free per-batch transform: each measure column
  becomes ``len(measures)`` stacked copies of the id columns (Arrow concat,
  no Python loop over rows).
- :func:`explode_tokens` — shuffle-free flat_map: lower-cased ``[a-z]+``
  token runs (the exact DuckDB mirror is
  ``unnest(regexp_extract_all(lower(text), '[a-z]+'))`` with
  ``generate_subscripts`` for 1-based positions).

All three are pure batch transforms and stream under backpressure; none
materializes the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def pivot_counts(ds: rd.Dataset, group_col: str, pivot_col: str,
                 values: list[str], value_col: str | None = None
                 ) -> rd.Dataset:
    """Long→wide: one row per ``group_col``, one ``n_<value>`` count column
    per pivot value (plus ``sum_<value>`` columns of ``value_col`` when
    given). Unlisted pivot values are ignored (explicit schema contract)."""

    def indicators(batch: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {group_col: batch.column(group_col)}
        pv = batch.column(pivot_col)
        for v in values:
            m = pc.equal(pv, v)
            cols[f"n_{v}"] = pc.if_else(m, pa.scalar(1, pa.int64()),
                                        pa.scalar(0, pa.int64()))
            if value_col is not None:
                cols[f"sum_{v}"] = pc.if_else(
                    m, batch.column(value_col).cast(pa.float64()),
                    pa.scalar(0.0, pa.float64()))
        return pa.table(cols)

    from .groupagg import grouped_agg

    aggs = [(f"n_{v}", "sum", f"n_{v}") for v in values]
    if value_col is not None:
        aggs += [(f"sum_{v}", "sum", f"sum_{v}") for v in values]
    return grouped_agg(ds.map_batches(indicators, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       keys=[group_col], aggs=aggs)


def unpivot(ds: rd.Dataset, id_cols: list[str], measures: list[str],
            metric_col: str = "metric", value_col: str = "value"
            ) -> rd.Dataset:
    """Wide→long (melt): each input row yields ``len(measures)`` rows of
    ``(id_cols..., metric, value)``. Values cast to float64 (the common
    supertype of measure columns — matches SQL UNPIVOT over doubles)."""

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for m in measures:
            cols = {c: batch.column(c) for c in id_cols}
            cols[metric_col] = pa.array([m] * batch.num_rows, pa.string())
            cols[value_col] = batch.column(m).cast(pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def explode_tokens(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text", out_col: str = "word") -> pa.Table:
    """Flat_map one batch: ``(id, pos, word)`` per lower-case ``[a-z]+``
    token run, ``pos`` 1-based among the row's kept tokens. Vectorized:
    split → flatten → parent-index take; positions from one arange over
    the nondecreasing parent array (no per-row Python)."""
    text = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(text, "[^a-z]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")           # split artifacts at run boundaries
    flat, parent = flat.filter(mask), parent.filter(mask)
    p = parent.to_numpy(zero_copy_only=False)
    # parent is nondecreasing: position = arange - start_of_its_group
    starts = np.flatnonzero(np.diff(p, prepend=np.int64(-1)))
    grp_start = np.repeat(starts, np.diff(np.append(starts, len(p))))
    pos = np.arange(len(p), dtype=np.int64) - grp_start + 1
    ids = batch.column(id_col).take(parent)
    return pa.table({id_col: ids, "pos": pa.array(pos, pa.int64()),
                     out_col: flat})


def sliding_chunks(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text", size: int = 64,
                   stride: int = 32) -> pa.Table:
    """RAG-style overlapping token chunking: one output row per
    ``stride``-stepped window of up to ``size`` tokens, carrying the joined
    chunk text. Shuffle-free flat_map; fully vectorized — chunk token
    indices are ONE arange/gather over the batch's flattened token buffer,
    the join back to text is Arrow's ``binary_join``. Token rule is
    ``[A-Za-z0-9]+`` runs (case preserved), mirrored by the oracle's
    ``regexp_extract_all``; a document yields ``ceil(n_tokens/stride)``
    chunks (empty docs yield none)."""
    lists = pc.split_pattern_regex(batch.column(text_col), "[^A-Za-z0-9]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    flat, parent = flat.filter(mask), parent.filter(mask)
    p = parent.to_numpy(zero_copy_only=False)
    n_rows = batch.num_rows
    counts = np.bincount(p, minlength=n_rows).astype(np.int64)
    row_off = np.concatenate([[0], np.cumsum(counts)])
    n_chunks = -(-counts // stride)                     # ceil; 0 for empty
    total = int(n_chunks.sum())
    row_of_chunk = np.repeat(np.arange(n_rows), n_chunks)
    first = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    cidx = np.arange(total, dtype=np.int64) - np.repeat(first, n_chunks)
    starts = cidx * stride
    lens = np.minimum(size, counts[row_of_chunk] - starts)
    chunk_off = np.concatenate([[0], np.cumsum(lens)])
    base = row_off[row_of_chunk] + starts
    idx = (np.arange(int(chunk_off[-1]), dtype=np.int64)
           - np.repeat(chunk_off[:-1], lens) + np.repeat(base, lens))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    chunk_list = pa.ListArray.from_arrays(
        pa.array(chunk_off, pa.int32()), flat.take(pa.array(idx)))
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(row_of_chunk)),
        "chunk_idx": pa.array(cidx),
        "n_tokens_chunk": pa.array(lens.astype(np.int64)),
        "chunk_text": pc.binary_join(chunk_list, " "),
    })
