"""Arrow-native grouped aggregation (P5 hot path).

``Dataset.groupby(...).aggregate(...)`` in Ray Data is a sort-based
exchange whose map/reduce sub-operators walk per-key group boundaries in
Python — measured here at ~40k rows/s on 313k rows × 64k string keys
(7.7 s map + 3.6 s reduce for an aggregate Arrow's hash kernels finish in
tens of milliseconds). This operator keeps the same distributed shape but
does ALL per-row work in Arrow C++:

1. **partial** — each block is pre-aggregated with ``Table.group_by``
   (hash aggregation, C++), so at most one row per (key, block) enters
   the exchange; sums/counts/mins/maxes decompose associatively (mean
   travels as sum+count and is finalized after the combine);
2. **exchange** — partials are sharded by ``hash(keys) % B`` (B ~ 3×
   cores like the join bucket heuristic: one ``groupby("_gb")`` shuffle
   moving key+partial columns only);
3. **combine** — each shard re-aggregates its partials with one more
   ``Table.group_by`` call (C++ again; Python touches a shard, never a
   key).

Supported fns: ``sum count min max mean count_star`` (count = non-null
count of the named column, mirroring SQL ``COUNT(col)``; ``count_star``
counts ALL rows per group — SQL ``COUNT(*)`` — via Arrow's ``count_all``
kernel, so it is exact even when the counted column has NULLs). Output
columns follow the caller's aliases so oracle SQL matches exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

#: fn → (arrow partial kernel, arrow combine kernel)
_DECOMP = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def _shard_count(cpus: int | None = None) -> int:
    import ray

    if cpus is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    return max(16, 3 * cpus)


def grouped_agg(ds: rd.Dataset, keys: list[str],
                aggs: list[tuple[str, str, str]],
                num_shards: int | None = None) -> rd.Dataset:
    """Per-``keys`` aggregation of ``aggs`` = [(col, fn, out_name), ...]
    with fn in {sum, count, min, max, mean}. Returns a Dataset with
    columns ``keys + [out_name...]``; one bucket-shard exchange of
    partial rows only."""
    shards = num_shards or _shard_count()

    # decompose: mean → (sum, count) partials + a finalize division.
    # tmp_of maps each plan entry to its partial-column name; the arrow
    # aggregate list is deduped on (col, kernel) since pyarrow names its
    # outputs "{col}_{kernel}".
    plan: list[tuple[str, str, str, str]] = []   # (col, arrow_fn, tmp, comb)
    finalize_means: list[tuple[str, str, str]] = []  # (out, sum_tmp, cnt_tmp)
    for col, fn, out in aggs:
        if fn == "mean":
            plan.append((col, "sum", f"_s_{out}", "sum"))
            plan.append((col, "count", f"_c_{out}", "sum"))
            finalize_means.append((out, f"_s_{out}", f"_c_{out}"))
        elif fn in ("count_star", "count_all"):
            # SQL COUNT(*): col is ignored; Arrow's count_all kernel
            # counts every row of the group, NULLs included
            plan.append((None, "count_all", f"_p_{out}", "sum"))
        elif fn in _DECOMP:
            pfn, cfn = _DECOMP[fn]
            plan.append((col, pfn, f"_p_{out}", cfn))
        else:
            raise ValueError(f"unsupported agg fn {fn!r}")

    arrow_aggs = [([], afn) if col is None else (col, afn)
                  for col, afn in dict.fromkeys(
                      (col, afn) for col, afn, _, _ in plan)]
    need_cols = list(dict.fromkeys(
        keys + [c for c, _, _, _ in plan if c is not None]))

    def partial(batch: pa.Table) -> pa.Table:
        agged = batch.select(need_cols).group_by(keys).aggregate(arrow_aggs)
        cols = {k: agged[k] for k in keys}
        for col, afn, tmp, _ in plan:
            cols[tmp] = agged["count_all" if col is None
                              else f"{col}_{afn}"]
        t = pa.table(cols)
        h = np.zeros(t.num_rows, np.uint64)
        for k in keys:
            arr = t[k]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            kv = pd.util.hash_array(
                np.asarray(arr.to_pandas()), categorize=False)
            h = h * np.uint64(1000003) + kv.astype(np.uint64)
        return t.append_column(
            "_gb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    def combine(t: pa.Table) -> pa.Table:
        # pure Arrow — a pandas round-trip here would coerce nullable
        # int64 partials (all-NULL-group sums) to float64
        agged = t.drop_columns(["_gb"]).group_by(keys).aggregate(
            [(tmp, cfn) for _, _, tmp, cfn in plan])
        cols = {k: agged[k] for k in keys}
        for _, _, tmp, cfn in plan:
            cols[tmp] = agged[f"{tmp}_{cfn}"]
        return pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    combined = parts.groupby("_gb").map_groups(combine,
                                               batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for col, fn, out in aggs:
            if fn != "mean":
                cols[out] = batch[f"_p_{out}"]
        for out, s, c in finalize_means:
            cols[out] = pc.divide(
                pc.cast(batch[s], pa.float64()),
                pc.cast(batch[c], pa.float64()))
        return pa.table(cols)

    return combined.map_batches(finish, batch_format="pyarrow",
                                zero_copy_batch=True)
