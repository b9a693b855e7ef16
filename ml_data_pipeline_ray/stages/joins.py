"""Join operators, Ray-Data-first.

The reference implements no joins (SURVEY.md §2.5); these are the engine's
join surface, designed around shuffle cost:

- :func:`broadcast_join` / :func:`broadcast_semi_join` — small side goes
  through ``ray.put`` ONCE and is read zero-copy in every task (never
  re-shipped per batch); the probe side streams. Use whenever one side fits
  in memory (dimension tables, key sets) — no shuffle at all.
- :func:`hash_join` — both sides large: add ``bucket = hash(key) % B`` to
  each side, union, one ``groupby(bucket)`` shuffle, pandas merge inside each
  bucket. B should be ~2-4x total cores; skewed keys can be salted by
  raising B. This is the portable partitioned hash join.
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _pa_schema(ds: rd.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow Schema (pandas-block datasets report a
    PandasBlockSchema with numpy dtypes — convert)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(name, t))
        else:
            dt = np.dtype(t)
            fields.append(pa.field(
                name, pa.string() if dt == object else pa.from_numpy_dtype(dt)))
    return pa.schema(fields)


def _hash_cols(df_or_tbl, on: list[str]) -> np.ndarray:
    h = np.zeros(len(df_or_tbl), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in on:
            vals = (df_or_tbl[c].to_numpy() if isinstance(df_or_tbl, pd.DataFrame)
                    else df_or_tbl.column(c).to_numpy(zero_copy_only=False))
            h = h * np.uint64(0x100000001B3) + pd.util.hash_array(vals, categorize=True)
    return h


_ARROW_JOIN_TYPE = {"inner": "inner", "left": "left outer",
                    "outer": "full outer"}


def _default_shards() -> int:
    """Shuffle-shard count for keyed kernels (as-of / range joins): ~3x the
    cluster cores — enough groups to keep every core busy, few enough that
    per-group machinery is negligible."""
    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    return max(16, 3 * cpus)


#: below this, another shard buys no parallelism worth its machinery: each
#: shuffle shard becomes one Ray group (~ms of sort/reduce bookkeeping), so
#: 96 shards over a 2 MB filtered slice is pure fixed cost.
_MIN_SHARD_BYTES = 4 << 20


def _keyed_shards(left: rd.Dataset, right: rd.Dataset | None = None) -> int:
    """Bytes-aware shard count for the keyed-kernel shuffles: tiny inputs
    collapse to a few shards (fixed per-shard machinery dominated the wall
    at small scale), medium inputs use the ~3x-cores parallelism target, and
    huge inputs grow PAST it so one shard never exceeds
    ~``_TARGET_BUCKET_BYTES`` in a worker heap (same memory bound as
    ``hash_join`` buckets — at 100 TB a cores-only count would put ~1 TB in
    a single ``map_groups`` group). Estimates are metadata-only and
    overestimate filtered scans (full-file bytes), which errs toward more
    shards — the safe direction."""
    par = _default_shards()
    est = _estimate_input_bytes(left) or 0
    if right is not None:
        est += _estimate_input_bytes(right) or 0
    if not est:
        return par
    small = -(-est // _MIN_SHARD_BYTES)
    big = -(-est // _TARGET_BUCKET_BYTES)
    return max(big, min(par, small), 1)


class _BroadcastJoiner:
    """Per-batch zero-copy Arrow hash join against the broadcast side. The
    instance holds only the ObjectRef (tiny per-task pickle); the table
    resolves lazily from the local object store on first use in each worker
    (zero-copy read — never re-shipped per batch)."""

    def __init__(self, small_ref, on: list[str], how: str):
        self._ref = small_ref
        self._small = None
        self.on, self.how = on, how

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._small is None:
            small = (ray.get(self._ref)
                     if isinstance(self._ref, ray.ObjectRef) else self._ref)
            # Arrow's join requires exactly matching key types; snap the
            # small side onto the probe stream's key types once per worker
            for k in self.on:
                bt = batch.schema.field(k).type
                if small.schema.field(k).type != bt:
                    small = small.set_column(
                        small.column_names.index(k), k, small[k].cast(bt))
            # rename colliding non-key columns with the same "_r" suffix
            # hash_join uses, so both auto_join arms produce one schema
            # (Table.join has no suffix support and would raise on select)
            ren = {c: c + "_r" for c in small.column_names
                   if c in batch.column_names and c not in self.on}
            if ren:
                small = small.rename_columns(
                    [ren.get(c, c) for c in small.column_names])
            self._small = small
            self._out_cols = (batch.column_names
                              + [c for c in small.column_names
                                 if c not in batch.column_names])
        joined = batch.join(self._small, keys=self.on,
                            join_type=_ARROW_JOIN_TYPE[self.how])
        return joined.select([c for c in self._out_cols
                              if c in joined.column_names])


def broadcast_join(ds: rd.Dataset, small: pd.DataFrame | pa.Table,
                   on: list[str], how: Literal["inner", "left"] = "inner",
                   concurrency: int | None = None) -> rd.Dataset:
    """Join a streaming Dataset against a small in-memory table: broadcast
    once via ``ray.put`` and resolved lazily from the local object store
    inside each task (never re-shipped per batch, no actor-pool startup).
    No shuffle; the probe side stays zero-copy Arrow end to end. Pass
    ``concurrency`` to switch to an actor pool when the resolve cost itself
    matters (very large broadcast sides)."""
    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    small = small.combine_chunks()
    ref = ray.put(small)
    if concurrency:
        return ds.map_batches(_BroadcastJoiner,
                              fn_constructor_args=(ref, on, how),
                              batch_format="pyarrow", zero_copy_batch=True,
                              concurrency=concurrency)
    return ds.map_batches(_BroadcastJoiner(ref, on, how),
                          batch_format="pyarrow", zero_copy_batch=True)


class _SemiFilter:
    """Single-column keys filter with a zero-copy Arrow ``is_in`` kernel;
    composite keys fall back to a pandas MultiIndex membership test."""

    def __init__(self, keys_ref, on: list[str], anti: bool):
        self._ref = keys_ref
        self.keys = None
        self.on, self.anti = on, anti

    def _resolve(self):
        self.keys = (ray.get(self._ref)
                     if isinstance(self._ref, ray.ObjectRef) else self._ref)
        if len(self.on) == 1:
            self._value_set = pa.array(sorted(self.keys))

    def __call__(self, batch):
        if self.keys is None:
            self._resolve()
        if isinstance(batch, pa.Table):
            import pyarrow.compute as pc
            vs = self._value_set
            col = batch[self.on[0]]
            if vs.type != col.type:
                vs = vs.cast(col.type)
            mask = pc.is_in(col, value_set=vs)
            mask = pc.fill_null(mask, False)
            return batch.filter(pc.invert(mask) if self.anti else mask)
        idx = pd.MultiIndex.from_frame(batch[self.on])
        mask = idx.isin(self.keys)
        return batch[~mask] if self.anti else batch[mask]


def broadcast_semi_join(ds: rd.Dataset, keys, on: list[str],
                        anti: bool = False) -> rd.Dataset:
    """Semi (or anti) join: keep rows whose key is (not) in the broadcast key
    set. ``keys`` is a set / Index / array for single-column keys, or a
    MultiIndex-able frame for composite keys."""
    if isinstance(keys, pd.DataFrame):
        keys = pd.MultiIndex.from_frame(keys[on]) if len(on) > 1 else set(keys[on[0]])
    ref = ray.put(keys)
    fmt = "pyarrow" if len(on) == 1 else "pandas"
    return ds.map_batches(_SemiFilter(ref, on, anti), batch_format=fmt,
                          zero_copy_batch=(fmt == "pyarrow"))


def auto_join(left: rd.Dataset, right: rd.Dataset, on: list[str],
              how: Literal["inner", "left"] = "inner",
              broadcast_limit_rows: int = 1_000_000,
              broadcast_limit_bytes: int = 256 << 20,
              **hash_join_kwargs) -> rd.Dataset:
    """Cost-based join (the auto-broadcast-threshold pattern): attempt to
    materialize the right side under HARD row/byte caps — if it fits,
    broadcast it (no shuffle at all); the moment either cap trips, stop and
    fall back to the bucketed shuffle join. The caps bound driver and
    object-store memory by construction, so this can never degenerate into
    an unbounded driver materialization; an oversized right side costs one
    partial extra scan (Datasets re-execute lazily)."""
    batches, rows, nbytes = [], 0, 0
    over = False
    for b in right.iter_batches(batch_size=65536, batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        batches.append(t)
        rows += t.num_rows
        nbytes += t.nbytes
        if rows > broadcast_limit_rows or nbytes > broadcast_limit_bytes:
            over = True
            break
    if over:
        return hash_join(left, right, on, how=how, **hash_join_kwargs)
    if not batches:
        small = _pa_schema(right).empty_table()
    else:
        small = pa.concat_tables(batches, promote_options="permissive")
    return broadcast_join(left, small, on=on, how=how)


def asof_join(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
              direction: Literal["backward", "forward"] = "backward",
              suffix: str = "_r") -> rd.Dataset:
    """As-of join (the brief's canonical custom operator — absent from both
    the reference and Ray Data): for each left row, the single right row
    with the same ``by`` key and the nearest ``on`` value at-or-before
    (``backward``) / at-or-after (``forward``) the left's. Left rows without
    a match keep nulls (left-outer semantics).

    Ray-native shape: both sides are tagged and unioned under a padded
    common schema, ONE shuffle on ``hash(by) % ~3x-cores`` co-locates every
    key's rows (many keys per shard — one Ray group PER KEY costs ~0.5 ms of
    group machinery each, which dominated at tens of thousands of keys), and
    the in-shard match is a single vectorized ``pd.merge_asof(..., by=by)``
    over the sorted shard. Partitioning assumption: one shard's rows fit one
    group (bytes-bounded by the shard count, not by key cardinality)."""
    lschema = _pa_schema(left)
    rschema = _pa_schema(right)
    lcols = list(lschema.names)
    rrename = {c: (c + suffix if c in lcols and c not in (by, on) else c)
               for c in rschema.names}
    rcols = [rrename[c] for c in rschema.names if c not in (by, on)]

    fields = {f.name: f for f in lschema}
    for f in rschema:
        name = rrename[f.name]
        if name not in fields:
            fields[name] = pa.field(name, f.type)
    unified = pa.schema(list(fields.values()))

    from .transforms import align_to_schema

    num_shards = _keyed_shards(left, right)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                batch = batch.rename_columns(
                    [rrename[c] for c in batch.column_names])
            batch = align_to_schema(batch, unified)
            shard = (_hash_cols(batch, [by]) % num_shards).astype(np.int32)
            return batch.append_column(
                "_side", pa.array(np.full(batch.num_rows, side, dtype=np.int8))
            ).append_column("_shard", pa.array(shard))
        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow",
                            zero_copy_batch=True).union(
        right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))

    # Exact output schema: left columns keep the left types, right value
    # columns keep the RIGHT types (nullable — unmatched left rows pad with
    # null). Emitting Arrow with this schema from the group kernel prevents
    # pandas' null-introduced float64/NaN promotion from leaking into the
    # result (int64-with-null stays int64-with-null).
    out_schema = pa.schema(
        [lschema.field(c) for c in lcols]
        + [pa.field(rrename[f.name], f.type) for f in rschema
           if rrename[f.name] in rcols])

    return _asof_reduce(both, lcols, rcols, by, on, direction, out_schema)


def _asof_reduce(both: rd.Dataset, lcols: list[str], rcols: list[str],
                 by: str, on: str, direction: str,
                 out_schema: pa.Schema) -> rd.Dataset:
    """Shared as-of reduce: ONE shuffle on the precomputed ``_shard`` column
    co-locates every key's rows, then a vectorized ``pd.merge_asof`` per
    shard (sorted by ``on``, keyed by ``by``)."""

    def join_shard(g: pd.DataFrame) -> pa.Table:
        lg = g[g["_side"] == 0][lcols].sort_values(on, kind="mergesort")
        rg = g[g["_side"] == 1][[by, on] + rcols].sort_values(
            on, kind="mergesort")
        if len(lg) == 0 or len(rg) == 0:
            out = lg.assign(**{c: pd.Series([None] * len(lg), dtype=object)
                               for c in rcols})
        else:
            out = pd.merge_asof(lg, rg, on=on, by=by, direction=direction)
        return pa.Table.from_pandas(out[out_schema.names], schema=out_schema,
                                    preserve_index=False
                                    ).replace_schema_metadata(None)

    return both.groupby("_shard").map_groups(join_shard, batch_format="pandas")


def asof_join_sliced(ds: rd.Dataset, by: str, on: str,
                     left_mask, right_mask,
                     left_cols: list[str], right_cols: list[str],
                     direction: Literal["backward", "forward"] = "backward",
                     suffix: str = "_r") -> rd.Dataset:
    """As-of join where BOTH sides are row-slices of ONE dataset (e.g.
    purchases vs clicks of the same events table): a single scan tags the
    two sides with vectorized boolean masks. ``asof_join(slice_a, slice_b)``
    over the same source executes the shared read lineage twice — Ray Data
    does not dedupe common subplans across union branches — so this variant
    halves the scan (and at 100 TB, scans dominate).

    ``left_mask`` / ``right_mask``: callables ``pa.Table ->`` boolean array
    (e.g. ``lambda b: pc.equal(b["event_type"], "purchase")``). Mask-only
    columns may be absent from ``left_cols`` / ``right_cols``."""
    schema = _pa_schema(ds)
    lschema = pa.schema([schema.field(c) for c in left_cols])
    rschema = pa.schema([schema.field(c) for c in right_cols])
    rrename = {c: (c + suffix if c in left_cols and c not in (by, on) else c)
               for c in right_cols}
    rcols = [rrename[c] for c in right_cols if c not in (by, on)]

    fields = {f.name: f for f in lschema}
    for f in rschema:
        name = rrename[f.name]
        if name not in fields:
            fields[name] = pa.field(name, f.type)
    unified = pa.schema(list(fields.values()))

    from .transforms import align_to_schema

    num_shards = _keyed_shards(ds)

    def tag_both(batch: pa.Table) -> pa.Table:
        parts = []
        for side, mask, cols in ((0, left_mask(batch), left_cols),
                                 (1, right_mask(batch), right_cols)):
            part = batch.filter(mask).select(cols)
            if side == 1:
                part = part.rename_columns([rrename[c] for c in cols])
            part = align_to_schema(part, unified)
            shard = (_hash_cols(part, [by]) % num_shards).astype(np.int32)
            parts.append(part.append_column(
                "_side", pa.array(np.full(part.num_rows, side, dtype=np.int8))
            ).append_column("_shard", pa.array(shard)))
        return pa.concat_tables(parts)

    both = ds.map_batches(tag_both, batch_format="pyarrow",
                          zero_copy_batch=True)
    out_schema = pa.schema(
        [lschema.field(c) for c in left_cols]
        + [pa.field(rrename[f.name], f.type) for f in rschema
           if rrename[f.name] in rcols])
    return _asof_reduce(both, left_cols, rcols, by, on, direction, out_schema)


def range_join_count(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
                     lo_offset, hi_offset,
                     count_col: str = "n_in_range") -> rd.Dataset:
    """Range (interval) join aggregate: for each left row, the COUNT of
    right rows with the same ``by`` key and ``on`` in the half-open window
    ``(left.on + lo_offset, left.on + hi_offset]``.

    Counting (not pair emission) keeps the output linear in the left side —
    a pair-emitting range join can explode quadratically; when pairs are
    truly needed, bound the window first. Shape: tag + union + ONE shuffle
    on ``hash(by) % ~3x-cores`` (many keys per shard — a group per key costs
    ~0.5 ms of Ray group machinery each), then per key inside the shard two
    vectorized ``searchsorted`` scans over that key's sorted right-side
    times. Partitioning assumption: one shard fits one group (bytes-bounded
    by the shard count, not key cardinality)."""
    lschema = _pa_schema(left)
    lcols = list(lschema.names)
    num_shards = _keyed_shards(left, right)

    def tag(side: int, keep: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(keep)
            from .transforms import align_to_schema
            target = pa.schema([lschema.field(c) if c in lschema.names
                                else batch.schema.field(c) for c in lcols])
            batch = align_to_schema(batch, target)
            shard = (_hash_cols(batch, [by]) % num_shards).astype(np.int32)
            return batch.append_column(
                "_side", pa.array(np.full(batch.num_rows, side, dtype=np.int8))
            ).append_column("_shard", pa.array(shard))
        return fn

    both = left.map_batches(tag(0, lcols), batch_format="pyarrow",
                            zero_copy_batch=True).union(
        right.map_batches(tag(1, [by, on]), batch_format="pyarrow",
                          zero_copy_batch=True))
    return _range_reduce(both, lcols, by, on, lo_offset, hi_offset, count_col,
                         lschema)


def range_join_count_sliced(ds: rd.Dataset, by: str, on: str,
                            left_mask, right_mask, left_cols: list[str],
                            lo_offset, hi_offset,
                            count_col: str = "n_in_range") -> rd.Dataset:
    """Range-join count where both sides are row-slices of ONE dataset: a
    single scan tags sides with vectorized masks (see
    :func:`asof_join_sliced` for why — Ray Data executes the shared read
    lineage once per union branch)."""
    schema = _pa_schema(ds)
    lschema = pa.schema([schema.field(c) for c in left_cols])
    lcols = list(left_cols)
    num_shards = _keyed_shards(ds)

    from .transforms import align_to_schema

    def tag_both(batch: pa.Table) -> pa.Table:
        parts = []
        for side, mask, keep in ((0, left_mask(batch), lcols),
                                 (1, right_mask(batch), [by, on])):
            part = batch.filter(mask).select(keep)
            target = pa.schema([lschema.field(c) if c in lschema.names
                                else part.schema.field(c) for c in lcols])
            part = align_to_schema(part, target)
            shard = (_hash_cols(part, [by]) % num_shards).astype(np.int32)
            parts.append(part.append_column(
                "_side", pa.array(np.full(part.num_rows, side, dtype=np.int8))
            ).append_column("_shard", pa.array(shard)))
        return pa.concat_tables(parts)

    both = ds.map_batches(tag_both, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _range_reduce(both, lcols, by, on, lo_offset, hi_offset, count_col,
                         lschema)


def _range_reduce(both: rd.Dataset, lcols: list[str], by: str, on: str,
                  lo_offset, hi_offset, count_col: str,
                  lschema: pa.Schema) -> rd.Dataset:
    """Shared range-count reduce: ONE shuffle on ``_shard``, then per key
    inside the shard two vectorized ``searchsorted`` scans over that key's
    sorted right-side times."""
    # Exact output schema (left columns + int64 count): the tagged union pads
    # right-side rows with nulls, which makes pandas promote left int columns
    # to float64 for the whole group — cast back when emitting so the output
    # dtypes match the left input exactly.
    out_schema = pa.schema([lschema.field(c) for c in lcols]
                           + [pa.field(count_col, pa.int64())])

    def count_shard(g: pd.DataFrame) -> pa.Table:
        lg = g[g["_side"] == 0][lcols]
        rg = g[g["_side"] == 1]
        counts = np.zeros(len(lg), dtype=np.int64)
        if len(lg) and len(rg):
            # per-key slices: sort the right side by (by, on) once, then for
            # each key in the left, two searchsorted scans within its slice
            rg = rg.sort_values([by, on], kind="mergesort")
            rkeys = rg[by].to_numpy()
            rts = rg[on].to_numpy()
            lkeys = lg[by].to_numpy()
            lts = lg[on].to_numpy()
            order = np.argsort(lkeys, kind="mergesort")
            uk, kstart = np.unique(lkeys[order], return_index=True)
            kend = np.concatenate((kstart[1:], [len(lkeys)]))
            r_lo = np.searchsorted(rkeys, uk, side="left")
            r_hi = np.searchsorted(rkeys, uk, side="right")
            for ki in range(uk.size):
                li = order[kstart[ki]:kend[ki]]
                seg = rts[r_lo[ki]:r_hi[ki]]
                lo = np.searchsorted(seg, lts[li] + lo_offset, side="right")
                hi = np.searchsorted(seg, lts[li] + hi_offset, side="right")
                counts[li] = hi - lo
        out = lg.copy()
        out[count_col] = counts
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False
                                    ).replace_schema_metadata(None)

    return both.groupby("_shard").map_groups(count_shard, batch_format="pandas")


#: per-bucket in-memory target: each bucket materializes as ONE map_groups
#: group in a worker heap, so buckets must be bytes-bounded, not just
#: core-count-bounded — at 100 TB a cores-only bucket count would put ~1 TB
#: in a single group.
_TARGET_BUCKET_BYTES = 512 << 20

#: conservative parquet-compressed -> in-memory Arrow expansion factor
_PARQUET_EXPANSION = 3


def _estimate_input_bytes(ds: rd.Dataset) -> int | None:
    """Cheap (metadata-only) in-memory size estimate, without executing.
    ``Dataset.size_bytes()`` executes mapped plans, so it can't be used
    here, and ``Dataset.input_files()`` returns ``[]`` once any
    ``map_batches`` wraps the read — so walk the logical plan to the Read
    leaves and use each datasource's own metadata estimate (falling back to
    on-disk bytes x expansion). Overestimates filtered/pruned scans, which
    errs toward MORE buckets — the safe direction."""
    try:
        files = ds.input_files()
    except Exception:
        files = []
    if files:
        import os
        total = 0
        for f in files:
            try:
                total += os.path.getsize(f)
            except OSError:
                return None
        return total * _PARQUET_EXPANSION

    # mapped plan: find the Read leaves (private API — best-effort)
    try:
        total = 0
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            deps = op.input_dependencies
            if deps:
                stack.extend(deps)
                continue
            dsrc = getattr(op, "_datasource", None)
            est = dsrc.estimate_inmemory_data_size() if dsrc else None
            if est is None:
                return None
            total += int(est)
        return total or None
    except Exception:
        return None


def _choose_num_buckets(est_bytes: int | None, cpus: int) -> int:
    """Bytes-per-bucket target with a 3x-cores floor and a tiny-input cap:
    enough groups to keep every core busy, no group larger than
    ~_TARGET_BUCKET_BYTES in memory (the per-group memory bound of the
    bucketed join), and never a bucket smaller than ~1 MiB — below that
    per-group task overhead dominates useful work (measured: a 1.5 MB
    aggregate-view join fanned into 96 single-millisecond groups cost
    ~10 s of scheduling for ~50 ms of join)."""
    floor = max(16, 3 * cpus)
    if not est_bytes:
        return floor
    cap = max(1, est_bytes // (1 << 20))        # ≥ ~1 MiB per bucket
    return min(max(floor, -(-est_bytes // _TARGET_BUCKET_BYTES)), cap) \
        if cap < floor else max(floor, -(-est_bytes // _TARGET_BUCKET_BYTES))


def hash_join(left: rd.Dataset, right: rd.Dataset, on: list[str],
              how: Literal["inner", "left", "outer"] = "inner",
              num_buckets: int | None = None,
              suffixes: tuple[str, str] = ("", "_r")) -> rd.Dataset:
    """Partitioned (bucketed) hash join of two large Datasets.

    Both sides are tagged with ``bucket = hash(on) % num_buckets``, unioned
    under a padded common schema, shuffled once by bucket, and joined with
    Arrow's hash-join kernel inside each bucket group (zero pandas
    round-trips). Partitioning assumption: all rows of a join key land in
    one bucket (guaranteed by the hash); skew in a single key cannot be
    split — salt by replicating the small side if needed.

    ``how="outer"`` (FULL OUTER) is only available on this bucketed path:
    a bucket holds ALL rows of its keys from BOTH sides, so per-bucket full
    outer is globally correct — a broadcast join cannot express it (the
    small side's unmatched rows span every probe batch).

    ``num_buckets`` defaults to data-size-aware: ``total input bytes /
    ~512 MiB`` with a 3x-cores floor, so each bucket group stays within a
    worker's heap no matter the input scale (a cores-only default would put
    ~1 TB per group at 100 TB)."""
    from .transforms import align_to_schema

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        est_l = _estimate_input_bytes(left)
        est_r = _estimate_input_bytes(right)
        est = (est_l or 0) + (est_r or 0)
        num_buckets = _choose_num_buckets(est or None, cpus)

    lschema = _pa_schema(left)
    rschema = _pa_schema(right)
    shared = [c for c in rschema.names if c in lschema.names and c not in on]
    rrename = {c: c + suffixes[1] for c in shared}

    # unified schema: left fields, then renamed right-only fields; join keys
    # promoted permissively so int32/int64 key pairs still match
    fields = {f.name: f for f in lschema}
    for f in rschema:
        name = rrename.get(f.name, f.name)
        if name in on and name in fields:
            fields[name] = pa.unify_schemas(
                [pa.schema([fields[name]]), pa.schema([pa.field(name, f.type)])],
                promote_options="permissive").field(0)
        elif name not in fields:
            fields[name] = pa.field(name, f.type)
    unified = pa.schema(list(fields.values()))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1 and rrename:
                batch = batch.rename_columns(
                    [rrename.get(c, c) for c in batch.column_names])
            # align BEFORE hashing so both sides hash identical key dtypes
            batch = align_to_schema(batch, unified)
            jb = (_hash_cols(batch, on) % num_buckets).astype(np.int32)
            batch = batch.append_column("_jb", pa.array(jb))
            batch = batch.append_column(
                "_side", pa.array(np.full(batch.num_rows, side, dtype=np.int8)))
            return batch
        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    lout = list(lschema.names)
    rout = [rrename.get(c, c) for c in rschema.names if c not in on]

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = g.column("_side")
        lg = g.filter(pc.equal(side, 0)).select(lout)
        rg = g.filter(pc.equal(side, 1)).select(on + rout)
        joined = lg.join(rg, keys=on, join_type=_ARROW_JOIN_TYPE[how])
        out = lout + rout
        return joined.select([c for c in out if c in joined.column_names])

    return both.groupby("_jb").map_groups(join_bucket, batch_format="pyarrow")


def salted_hash_join(left: rd.Dataset, right: rd.Dataset, on: list[str],
                     salts: int = 8, num_buckets: int | None = None
                     ) -> rd.Dataset:
    """Skew-safe inner hash join: a single hot key's rows land in ONE
    bucket of the plain ``hash_join`` (a hash cannot split equal keys), so
    one task gets the whole hot key at 100 TB. Salting splits it: every
    LEFT row gets an arbitrary salt in ``[0, salts)`` (per-batch
    round-robin — any assignment is correct, each left row joins
    independently) and the RIGHT side is replicated once per salt value, so
    the bucket key becomes ``(key..., salt)`` and a hot key fans out over
    ``salts`` tasks. Cost: the right side ships ``salts`` times — use for
    fact × dimension shapes with known key skew; equality semantics are
    unchanged (verified against the unsalted join in tests)."""

    def tag_left(batch: pa.Table) -> pa.Table:
        s = (np.arange(batch.num_rows, dtype=np.int64) % salts)
        return batch.append_column("_salt", pa.array(s))

    def replicate_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), salts))
        out = batch.take(idx)
        s = np.tile(np.arange(salts, dtype=np.int64), n)
        return out.append_column("_salt", pa.array(s))

    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.map_batches(replicate_right, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = hash_join(lt, rt, on=[*on, "_salt"], num_buckets=num_buckets)

    def drop_salt(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["_salt"])

    return joined.map_batches(drop_salt, batch_format="pyarrow",
                              zero_copy_batch=True)
