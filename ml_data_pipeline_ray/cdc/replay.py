"""CDC changelog replay — the flagship Ray-Data-native pipeline.

Implements the north rule from BASELINE.json: a binlog/WAL-style change-event
tailer over Parquet transcript tables. Change events
``(lsn, op ∈ {insert,update,delete}, conv_id, turn_idx, payload…)`` stream as
zero-copy Arrow batches through ``ray.data.Dataset.map_batches``, are
hash-partitioned by ``conv_id`` and merged with per-key last-writer-wins LSN
ordering into a partitioned Parquet lake with an exactly-once manifest commit
(:mod:`.manifest`).

Dataflow (SURVEY.md §7.1)::

    read_parquet(changelog, filter = lsn > checkpoint, schema = unified)
      -> map_batches(normalize: align schema, op->rank, pid = hash(conv_id) % P,
                     per-batch LWW combiner)                     [stateless tasks]
      -> [optional two-stage skew path: groupby(pid, salt) partial LWW reduce]
      -> groupby(pid).map_groups(merge with current lake partition,  [THE one
                                 write staged partition file)         wide step]
      -> driver: collect tiny metrics table -> atomic manifest commit    [2PC]

Correctness depends only on per-key max-LSN (commutative across arrival
order), so Ray's unordered streaming execution is safe and duplicate /
out-of-order / late events are absorbed (idempotent replay ⇒ exactly-once
effect on at-least-once delivery). Tie-break at equal LSN: op precedence
delete > update > insert (documented engine rule; the reference is silent —
SURVEY.md §4 "Ordering").

Reference parity: this replaces the reference's single-threaded
source→transform→sink loop (``ml-data/ml-data-core/src/schedule.rs:150-235``)
with the Ray Data streaming executor; the keyed upsert is the reference's
nearest-analog of dictionary-merge state (``string_cache.rs:155-260``)
re-expressed as a distributed groupby (SURVEY.md §2.4 ST7, §2.5).

Scale notes (100 TB / 10^10 events):
- ``num_partitions`` is the unit of merge parallelism and of lake layout;
  size it to ~2-4x total cluster cores so one partition's state fits a
  worker heap. The changelog is processed in LSN-ordered rounds
  (:meth:`CDCEngine.replay_in_rounds`) so merge state is bounded per round
  (SURVEY.md §7.5.2).
- The only all-to-all exchange is the single ``groupby(pid)``; the
  per-batch LWW combiner runs before it (map-side partial reduce), and the
  optional salted first pass (``two_stage=True``) spreads a hot
  conversation's reduce work over ``salts`` subgroups before the final
  per-partition merge — the north star's "second groupby-aggregate pass".
- Reads prune with column projection + ``lsn > checkpoint`` row-group
  pushdown (reference P3 analog, ``parquet/predicates.rs:336-375`` — built
  into ``read_parquet``, not reimplemented).
"""

from __future__ import annotations

import os
from typing import Any, Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..sources.readers import read_parquet
from .manifest import LakeManifest

# internal column names (never user-facing)
PID_COL = "_pid"
RANK_COL = "_rank"
SALT_COL = "_salt"
LAKE_LSN_COL = "_lsn"
LAKE_DELETED_COL = "_deleted"

OPS = ["insert", "update", "delete"]  # rank 0, 1, 2


# ---------------------------------------------------------------------------
# vectorized kernels
# ---------------------------------------------------------------------------

def stable_hash_strings(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of a string column (vectorized siphash via
    pandas; stable across processes — engine-internal use only)."""
    np_arr = arr.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np_arr, categorize=True)


def lww_winners(tbl: pa.Table, key: list[str], lsn_col: str = "lsn",
                rank_col: str = RANK_COL) -> pa.Table:
    """Keep, per key, the single row with max ``(lsn, rank)`` — the
    last-writer-wins reduce. Pure Arrow, O(n log n) sort + one vectorized
    boundary scan; no Python per-row work."""
    n = tbl.num_rows
    if n <= 1:
        return tbl
    sort_keys = [(k, "ascending") for k in key] + [(lsn_col, "ascending"),
                                                  (rank_col, "ascending")]
    tbl = tbl.sort_by(sort_keys)
    # a row wins iff the next row has a different key (last of each run)
    neq = None
    for k in key:
        col = tbl.column(k).combine_chunks()
        d = pc.not_equal(col.slice(0, n - 1), col.slice(1))
        d = pc.fill_null(d, True)
        neq = d if neq is None else pc.or_(neq, d)
    mask = np.ones(n, dtype=bool)
    mask[: n - 1] = neq.to_numpy(zero_copy_only=False)
    return tbl.filter(pa.array(mask))


from ..stages.transforms import align_to_schema  # canonical impl (widening lattice)


def unify_parquet_schemas(files: Iterable[str]) -> pa.Schema:
    """Unified (permissively promoted) schema across parquet footers —
    metadata-only reads, cheap even for many files."""
    schemas = [pq.read_schema(f) for f in files]
    return pa.unify_schemas(schemas, promote_options="permissive")


def _expand_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")))
        else:
            out.append(p)
    return out


# ---------------------------------------------------------------------------
# pipeline stages (stateless map_batches functions — closures are small)
# ---------------------------------------------------------------------------

def _make_normalizer(schema: pa.Schema, key: list[str], lsn_col: str,
                     op_col: str, num_partitions: int, salts: int,
                     combine: bool):
    """Batch normalizer: schema-align, op->rank, partition id, optional
    per-batch LWW combiner (map-side partial reduce before the shuffle)."""
    op_values = pa.array(OPS, type=pa.string())

    def normalize(batch: pa.Table) -> pa.Table:
        batch = align_to_schema(batch, schema)
        rank = pc.index_in(batch.column(op_col), value_set=op_values).cast(pa.int8())
        h = stable_hash_strings(batch.column(key[0]))
        pid = (h % np.uint64(num_partitions)).astype(np.int32)
        salt = (batch.column(lsn_col).to_numpy() % salts).astype(np.int8)
        batch = batch.drop_columns([op_col])
        batch = batch.append_column(RANK_COL, rank)
        batch = batch.append_column(PID_COL, pa.array(pid))
        batch = batch.append_column(SALT_COL, pa.array(salt))
        if combine:
            batch = lww_winners(batch, key, lsn_col)
        return batch

    return normalize


def _make_partial_reducer(key: list[str], lsn_col: str):
    """Stage-1 of the salted skew path: per-(pid, salt) LWW reduce."""
    def reduce_group(group: pa.Table) -> pa.Table:
        return lww_winners(group, key, lsn_col)
    return reduce_group


def _merge_partition_core(ev: pa.Table, pid: int, ckpt: int,
                          cur_path: str | None, key: list[str], lsn_col: str,
                          payload_names: list[str], txn_dir: str) -> dict:
    """The per-partition LWW merge: drop already-applied events, fold into the
    current lake partition state, write the staged partition file, return one
    metrics dict. Shared by the Ray Data groupby path and the direct-exchange
    path — the semantics live in exactly one place."""
    ev = ev.filter(pc.greater(ev.column(lsn_col), pa.scalar(ckpt)))
    if ev.num_rows == 0:
        return {"pid": pid, "action": "skip", "file": "", "last_lsn": ckpt,
                "rows": 0, "tombstones": 0, "events_applied": 0}
    ev = ev.select(payload_names + [lsn_col, RANK_COL])

    if cur_path and os.path.exists(cur_path):
        cur = pq.read_table(cur_path)
        deleted = cur.column(LAKE_DELETED_COL)
        cur_rank = pc.if_else(deleted, pa.scalar(2, pa.int8()),
                              pa.scalar(1, pa.int8()))
        cur = cur.drop_columns([LAKE_DELETED_COL])
        cur = cur.rename_columns(
            [lsn_col if c == LAKE_LSN_COL else c for c in cur.column_names])
        cur = cur.append_column(RANK_COL, cur_rank)
        combined = pa.concat_tables([cur, ev], promote_options="permissive")
    else:
        combined = ev

    winners = lww_winners(combined, key, lsn_col)
    is_deleted = pc.equal(winners.column(RANK_COL), pa.scalar(2, pa.int8()))
    out_names = [c for c in winners.column_names if c not in (lsn_col, RANK_COL)]
    lake_tbl = winners.select(out_names)
    lake_tbl = lake_tbl.append_column(LAKE_LSN_COL, winners.column(lsn_col))
    lake_tbl = lake_tbl.append_column(LAKE_DELETED_COL, is_deleted)
    # stable layout within the partition file (cheap: already key-sorted)
    path = os.path.join(txn_dir, f"pid={pid:05d}.parquet")
    # zstd-1 halves lake bytes vs snappy at equal CPU — partition-write disk
    # bandwidth is the merge wall's floor at high parallelism
    pq.write_table(lake_tbl, path, compression="zstd", compression_level=1)
    # 2PC durability done right: each data file is fsynced HERE, in parallel
    # across merge tasks, so the commit-time manifest fsync is tiny. (Without
    # this, the manifest fsync could both stall seconds behind ~GBs of dirty
    # writeback and fail to actually cover the data files.)
    with open(path, "rb") as f:
        os.fsync(f.fileno())

    last_lsn = max(ckpt, pc.max(ev.column(lsn_col)).as_py())
    n_tomb = pc.sum(is_deleted.cast(pa.int64())).as_py() or 0
    return {"pid": pid, "action": "write", "file": path,
            "last_lsn": int(last_lsn), "rows": int(lake_tbl.num_rows - n_tomb),
            "tombstones": int(n_tomb), "events_applied": int(ev.num_rows)}


def _make_merger(key: list[str], lsn_col: str, payload_schema: pa.Schema,
                 cur_files: dict[int, str], checkpoints: dict[int, int],
                 version: int, txn_dir: str):
    """Final per-partition merge for the Ray Data groupby path: runs once per
    pid inside ``groupby(pid).map_groups``; reads/writes go to the lake
    directory (shared storage on a real cluster). Returns a single metrics
    row — the driver only ever collects P tiny rows."""
    payload_names = [f.name for f in payload_schema]

    def merge(group: pa.Table) -> pd.DataFrame:
        pid = int(group.column(PID_COL)[0].as_py())
        row = _merge_partition_core(group, pid, checkpoints.get(pid, -1),
                                    cur_files.get(pid), key, lsn_col,
                                    payload_names, txn_dir)
        return pd.DataFrame([row])

    return merge


# ---------------------------------------------------------------------------
# direct exchange (fused map + P-way hash exchange + merge via Ray core)
# ---------------------------------------------------------------------------
#
# Profiling at sandbox scale showed Ray Data's generic sort-based groupby
# spending its wall time on shuffle-object handling (B input blocks x P
# partitions small objects + sort sampling barriers), not on compute; the CDC
# exchange needs no sort at all — the partition function pid = hash(conv_id)%P
# is known up front. This path expresses the exchange directly with Ray core
# tasks (the "custom operator" escape hatch, SURVEY.md §2 "Custom operators"):
#
#   map task  (one per input split): read parquet split with pushdown ->
#       schema-align -> op->rank -> pid -> per-split LWW combine -> return P
#       sub-tables (one object per partition)
#   merge task (one per pid): concat its B shards -> _merge_partition_core
#
# Partitioning assumption: every event of a key lands in exactly one pid
# (guaranteed by the hash); merge starts when all map outputs for that pid
# exist (an inherent barrier of any exchange). Object count is B x P — fine
# for the per-round B and P this engine targets (LSN-chunked rounds bound B;
# P is ~2-4x cluster cores). For extreme B x P, the Ray Data groupby path
# (exchange="raydata") remains available; both paths share merge semantics
# and are tested against the same oracle.

import ray


def _plan_splits(files: list[str], split_mib: int,
                 min_splits: int = 64) -> list[list[tuple[str, list[int]]]]:
    """Bytes-balanced read splits at ROW-GROUP granularity from parquet
    footers (metadata-only reads). A split is ``[(file, [rg_idx, ...]),
    ...]`` — independent of how rows happen to be sharded into files, so
    one huge file still fans out and a thousand tiny files still batch up.
    The plan derives from input bytes only (never cluster size): identical
    physical plan at every parallelism level.

    Driver-side footer reads are fine for the file counts one transaction
    sees; at extreme file counts plan from the manifest instead."""
    rgs: list[tuple[str, int, int]] = []           # (file, rg, compressed_bytes)
    total = 0
    for f in files:
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            b = sum(md.row_group(rg).column(j).total_compressed_size
                    for j in range(md.num_columns))
            rgs.append((f, rg, b))
            total += b
    # target bytes/split: bounded above by split_mib, and small enough that
    # ~min_splits splits exist when the data allows (fine-grained waves)
    target = max(1, min(split_mib << 20, total // min_splits))
    splits, cur, cur_bytes = [], [], 0
    for f, rg, b in rgs:
        if cur and cur[-1][0] == f:
            cur[-1][1].append(rg)
        else:
            cur.append((f, [rg]))
        cur_bytes += b
        if cur_bytes >= target:
            splits.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        splits.append(cur)
    return splits


@ray.remote
def _exchange_map_task(split: list[tuple[str, list[int]]], schema: pa.Schema,
                       flt, key: list[str], lsn_col: str, op_col: str,
                       num_partitions: int, combine: bool) -> list[pa.Table]:
    """Read one input split (row-group subsets, with pushdown), normalize,
    combine, and split into ``num_partitions`` sub-tables (P objects)."""
    import pyarrow.dataset as pads

    # heterogeneous (evolved) fragments: scan each file with ITS OWN schema
    # (the filter only touches the always-present lsn column, so pushdown
    # still applies) and align afterwards — Arrow's scanner can null-fill /
    # widen flat columns but cannot cast evolved struct columns, while
    # align_to_schema handles the full lattice including nested types
    parts = []
    for f, rg_ids in split:
        frag = next(iter(pads.dataset(f).get_fragments()))
        if len(rg_ids) < frag.num_row_groups:
            frag = frag.subset(row_group_ids=rg_ids)
        t = frag.to_table(filter=flt)
        parts.append(align_to_schema(t, schema))
    tbl = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
    op_values = pa.array(OPS, type=pa.string())
    rank = pc.index_in(tbl.column(op_col), value_set=op_values).cast(pa.int8())
    tbl = tbl.drop_columns([op_col]).append_column(RANK_COL, rank)

    h = stable_hash_strings(tbl.column(key[0]))
    pid = (h % np.uint64(num_partitions)).astype(np.int32)
    tbl = tbl.append_column(PID_COL, pa.array(pid))

    # ONE sort orders by (pid, key..., lsn, rank): the LWW-combine boundary
    # scan AND the partition split both read off it (pid never splits a key —
    # it is a function of key[0]). Arrow's fused sort_by measured FASTER than
    # hand-split sort_indices + selective gathers (two variants profiled at
    # 1.5-3x worse — the fused sort's cache behavior wins).
    sort_keys = ([(PID_COL, "ascending")] + [(k, "ascending") for k in key]
                 + [(lsn_col, "ascending"), (RANK_COL, "ascending")])
    tbl = tbl.sort_by(sort_keys)
    if combine:
        n = tbl.num_rows
        if n > 1:
            neq = None
            for k in key:
                col = tbl.column(k).combine_chunks()
                d = pc.fill_null(pc.not_equal(col.slice(0, n - 1), col.slice(1)), True)
                neq = d if neq is None else pc.or_(neq, d)
            mask = np.ones(n, dtype=bool)
            mask[: n - 1] = neq.to_numpy(zero_copy_only=False)
            tbl = tbl.filter(pa.array(mask))

    spid = tbl.column(PID_COL).to_numpy()
    bounds = np.searchsorted(spid, np.arange(num_partitions + 1))
    # each slice is gather-copied so the serialized return objects hold ONLY
    # their own rows (a zero-copy slice drags its parent buffers into the
    # object store)
    out = []
    for i in range(num_partitions):
        part = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        out.append(part.take(pa.array(np.arange(part.num_rows, dtype=np.int64))))
    return out


@ray.remote
def _exchange_merge_task(pid: int, cur_path, ckpt: int, key: list[str],
                         lsn_col: str, payload_names: list[str],
                         txn_dir: str, *shards) -> dict:
    # shards arrive as top-level args so Ray resolves the ObjectRefs in-line
    flat = []
    for s in shards:
        flat.extend(s) if isinstance(s, list) else flat.append(s)
    parts = [s for s in flat if s.num_rows]
    if not parts:
        return {"pid": pid, "action": "skip", "file": "", "last_lsn": ckpt,
                "rows": 0, "tombstones": 0, "events_applied": 0}
    ev = pa.concat_tables(parts, promote_options="permissive")
    return _merge_partition_core(ev, pid, ckpt, cur_path, key, lsn_col,
                                 payload_names, txn_dir)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class CDCEngine:
    """A CDC / incremental-ingest lake over conversation-transcript tables.

    Parameters
    ----------
    lake_dir : str
        Lake root (shared storage on a real cluster).
    num_partitions : int
        Fixed hash-partition count of the lake (``pid = hash(conv_id) % P``).
        Persisted in the manifest and validated on reopen.
    key : list[str]
        Upsert key; first element is the partitioning column.
    two_stage : bool
        Enable the salted skew path: a per-(pid, salt) partial LWW reduce
        before the final per-pid merge (default off — the per-batch combiner
        usually suffices; turn on for pathologically hot conversations).
    salts : int
        Sub-buckets per partition for the two-stage path.
    """

    def __init__(self, lake_dir: str, num_partitions: int = 32,
                 key: list[str] | None = None, lsn_col: str = "lsn",
                 op_col: str = "op", two_stage: bool = False, salts: int = 8,
                 combine_batches: bool = True, exchange: str = "direct",
                 split_mib: int = 16):
        if exchange not in ("direct", "raydata"):
            raise ValueError(f"unknown exchange {exchange!r}")
        if two_stage:
            # the salted two-stage reduce is a groupby construct; the direct
            # exchange gets its skew resistance from per-split combining
            exchange = "raydata"
        self.exchange = exchange
        self.lake_dir = lake_dir
        self.key = key or ["conv_id", "turn_idx"]
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.two_stage = two_stage
        self.salts = salts
        self.combine_batches = combine_batches
        self.split_mib = split_mib
        self.manifest = LakeManifest(lake_dir)
        meta = self.manifest.load().get("meta", {})
        if "num_partitions" in meta and int(meta["num_partitions"]) != num_partitions:
            raise ValueError(
                f"lake was created with num_partitions={meta['num_partitions']}, "
                f"got {num_partitions}")
        self.num_partitions = num_partitions

    # -- replay -------------------------------------------------------------

    def replay(self, changelog: str | list[str],
               lsn_min: int | None = None, lsn_max: int | None = None,
               ray_remote_args: dict | None = None) -> dict[str, Any]:
        """Replay (a slice of) the changelog into the lake as ONE exactly-once
        transaction. Returns commit metrics. Idempotent: events at or below a
        partition's checkpoint are skipped, and an interrupted transaction is
        invisible until its atomic manifest commit.
        """
        files = _expand_paths(changelog)
        in_schema = unify_parquet_schemas(files)
        payload_schema = pa.schema(
            [f for f in in_schema if f.name not in (self.lsn_col, self.op_col)])

        ckpts = self.manifest.checkpoints()
        # global pushdown: only sound if every partition has a checkpoint
        flt = None
        if len(ckpts) == self.num_partitions and ckpts:
            flt = pc.field(self.lsn_col) > min(ckpts.values())
        if lsn_min is not None:
            f2 = pc.field(self.lsn_col) > lsn_min
            flt = f2 if flt is None else (flt & f2)
        if lsn_max is not None:
            f2 = pc.field(self.lsn_col) <= lsn_max
            flt = f2 if flt is None else (flt & f2)

        if self.exchange == "direct":
            return self._replay_direct(files, in_schema, payload_schema,
                                       ckpts, flt)

        # no schema= at the read: evolved struct columns cannot be cast by
        # the parquet scanner; each batch aligns to the unified schema inside
        # the normalizer instead (same lattice as the direct path)
        ds = read_parquet(files, filter=flt)
        ds = ds.map_batches(
            _make_normalizer(in_schema, self.key, self.lsn_col, self.op_col,
                             self.num_partitions, self.salts,
                             self.combine_batches),
            batch_format="pyarrow", zero_copy_batch=True,
            **(ray_remote_args or {}))

        if self.two_stage:
            ds = ds.groupby([PID_COL, SALT_COL]).map_groups(
                _make_partial_reducer(self.key, self.lsn_col),
                batch_format="pyarrow")

        version = self.manifest.current_version() + 1
        txn_dir = self.manifest.txn_data_dir(version)
        merger = _make_merger(self.key, self.lsn_col, payload_schema,
                              self.manifest.partition_files(), ckpts,
                              version, txn_dir)
        metrics_ds = ds.groupby(PID_COL).map_groups(merger, batch_format="pyarrow")
        metrics = metrics_ds.to_pandas()
        self.last_stats = metrics_ds.stats()  # per-operator wall/cpu breakdown
        return self._commit_metrics(version, metrics.to_dict("records"))

    def _replay_direct(self, files: list[str], in_schema: pa.Schema,
                       payload_schema: pa.Schema, ckpts: dict[int, int],
                       flt) -> dict[str, Any]:
        """Direct P-way hash exchange via Ray core tasks (see module notes):
        fused read+normalize+combine+split map tasks, then one merge task per
        partition. Same merge semantics and exactly-once commit as the
        Ray Data path."""
        import ray as _ray

        # split planning at row-group granularity (bytes only — identical
        # plan at every parallelism level); bounded MiB per split keeps
        # per-task heap small and the map waves fine-grained (a straggler
        # costs one small split, not 1/n_files of the job)
        splits = _plan_splits(files, self.split_mib)
        n_splits = len(splits)
        total_bytes = sum(os.path.getsize(f) for f in files)

        P = self.num_partitions
        payload_names = [f.name for f in payload_schema]
        version = self.manifest.current_version() + 1
        txn_dir = self.manifest.txn_data_dir(version)
        cur_files = self.manifest.partition_files()

        import time as _time

        t0 = _time.perf_counter()
        shard_refs = [
            _exchange_map_task.options(num_returns=P).remote(
                split, in_schema, flt, self.key, self.lsn_col, self.op_col,
                P, self.combine_batches)
            for split in splits
        ]
        # num_returns=1 yields a bare ref to the single-element list (not a
        # tuple of refs), so zip(*) can't transpose it — the lone merge task
        # must receive ALL B shard refs and flatten their list payloads
        per_pid = ([list(shard_refs)] if P == 1
                   else [list(col) for col in zip(*shard_refs)])
        flat = [r for col in per_pid for r in col]
        _ray.wait(flat, num_returns=len(flat), fetch_local=False)
        t_maps = _time.perf_counter()
        merge_refs = [
            _exchange_merge_task.remote(pid, cur_files.get(pid),
                                        ckpts.get(pid, -1), self.key,
                                        self.lsn_col, payload_names, txn_dir,
                                        *per_pid[pid])
            for pid in range(P)
        ]
        rows = _ray.get(merge_refs)
        t_merge = _time.perf_counter()
        res = self._commit_metrics(version, rows)
        t_commit = _time.perf_counter()
        self.last_stats = (
            f"direct exchange: {n_splits} map tasks x {P} partitions "
            f"({total_bytes >> 20} MiB input); maps {t_maps - t0:.2f}s, "
            f"merge {t_merge - t_maps:.2f}s, commit {t_commit - t_merge:.2f}s")
        return res

    def _commit_metrics(self, version: int,
                        rows: list[dict]) -> dict[str, Any]:
        written = [r for r in rows if r.get("action") == "write"]
        if not written:
            return {"version": self.manifest.current_version(), "committed": False,
                    "events_applied": 0, "partitions_written": 0}
        new_parts = {
            int(r["pid"]): {"file": r["file"], "last_lsn": int(r["last_lsn"]),
                            "rows": int(r["rows"]),
                            "tombstones": int(r["tombstones"])}
            for r in written
        }
        totals = {
            "events_applied": int(sum(r["events_applied"] for r in written)),
            "partitions_written": len(new_parts),
            "rows_live": int(sum(r["rows"] for r in written)),
        }
        self.manifest.commit(version, new_parts,
                             meta={"num_partitions": self.num_partitions,
                                   "key": self.key},
                             metrics=totals)
        return {"version": version, "committed": True, **totals}

    def replay_in_rounds(self, changelog: str | list[str],
                         num_rounds: int) -> list[dict[str, Any]]:
        """Process the changelog in LSN-ordered micro-batches (one exactly-once
        transaction per round) so per-round merge state is bounded — the scale
        path for 10^10-event logs (SURVEY.md §7.5.2). Round bounds come from
        parquet footer statistics (metadata-only)."""
        files = _expand_paths(changelog)
        lo, hi = _lsn_bounds(files, self.lsn_col)
        edges = np.linspace(lo - 1, hi, num_rounds + 1).astype(np.int64)
        out = []
        for i in range(num_rounds):
            out.append(self.replay(files, lsn_min=int(edges[i]),
                                   lsn_max=int(edges[i + 1])))
        return out

    def tail(self, changelog: str | list[str], max_polls: int = 10,
             idle_stop: int = 2, poll_interval_s: float = 0.0) -> list[dict]:
        """Binlog/WAL-style tailer: poll the changelog location and apply
        whatever is new, as long as new events keep arriving.

        Each poll is one exactly-once :meth:`replay` — per-partition LSN
        checkpoints make polling idempotent (already-applied events are
        pruned at the read and skipped in the merge), so "tail" is literally
        "replay in a loop". Stops after ``idle_stop`` consecutive polls with
        nothing new, or ``max_polls`` total. Returns per-poll metrics.

        Delivery contract (the standard WAL/binlog prefix property): segments
        that appear later must only contain events with LSN above the
        already-applied checkpoints — checkpoints are watermarks meaning
        "everything at or below is applied". Out-of-order backfill across
        polls violates that; for such logs, replay the full set in one call
        (idempotent, order-free) instead of tailing."""
        import time as _time

        out = []
        idle = 0
        for _ in range(max_polls):
            m = self.replay(changelog)
            out.append(m)
            idle = 0 if m["committed"] else idle + 1
            if idle >= idle_stop:
                break
            if poll_interval_s:
                _time.sleep(poll_interval_s)
        return out

    def compact(self, ray_remote_args: dict | None = None) -> dict[str, Any]:
        """Drop tombstones by rewriting partitions that have any (one new
        exactly-once transaction; untouched partitions carry forward).

        Safe because every stored tombstone's ``_lsn`` <= that partition's
        checkpoint, and replay filters incoming events to
        ``lsn > checkpoint[pid]`` — no late event can resurrect a compacted
        delete."""
        import ray as _ray

        man = self.manifest.load()
        todo = {int(pid): e for pid, e in man["partitions"].items()
                if e.get("tombstones", 0) > 0}
        if not todo:
            return {"version": man["version"], "committed": False,
                    "partitions_compacted": 0}
        version = man["version"] + 1
        txn_dir = self.manifest.txn_data_dir(version)

        @_ray.remote
        def rewrite(pid: int, src: str, last_lsn: int) -> dict:
            tbl = pq.read_table(src)
            live = tbl.filter(pc.equal(tbl.column(LAKE_DELETED_COL), False))
            path = os.path.join(txn_dir, f"pid={pid:05d}.parquet")
            pq.write_table(live, path, compression="zstd", compression_level=1)
            # same durability rule as _merge_partition_core: the data file
            # must be on disk before the manifest can point at it
            with open(path, "rb") as f:
                os.fsync(f.fileno())
            return {"pid": pid, "action": "write", "file": path,
                    "last_lsn": last_lsn, "rows": live.num_rows,
                    "tombstones": 0, "events_applied": 0}

        rows = _ray.get([
            rewrite.remote(pid, os.path.join(self.lake_dir, e["file"]),
                           int(e["last_lsn"]))
            for pid, e in todo.items()
        ])
        res = self._commit_metrics(version, rows)
        res["partitions_compacted"] = len(rows)
        return res

    # -- read side ----------------------------------------------------------

    def final_dataset(self, columns: list[str] | None = None,
                      version: int | None = None) -> rd.Dataset:
        """The committed lake table as a streaming Dataset (tombstones dropped,
        internal columns hidden). Pass ``version`` to time-travel to any
        previously committed transaction (manifests are retained)."""
        pfiles = sorted(self.manifest.partition_files(version).values())
        if not pfiles:
            raise ValueError("lake is empty (no committed transactions)")
        schema = unify_parquet_schemas(pfiles)
        ds = read_parquet(pfiles, schema=schema,
                             filter=~pc.field(LAKE_DELETED_COL))
        drop = [LAKE_LSN_COL, LAKE_DELETED_COL]
        user_cols = [n for n in schema.names if n not in drop]
        ds = ds.select_columns(columns or user_cols)
        return ds

    def final_table(self, sort: bool = True, version: int | None = None) -> pa.Table:
        """Materialized final state, sorted by key — for tests/verification
        only (stable turn ordering per BASELINE.json); never call on 100 TB."""
        batches = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
                   for b in self.final_dataset(version=version).iter_batches(
                       batch_size=65536, batch_format="pyarrow")]
        tbl = pa.concat_tables(batches, promote_options="permissive")
        if sort:
            tbl = tbl.sort_by([(k, "ascending") for k in self.key])
        return tbl

    def table_changes(self, v_from: int, v_to: int | None = None,
                      payload_columns: list[str] | None = None
                      ) -> rd.Dataset:
        """The lake as a CDC **source**: the exact row-level diff between
        two committed versions — ``(key..., change ∈ insert/update/delete,
        new payload columns — null for deletes)``.

        Scale design: partitions whose manifest file entry is IDENTICAL at
        both versions are pruned before any read (an incremental commit
        rewrites only touched partitions, so the diff reads only those);
        the remaining live snapshots full-outer ``hash_join`` on the key.
        "Update" is detected by the per-row ``_lsn`` (the winning event's
        LSN — rewritten iff a newer event won the key), so payload-equal
        rewrites are still reported, exactly like the changelog semantics.
        Robust to compaction: a compacted ``v_to`` drops tombstones, but a
        key live at ``v_from`` and absent at ``v_to`` is still a delete via
        the outer join.

        ``payload_columns`` prunes the new-side payload carried through the
        diff (``[]`` = keys + change only): a consumer that only needs the
        change kind (e.g. incremental count maintenance) should not ship
        the wide text columns through the outer-join exchange."""
        from ..stages.joins import hash_join

        pf1 = self.manifest.partition_files(v_from)
        pf2 = self.manifest.partition_files(v_to)
        pids = [p for p in set(pf1) | set(pf2) if pf1.get(p) != pf2.get(p)]
        f1 = sorted(pf1[p] for p in pids if p in pf1)
        f2 = sorted(pf2[p] for p in pids if p in pf2)

        def _live(files: list[str], cols: list[str]) -> rd.Dataset:
            schema = unify_parquet_schemas(files)
            ds = read_parquet(files, schema=schema,
                              filter=~pc.field(LAKE_DELETED_COL))
            return ds.select_columns(cols)

        base = unify_parquet_schemas(f2 or f1 or
                                     sorted(pf2.values() or pf1.values()))
        payload = [n for n in base.names
                   if n not in (*self.key, LAKE_LSN_COL, LAKE_DELETED_COL)]
        if payload_columns is not None:
            payload = [c for c in payload if c in payload_columns]

        def _empty(cols: list[str]) -> rd.Dataset:
            names = [c if c in base.names else LAKE_LSN_COL for c in cols]
            t = base.empty_table().select(names).rename_columns(cols)
            return rd.from_arrow(t)

        old_cols = [*self.key, "_lsn_from"]
        new_cols = [*self.key, "_lsn_to", *payload]
        old = (_live(f1, [*self.key, LAKE_LSN_COL]).map_batches(
            lambda b: b.rename_columns(old_cols),
            batch_format="pyarrow", zero_copy_batch=True)
            if f1 else _empty(old_cols))
        new = (_live(f2, [*self.key, LAKE_LSN_COL, *payload]).map_batches(
            lambda b: b.rename_columns(new_cols),
            batch_format="pyarrow", zero_copy_batch=True)
            if f2 else _empty(new_cols))
        joined = hash_join(old, new, on=list(self.key), how="outer")

        def classify(b: pa.Table) -> pa.Table:
            lf, lt = b.column("_lsn_from"), b.column("_lsn_to")
            change = pc.if_else(
                pc.is_null(lf), pa.scalar("insert"),
                pc.if_else(pc.is_null(lt), pa.scalar("delete"),
                           pa.scalar("update")))
            out = b.drop_columns(["_lsn_from", "_lsn_to"])
            out = out.add_column(len(self.key), "change", change)
            # unchanged rows (same winning LSN on both sides) are not changes
            keep = pc.or_kleene(pc.is_null(lf), pc.or_kleene(
                pc.is_null(lt), pc.not_equal(lf, lt)))
            return out.filter(pc.fill_null(keep, False))

        return joined.map_batches(classify, batch_format="pyarrow",
                                  zero_copy_batch=True)


def _lsn_bounds(files: list[str], lsn_col: str) -> tuple[int, int]:
    """(min, max) LSN across files from parquet row-group statistics."""
    lo, hi = None, None
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().get_field_index(lsn_col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        raise ValueError(f"no {lsn_col} statistics in parquet footers")
    return int(lo), int(hi)


def replay_changelog(changelog: str | list[str], lake_dir: str,
                     num_partitions: int = 32, **kw) -> dict[str, Any]:
    """One-shot convenience: replay the whole changelog into a (new or
    existing) lake and return commit metrics."""
    eng = CDCEngine(lake_dir, num_partitions=num_partitions, **kw)
    return eng.replay(changelog)
