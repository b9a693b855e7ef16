"""Distributed connected components over an undirected edge list.

The missing last step of the near-dup pipeline: candidate **pairs**
(MinHash / SimHash / embedding-cosine output) become dedup **clusters** —
each document labelled with its component's minimum id, so "keep one
representative per near-dup group" is a single filter (`comp == id`).

Algorithm: iterative min-label propagation. Each round every node takes the
minimum label among itself and its neighbors:

    labels ← (labels ∪ labels⋈edges) . groupby(id).min(comp)

Each round is one bucketed ``hash_join`` (edges × labels) plus one
``groupby`` min — two shuffles over edge-sized data, which at 100 TB is
bounded by the true near-dup density, not the corpus (the pair list is the
verified-duplicate set, orders of magnitude smaller than the input).
Convergence is detected without an old×new diff join: the self-row carries
the previous label through the SAME groupby (``old = max`` of a column
that is null on message rows), so "changed" is a per-row compare + Sum
over the new labels. Works for any orderable id type (string conv ids
included). Rounds needed = the component graph's diameter; near-dup
components are clique-ish (every pair above threshold is its own edge), so
the loop typically converges in 2-3 rounds; a ``max_iter`` guard raises on
pathological chains rather than looping forever.

Labels are materialized each round: the iteration would otherwise stack an
unbounded lazy lineage (each round would re-execute every prior round).

The reference has no graph ops; this is part of the brief's dedup family.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from .joins import hash_join


from .transforms import sever as _sever


def connected_components(edges: rd.Dataset, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 50
                         ) -> rd.Dataset:
    """``(id, comp)`` for every node appearing in ``edges``, where ``comp``
    is the minimum node id of its connected component."""

    def both_dirs(b: pa.Table) -> pa.Table:
        fwd = pa.table({"id": b.column(src), "nbr": b.column(dst)})
        rev = pa.table({"id": b.column(dst), "nbr": b.column(src)})
        return pa.concat_tables([fwd, rev])

    e = _sever(edges.map_batches(both_dirs, batch_format="pyarrow",
                                 zero_copy_batch=True))
    # bytes-aware bucket count, computed ONCE from the materialized edge
    # list (labels are never larger): tiny pair lists collapse to one
    # bucket — at 48 fixed buckets the per-round shuffle machinery was the
    # whole wall — while huge edge lists keep the ~512 MiB heap bound.
    from .joins import _MIN_SHARD_BYTES, _TARGET_BUCKET_BYTES, _default_shards
    eb = e.materialize().size_bytes() or _MIN_SHARD_BYTES
    nb = max(-(-eb // _TARGET_BUCKET_BYTES),
             min(_default_shards(), -(-eb // _MIN_SHARD_BYTES)), 1)

    # init: comp(id) = min neighbor ∪ self  (round 1 fused into the init)
    def self_and_nbr(b: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"id": b.column("id"), "comp": b.column("nbr")}),
            pa.table({"id": b.column("id"), "comp": b.column("id")}),
        ])

    from .groupagg import grouped_agg

    labels = _sever(grouped_agg(
        e.map_batches(self_and_nbr, batch_format="pyarrow",
                      zero_copy_batch=True),
        keys=["id"], aggs=[("comp", "min", "comp")]))

    def tag_old(b: pa.Table) -> pa.Table:
        return pa.table({"id": b.column("id"), "comp": b.column("comp"),
                         "old": b.column("comp")})

    def tag_msg(b: pa.Table) -> pa.Table:
        return pa.table({"id": b.column("id"), "comp": b.column("comp"),
                         "old": pa.nulls(b.num_rows, b.column("comp").type)})

    def n_changed(b: pa.Table) -> pa.Table:
        ne = pc.cast(pc.not_equal(b.column("comp"), b.column("old")),
                     pa.int64())
        return pa.table({"changed": ne})

    for rnd in range(max_iter):
        # propagate: neighbor's current label reaches me through the edge
        msgs = hash_join(e, labels.map_batches(
            lambda b: b.select(["id", "comp"]).rename_columns(["nbr", "comp"]),
            batch_format="pyarrow", zero_copy_batch=True), on=["nbr"],
            num_buckets=nb)
        cand = (msgs.select_columns(["id", "comp"])
                .map_batches(tag_msg, batch_format="pyarrow",
                             zero_copy_batch=True)
                .union(labels.map_batches(tag_old, batch_format="pyarrow",
                                          zero_copy_batch=True)))
        # repartition to the bucket count (union+groupby double the block
        # count every round otherwise) and SEVER the plan (see _sever)
        mid = _sever(grouped_agg(cand, keys=["id"],
                                 aggs=[("comp", "min", "comp"),
                                       ("old", "max", "old")])
                     .repartition(nb))
        # pointer jump: comp ← comp(comp). Every label IS a node id with its
        # own label row, so the self-join is total; jumping doubles the
        # distance a minimum travels per round → O(log diameter) rounds on
        # chain-shaped components instead of O(diameter). Skipped for the
        # first two rounds: near-dup graphs are clique-ish and converge
        # immediately, so the extra join would be pure overhead there.
        if rnd < 2:
            labels = mid
        else:
            jump = mid.map_batches(
                lambda b: b.select(["id", "comp"]).rename_columns(
                    ["comp", "comp_of"]),
                batch_format="pyarrow", zero_copy_batch=True)
            labels = _sever(hash_join(mid, jump, on=["comp"], num_buckets=nb
                                      ).map_batches(
                lambda b: pa.table({"id": b.column("id"),
                                    "comp": b.column("comp_of"),
                                    "old": b.column("old")}),
                batch_format="pyarrow", zero_copy_batch=True).repartition(nb))
        changed = (labels.map_batches(n_changed, batch_format="pyarrow",
                                      zero_copy_batch=True)
                   .aggregate(Sum("changed", alias_name="s"))["s"])
        labels = labels.select_columns(["id", "comp"])
        if not changed:           # labels only decrease → fixpoint reached
            return labels
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} "
                       f"rounds (pathological chain-shaped components?)")


def components_of_pairs(pairs: pd.DataFrame, max_iter: int = 50
                        ) -> pd.DataFrame:
    """Convenience: a (small, driver-resident) verified-pair DataFrame →
    sorted ``(id, comp)`` labelling via the distributed loop."""
    if len(pairs) == 0:
        dt = pairs["id_a"].dtype if "id_a" in pairs else "int64"
        return pd.DataFrame({"id": pd.Series([], dtype=dt),
                             "comp": pd.Series([], dtype=dt)})
    edges = rd.from_arrow(pa.Table.from_pandas(pairs[["id_a", "id_b"]],
                                               preserve_index=False))
    out = connected_components(edges, max_iter=max_iter).to_pandas()
    return out.sort_values("id").reset_index(drop=True)
