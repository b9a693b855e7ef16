"""CDC lake lifecycle: tailing, compaction, time travel."""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ml_data_pipeline_ray.cdc import CDCEngine, oracle_replay
from ml_data_pipeline_ray.cdc.oracle import FINAL_COLUMNS
from ml_data_pipeline_ray.cdc.replay import LAKE_DELETED_COL


def _read_all(d):
    return pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(d + "/*.parquet"))],
                            promote_options="permissive")


@pytest.mark.usefixtures("ray_session")
def test_tail_applies_incrementally_arriving_files(small_fixture, tmp_path):
    """Simulate a binlog tail: LSN-ordered log segments arrive in waves (the
    WAL prefix contract — later segments only carry higher LSNs); each poll
    applies only what's new; final state equals the full-oracle replay."""
    full = _read_all(small_fixture["changelog"]).sort_by([("lsn", "ascending")])
    n = full.num_rows
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_partitions=8)

    applied = []
    bounds = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        seg = full.slice(bounds[i], bounds[i + 1] - bounds[i])
        pq.write_table(seg, os.path.join(spool, f"segment-{i:03d}.parquet"))
        res = eng.tail(spool, max_polls=3, idle_stop=1)
        applied.extend(res)
    assert sum(r["committed"] for r in applied) == 3
    # nothing new -> tail stops without committing
    res = eng.tail(spool, max_polls=3, idle_stop=2)
    assert all(not r["committed"] for r in res)

    got = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    want = oracle_replay(_read_all(small_fixture["changelog"]))
    assert len(got) == len(want)
    for col in FINAL_COLUMNS:
        pd.testing.assert_series_equal(got[col].reset_index(drop=True),
                                       want[col].reset_index(drop=True),
                                       check_names=False, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_compact_drops_tombstones_preserves_state(small_fixture, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_partitions=8)
    eng.replay(small_fixture["changelog"])
    before = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    tombs_before = sum(e["tombstones"]
                       for e in eng.manifest.load()["partitions"].values())
    assert tombs_before > 0

    res = eng.compact()
    assert res["committed"] and res["partitions_compacted"] > 0
    tombs_after = sum(e["tombstones"]
                      for e in eng.manifest.load()["partitions"].values())
    assert tombs_after == 0
    # physical files contain no deleted rows anymore
    for f in eng.manifest.partition_files().values():
        t = pq.read_table(f)
        assert t.filter(t.column(LAKE_DELETED_COL)).num_rows == 0

    after = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    pd.testing.assert_frame_equal(before, after)

    # replay after compaction stays a no-op (checkpoints intact)
    again = eng.replay(small_fixture["changelog"])
    assert again["committed"] is False


@pytest.mark.usefixtures("ray_session")
def test_time_travel_versions(small_fixture, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_partitions=8)
    rounds = eng.replay_in_rounds(small_fixture["changelog"], num_rounds=2)
    v1, v2 = rounds[0]["version"], rounds[1]["version"]
    t1 = eng.final_table(sort=True, version=v1)
    t2 = eng.final_table(sort=True, version=v2)
    tcur = eng.final_table(sort=True)
    assert t2.equals(tcur)
    assert not t1.equals(t2)          # state evolved between versions
    with pytest.raises(ValueError, match="not been committed"):
        eng.final_dataset(version=99)


@pytest.mark.usefixtures("ray_session")
def test_table_changes_diff_and_converged_empty(small_fixture, tmp_path):
    """table_changes(v1) between the mid-LSN and final versions equals the
    brute diff of the two materialized snapshots; re-replaying a converged
    lake yields an EMPTY diff (winning LSNs unchanged everywhere)."""
    from ml_data_pipeline_ray.cdc.replay import _lsn_bounds

    files = sorted(glob.glob(small_fixture["changelog"] + "/*.parquet"))
    lo, hi = _lsn_bounds(files, "lsn")
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(files, lsn_max=(lo + hi) // 2)
    v1 = eng.manifest.current_version()
    eng.replay(files, lsn_min=(lo + hi) // 2)

    got = (eng.table_changes(v_from=v1).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))

    s1 = eng.final_table(version=v1).to_pandas().set_index(
        ["conv_id", "turn_idx"])
    s2 = eng.final_table().to_pandas().set_index(["conv_id", "turn_idx"])
    inserts = set(s2.index) - set(s1.index)
    deletes = set(s1.index) - set(s2.index)
    want_ins = {k for k, c in zip(zip(got["conv_id"], got["turn_idx"]),
                                  got["change"]) if c == "insert"}
    want_del = {k for k, c in zip(zip(got["conv_id"], got["turn_idx"]),
                                  got["change"]) if c == "delete"}
    assert want_ins == inserts
    assert want_del == deletes
    # updates are a superset check: every reported update exists in both
    ups = got[got["change"] == "update"]
    for k in zip(ups["conv_id"], ups["turn_idx"]):
        assert k in s1.index and k in s2.index

    # converged re-replay → empty diff
    v2 = eng.manifest.current_version()
    eng.replay(files)
    assert eng.table_changes(v_from=v2).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_table_changes_after_compaction_empty_and_pruned(small_fixture, tmp_path):
    """Compaction rewrites ONLY tombstoned partitions; the diff across the
    compaction commit must be empty (live rows keep their winning LSN) and
    the manifest-level pruning must have real effect (untouched partitions
    keep identical file entries)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(small_fixture["changelog"])
    v1 = eng.manifest.current_version()
    res = eng.compact()
    assert res["committed"]
    pf1 = eng.manifest.partition_files(v1)
    pf2 = eng.manifest.partition_files()
    changed = [p for p in set(pf1) | set(pf2) if pf1.get(p) != pf2.get(p)]
    assert 0 < len(changed) <= res["partitions_compacted"]
    assert eng.table_changes(v_from=v1).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_table_changes_across_schema_evolution(tmp_path_factory, tmp_path):
    """Diff across an evolving commit: the first transaction is pure v1
    schema (no ``model``), the second brings the evolved files — the diff
    must surface the unified schema (``model`` present, null where the
    winning row predates the evolution) without error."""
    from ml_data_pipeline_ray.cdc.replay import _lsn_bounds
    from ml_data_pipeline_ray.fixtures import write_fixture_set

    paths = write_fixture_set(str(tmp_path_factory.mktemp("ev_diff")),
                              scale="tiny", seed=42, n_files=8, evolve=True)
    files = sorted(glob.glob(paths["changelog"] + "/*.parquet"))
    lo, hi = _lsn_bounds(files, "lsn")
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(files, lsn_max=(lo + hi) // 2)   # pre-cutover: v1 schema
    v1 = eng.manifest.current_version()
    eng.replay(files, lsn_min=(lo + hi) // 2)   # brings the evolved schema
    diff = eng.table_changes(v_from=v1).to_pandas()
    assert len(diff) > 0
    assert "model" in diff.columns
    ins = diff[diff["change"] == "insert"]
    assert ins["model"].notna().any()           # evolved rows carry model


@pytest.mark.usefixtures("ray_session")
def test_incremental_view_across_tail_polls(small_fixture, tmp_path):
    """The CDC-source composition a real consumer runs: a per-conversation
    turn-count view maintained ONLY from `table_changes` diffs across three
    tail polls, checked against a full recompute of the snapshot at every
    committed version."""
    import numpy as np

    from ml_data_pipeline_ray.cdc.replay import _lsn_bounds

    files = sorted(glob.glob(small_fixture["changelog"] + "/*.parquet"))
    lo, hi = _lsn_bounds(files, "lsn")
    cuts = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3, hi]
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)

    view: dict = {}
    prev_v = None
    lsn_min = None
    for cut in cuts:
        eng.replay(files, lsn_min=lsn_min, lsn_max=cut)
        v = eng.manifest.current_version()
        if prev_v is None:
            snap = eng.final_table(version=v).to_pandas()
            view = snap.groupby("conv_id").size().to_dict()
        else:
            diff = eng.table_changes(v_from=prev_v, v_to=v,
                                     payload_columns=[]).to_pandas()
            for conv, ch in zip(diff["conv_id"], diff["change"]):
                view[conv] = view.get(conv, 0) + (1 if ch == "insert" else
                                                  -1 if ch == "delete" else 0)
            view = {c: n for c, n in view.items() if n > 0}
        want = (eng.final_table(version=v).to_pandas()
                .groupby("conv_id").size().to_dict())
        assert view == want, f"view diverged at version {v}"
        prev_v, lsn_min = v, cut
