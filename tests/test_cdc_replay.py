"""End-to-end CDC replay correctness: engine final table == pandas oracle,
per-turn text equality under stable (conv_id, turn_idx) ordering
(BASELINE.json north rule)."""

import glob

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ml_data_pipeline_ray.cdc import CDCEngine, oracle_replay
from ml_data_pipeline_ray.cdc.oracle import FINAL_COLUMNS


def _read_all(changelog_dir: str) -> pa.Table:
    files = sorted(glob.glob(changelog_dir + "/*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files],
                            promote_options="permissive")


def _assert_tables_equal(engine_df: pd.DataFrame, oracle_df: pd.DataFrame):
    assert list(engine_df.columns) == list(oracle_df.columns)
    assert len(engine_df) == len(oracle_df)
    for col in oracle_df.columns:
        a = engine_df[col].reset_index(drop=True)
        b = oracle_df[col].reset_index(drop=True)
        pd.testing.assert_series_equal(a, b, check_names=False,
                                       check_dtype=False, obj=f"column {col}")


@pytest.mark.usefixtures("ray_session")
def test_full_replay_matches_oracle(small_fixture, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_partitions=8)
    metrics = eng.replay(small_fixture["changelog"])
    assert metrics["committed"]
    assert metrics["partitions_written"] == 8

    got = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    want = oracle_replay(_read_all(small_fixture["changelog"]))
    _assert_tables_equal(got, want)
    # text equality is byte-exact
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_two_stage_salted_path_equals_oracle(small_fixture, tmp_path):
    lake = str(tmp_path / "lake2")
    eng = CDCEngine(lake, num_partitions=8, two_stage=True, salts=4,
                    exchange="raydata")
    eng.replay(small_fixture["changelog"])
    got = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    want = oracle_replay(_read_all(small_fixture["changelog"]))
    _assert_tables_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_raydata_and_direct_exchange_agree(small_fixture, tmp_path):
    """Both exchange implementations produce identical committed state."""
    a = CDCEngine(str(tmp_path / "ld"), num_partitions=8, exchange="direct")
    a.replay(small_fixture["changelog"])
    b = CDCEngine(str(tmp_path / "lr"), num_partitions=8, exchange="raydata")
    b.replay(small_fixture["changelog"])
    ta = a.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    tb = b.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    pd.testing.assert_frame_equal(ta, tb)


@pytest.mark.usefixtures("ray_session")
def test_single_partition_direct_exchange_keeps_all_splits(small_fixture, tmp_path):
    """P=1 regression: with num_partitions=1 the lone merge task must receive
    every map split's output, not just the first (ADVICE r1, replay.py:468)."""
    eng = CDCEngine(str(tmp_path / "lp1"), num_partitions=1, exchange="direct")
    m = eng.replay(small_fixture["changelog"])
    assert m["committed"]
    got = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    want = oracle_replay(_read_all(small_fixture["changelog"]))
    _assert_tables_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_replay_in_rounds_converges_identically(small_fixture, tmp_path):
    lake = str(tmp_path / "lake3")
    eng = CDCEngine(lake, num_partitions=8)
    rounds = eng.replay_in_rounds(small_fixture["changelog"], num_rounds=3)
    assert sum(r["committed"] for r in rounds) >= 1
    got = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]
    want = oracle_replay(_read_all(small_fixture["changelog"]))
    _assert_tables_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_idempotent_re_replay(small_fixture, tmp_path):
    """Re-running the full log over a converged lake applies zero events
    (at-least-once delivery absorbed by checkpoints + LWW)."""
    lake = str(tmp_path / "lake4")
    eng = CDCEngine(lake, num_partitions=8)
    eng.replay(small_fixture["changelog"])
    v1 = eng.manifest.current_version()
    m2 = eng.replay(small_fixture["changelog"])
    assert m2["committed"] is False
    assert m2["events_applied"] == 0
    assert eng.manifest.current_version() == v1


@pytest.mark.usefixtures("ray_session")
def test_delete_tombstone_and_revive(small_fixture, tmp_path):
    lake = str(tmp_path / "lake5")
    eng = CDCEngine(lake, num_partitions=8)
    eng.replay(small_fixture["changelog"])
    log = _read_all(small_fixture["changelog"]).to_pandas()
    want = oracle_replay(log)
    got = eng.final_table(sort=True).to_pandas()[FINAL_COLUMNS]

    # keys whose last event is a delete are absent
    log["_rank"] = log["op"].map({"insert": 0, "update": 1, "delete": 2})
    last = (log.sort_values(["lsn", "_rank"], kind="mergesort")
            .groupby(["conv_id", "turn_idx"]).tail(1))
    deleted_keys = set(map(tuple, last.loc[last.op == "delete",
                                           ["conv_id", "turn_idx"]].to_numpy()))
    got_keys = set(map(tuple, got[["conv_id", "turn_idx"]].to_numpy()))
    assert deleted_keys and not (deleted_keys & got_keys)

    # revived keys (insert after delete) are present with the revived text
    revived = (last[(last.op == "insert")]
               .merge(log[log.op == "delete"][["conv_id", "turn_idx"]].drop_duplicates(),
                      on=["conv_id", "turn_idx"]))
    assert len(revived) > 0
    assert set(map(tuple, revived[["conv_id", "turn_idx"]].to_numpy())) <= got_keys
    assert len(got) == len(want)
