"""F3 schema evolution: added nullable column + int32->int64 widening across
the changelog, unified via Arrow permissive promotion (reference analog:
``compatible_with`` lattice, ml-data/ml-data-core/src/schema.rs:206-253)."""

import glob

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ml_data_pipeline_ray.cdc import CDCEngine, oracle_replay
from ml_data_pipeline_ray.fixtures import write_fixture_set


@pytest.fixture(scope="module")
def evolved_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cdc_evolved"))
    return write_fixture_set(root, scale="tiny", seed=42, n_files=8, evolve=True)


def _read_all(d):
    return pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(d + "/*.parquet"))],
                            promote_options="permissive")


@pytest.mark.usefixtures("ray_session")
def test_evolved_replay_unifies_schema_and_matches_oracle(evolved_fixture, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_partitions=8)
    m = eng.replay(evolved_fixture["changelog"])
    assert m["committed"]

    tbl = eng.final_table(sort=True)
    # unified schema: widened turn_idx, added nullable model
    assert tbl.schema.field("turn_idx").type == pa.int64()
    assert "model" in tbl.schema.names

    got = tbl.to_pandas()
    want = oracle_replay(_read_all(evolved_fixture["changelog"]),
                         extra_columns=["model"])
    got = got[want.columns.tolist()]
    assert len(got) == len(want)
    for col in want.columns:
        pd.testing.assert_series_equal(
            got[col].reset_index(drop=True), want[col].reset_index(drop=True),
            check_names=False, check_dtype=False, obj=f"column {col}")

    # pre-cutover winners have null model (null-backfill), some post-cutover don't
    assert got["model"].isna().any()
    assert got["model"].notna().any()
