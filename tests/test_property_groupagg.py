"""Property-based test: for ARBITRARY tables (random key cardinalities,
null patterns, negative values, block layouts), the Arrow-native
``grouped_agg`` equals a pandas oracle under SQL null semantics for every
supported aggregate function."""

import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings

from ml_data_pipeline_ray.stages.groupagg import grouped_agg


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=1, max_value=300))
    n_keys = draw(st.integers(min_value=1, max_value=50))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    null_frac = draw(st.sampled_from([0.0, 0.1, 1.0]))
    parts = draw(st.sampled_from([1, 3, 7]))
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": np.char.add("k", rng.integers(0, n_keys, n).astype(str)),
        "v": rng.normal(0, 100, n),
        "m": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    if null_frac:
        mask = rng.random(n) < null_frac
        df.loc[mask, "v"] = np.nan
    return df, parts


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(tables())
def test_grouped_agg_equals_pandas_oracle(case):
    df, parts = case
    got = grouped_agg(
        rd.from_pandas(df).repartition(parts), keys=["k"],
        aggs=[("v", "sum", "sv"), ("v", "count", "nv"),
              ("v", "mean", "av"), ("m", "min", "mn"),
              ("m", "max", "mx"), ("k", "count", "nr")],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = (df.groupby("k")
            .agg(sv=("v", lambda s: s.sum(min_count=1)),   # SQL: all-NULL→NULL
                 nv=("v", "count"), av=("v", "mean"),
                 mn=("m", "min"), mx=("m", "max"), nr=("k", "size"))
            .reset_index().sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == want["k"].tolist()
    for c in ("nv", "nr", "mn", "mx"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # all-null groups surface as None (object dtype) from Arrow — coerce
    assert np.allclose(got["sv"].astype(np.float64),
                       want["sv"].astype(np.float64), equal_nan=True)
    assert np.allclose(got["av"].astype(np.float64),
                       want["av"].astype(np.float64), equal_nan=True)
