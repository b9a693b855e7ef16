"""Fitted encoders vs sklearn-style pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ml_data_pipeline_ray.stages.encoders import (MinMaxScaler, OneHotEncoder,
                                                  StandardScaler)


@pytest.mark.usefixtures("ray_session")
def test_one_hot_encoder():
    df = pd.DataFrame({"cat": ["a", "b", "a", None, "c"], "x": range(5)})
    enc = OneHotEncoder("cat").fit(rd.from_pandas(df))
    assert enc.categories == ["a", "b", "c"]
    out = enc.transform(rd.from_pandas(df)).to_pandas()
    assert out["cat_a"].tolist() == [1, 0, 1, 0, 0]
    assert out["cat_b"].tolist() == [0, 1, 0, 0, 0]
    assert out["cat_c"].tolist() == [0, 0, 0, 0, 1]
    # unknown category at transform time -> all zeros
    new = pd.DataFrame({"cat": ["zzz"], "x": [9]})
    t = enc.transform(rd.from_pandas(new)).to_pandas()
    assert t[["cat_a", "cat_b", "cat_c"]].to_numpy().sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_standard_scaler_matches_numpy():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"a": rng.normal(5, 2, 1000), "b": rng.random(1000)})
    sc = StandardScaler(["a", "b"]).fit(rd.from_pandas(df))
    out = sc.transform(rd.from_pandas(df)).to_pandas()
    for c in ("a", "b"):
        want = (df[c] - df[c].mean()) / df[c].std(ddof=0)
        np.testing.assert_allclose(out[c], want, rtol=1e-9, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_minmax_scaler():
    df = pd.DataFrame({"a": [0.0, 5.0, 10.0]})
    sc = MinMaxScaler(["a"]).fit(rd.from_pandas(df))
    out = sc.transform(rd.from_pandas(df)).to_pandas()
    assert out["a"].tolist() == [0.0, 0.5, 1.0]
