"""AggregateFnV2 sketch wrappers inside ds.groupby().aggregate() (E4/E5/E8)."""

import numpy as np
import pyarrow as pa
import pytest

from webval.aggregates import ApproxDistinct, TDigestQuantile


@pytest.mark.usefixtures("ray_session")
def test_grouped_sketch_aggregates_accuracy():
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 30_000
    keys = rng.choice(["a", "b", "c"], p=[0.6, 0.3, 0.1], size=n)
    vals = np.where(keys == "a", rng.normal(100, 10, n),
                    np.where(keys == "b", rng.normal(500, 50, n),
                             rng.normal(1000, 5, n)))
    ids = rng.integers(0, 5000, size=n)
    t = pa.table({"k": keys, "v": vals, "id": ids})
    ds = rd.from_arrow(t).repartition(6)
    out = ds.groupby("k").aggregate(
        TDigestQuantile("v", q=0.5, alias_name="p50"),
        ApproxDistinct("id", alias_name="nd")).to_pandas().set_index("k")

    import pandas as pd
    df = t.to_pandas()
    for k, grp in df.groupby("k"):
        true_med = grp["v"].median()
        true_nd = grp["id"].nunique()
        assert abs(out.loc[k, "p50"] - true_med) / abs(true_med) < 0.02, k
        assert abs(out.loc[k, "nd"] - true_nd) / true_nd < 0.03, k


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_timestamp_nulls():
    """Review r3: NaT (timestamp nulls) must not count as a distinct
    value — COUNT(DISTINCT) semantics across dtypes."""
    import pyarrow as pa
    import ray.data as rd

    from webval.aggregates import ApproxDistinct

    t = pa.table({"g": ["a"] * 6,
                  "ts": pa.array([1_000_000, 2_000_000, None, None,
                                  1_000_000, 2_000_000],
                                 pa.timestamp("us"))})
    out = rd.from_arrow(t).groupby("g").aggregate(
        ApproxDistinct("ts", alias_name="d")).take_all()
    assert round(out[0]["d"]) == 2
