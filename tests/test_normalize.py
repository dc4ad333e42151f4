"""B8 type normalizer: null-on-error casts, timestamp parsing, error counts."""

import pyarrow as pa
import pytest

from webval.normalize import normalize_types


@pytest.mark.usefixtures("ray_session")
def test_normalize_casts_and_counts_errors():
    import ray.data as rd

    t = pa.table({
        "n": ["1", "2", "oops", None, "5"],
        "ts": ["2025-01-01T00:00:00", "bad-ts", None,
               "2025-06-01T12:30:00", "2025-13-99T00:00:00"],
    })
    out = normalize_types(
        rd.from_arrow(t),
        {"n": pa.int64(), "ts": pa.timestamp("us")},
        ts_format="%Y-%m-%dT%H:%M:%S").take_all()
    ns = [r["n"] for r in out]
    assert ns == [1, 2, None, None, 5]
    ts_nulls = [r["ts"] is None for r in out]
    assert ts_nulls == [False, True, True, False, True]
    errs = [r["__cast_errors__"] for r in out]
    # row2: n + (ts null already? no, "oops" row ts is None input -> not an error)
    assert errs == [0, 1, 1, 0, 1]


@pytest.mark.usefixtures("ray_session")
def test_normalize_float_and_passthrough():
    import ray.data as rd

    t = pa.table({"x": ["1.5", "2.25", "nan?", "3"], "keep": ["a", "b", "c", "d"]})
    out = normalize_types(rd.from_arrow(t), {"x": pa.float64()},
                          count_col=None).take_all()
    assert [r["x"] for r in out] == [1.5, 2.25, None, 3.0]
    assert [r["keep"] for r in out] == ["a", "b", "c", "d"]
    assert "__cast_errors__" not in out[0]
