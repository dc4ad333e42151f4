"""P1 build: Ray engine vs the pure-pandas rdv-semantics oracle on real
testdata (SURVEY.md §5.1) — exact fields exactly, sketches within tolerance."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from webval.oracle import build_stats_oracle, check_frame_oracle
from webval.pipelines import build_schema
from webval.schema import CheckSpec, SchemaSpec
from webval.sketches import Moments

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem_spec(ray_session):
    import ray.data as rd
    ds = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice", "l_returnflag"])
    return build_schema(ds, name="lineitem", histogram="exact")


def test_build_matches_oracle_exact_fields(lineitem_spec):
    df = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    oracle = build_stats_oracle(df[["l_quantity", "l_extendedprice", "l_returnflag"]])
    for col in ("l_quantity", "l_extendedprice"):
        p = lineitem_spec.column(col)
        m = Moments.from_dict(p.moments)
        o = oracle[col]
        assert m.min == o["min"] and m.max == o["max"]
        assert m.mean == pytest.approx(o["mean"], rel=1e-12)
        assert m.std == pytest.approx(o["std"], rel=1e-9)
        assert p.null_count == o["null_count"]
        assert abs(p.distinct_est - o["distinct"]) / o["distinct"] < 0.03
    p = lineitem_spec.column("l_returnflag")
    assert p.frequencies["counts"] == oracle["l_returnflag"]["frequencies"]


def test_build_quantiles_within_rank_tolerance(lineitem_spec):
    df = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    v = np.sort(df["l_extendedprice"].to_numpy())
    p = lineitem_spec.column("l_extendedprice")
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = p.quantile(q)
        rank = np.searchsorted(v, est) / len(v)
        assert abs(rank - q) < 0.01, (q, est, rank)


def test_build_histogram_attached(lineitem_spec):
    p = lineitem_spec.column("l_quantity")
    assert p.histogram is not None
    total = sum(p.histogram["counts"]) + p.histogram["underflow"] + p.histogram["overflow"]
    assert total == p.count - p.null_count


@pytest.mark.usefixtures("ray_session")
def test_check_verdicts_match_row_oracle_exactly():
    """Verdict + failed-check parity, row for row, vs the oracle row loop."""
    import ray.data as rd
    from webval.checks import check_dataset

    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    checks = [
        CheckSpec("value-range", "value", "range", {"min": 5.0, "max": 250.0}),
        CheckSpec("type-domain", "event_type", "domain",
                  {"values": ["click", "view", "purchase"]}),
        CheckSpec("props-regex", "props", "regex", {"pattern": r"^\{.*\}$"}),
    ]
    schema = SchemaSpec(name="events", built=True, checks=checks)
    oracle = check_frame_oracle(df, checks)
    ds = rd.read_parquet(f"{SF}/events.parquet").repartition(4)
    got = {r["event_id"]: (r["pass"], sorted(r["failed_checks"]))
           for r in check_dataset(ds, schema,
                                  keep_cols=["event_id"]).take_all()}
    assert len(got) == len(df)
    mism = 0
    for eid, op, of in zip(df["event_id"], oracle["pass"], oracle["failed_checks"]):
        gp, gf = got[eid]
        if gp != op or gf != sorted(of):
            mism += 1
    assert mism == 0
    # sanity: the planted ranges actually fire on this data
    assert sum(1 for p, _ in got.values() if not p) > 0
