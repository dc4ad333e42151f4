"""rdv-style API facade + distributed connected components."""

import numpy as np
import pyarrow as pa
import pytest

from webval.api import Schema
from webval.synth import expected_counts, gen_webpages_table


@pytest.mark.usefixtures("ray_session")
def test_schema_lifecycle_facade(tmp_path):
    import ray.data as rd

    t = gen_webpages_table(np.arange(3000))
    ds = rd.from_arrow(t)
    kinds = {"page_id": "skip", "url": "text", "warc_ts": "timestamp",
             "html": "skip", "text": "text", "lang": "categorical",
             "part_id": "skip"}
    schema = Schema(name="pages").build(ds, kinds)
    assert schema.built

    # save / load roundtrip, then check with an added explicit check
    p = str(tmp_path / "schema.json")
    schema.save(p)
    loaded = Schema.load(p)
    loaded.add_check("url-regex", "url", "regex",
                     {"pattern": r"^https?://[^ ]+$"})
    res = loaded.check(ds, keep_cols=["url"])
    viol = res["violations"].take_all()
    n_regex = sum(1 for v in viol if "url-regex" in v["failed_checks"])
    assert n_regex == expected_counts(3000)["bad_url"]

    dups = loaded.check_uniqueness(ds, "url").take_all()
    assert len(dups) == expected_counts(3000)["dup_extra_rows"]

    rep = loaded.contrast(schema)
    assert rep["drifted"] is False

    loaded.remove_check("url-regex")
    assert all(c.name != "url-regex" for c in loaded.spec.checks)

    with pytest.raises(RuntimeError):
        Schema(name="unbuilt").check(ds)


@pytest.mark.usefixtures("ray_session")
def test_pre_stage_roundtrip_reconstructs_pipeline(tmp_path):
    """VERDICT r2 missing-2 / next-5: a schema built WITH pre-stages
    (extraction + lang tagging) must, after save→load, replay those stages
    from the JSON alone and reproduce identical verdicts on raw html."""
    import ray.data as rd

    t = gen_webpages_table(np.arange(1500))
    raw = rd.from_arrow(t.select(["page_id", "url", "html"]))
    stages = [
        {"kind": "extract_text",
         "params": {"html_col": "html", "out_col": "text2",
                    "concurrency": [1, 2], "num_cpus": 0.5}},
        {"kind": "lang_tag",
         "params": {"text_col": "text2", "out_col": "lang2",
                    "concurrency": [1, 2], "num_cpus": 0.5}},
    ]
    kinds = {"page_id": "skip", "url": "text", "html": "skip",
             "text2": "text", "lang2": "categorical"}
    schema = Schema(name="pages").build(raw, kinds, pre_stages=stages)
    schema.add_check("lang2-domain", "lang2", "domain",
                     {"values": ["en", "de", "fr", "unk"]})
    p = str(tmp_path / "schema.json")
    schema.save(p)

    loaded = Schema.load(p)
    assert loaded.spec.pre_stages == stages  # config round-trips verbatim
    res = loaded.check(raw, keep_cols=["page_id", "lang2"])
    got = sorted((r["page_id"], r["pass"], tuple(r["failed_checks"]))
                 for r in res["verdicts"].take_all())
    want = sorted((r["page_id"], r["pass"], tuple(r["failed_checks"]))
                  for r in schema.check(raw, keep_cols=["page_id", "lang2"])
                  ["verdicts"].take_all())
    assert got == want and len(got) == 1500
    # the loaded pipeline really ran extraction: some rows fail the domain
    # check only if lang2 exists; sanity-check the column materialized
    assert any(r[2] for r in got) or all(r[1] for r in got)

    # unknown kind in a (hand-edited) schema file fails loudly
    loaded.spec.pre_stages = [{"kind": "nope", "params": {}}]
    with pytest.raises(KeyError, match="nope"):
        loaded.check(raw)


@pytest.mark.usefixtures("ray_session")
def test_normalize_pre_stage_roundtrip(tmp_path):
    """The B8 normalize pre-stage (string type names incl. parametric
    timestamps) must survive the JSON round-trip and null-on-error cast
    when replayed from a loaded schema."""
    import ray.data as rd

    t = pa.table({"sid": pa.array(["1", "2", "oops", None]),
                  "ts": pa.array(["2026-01-01 00:00:00", "bad",
                                  "2026-01-02 10:30:00", None])})
    stages = [{"kind": "normalize",
               "params": {"casts": {"sid": "int64", "ts": "timestamp[us]"},
                          "ts_format": "%Y-%m-%d %H:%M:%S"}}]
    kinds = {"sid": "numeric", "ts": "timestamp", "__cast_errors__": "skip"}
    schema = Schema(name="n").build(rd.from_arrow(t), kinds,
                                    pre_stages=stages)
    p = str(tmp_path / "schema.json")
    schema.save(p)
    loaded = Schema.load(p)
    res = loaded.check(rd.from_arrow(t))
    rows = sorted(res["verdicts"].take_all(),
                  key=lambda r: (r["sid"] is None, r["sid"]))
    sids = [r["sid"] for r in rows]
    assert sids == [1, 2, None, None]  # "oops" cast to null
    errs = sorted(r["__cast_errors__"] for r in rows)
    assert errs == [0, 0, 1, 1]  # "oops" row and "bad"-ts row each count 1


@pytest.mark.usefixtures("ray_session")
def test_connected_components_distributed():
    import ray.data as rd

    from webval.dedup import connected_components_distributed

    # two chains and one clique: {1-2-3-4}, {10-11}, {20,21,22 all-pairs}
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22), (21, 22)]
    t = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                  "id_b": pa.array([b for _, b in edges], pa.int64())})
    out = connected_components_distributed(rd.from_arrow(t).repartition(3))
    got = {r["id"]: r["cluster_id"] for r in out.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


@pytest.mark.usefixtures("ray_session")
def test_register_pre_stage_plugin_roundtrip(tmp_path):
    """§2-J plugin surface: a user-registered pre-stage kind participates
    in the build → save → load → check round-trip like the built-ins."""
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.stages import PRE_STAGE_KINDS, register_pre_stage

    def _add_len(ds, params):
        col = params["col"]

        def fn(t):
            return t.append_column(f"{col}_len",
                                   pc.utf8_length(t.column(col)))

        return ds.map_batches(fn, batch_format="pyarrow")

    register_pre_stage("add_len", _add_len)
    try:
        t = pa.table({"s": pa.array(["a", "bbb", None, "cc"])})
        stages = [{"kind": "add_len", "params": {"col": "s"}}]
        schema = Schema(name="p").build(rd.from_arrow(t),
                                        {"s": "text", "s_len": "numeric"},
                                        pre_stages=stages)
        p = str(tmp_path / "schema.json")
        schema.save(p)
        loaded = Schema.load(p)
        assert loaded.spec.pre_stages == stages
        res = loaded.check(rd.from_arrow(t))
        got = {r["s"]: r["s_len"] for r in res["verdicts"].take_all()}
        assert got == {"a": 1, "bbb": 3, None: None, "cc": 2}
    finally:
        PRE_STAGE_KINDS.pop("add_len", None)


def test_diff_specs_schema_evolution(ray_session):
    import ray.data as rd

    from webval.pipelines import build_schema
    from webval.schema import diff_specs

    a = build_schema(rd.from_arrow(pa.table({
        "x": [1.0, 2.0, 3.0, None],
        "cat": ["a", "b", "a", "b"],
        "gone": [1, 2, 3, 4]})),
        {"x": "numeric", "cat": "categorical", "gone": "numeric"})
    b = build_schema(rd.from_arrow(pa.table({
        "x": [None, None, 3.0, None],            # null-rate shift
        "cat": [str(i) for i in range(4)],        # distinct ratio 2x
        "fresh": ["u", "v", "w", "z"]})),
        {"x": "numeric", "cat": "categorical", "fresh": "text"})
    d = diff_specs(a, b)
    assert d["added"] == ["fresh"] and d["removed"] == ["gone"]
    assert {s["column"] for s in d["null_rate_shifts"]} == {"x"}
    assert not d["compatible"]
    same = diff_specs(a, a)
    assert same["compatible"] and not same["added"]
