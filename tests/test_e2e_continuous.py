"""End-to-end continuous-crawl story: day-0 corpus → schema baseline +
persisted dedup index; day-1 increment → incremental dedup → check against
the frozen baseline → drift verdicts.  Ties together synth, dedup index,
schema build/check, diff_specs and contrast the way a recurring ingestion
job composes them."""

import re

import numpy as np
import pyarrow as pa
import pytest


def _norm(t: str) -> str:
    # mirrors textstats.add_fingerprints(normalize=True)
    return re.sub(r"\s+", " ", t.strip()).lower()


@pytest.mark.usefixtures("ray_session")
def test_continuous_crawl_day0_day1(tmp_path):
    import ray.data as rd

    from webval.dedup import build_dedup_index, incremental_dedup
    from webval.pipelines import build_schema, check_pass_rates, contrast
    from webval.schema import diff_specs
    from webval.synth import gen_webpages_table

    day0 = gen_webpages_table(np.arange(600))
    # day 1 = 600 fresh pages + 150 recrawled day-0 pages
    day1 = pa.concat_tables([gen_webpages_table(np.arange(600, 1200)),
                             gen_webpages_table(np.arange(150))])

    idx = str(tmp_path / "fpidx")
    build_dedup_index(rd.from_arrow(day0), idx, text_col="text")
    surv = incremental_dedup(rd.from_arrow(day1), "page_id", idx,
                             text_col="text", append=True).to_pandas()

    # brute-force expectation: first page per normalized text that day 0
    # never saw (the fixture plants intra-shard duplicate texts, so this
    # is NOT simply "the 600 fresh ids")
    seen0 = {_norm(t) for t in day0.column("text").to_pylist()
             if t is not None}
    expect = {}
    for pid, t in zip(day1.column("page_id").to_pylist(),
                      day1.column("text").to_pylist()):
        if t is None:
            continue
        n = _norm(t)
        if n in seen0:
            continue
        expect[n] = min(expect.get(n, pid), pid)
    assert sorted(surv["page_id"]) == sorted(expect.values())
    assert set(surv["page_id"]) <= set(range(600, 1200))  # recrawls dropped

    # schema lifecycle: freeze day-0 baseline, validate the day-1 survivors
    kinds = {"url": "text", "text": "text", "lang": "categorical"}
    base = build_schema(rd.from_arrow(day0).select_columns(
        ["url", "text", "lang"]), kinds, name="day0").infer_default_checks()
    day1_clean = rd.from_arrow(day1).filter(
        lambda r: r["page_id"] in set(surv["page_id"]))
    rates = check_pass_rates(day1_clean.select_columns(
        ["url", "text", "lang"]), base).to_pylist()
    by = {r["check_name"]: r for r in rates}
    # same generator ⇒ the baseline's inferred domain/range checks hold for
    # the overwhelming majority of fresh rows (planted violations are ~1%)
    assert by["lang-domain"]["fail_rate"] < 0.05

    # drift: text/lang are id-independent ⇒ NOT drifted across shards;
    # url LENGTH legitimately drifts (bigger ids ⇒ longer urls), so the
    # no-drift claim is made over the id-independent columns only
    kinds_tl = {"text": "text", "lang": "categorical"}
    base_tl = build_schema(rd.from_arrow(day0).select_columns(
        ["text", "lang"]), kinds_tl, name="day0")
    cur = build_schema(rd.from_arrow(day1).select_columns(
        ["text", "lang"]), kinds_tl, name="day1")
    rep = contrast(base_tl, cur)
    assert not rep["drifted"], rep

    stretched = day1.set_column(
        day1.column_names.index("text"), "text",
        pa.array([None if t is None else t + " " + t + " " + t
                  for t in day1.column("text").to_pylist()],
                 day1.schema.field("text").type))
    drifted = build_schema(rd.from_arrow(stretched).select_columns(
        ["text", "lang"]), kinds_tl, name="day1-drifted")
    rep2 = contrast(base_tl, drifted)
    assert rep2["drifted"] and rep2["columns"]["text"]["drifted"]

    # structural diff: same shape ⇒ no added/removed/kind changes
    cur_full = build_schema(rd.from_arrow(day1).select_columns(
        ["url", "text", "lang"]), kinds, name="day1-full")
    d = diff_specs(base, cur_full)
    assert not d["added"] and not d["removed"] and not d["kind_changed"]
