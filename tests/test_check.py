"""P2 check pipeline: planted-violation parity (FIXTURES.md counts are
closed-form in i, so the assertions are exact integers — SURVEY.md §5.1)."""

import numpy as np
import pyarrow as pa
import pytest

from webval.checks import check_dataset, check_mask, violations_of
from webval.pipelines import referential_orphans, uniqueness_violations
from webval.schema import CheckSpec, SchemaSpec
from webval.synth import (
    expected_counts,
    expected_orphans,
    gen_links_table,
    gen_webpages_table,
)

N = 5000

URL_RE = r"^https?://[^ ]+$"
REAL_LANGS = ["en", "de", "fr", "es", "nl", "ru", "zh"]


def webpage_schema() -> SchemaSpec:
    s = SchemaSpec(name="webpages", built=True)
    s.checks = [
        CheckSpec("url-regex", "url", "regex", {"pattern": URL_RE}),
        CheckSpec("lang-domain", "lang", "domain", {"values": REAL_LANGS}),
        CheckSpec("len-range", "n_chars", "range", {"min": 0, "max": 10_000}),
    ]
    return s


def test_check_mask_null_semantics():
    t = pa.table({"x": [1.0, None, 99.0], "s": ["ok", None, "bad!"]})
    m = check_mask(t, CheckSpec("r", "x", "range", {"min": 0, "max": 10}))
    assert m.tolist() == [True, True, False]  # null passes range
    m = check_mask(t, CheckSpec("d", "s", "domain", {"values": ["ok"]}))
    assert m.tolist() == [True, True, False]
    m = check_mask(t, CheckSpec("n", "x", "not_null", {}))
    assert m.tolist() == [True, False, True]
    m = check_mask(t, CheckSpec("g", "s", "regex", {"pattern": r"^\w+$"}))
    assert m.tolist() == [True, True, False]


@pytest.mark.usefixtures("ray_session")
def test_planted_violations_exact():
    import ray.data as rd

    t = gen_webpages_table(np.arange(N))
    t = t.append_column(
        "n_chars",
        pa.array([len(x) if x is not None else None
                  for x in t.column("text").to_pylist()], type=pa.int64()))
    ds = rd.from_arrow(t).repartition(8)
    schema = webpage_schema()
    verdicts = check_dataset(ds, schema, keep_cols=["url", "lang"])
    viol = violations_of(verdicts).take_all()
    ec = expected_counts(N)

    by_check: dict[str, int] = {}
    for v in viol:
        for name in v["failed_checks"]:
            by_check[name] = by_check.get(name, 0) + 1
    assert by_check["url-regex"] == ec["bad_url"]
    # __unk__ rows fail the domain check; null lang passes (null-rate owns it)
    n_unk = sum(1 for x in t.column("lang").to_pylist() if x == "__unk__")
    assert by_check["lang-domain"] == n_unk
    assert "len-range" not in by_check
    total_pass = sum(1 for r in verdicts.take_all() if r["pass"])
    assert total_pass == N - len(viol)


@pytest.mark.usefixtures("ray_session")
def test_uniqueness_violations_exact():
    import ray.data as rd

    t = gen_webpages_table(np.arange(N))
    ds = rd.from_arrow(t).repartition(16)
    dups = uniqueness_violations(ds, "url").take_all()
    ec = expected_counts(N)
    # each dup row reuses one earlier url → dup urls have cnt == 2
    assert len(dups) == ec["dup_extra_rows"]
    assert all(d["cnt"] == 2 for d in dups)
    extra = sum(d["cnt"] - 1 for d in dups)
    assert extra == ec["dup_extra_rows"]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_referential_orphans_both_modes(mode):
    import ray.data as rd

    n_links = 2000
    pages = rd.from_arrow(gen_webpages_table(np.arange(N))).repartition(4)
    links = rd.from_arrow(gen_links_table(np.arange(n_links), N)).repartition(4)
    orphans = referential_orphans(links, pages, "dst_url", "url",
                                  mode=mode, num_partitions=4)
    rows = orphans.take_all()
    assert len(rows) == expected_orphans(n_links)
    assert all("orphan-" in r["dst_url"] for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_verdict_columns_schema():
    import ray.data as rd

    t = gen_webpages_table(np.arange(200))
    ds = rd.from_arrow(t)
    s = SchemaSpec(name="w", built=True)
    s.checks = [CheckSpec("url-regex", "url", "regex", {"pattern": URL_RE})]
    v = check_dataset(ds, s, keep_cols=["url"])
    sch = v.schema()
    assert sch.names == ["url", "pass", "failed_checks"]


@pytest.mark.usefixtures("ray_session")
def test_referential_bloom_mode():
    """Bloom prefilter: every emitted row is a TRUE orphan; ≥97% of planted
    orphans found (1% nominal fp on matched keys)."""
    import ray.data as rd

    n_links = 2000
    pages = rd.from_arrow(gen_webpages_table(np.arange(N))).repartition(4)
    links = rd.from_arrow(gen_links_table(np.arange(n_links), N)).repartition(4)
    rows = referential_orphans(links, pages, "dst_url", "url",
                               mode="bloom").take_all()
    assert all("orphan-" in r["dst_url"] for r in rows)  # no false orphans
    assert len(rows) >= 0.97 * expected_orphans(n_links)


@pytest.mark.usefixtures("ray_session")
def test_to_tags_rdv_shape():
    import pyarrow as pa
    import ray.data as rd

    from webval.checks import check_dataset, to_tags
    from webval.schema import CheckSpec, SchemaSpec

    schema = SchemaSpec(name="w", built=True, checks=[
        CheckSpec("url-regex", "url", "regex", {"pattern": r"^https?://"})])
    t = pa.table({"url": pa.array(["https://a.com", "bad url", None])})
    v = check_dataset(rd.from_arrow(t), schema)
    rows = to_tags(v, feature_cols=["url"]).take_all()
    # pass row: one feature tag only
    assert rows[0]["tags"] == [{"name": "url", "value": "https://a.com",
                                "type": "feature", "group": "default"}]
    # failing row: feature tag + <check>-err tag in schema-errors group
    assert {"name": "url-regex-err", "value": "1", "type": "error",
            "group": "schema-errors"} in rows[1]["tags"]
    # null feature emits no feature tag; nulls pass regex (null-rate owns them)
    assert rows[2]["tags"] == []
    # default path (no feature_cols): vectorized error tags only
    err_rows = to_tags(v).take_all()
    assert err_rows[0]["tags"] == []
    assert err_rows[1]["tags"] == [{"name": "url-regex-err", "value": "1",
                                    "type": "error",
                                    "group": "schema-errors"}]
    assert err_rows[2]["tags"] == []


@pytest.mark.usefixtures("ray_session")
def test_curation_pipeline_composition():
    """Filter → dedup → tokens must compose: row count equals the number
    of distinct normalized texts among filter-passing rows, and token
    counts match a direct recount on the survivors."""
    import numpy as np
    import ray.data as rd

    from webval.pipelines import curation_pipeline
    from webval.synth import gen_webpages_table
    from webval.textstats import C4_MEAN_WL_RANGE, C4_MIN_WORDS, C4_MAX_SYMBOL_RATIO

    t = gen_webpages_table(np.arange(3000))
    ds = rd.from_arrow(t.select(["page_id", "text", "lang"])).repartition(4)
    rows = curation_pipeline(ds, "page_id").take_all()
    assert len(rows) > 0
    for r in rows:
        assert r["word_count"] >= C4_MIN_WORDS
        assert C4_MEAN_WL_RANGE[0] <= r["mean_word_len"] <= C4_MEAN_WL_RANGE[1]
        assert r["symbol_ratio"] <= C4_MAX_SYMBOL_RATIO
        # token recount on the surviving row
        assert r["ws_tokens"] == len(r["text"].split())
    # dedup: every surviving normalized text is unique, and each keeper is
    # the minimum page_id among the fixture rows sharing its text
    norm = {}
    for r in rows:
        key = " ".join(r["text"].split()).lower()
        assert key not in norm, "duplicate text survived dedup"
        norm[key] = r["page_id"]
    full = {}
    for pid, text in zip(t.column("page_id").to_pylist(),
                         t.column("text").to_pylist()):
        if text is None:
            continue
        key = " ".join(text.strip().split()).lower()
        full.setdefault(key, []).append(pid)
    for key, keeper in norm.items():
        assert keeper == min(full[key]), key[:40]


@pytest.mark.usefixtures("ray_session")
def test_to_tags_null_failed_checks_entry():
    """Review r3: a null failed_checks entry (user-supplied verdicts) must
    behave like an empty list, not poison the offsets."""
    import ray.data as rd

    from webval.checks import to_tags

    t = pa.table({"x": [1, 2, 3],
                  "pass": [True, False, True],
                  "failed_checks": pa.array([[], ["c1"], None],
                                            pa.list_(pa.string()))})
    rows = to_tags(rd.from_arrow(t)).take_all()
    assert rows[0]["tags"] == []
    assert [g["name"] for g in rows[1]["tags"]] == ["c1-err"]
    assert rows[2]["tags"] == []


def test_conditional_check_semantics():
    from webval.checks import check_mask

    t = pa.table({
        "lang": ["en", "en", "de", None, "en"],
        "n":    [10,   500,  500,  500,  None],
    })
    spec = CheckSpec("en-len", "n", "conditional", {
        "when": {"column": "lang", "kind": "domain",
                 "params": {"values": ["en"]}},
        "then": {"column": "n", "kind": "range",
                 "params": {"min": 0, "max": 100}},
    })
    m = check_mask(t, spec)
    # in-scope pass, in-scope fail, out of scope (wrong value), out of
    # scope (null when-col — SQL-natural), in-scope null value (range
    # nulls pass: the null-rate check owns them)
    assert m.tolist() == [True, False, True, True, True]


def test_register_batch_check_kind_plugin():
    from webval.checks import ROW_LEVEL_KINDS  # noqa: F401  (snapshot below)
    from webval import checks as C

    def sum_under(batch, params):
        import pyarrow.compute as pc
        s = pc.add(batch.column("a"), batch.column("b"))
        return pc.fill_null(pc.less_equal(s, params["max"]), True)

    C.register_batch_check_kind("sum_under", sum_under)
    try:
        assert "sum_under" in C.ROW_LEVEL_KINDS
        t = pa.table({"a": [1, 5], "b": [1, 50]})
        m = C.check_mask(t, CheckSpec("s", "a", "sum_under", {"max": 10}))
        assert m.tolist() == [True, False]
    finally:
        C.BATCH_CHECK_KINDS.pop("sum_under", None)
        C.ROW_LEVEL_KINDS = C.CHECK_KINDS.keys() | C.BATCH_CHECK_KINDS.keys()


def test_check_pass_rates(ray_session):
    import ray.data as rd

    from webval.pipelines import check_pass_rates

    t = pa.table({"value": [1.0, 50.0, 300.0, None],
                  "event_type": ["click", "bogus", "view", "click"]})
    spec = SchemaSpec(name="e", built=True, checks=[
        CheckSpec("value-range", "value", "range", {"min": 5.0, "max": 250.0}),
        CheckSpec("type-domain", "event_type", "domain",
                  {"values": ["click", "view", "purchase", "signup"]}),
    ])
    out = check_pass_rates(rd.from_arrow(t), spec).to_pylist()
    by = {r["check_name"]: r for r in out}
    assert by["value-range"]["n_failed"] == 2  # 1.0 and 300.0; null passes
    assert by["type-domain"]["n_failed"] == 1
    assert by["value-range"]["n_rows"] == 4
    assert by["value-range"]["fail_rate"] == 0.5


def test_weighted_sample_membership(ray_session):
    import ray.data as rd

    from webval.pipelines import weighted_sample

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    p = np.where(ids % 4 == 0, 1.0,          # always kept
                 np.where(ids % 4 == 1, 0.0,  # never kept
                          0.5))               # hash decides
    t = pa.table({"id": pa.array(ids), "p": pa.array(p)})
    got = set(weighted_sample(rd.from_arrow(t), "id", "p")
              .to_pandas()["id"])
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    want = set(ids[h.astype(np.float64) < np.floor(p * 2.0**32)])
    assert got == want
    assert set(ids[ids % 4 == 0]) <= got
    assert not (set(ids[ids % 4 == 1]) & got)
    mid = [i for i in got if i % 4 in (2, 3)]
    assert 0.4 * n / 2 < len(mid) < 0.6 * n / 2   # ~half of the 0.5 class
