"""Resume semantics (SURVEY.md §5.4): re-run skips completed units; after
deleting manifest lines only the missing units recompute; outputs identical."""

import json
import os
import shutil

import numpy as np
import pytest

from webval.manifest import list_fragments, read_manifest, run_check_with_manifest
from webval.schema import CheckSpec, SchemaSpec
from webval.synth import expected_counts, gen_webpages_table


@pytest.fixture()
def setup(tmp_path, ray_session):
    import pyarrow.parquet as pq

    in_dir = str(tmp_path / "pages")
    os.makedirs(in_dir)
    # 8 fragments of 500 rows
    for f in range(8):
        t = gen_webpages_table(np.arange(f * 500, (f + 1) * 500))
        pq.write_table(t, os.path.join(in_dir, f"frag-{f:03d}.parquet"))
    schema = SchemaSpec(name="w", built=True, checks=[
        CheckSpec("url-regex", "url", "regex", {"pattern": r"^https?://[^ ]+$"}),
    ])
    return in_dir, str(tmp_path / "out"), schema


def _total(results):
    return sum(r.rows for r in results), sum(r.violations for r in results)


def test_run_resume_and_recompute(setup):
    import ray.data as rd

    in_dir, out_dir, schema = setup
    res1 = run_check_with_manifest(in_dir, schema, out_dir, unit_size=2,
                                   keep_cols=["url"])
    assert len(res1) == 4 and not any(r.skipped for r in res1)
    rows, viols = _total(res1)
    assert rows == 4000
    assert viols == expected_counts(4000)["bad_url"]
    v1 = sorted(r["url"] for r in rd.read_parquet(f"{out_dir}/violations").take_all())

    # full re-run: everything skipped, outputs unchanged
    res2 = run_check_with_manifest(in_dir, schema, out_dir, unit_size=2,
                                   keep_cols=["url"])
    assert all(r.skipped for r in res2)
    assert _total(res2) == (rows, viols)

    # drop two units from the manifest (simulate kill mid-run): only those
    # recompute, and final outputs are identical
    mpath = os.path.join(out_dir, "manifest.jsonl")
    lines = [json.loads(line) for line in open(mpath)]
    keep = [r for r in lines if r["unit"] not in (1, 3)]
    with open(mpath, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    shutil.rmtree(os.path.join(out_dir, "verdicts", "unit=1"))
    res3 = run_check_with_manifest(in_dir, schema, out_dir, unit_size=2,
                                   keep_cols=["url"])
    assert sorted(r.unit for r in res3 if not r.skipped) == [1, 3]
    assert _total(res3) == (rows, viols)
    v3 = sorted(r["url"] for r in rd.read_parquet(f"{out_dir}/violations").take_all())
    assert v3 == v1
    assert len(read_manifest(out_dir)) == 4


def test_resume_recomputes_on_fragment_shift(setup):
    """ADVICE r1: if files appear/disappear between runs, positional unit
    ids map to different fragments — resume must recompute those units, not
    silently skip them."""
    import pyarrow.parquet as pq

    in_dir, out_dir, schema = setup
    res1 = run_check_with_manifest(in_dir, schema, out_dir, unit_size=2,
                                   keep_cols=["url"])
    assert not any(r.skipped for r in res1)
    # add one fragment at the FRONT of sort order: every unit's fragment
    # list shifts
    t = gen_webpages_table(np.arange(8 * 500, 8 * 500 + 500))
    pq.write_table(t, os.path.join(in_dir, "frag-000a.parquet"))
    res2 = run_check_with_manifest(in_dir, schema, out_dir, unit_size=2,
                                   keep_cols=["url"])
    # frag-000a sorts after frag-000 → unit 0 keeps (frag-000, frag-000a)?
    # no: sorted order is frag-000.parquet < frag-000a.parquet < frag-001 —
    # unit 0 becomes (frag-000, frag-000a) ≠ old (frag-000, frag-001), so
    # every unit recomputes except none match
    assert not any(r.skipped for r in res2)
    assert sum(r.rows for r in res2) == 4500


def test_full_check_run(setup, tmp_path):
    import pyarrow.parquet as pq

    from webval.manifest import full_check_run
    from webval.synth import expected_orphans, gen_links_table

    in_dir, _, schema = setup
    links_dir = str(tmp_path / "links")
    os.makedirs(links_dir)
    pq.write_table(gen_links_table(np.arange(1000), 4000),
                   os.path.join(links_dir, "links.parquet"))
    out = str(tmp_path / "full_out")
    s = full_check_run(in_dir, schema, out, unit_size=4, keep_cols=["url"],
                       unique_col="url", links_dir=links_dir)
    ec = expected_counts(4000)
    assert s["rows"] == 4000
    assert s["violation_rows"] == ec["bad_url"]
    assert s["dup_keys"] == ec["dup_extra_rows"]
    assert s["orphans"] == expected_orphans(1000)
    assert os.path.exists(os.path.join(out, "summary.json"))
    # resumable: second call skips all units, same summary
    s2 = full_check_run(in_dir, schema, out, unit_size=4, keep_cols=["url"],
                        unique_col="url", links_dir=links_dir)
    assert s2["units_skipped"] == s2["units"]
    assert {k: v for k, v in s2.items() if k != "units_skipped"} == \
           {k: v for k, v in s.items() if k != "units_skipped"}


def test_list_fragments(setup):
    in_dir, _, _ = setup
    frags = list_fragments(in_dir)
    assert len(frags) == 8
    assert frags == sorted(frags)


@pytest.mark.usefixtures("ray_session")
def test_partitioned_write_prunes_at_read(tmp_path):
    """Resumable-output shape: hive-partitioned parquet (one directory per
    key) lets a re-run or a downstream reader touch only the partitions it
    needs — the read-side filter must reach the scanner, not a map stage."""
    import ray.data as rd

    import numpy as np
    import pyarrow as pa

    n = 3000
    langs = np.array(["en", "de", "fr"])[np.arange(n) % 3]
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "lang": pa.array(list(langs)),
                  "x": pa.array(np.arange(n) * 2, pa.int64())})
    out = str(tmp_path / "parts")
    rd.from_arrow(t).repartition(4).write_parquet(out,
                                                  partition_cols=["lang"])
    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en", "lang=fr"]

    # partition pruning happens at FILE LISTING time via partition_filter
    # (Ray 2.49's `filter=` cannot bind hive-partition columns during
    # fragment sampling) — non-matching directories are never opened
    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
        PathPartitionParser,
    )
    part = Partitioning("hive", field_types={"lang": str})
    ds = rd.read_parquet(
        out,
        partition_filter=PathPartitionFilter(
            PathPartitionParser(part), lambda kv: kv.get("lang") == "en"),
        partitioning=part)
    got = ds.to_pandas()
    assert len(got) == n // 3
    assert set(got["doc_id"] % 3) == {0}
    assert set(got["lang"]) == {"en"}
    files = [f for f in ds.input_files()]
    assert files and all("lang=en" in f for f in files)
