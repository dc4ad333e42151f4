"""The ray-job entry point (jobs/run_full_check.py): fresh run, schema
persistence, and manifest-based resume — in-process against the test
session (the script's guarded ray.init is a no-op when attached)."""

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs"))


@pytest.mark.usefixtures("ray_session")
def test_run_full_check_job_and_resume(tmp_path, capsys):
    from run_full_check import main

    from webval.synth import gen_links_table, gen_webpages_table

    inp = tmp_path / "pages"
    inp.mkdir()
    # two fragments -> two units at unit_size=1
    pq.write_table(gen_webpages_table(np.arange(0, 300)),
                   inp / "part-0.parquet")
    pq.write_table(gen_webpages_table(np.arange(300, 600)),
                   inp / "part-1.parquet")
    links = tmp_path / "links.parquet"
    pq.write_table(gen_links_table(np.arange(100), 600), links)
    out = tmp_path / "out"

    rc = main(["--input", str(inp), "--out", str(out),
               "--links", str(links), "--extract", "--unit-size", "1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 600
    assert summary["units"] == 2 and summary["units_skipped"] == 0
    assert os.path.exists(out / "schema.json")
    assert "orphans" in summary and "dup_keys" in summary

    # resume: same out dir -> both units skipped, same totals, and the
    # schema is LOADED (not rebuilt) - mtime unchanged
    mtime = os.path.getmtime(out / "schema.json")
    rc = main(["--input", str(inp), "--out", str(out),
               "--links", str(links), "--extract", "--unit-size", "1"])
    assert rc == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["units_skipped"] == 2
    assert summary2["rows"] == summary["rows"]
    assert os.path.getmtime(out / "schema.json") == mtime


@pytest.mark.usefixtures("ray_session")
def test_run_curation_job(tmp_path, capsys):
    from run_curation import main

    import pyarrow as pa

    inp = tmp_path / "docs"
    inp.mkdir()
    texts = (["alpha beta gamma delta epsilon zeta eta theta"] * 3
             + [f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h w{i}j"
                for i in range(40)])                    # dup group → 1 kept
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}), inp / "part-0.parquet")
    out = tmp_path / "curated"

    rc = main(["--input", str(inp), "--out", str(out),
               "--dedup", "exact", "--min-docs", "50",
               "--window", "8", "--overlap", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_in"] == 43
    assert summary["chunks"] > 0
    got = pq.read_table(out)
    assert set(got.column_names) >= {"doc_id", "chunk_id", "chunk_text",
                                     "n_tokens"}
    # exact dedup kept ONE of the three identical docs (the min id)
    ids = set(got.column("doc_id").to_pylist())
    assert 0 in ids and 1 not in ids and 2 not in ids


@pytest.mark.usefixtures("ray_session")
def test_run_contrast_job_detects_planted_drift(tmp_path, capsys):
    from run_contrast import main

    import ray.data as rd

    from webval.api import Schema
    from webval.synth import gen_webpages_table

    clean = tmp_path / "clean"
    drifted = tmp_path / "drifted"
    for d, kw in ((clean, {}), (drifted, {"drift_part": 2})):
        d.mkdir()
        pq.write_table(gen_webpages_table(np.arange(600), rows_per_part=100,
                                          **kw), d / "part-0.parquet")

    kinds = {"url": "text", "text": "text", "lang": "categorical",
             "warc_ts": "timestamp"}
    base_path = tmp_path / "baseline.json"
    Schema(name="baseline").build(
        rd.read_parquet(str(clean), columns=list(kinds)), kinds) \
        .save(str(base_path))

    out_ok = tmp_path / "rep_ok.json"
    rc = main(["--input", str(clean), "--baseline", str(base_path),
               "--out", str(out_ok)])
    assert rc == 0
    rep = json.load(open(out_ok))
    assert rep["drifted"] is False

    out_bad = tmp_path / "rep_bad.json"
    html_out = tmp_path / "rep_bad.html"
    rc = main(["--input", str(drifted), "--baseline", str(base_path),
               "--out", str(out_bad), "--per-partition",
               "--drift-cols", "text,lang", "--html", str(html_out)])
    assert rc == 2
    rep = json.load(open(out_bad))
    assert rep["drifted"] is True and rep["columns"]["text"]["drifted"]
    # the per-partition report flags THE PLANTED partition (id 2), not
    # merely some partition — wrong-shard attribution must fail here
    parts = {p["part_id"]: p for p in rep["partitions"]}
    assert parts[2]["drifted"] is True
    assert not parts[0].get("drifted") and not parts[1].get("drifted")
    # the static-HTML viewer artifact (rdv report-viewer analog): one
    # self-contained document with the drift badge, every column row and
    # the per-partition table
    doc = html_out.read_text()
    assert doc.startswith("<!doctype html>") and "</html>" in doc
    assert "DRIFTED" in doc and "Per-partition drift" in doc
    for col in rep["columns"]:
        assert f"<td>{col}</td>" in doc


@pytest.mark.usefixtures("ray_session")
def test_jobs_compose_full_check_schema_feeds_contrast(tmp_path, capsys):
    """The operational loop across job surfaces: run_full_check persists
    schema.json; run_contrast consumes it unchanged as the baseline."""
    from run_contrast import main as contrast_main
    from run_full_check import main as check_main

    from webval.synth import gen_webpages_table

    inp = tmp_path / "pages"
    inp.mkdir()
    pq.write_table(gen_webpages_table(np.arange(600), rows_per_part=100),
                   inp / "part-0.parquet")
    out = tmp_path / "check_out"
    # sample-fraction 1.0: at 600 fixture rows a 10% sampled baseline has
    # enough sampling noise to legitimately trip the drift thresholds
    assert check_main(["--input", str(inp), "--out", str(out),
                       "--sample-fraction", "1.0"]) == 0

    rep = tmp_path / "drift.json"
    rc = contrast_main(["--input", str(inp),
                        "--baseline", str(out / "schema.json"),
                        "--out", str(rep)])
    capsys.readouterr()
    # same data vs its own sampled-build schema: nothing drifts
    assert rc == 0
    assert json.load(open(rep))["drifted"] is False


@pytest.mark.usefixtures("ray_session")
def test_run_dedup_job_init_and_increment(tmp_path, capsys):
    import pyarrow as pa

    from run_dedup import main

    corpus = tmp_path / "corpus.parquet"
    pq.write_table(pa.table({
        "doc_id": list(range(6)),
        "text": ["alpha beta", "gamma", "alpha beta",  # planted dup
                 "delta", "epsilon", "gamma"],
    }), corpus)
    index = tmp_path / "fpindex"

    rc = main(["init", "--input", str(corpus), "--index", str(index)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["fingerprints"] == 4  # distinct texts only

    # increment: 2 rows repeat corpus content, 2 are new (one duplicated
    # WITHIN the increment -> min-id row survives once)
    inc = tmp_path / "inc.parquet"
    pq.write_table(pa.table({
        "doc_id": [10, 11, 12, 13],
        "text": ["alpha beta", "zeta", "zeta", "gamma"],
    }), inc)
    out = tmp_path / "new_rows"
    rc = main(["increment", "--input", str(inc), "--index", str(index),
               "--out", str(out)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_in"] == 4 and summary["rows_new"] == 1
    got = pq.read_table(out).to_pydict()
    assert got["doc_id"] == [11] and got["text"] == ["zeta"]

    # dirty --out fails fast; re-running against the APPENDED index drops
    # zeta too (its fingerprint was committed)
    with pytest.raises(SystemExit, match="non-empty"):
        main(["increment", "--input", str(inc), "--index", str(index),
              "--out", str(out)])
    out2 = tmp_path / "new_rows2"
    rc = main(["increment", "--input", str(inc), "--index", str(index),
               "--out", str(out2)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_new"] == 0

    # init refuses to clobber an existing index
    with pytest.raises(SystemExit, match="non-empty"):
        main(["init", "--input", str(corpus), "--index", str(index)])


@pytest.mark.usefixtures("ray_session")
def test_run_training_prep_job(tmp_path, capsys):
    import pyarrow as pa

    from run_training_prep import main

    inp = tmp_path / "docs"
    inp.mkdir()
    texts, ids = [], []
    for i in range(120):
        ids.append(i)
        if i % 10 == 7:
            texts.append("buy cheap pills now " * 5)       # blocklisted
        elif i % 10 in (8, 9):
            texts.append("identical near dup body text here " * 6)
        else:
            texts.append(f"unique document body {i} with words " * 4)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts)}),
                   inp / "d.parquet")
    out = tmp_path / "prep"

    rc = main(["--input", str(inp), "--out", str(out),
               "--context-len", "64", "--block", "cheap pills",
               "--jaccard", "0.9"])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows_in"] == 120
    assert s["rows_clean"] == 108                 # 12 blocklisted dropped
    # 24 exact near-dups collapse to 1 kept doc
    assert s["rows_kept"] == 108 - 24 + 1
    assert sum(s["splits"].values()) == s["rows_kept"]
    assert s["splits"]["train"] > s["splits"]["val"] >= 0

    # the pack plan is loadable, offsets partition each split's stream
    import ray.data as rd
    plan = rd.read_parquet(str(out / "split=train")).to_pandas() \
        .sort_values("offset")
    assert (plan["offset"] + plan["n_tokens"]).iloc[:-1].tolist() \
        == plan["offset"].iloc[1:].tolist()
    assert (plan["bin"] == plan["offset"] // 64).all()

    # dirty --out fails fast
    with pytest.raises(SystemExit, match="non-empty"):
        main(["--input", str(inp), "--out", str(out)])


@pytest.mark.usefixtures("ray_session")
def test_run_training_prep_dsir_selection(tmp_path, capsys):
    import numpy as np
    import pyarrow as pa

    from run_training_prep import main

    inp = tmp_path / "docs_dsir"
    inp.mkdir()
    rng = np.random.default_rng(5)
    en_vocab = ["clean", "clear", "useful", "prose", "body"]
    xx_vocab = ["zz1", "zz2", "zz3", "zz4", "zz5"]
    ids, texts, langs = [], [], []
    for i in range(200):
        lang = "en" if i % 2 == 0 else "xx"
        vocab = en_vocab if lang == "en" else xx_vocab
        ids.append(i)
        langs.append(lang)
        texts.append(" ".join(rng.choice(vocab, size=8)))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts),
                             "lang": pa.array(langs)}),
                   inp / "d.parquet")
    out = tmp_path / "prep_dsir"

    rc = main(["--input", str(inp), "--out", str(out),
               "--context-len", "64", "--jaccard", "0.99",
               "--dsir-target-lang", "en", "--dsir-keep", "40"])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows_selected"] == 40
    assert sum(s["splits"].values()) == 40
    # the selection is biased hard toward the target slice: en docs use a
    # disjoint vocabulary, so nearly every winner is an en doc (even ids)
    import ray.data as rd
    won = []
    for name in ("train", "val", "test"):
        d = out / f"split={name}"
        if d.is_dir():
            won += rd.read_parquet(str(d)).to_pandas()["doc_id"].tolist()
    n_en = sum(1 for i in won if i % 2 == 0)
    assert n_en >= 36, n_en

    # flag pairing is enforced
    with pytest.raises(SystemExit):
        main(["--input", str(inp), "--out", str(tmp_path / "x"),
              "--dsir-target-lang", "en"])
