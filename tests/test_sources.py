"""WARC source/sink: byte-exact round-trip through real files, gzip
members, malformed-record resynchronization, parallel multi-shard reads."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from webval.sources import parse_warc_bytes, write_warc, write_warc_file
from webval.synth import gen_webpages_table


def _expected_rows(t: pa.Table):
    """(url, ts_us, html) for the non-null-html rows, url-sorted."""
    t = t.filter(pc.is_valid(t.column("html")))
    ts = pc.cast(t.column("warc_ts"), pa.int64()).to_pylist()
    return sorted(zip(t.column("url").to_pylist(), ts,
                      t.column("html").to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_warc_roundtrip_multishard(tmp_path):
    from webval.sources import read_warc

    t = gen_webpages_table(np.arange(3000))
    paths = write_warc(t, str(tmp_path / "warc"), shard_rows=700,
                       compress=True)
    assert len(paths) == 5 and all(p.endswith(".warc.gz") for p in paths)
    # cast back to int64 µs INSIDE the pipeline — exact, no driver
    # datetime conversions
    ds = read_warc(paths).map_batches(
        lambda b: b.set_column(b.column_names.index("warc_ts"), "warc_ts",
                               pc.cast(b.column("warc_ts"), pa.int64())),
        batch_format="pyarrow")
    got = sorted((r["url"], r["warc_ts"], r["html"]) for r in ds.take_all())
    want = _expected_rows(t)
    assert got == want  # urls, µs-exact timestamps, byte-exact html


def test_warc_plain_and_gzip_parse_identically(tmp_path):
    t = gen_webpages_table(np.arange(200))
    rows = _expected_rows(t)
    p1 = str(tmp_path / "a.warc")
    p2 = str(tmp_path / "a.warc.gz")
    write_warc_file(p1, rows)
    write_warc_file(p2, rows)
    raw = open(p1, "rb").read()
    import gzip
    gz = gzip.decompress(open(p2, "rb").read())
    assert raw == gz  # compression is transparent
    parsed = sorted(parse_warc_bytes(raw))
    assert parsed == rows


def test_warc_malformed_resync_and_strict(tmp_path):
    t = gen_webpages_table(np.arange(60))
    rows = _expected_rows(t)
    third = len(rows) // 3
    good_head = b"".join(
        open(p, "rb").read() for p in [str(tmp_path / "h.warc")]
        if write_warc_file(p, rows[:third]) or True)
    mangled = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: notanumber\r\n\r\ngarbage")
    tail = str(tmp_path / "t.warc")
    write_warc_file(tail, rows[third:])
    blob = good_head + mangled + open(tail, "rb").read()
    got = sorted(parse_warc_bytes(blob, strict=False))
    assert got == rows  # resynchronized past the mangled record
    with pytest.raises(ValueError, match="malformed WARC header"):
        list(parse_warc_bytes(blob, strict=True))
    # truncated tail: non-strict yields the complete prefix records
    cut = blob[: len(blob) - 40]
    got_cut = sorted(parse_warc_bytes(cut, strict=False))
    assert rows[0] in got_cut and len(got_cut) == len(rows) - 1


def test_warc_skips_non_response_records():
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Record-ID: <urn:uuid:x>\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"WARC-Target-URI: http://a.com/\r\n"
           b"Content-Type: application/http; msgtype=request\r\n"
           b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
    rows = [("http://b.com/", 1_700_000_000_123_456, b"<p>x</p>")]
    buf = req + b"".join(
        __import__("webval.sources", fromlist=["x"])._format_record(*r)
        for r in rows)
    assert sorted(parse_warc_bytes(buf)) == rows


@pytest.mark.usefixtures("ray_session")
def test_warc_streaming_chunked_and_multimember(tmp_path):
    """Chunked decode: records split across tiny read chunks and across
    CONCATENATED gzip members must all surface exactly once."""
    import gzip

    from webval.sources import WarcDatasource, read_warc

    t = gen_webpages_table(np.arange(400))
    rows = _expected_rows(t)
    half = len(rows) // 2
    # two independent gzip members concatenated in one file (the real
    # .warc.gz layout)
    import io

    from webval.sources import _format_record
    m1 = gzip.compress(b"".join(_format_record(*r) for r in rows[:half]),
                       mtime=0)
    m2 = gzip.compress(b"".join(_format_record(*r) for r in rows[half:]),
                       mtime=0)
    p = str(tmp_path / "multi.warc.gz")
    with open(p, "wb") as f:
        f.write(m1 + m2)
    # drive _read_stream IN-PROCESS so the tiny chunk size really applies
    # (a Ray worker would re-resolve the class attribute from the module)
    old = WarcDatasource._CHUNK
    try:
        WarcDatasource._CHUNK = 4096  # force many chunks + partial records
        src = WarcDatasource([p], batch_rows=100)
        with open(p, "rb") as f:
            blocks = list(src._read_stream(f, p))
        got = []
        for b in blocks:
            ts = pc.cast(b.column("warc_ts"), pa.int64()).to_pylist()
            got.extend(zip(b.column("url").to_pylist(), ts,
                           b.column("html").to_pylist()))
        assert len(blocks) > 1  # chunking produced multiple batches/blocks
    finally:
        WarcDatasource._CHUNK = old
    assert sorted(got) == sorted(rows)
    # and the full Ray path still reads the multi-member file correctly
    ds = read_warc([p]).map_batches(
        lambda b: b.set_column(
            b.column_names.index("warc_ts"), "warc_ts",
            pc.cast(b.column("warc_ts"), pa.int64())),
        batch_format="pyarrow")
    got_ray = sorted((r["url"], r["warc_ts"], r["html"])
                     for r in ds.take_all())
    assert got_ray == sorted(rows)


def test_warc_resync_after_corrupt_length(tmp_path):
    """Review r3: a record with an overshooting Content-Length must not
    swallow the rest of the file — later intact records are recovered."""
    from webval.sources import _format_record

    t = gen_webpages_table(np.arange(40))
    rows = _expected_rows(t)
    half = len(rows) // 2
    corrupt = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:c>\r\n"
               b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
               b"WARC-Target-URI: http://c.com/\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: 99999999\r\n\r\nshort body")
    blob = (b"".join(_format_record(*r) for r in rows[:half])
            + corrupt
            + b"".join(_format_record(*r) for r in rows[half:]))
    got = sorted(parse_warc_bytes(blob, strict=False))
    assert got == rows  # every intact record recovered, corrupt one dropped
    # absurd Content-Length (over the 1 GiB cap) is malformed immediately
    giant = corrupt.replace(b"99999999", b"99999999999")
    blob2 = giant + b"".join(_format_record(*r) for r in rows[:3])
    assert sorted(parse_warc_bytes(blob2, strict=False)) == rows[:3]


def test_jsonl_and_csv_roundtrip_vs_parquet(ray_session, tmp_path):
    """Ray-native write_json/write_csv → read_json/read_csv round-trips a
    typed slice (int64, nullable string) losslessly vs the in-memory
    ground truth, including null handling."""
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array(np.arange(200), pa.int64()),
        "lang": pa.array([None if i % 7 == 0 else ["en", "de", "fr"][i % 3]
                          for i in range(200)]),
        "n_chars": pa.array([None if i % 11 == 0 else i * 3
                             for i in range(200)], pa.int64()),
    })
    for fmt in ("jsonl", "csv"):
        out = str(tmp_path / fmt)
        ds = rd.from_arrow(t).repartition(4)
        (ds.write_json(out) if fmt == "jsonl" else ds.write_csv(out))
        if fmt == "jsonl":
            back = rd.read_json(out)
        else:
            # unquoted empty → null; quoted "" stays a real empty string
            # (mirrors webval.queries.q_csv_read)
            from pyarrow import csv as pacsv
            back = rd.read_csv(out, convert_options=pacsv.ConvertOptions(
                strings_can_be_null=True, quoted_strings_can_be_null=False))
        got = (pa.concat_tables(
            back.iter_batches(batch_format="pyarrow", batch_size=None))
            .select(["doc_id", "lang", "n_chars"]).sort_by("doc_id"))
        assert got.num_rows == t.num_rows
        assert got.column("doc_id").to_pylist() == t.column("doc_id").to_pylist()
        assert got.column("lang").to_pylist() == t.column("lang").to_pylist()
        assert got.column("n_chars").cast(pa.int64()).to_pylist() \
            == t.column("n_chars").to_pylist()


def test_orc_roundtrip_multistripe(ray_session, tmp_path):
    """Sink → source equality incl. nulls/timestamps; a multi-stripe file
    must stream one table per stripe (task memory O(stripe) claim)."""
    import pyarrow.orc as paorc
    import ray
    import ray.data as rd

    from webval.sources import read_orc, write_orc

    n = 5000
    rng = np.random.default_rng(11)
    vals = rng.random(n)
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(np.where(rng.random(n) < 0.05, None, vals)),
        "s": pa.array([f"row{i}" if i % 7 else None for i in range(n)]),
        "ts": pa.array(np.arange(n) * 1_000_003, pa.timestamp("us")),
    })
    out = str(tmp_path / "orc_rt")
    write_orc(rd.from_arrow(t).repartition(4), out)
    back = pa.concat_tables(
        [ray.get(r) for r in read_orc(out).to_arrow_refs()])
    assert back.cast(t.schema).sort_by([("k", "ascending")]).equals(t)

    # stripe streaming: force many small stripes in one file, read it back
    one = str(tmp_path / "multi.orc")
    paorc.write_table(t, one, stripe_size=64 * 1024)
    f = paorc.ORCFile(one)
    assert f.nstripes > 1
    got = pa.concat_tables(
        [ray.get(r) for r in read_orc(one).to_arrow_refs()])
    assert got.cast(t.schema).sort_by([("k", "ascending")]).equals(t)
    # column pruning reaches the stripe read
    pruned = read_orc(one, columns=["s"])
    assert pruned.schema().names == ["s"]


def test_orc_empty_file_keeps_schema(ray_session, tmp_path):
    import pyarrow.orc as paorc

    from webval.sources import read_orc

    one = str(tmp_path / "empty.orc")
    paorc.write_table(pa.table({"a": pa.array([], pa.int64()),
                                "b": pa.array([], pa.string())}), one)
    ds = read_orc(one)
    assert ds.count() == 0
    assert ds.schema().names == ["a", "b"]


def test_ipc_roundtrip_multibatch(ray_session, tmp_path):
    """Sink → source equality incl. nulls/timestamps; a multi-batch IPC
    file must stream one table per record batch (task memory O(batch))."""
    import ray
    import ray.data as rd

    from webval.sources import read_ipc, write_ipc

    n = 5000
    rng = np.random.default_rng(12)
    vals = rng.random(n)
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(np.where(rng.random(n) < 0.05, None, vals)),
        "s": pa.array([f"row{i}" if i % 7 else None for i in range(n)]),
        "ts": pa.array(np.arange(n) * 1_000_003, pa.timestamp("us")),
    })
    out = str(tmp_path / "ipc_rt")
    write_ipc(rd.from_arrow(t).repartition(4), out)
    back = pa.concat_tables(
        [ray.get(r) for r in read_ipc(out).to_arrow_refs()])
    assert back.cast(t.schema).sort_by([("k", "ascending")]).equals(t)

    # batch streaming: many small record batches in ONE file
    one = str(tmp_path / "multi.arrow")
    with pa.ipc.new_file(one, t.schema) as w:
        for b in t.to_batches(max_chunksize=512):
            w.write_batch(b)
    assert pa.ipc.open_file(one).num_record_batches > 1
    got = pa.concat_tables(
        [ray.get(r) for r in read_ipc(one).to_arrow_refs()])
    assert got.cast(t.schema).sort_by([("k", "ascending")]).equals(t)
    # column pruning reaches the batch read
    pruned = read_ipc(one, columns=["s"])
    assert pruned.schema().names == ["s"]


def test_ipc_empty_file_keeps_schema(ray_session, tmp_path):
    from webval.sources import read_ipc

    one = str(tmp_path / "empty.arrow")
    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    with pa.ipc.new_file(one, schema):
        pass
    ds = read_ipc(one)
    assert ds.count() == 0
    assert ds.schema().names == ["a", "b"]


@pytest.mark.usefixtures("ray_session")
def test_parquet_layout_report(tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    from webval.sources import parquet_layout_report

    t = pa.table({"a": pa.array(np.arange(1000), pa.int64()),
                  "b": pa.array([f"s{i}" for i in range(1000)])})
    p1 = tmp_path / "multi.parquet"
    pq.write_table(t, p1, row_group_size=300)      # 4 row groups
    p2 = tmp_path / "single.parquet"
    pq.write_table(t.select(["a"]), p2)

    out = parquet_layout_report([str(p2), str(p1)]).to_pandas()
    assert list(out["file"])[:4] == ["multi.parquet"] * 4   # sorted
    multi = out[out["file"] == "multi.parquet"]
    assert list(multi["n_rows"]) == [300, 300, 300, 100]
    assert (multi["n_cols"] == 2).all()
    assert (multi["compressed_bytes"] > 0).all()
    single = out[out["file"] == "single.parquet"]
    assert len(single) == 1 and single.iloc[0]["n_rows"] == 1000
    assert single.iloc[0]["n_cols"] == 1

    # footer numbers match pyarrow's own metadata
    md = pq.ParquetFile(p1).metadata
    assert multi["compressed_bytes"].iloc[0] == sum(
        md.row_group(0).column(i).total_compressed_size
        for i in range(md.row_group(0).num_columns))
