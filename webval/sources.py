"""WARC source/sink — Common Crawl's native container format (public WARC
1.0 spec: ISO 28500).  Ray Data has parquet/csv/json/text readers but no
WARC; a web-text engine needs one (SURVEY.md §2-A family).

``read_warc`` is a ``FileBasedDatasource`` subclass, so it inherits Ray's
parallel file planning (one read task per file/group, remote filesystems,
``include_paths``) and streams blocks into the normal Dataset pipeline —
downstream extraction/validation is identical to the parquet path.
``write_warc`` emits deterministic response records (used for fixtures and
round-trip tests; a crawler would produce the real thing).

Records carry ``WARC-Target-URI`` / ``WARC-Date`` / an
``application/http; msgtype=response`` payload; reading yields
``{url, warc_ts, html}`` rows matching the BASELINE.json input_hint shape
(the HTTP header block is stripped; ``warc_ts`` keeps microseconds).
Gzip members are handled transparently (multi-member .warc.gz is the
Common-Crawl layout; Python's gzip module decodes concatenated members).
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"
_TS_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _us_to_dt(ts_us: int) -> datetime:
    # integer µs arithmetic — float epoch seconds lose microseconds at
    # 2026-era magnitudes (2^53 cliff family)
    from datetime import timedelta

    return _EPOCH + timedelta(microseconds=int(ts_us))


def _dt_to_us(ts: datetime) -> int:
    d = ts - _EPOCH
    return (d.days * 86_400_000_000 + d.seconds * 1_000_000
            + d.microseconds)


def _format_record(url: str, ts_us: int, html: bytes) -> bytes:
    """One deterministic WARC/1.0 response record (record id derived from
    the url so a rewritten shard is byte-identical)."""
    ts = _us_to_dt(ts_us)
    rid = hashlib.sha1(url.encode()).hexdigest()
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode() + html)
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
        + f"WARC-Date: {ts.strftime(_TS_FMT)}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + _CRLF)
    return head + http + _CRLF + _CRLF


def write_warc_file(path: str, records, *, compress: bool | None = None):
    """Write (url, ts_us, html_bytes) triples as one WARC file; ``.gz``
    suffix (or compress=True) gzips the whole stream.  Null html rows are
    NOT representable in a response record — the caller filters them."""
    compress = path.endswith(".gz") if compress is None else compress
    buf = io.BytesIO()
    for url, ts_us, html in records:
        buf.write(_format_record(url, int(ts_us), html))
    data = buf.getvalue()
    if compress:
        # mtime=0 → deterministic bytes for fixture caching
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)


def write_warc(table: pa.Table, out_dir: str, *, shard_rows: int = 100_000,
               url_col: str = "url", ts_col: str = "warc_ts",
               html_col: str = "html", compress: bool = True) -> list[str]:
    """Shard an Arrow table into WARC files (fixture/export path).  Rows
    with a null url, timestamp, or html are skipped — a response record
    needs all three (URI, Date, payload).  Returns the shard paths."""
    import os

    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    t = table.filter(pc.and_(
        pc.and_(pc.is_valid(table.column(html_col)),
                pc.is_valid(table.column(url_col))),
        pc.is_valid(table.column(ts_col))))
    ts = pc.cast(t.column(ts_col), pa.int64()).to_pylist()
    urls = t.column(url_col).to_pylist()
    htmls = t.column(html_col).to_pylist()
    paths = []
    ext = ".warc.gz" if compress else ".warc"
    for s, start in enumerate(range(0, t.num_rows, shard_rows)):
        p = os.path.join(out_dir, f"shard-{s:05d}{ext}")
        write_warc_file(p, zip(urls[start:start + shard_rows],
                               ts[start:start + shard_rows],
                               htmls[start:start + shard_rows]))
        paths.append(p)
    return paths


MAX_WARC_RECORD = 1 << 30  # 1 GiB — a larger Content-Length is corruption


def _parse_complete(data: bytes, *, strict: bool = False,
                    at_eof: bool = True,
                    max_record: int = MAX_WARC_RECORD):
    """Parse every COMPLETE record in ``data``; returns (rows, consumed)
    where ``consumed`` is the offset the caller may discard up to.  With
    ``at_eof=False`` a trailing partial record is left unconsumed for the
    next buffered chunk (the streaming reader's contract); with True a
    truncated tail is an error (strict) or resynchronized past.

    Non-response records are skipped; malformed records — bad headers,
    Content-Length over ``max_record`` (a corrupt length would otherwise
    make the streaming reader buffer the whole remaining file), or a
    truncated body at EOF — raise in ``strict`` mode, else scanning
    resynchronizes at the next record marker (crawl files routinely
    contain such tails)."""
    rows = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            pos = n if at_eof else max(n - 4, pos)  # keep a marker prefix
            break
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            if at_eof and strict:
                raise ValueError(f"unterminated WARC header at {start}")
            pos = start if not at_eof else n
            break
        try:
            headers = {}
            lines = data[start:head_end].split(_CRLF)
            for line in lines[1:]:
                k, _, v = line.decode("utf-8", "replace").partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            if not 0 <= length <= max_record:
                raise ValueError(f"Content-Length {length} out of range")
        except Exception:
            if strict:
                raise ValueError(f"malformed WARC header at {start}") from None
            pos = start + 5
            continue
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            if at_eof:
                if strict:
                    raise ValueError(f"truncated WARC record at {start}")
                pos = start + 5  # resync: later records may be intact
                continue
            pos = start  # complete record arrives with the next chunk
            break
        pos = body_end  # the inter-record \r\n\r\n is skipped by find()
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if url is None or date is None:
            if strict:
                raise ValueError(f"response record missing URI/Date at {start}")
            continue
        try:
            fmt = _TS_FMT if "." in date else "%Y-%m-%dT%H:%M:%SZ"
            ts = datetime.strptime(date, fmt).replace(tzinfo=timezone.utc)
            ts_us = _dt_to_us(ts)
        except ValueError:
            if strict:
                raise
            continue
        payload = data[body_start:body_end]
        if headers.get("content-type", "").startswith("application/http"):
            sep = payload.find(_CRLF + _CRLF)
            payload = payload[sep + 4:] if sep >= 0 else payload
        rows.append((url, ts_us, payload))
    return rows, pos


def parse_warc_bytes(data: bytes, *, strict: bool = False):
    """Yield (url, ts_us, html_bytes) from fully-buffered WARC bytes (the
    whole-buffer convenience form; the Datasource streams instead)."""
    rows, _ = _parse_complete(data, strict=strict, at_eof=True)
    yield from rows


try:
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC reader: one read task per file (Ray plans the
        parallelism), rows in input_hint shape.  The file is consumed in
        bounded chunks — gzip members decode incrementally (zlib
        decompressobj loop over ``unused_data`` handles the multi-member
        .warc.gz layout) and only the current partial record is buffered,
        so a task's memory is O(chunk + largest record), not O(file).
        ``strict=False`` resynchronizes past malformed records instead of
        failing the task."""

        _FILE_EXTENSIONS = ["warc", "warc.gz"]
        _CHUNK = 8 << 20  # 8 MiB read granularity

        def __init__(self, paths, *, strict: bool = False,
                     batch_rows: int = 4096, **kwargs):
            super().__init__(paths, **kwargs)
            self._strict = strict
            self._batch_rows = batch_rows

        @staticmethod
        def _raw_chunks(f, chunk: int):
            while True:
                data = f.read(chunk)
                if not data:
                    return
                yield bytes(data)

        @classmethod
        def _decoded_chunks(cls, f):
            """Plain bytes pass through; gzip decodes member-by-member."""
            import zlib

            it = cls._raw_chunks(f, cls._CHUNK)
            first = next(it, None)
            if first is None:
                return
            if first[:2] != b"\x1f\x8b":
                yield first
                yield from it
                return
            d = zlib.decompressobj(wbits=47)  # gzip wrapper
            pending = first
            while True:
                out = d.decompress(pending)
                if out:
                    yield out
                if d.eof:  # member boundary — restart on leftover bytes
                    pending = d.unused_data
                    if not pending:
                        pending = next(it, None)
                        if pending is None:
                            return
                    d = zlib.decompressobj(wbits=47)
                    continue
                pending = next(it, None)
                if pending is None:
                    tail = d.flush()
                    if tail:
                        yield tail
                    return

        def _read_stream(self, f, path: str):
            buf = b""
            urls: list = []
            tss: list = []
            htmls: list = []

            def block():
                return pa.table({
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(tss, pa.timestamp("us")),
                    "html": pa.array(htmls, pa.large_binary())})

            def drain(rows):
                nonlocal urls, tss, htmls
                for url, ts_us, html in rows:
                    urls.append(url)
                    tss.append(ts_us)
                    htmls.append(html)
                if len(urls) >= self._batch_rows:
                    b = block()
                    urls, tss, htmls = [], [], []
                    return b
                return None

            for chunk in self._decoded_chunks(f):
                buf += chunk
                rows, consumed = _parse_complete(buf, strict=self._strict,
                                                 at_eof=False)
                buf = buf[consumed:]
                b = drain(rows)
                if b is not None:
                    yield b
            rows, _ = _parse_complete(buf, strict=self._strict, at_eof=True)
            drain(rows)
            yield block()  # final (possibly empty — keeps schema on empty files)

    def read_warc(paths, *, strict: bool = False, **kwargs):
        """Dataset[{url, warc_ts, html}] from WARC files — drop-in
        replacement for the parquet read in every pipeline here."""
        import ray.data as rd

        return rd.read_datasource(WarcDatasource(paths, strict=strict,
                                                 **kwargs))

except ImportError:  # pragma: no cover - ray present in sandbox
    WarcDatasource = read_warc = None


# --- ORC container format (SURVEY §2-A source family) -----------------------
#
# Ray Data 2.49 ships parquet/csv/json/text readers but no ORC; pyarrow.orc
# (public Apache ORC C++ bindings) provides the codec.  The reader streams
# STRIPE-wise — one Arrow table per ORC stripe, so task memory is O(stripe),
# not O(file) — with column pruning pushed into the stripe read.  The sink
# is a BlockBasedFileDatasink: one .orc file per block, zstd by default.

try:
    from ray.data.datasource import BlockBasedFileDatasink

    class OrcDatasource(FileBasedDatasource):
        """Stripe-streaming ORC reader with column pruning.

        ORC's layout is footer-last, so the file needs random access —
        ``_open_input_source`` is overridden to open a seekable input file
        instead of the default sequential stream."""

        _FILE_EXTENSIONS = ["orc"]

        def __init__(self, paths, *, columns=None, **kwargs):
            super().__init__(paths, **kwargs)
            self._columns = list(columns) if columns else None

        def _open_input_source(self, filesystem, path, **open_args):
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            from pyarrow import orc

            reader = orc.ORCFile(f)
            if reader.nstripes == 0:
                yield reader.read(columns=self._columns)  # schema-bearing
                return
            for i in range(reader.nstripes):
                rb = reader.read_stripe(i, columns=self._columns)
                yield pa.Table.from_batches([rb])

    class OrcDatasink(BlockBasedFileDatasink):
        """One ORC file per output block (resumable-partition layout)."""

        def __init__(self, path, *, compression: str = "zstd", **kwargs):
            super().__init__(path, file_format="orc", **kwargs)
            self._compression = compression

        def write_block_to_file(self, block, file):
            from pyarrow import orc

            orc.write_table(block.to_arrow(), file,
                            compression=self._compression)

    def read_orc(paths, *, columns=None, **kwargs):
        """Dataset from ORC files, stripe-parallel within Ray's per-file
        read planning; ``columns=`` prunes at the stripe read."""
        import ray.data as rd

        return rd.read_datasource(
            OrcDatasource(paths, columns=columns, **kwargs))

    def write_orc(ds, path: str, *, compression: str = "zstd", **kwargs):
        """Write a Dataset as a directory of ORC files (one per block)."""
        ds.write_datasink(OrcDatasink(path, compression=compression,
                                      **kwargs))

except ImportError:  # pragma: no cover - ray present in sandbox
    OrcDatasource = OrcDatasink = read_orc = write_orc = None


# ---------------------------------------------------------------------------
# Arrow IPC (Feather v2) container: the zero-parse interchange format —
# what a sibling Arrow/Flight/polars pipeline hands over without a parquet
# re-encode.  The reader streams RECORD BATCHES (task memory is O(batch),
# not O(file)) with column pruning; the sink is one .arrow file per block.

try:
    from ray.data.datasource import BlockBasedFileDatasink as _Sink

    class IpcDatasource(FileBasedDatasource):
        """Record-batch-streaming Arrow IPC file reader with column
        pruning.  The IPC file format keeps its footer last, so — like
        ORC — the default sequential stream is overridden with a
        seekable input file."""

        _FILE_EXTENSIONS = ["arrow", "feather", "ipc"]

        def __init__(self, paths, *, columns=None, **kwargs):
            super().__init__(paths, **kwargs)
            self._columns = list(columns) if columns else None

        def _open_input_source(self, filesystem, path, **open_args):
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path: str):
            reader = pa.ipc.open_file(f)
            sel = self._columns
            if reader.num_record_batches == 0:
                t = reader.schema.empty_table()
                yield t.select(sel) if sel else t     # schema-bearing
                return
            for i in range(reader.num_record_batches):
                t = pa.Table.from_batches([reader.get_batch(i)])
                yield t.select(sel) if sel else t

    class IpcDatasink(_Sink):
        """One Arrow IPC file per output block (resumable-partition
        layout), zstd-compressed record batches by default."""

        def __init__(self, path, *, compression: str | None = "zstd",
                     **kwargs):
            super().__init__(path, file_format="arrow", **kwargs)
            self._compression = compression

        def write_block_to_file(self, block, file):
            t = block.to_arrow()
            opts = pa.ipc.IpcWriteOptions(compression=self._compression)
            with pa.ipc.new_file(file, t.schema, options=opts) as w:
                w.write_table(t)

    def read_ipc(paths, *, columns=None, **kwargs):
        """Dataset from Arrow IPC (Feather v2) files; ``columns=`` prunes
        each record batch before it enters the block."""
        import ray.data as rd

        return rd.read_datasource(
            IpcDatasource(paths, columns=columns, **kwargs))

    def write_ipc(ds, path: str, *, compression: str | None = "zstd",
                  **kwargs):
        """Write a Dataset as a directory of Arrow IPC files (one per
        block)."""
        ds.write_datasink(IpcDatasink(path, compression=compression,
                                      **kwargs))

except ImportError:  # pragma: no cover - ray present in sandbox
    IpcDatasource = IpcDatasink = read_ipc = write_ipc = None


def parquet_layout_report(paths: list[str]):
    """Storage-layout health audit from parquet FOOTERS only (no data
    scan): per file × row group, the row count, column count and total
    compressed bytes — the numbers that decide scan throughput at scale
    (row groups ≪ the HDFS/S3 read size mean footer-bound scans; one
    giant row group breaks predicate pushdown and parallelism).
    Returns a Dataset[{file, row_group, n_rows, n_cols,
    compressed_bytes}] ordered by (file, row_group).

    Scale shape: one Ray task per FILE reading only its footer
    (metadata-only I/O — the same trick the resume manifest uses for
    counts); the report is row-group-count-sized."""
    import os

    import ray
    import ray.data as rd

    @ray.remote
    def footer(path: str) -> pa.Table:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        rows, cols, comp = [], [], []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            rows.append(rg.num_rows)
            cols.append(rg.num_columns)
            comp.append(sum(rg.column(i).total_compressed_size
                            for i in range(rg.num_columns)))
        n = md.num_row_groups
        base = os.path.basename(path)
        return pa.table({
            "file": pa.array([base] * n, pa.string()),
            "row_group": pa.array(list(range(n)), pa.int64()),
            "n_rows": pa.array(rows, pa.int64()),
            "n_cols": pa.array(cols, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64())})

    refs = [footer.remote(p) for p in sorted(paths)]
    return rd.from_arrow_refs(refs).sort(["file", "row_group"])
