"""Deterministic synthetic web-page fixtures (SURVEY.md §2-A A6, FIXTURES.md).

Every value is a pure function of the row index ``i`` (seed baked in), so
expected outputs — planted duplicate / null / bad-url / orphan counts — are
closed-form and the same at any parallelism.  Table shape is pinned by
BASELINE.json input_hint::

    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

The ``text`` column is the GROUND-TRUTH extraction of ``html`` computed from
the template (independently of extract.py's parser); test_extract.py asserts
the two derivations agree byte-for-byte — that is the per-row invariant.

Planted features (disjoint index classes, verified in tests):
- i % 200 == 199   → url reuses row i-99's url      (0.5% dup violations, G2)
- i % 100 == 50    → html/text null                  (1% null-text, B3)
- i % 500 == 123   → lang null                       (0.2% null-lang, B3)
- i % 1000 ∈ {333,334,335} → malformed url           (0.3% regex violations, B5)
- lang == "__unk__" (~2% via freq table)             (domain violations, B4)
- rows in ``drift_part`` get ~4× longer sentences    (drift for contrast, P3)
Domains are drawn from a 1000-domain pool with Zipf(1.2) skew so hot domains
exercise the salted groupby (G2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webval._langdata import STOPWORDS, fillers_for

SEED = np.uint64(0x5EED_2026)
N_DOMAINS = 1000
ZIPF_A = 1.2
EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds
ROWS_PER_PART = 10_000

LANG_FREQ = [("en", 0.35), ("de", 0.12), ("fr", 0.11), ("es", 0.11),
             ("nl", 0.09), ("ru", 0.10), ("zh", 0.10), ("__unk__", 0.02)]
_LANG_NAMES = [l for l, _ in LANG_FREQ]
_LANG_CDF = np.cumsum([p for _, p in LANG_FREQ])

_zipf_w = 1.0 / np.arange(1, N_DOMAINS + 1) ** ZIPF_A
_ZIPF_CDF = np.cumsum(_zipf_w / _zipf_w.sum())


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche (wraps mod 2^64)."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def _rand(i: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uint64 for (row index, stream)."""
    with np.errstate(over="ignore"):
        return _mix(np.asarray(i, dtype=np.uint64)
                    ^ _mix(np.uint64(stream) + SEED))


def _uniform(i: np.ndarray, stream: int) -> np.ndarray:
    return _rand(i, stream).astype(np.float64) / 2.0 ** 64


def _base_url_idx(i: np.ndarray) -> np.ndarray:
    """Row whose url this row carries: dup rows point 99 back."""
    i = np.asarray(i, dtype=np.int64)
    return np.where(i % 200 == 199, i - 99, i)


def _sentence(i: int, r0: int, lang: str | None, drifted: bool) -> str:
    key = lang if lang in STOPWORDS else None
    n_words = (60 + r0 % 40) if drifted else (6 + r0 % 24)
    with np.errstate(over="ignore"):
        rs = _mix(np.uint64(r0) + np.arange(n_words, dtype=np.uint64))
    if key is None and lang == "__unk__":
        words = [f"q{int(r) % 97}x{int(r) % 13}" for r in rs]
    else:
        vocab_lang = key or "en"  # null-lang rows still carry english text
        stop = STOPWORDS[vocab_lang]
        fill = fillers_for(vocab_lang)
        words = [stop[int(r) % len(stop)] if int(r) % 10 < 6
                 else fill[(int(r) >> 8) % len(fill)] for r in rs]
    sep = "" if key == "zh" else " "
    return sep.join(words)


def gen_webpages_table(indices: np.ndarray, drift_part: int | None = None,
                       rows_per_part: int = ROWS_PER_PART) -> pa.Table:
    """Generate the webpages table for the given row indices — pure f(i)."""
    i = np.asarray(indices, dtype=np.int64)
    n = len(i)
    base = _base_url_idx(i)
    dom_idx = np.searchsorted(_ZIPF_CDF, _uniform(base, 0), side="right")
    part_id = i // rows_per_part

    # dup rows are re-crawls: content (html/text/lang) comes from the BASE
    # row, so planted url-dups are also exact content duplicates (dedup G2 +
    # exact-dedup oracles share the same closed-form counts)
    r0s = _rand(base, 2)
    r1s = _rand(base, 3)
    r2s = _rand(i, 4)  # per-crawl (not per-base): fetch timing differs on re-crawl
    lang_idx = np.searchsorted(_LANG_CDF, _uniform(base, 1), side="right")
    lang_idx = np.minimum(lang_idx, len(_LANG_NAMES) - 1)
    # fetch_ms: numeric STRING with planted unparseable values (i % 250 == 13
    # → "N/A"), exercising B8 normalize_types' cast-error counting
    fetch_ms = ["N/A" if int(ii) % 250 == 13 else str(200 + int(r) % 1800)
                for ii, r in zip(i, r2s)]
    urls, htmls, texts, langs = [], [], [], []
    for k in range(n):
        ii = int(i[k])
        bi = int(base[k])
        if ii % 1000 in (333, 334, 335):
            url = f"htp:/bad url {ii}"
        else:
            url = f"https://d{int(dom_idx[k])}.example.com/p/{bi}"
        urls.append(url)
        lang = None if bi % 500 == 123 else _LANG_NAMES[int(lang_idx[k])]
        langs.append(lang)
        if bi % 100 == 50:
            htmls.append(None)
            texts.append(None)
            continue
        drifted = drift_part is not None and int(part_id[k]) == drift_part
        sent = _sentence(bi, int(r0s[k]), lang, drifted)
        title = f"t{bi}"
        # entity/markup decorations (pure f(base row)) so the fixture is
        # entity- and attribute-dense like real crawl HTML: the encoded form
        # goes to `html`, the parser-decoded form to the `text` ground
        # truth.  d==8 (a HEX charref — outside the vectorized decode
        # table) deliberately lands on the parser slow path (~5%) so the
        # headline bench mixes paths honestly (VERDICT r1 §wrong-8); the
        # named/decimal entities and comments exercise the vectorized
        # decode/strip paths.
        r1 = int(r1s[k])
        d = r1 % 20
        if d == 0:
            extra_h, extra_t = " b &amp; w", " b & w"
        elif d == 1:
            extra_h, extra_t = " it&#39;s ok", " it's ok"
        elif d == 2:
            extra_h, extra_t = " use &lt;b&gt; tags", " use <b> tags"
        elif d == 3:
            extra_h, extra_t = " say &quot;hi&quot;", ' say "hi"'
        elif d == 4:
            extra_h, extra_t = f"<!-- crawl meta {bi} -->", ""
        elif d == 5:
            extra_h, extra_t = " a&#8212;b", " a—b"
        elif d == 6:
            extra_h, extra_t = " c&nbsp;d", " c d"
        elif d == 7:
            extra_h, extra_t = " e&hellip; &copy;2026", " e… ©2026"
        elif d == 8:
            extra_h, extra_t = " f&#x2014;g", " f—g"
        else:
            extra_h, extra_t = "", ""
        htmls.append(
            f'<html><head><title>{title}</title>'
            f'<style>p {{margin:0}}</style></head>'
            f'<body><p class="s{r1 % 7}">{sent}</p>{extra_h}'
            f' <a href="/p/{bi}?s={r1 % 7}&amp;v=2">next</a>'
            f'<script>var x={ii};</script></body></html>'
            .encode("utf-8"))
        texts.append(f"{title} {sent}{extra_t} next")

    return pa.table({
        "page_id": pa.array(i, type=pa.int64()),
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array((EPOCH_US + i * 37_000_000),
                            type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.large_binary()),
        "text": pa.array(texts, type=pa.large_string()),
        "lang": pa.array(langs, type=pa.string()),
        "fetch_ms": pa.array(fetch_ms, type=pa.string()),
        "part_id": pa.array(part_id, type=pa.int64()),
    })


def gen_links_table(indices: np.ndarray, n_pages: int) -> pa.Table:
    """Child table for referential checks (FIXTURES.md F2): dst_url is an
    orphan (not a page url) for i % 50 == 7 — exact count len(range(7,n,50)).
    """
    i = np.asarray(indices, dtype=np.int64)
    src_i = _base_url_idx((_rand(i, 7) % np.uint64(n_pages)).astype(np.int64))
    dst_i = _base_url_idx((_rand(i, 8) % np.uint64(n_pages)).astype(np.int64))
    # avoid sampling bad-url pages (their real url is malformed, which would
    # create unplanned orphans); +3 lands on a normal, non-dup index
    for arr in (src_i, dst_i):
        bad = np.isin(arr % 1000, (333, 334, 335))
        arr[bad] = (arr[bad] + 3) % n_pages
    src_dom = np.searchsorted(_ZIPF_CDF, _uniform(src_i, 0), side="right")
    dst_dom = np.searchsorted(_ZIPF_CDF, _uniform(dst_i, 0), side="right")
    srcs, dsts = [], []
    for k in range(len(i)):
        ii = int(i[k])
        srcs.append(f"https://d{int(src_dom[k])}.example.com/p/{int(src_i[k])}")
        if ii % 50 == 7:
            dsts.append(f"https://orphan-{ii}.invalid/x")
        else:
            dsts.append(f"https://d{int(dst_dom[k])}.example.com/p/{int(dst_i[k])}")
    return pa.table({"src_url": pa.array(srcs), "dst_url": pa.array(dsts)})


# -- closed-form expected counts (tests assert exact integers) --------------

def expected_counts(n: int) -> dict[str, int]:
    dup_rows = len(range(199, n, 200))
    return {
        "rows": n,
        "dup_extra_rows": dup_rows,          # rows whose url already exists
        "null_text": len(range(50, n, 100)),
        "null_lang": len(range(123, n, 500)),
        "bad_url": sum(len(range(s, n, 1000)) for s in (333, 334, 335)),
        "bad_fetch": len(range(13, n, 250)),
    }


def expected_orphans(n_links: int) -> int:
    return len(range(7, n_links, 50))


# -- Ray-parallel parquet writer (A6) ---------------------------------------

def write_webpages(out_dir: str, n_rows: int, *, drift_part: int | None = None,
                   rows_per_part: int = ROWS_PER_PART,
                   block_rows: int = 20_000) -> str:
    """Generate with ray.data.range → map_batches (seed-per-index, so any
    block split yields the same table) and write parquet to ``out_dir``.
    """
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        return gen_webpages_table(batch["id"], drift_part=drift_part,
                                  rows_per_part=rows_per_part)

    (rd.range(n_rows, override_num_blocks=max(1, n_rows // block_rows))
       .map_batches(gen, batch_format="numpy", batch_size=block_rows)
       .write_parquet(out_dir))
    return out_dir


def write_links(out_dir: str, n_links: int, n_pages: int,
                block_rows: int = 50_000) -> str:
    import ray.data as rd

    def gen(batch: dict) -> pa.Table:
        return gen_links_table(batch["id"], n_pages)

    (rd.range(n_links, override_num_blocks=max(1, n_links // block_rows))
       .map_batches(gen, batch_format="numpy", batch_size=block_rows)
       .write_parquet(out_dir))
    return out_dir
