"""Driver-contract query registry: every operator from SURVEY.md §2 exposed
as a named pipeline over the sf testdata tables (plus the deterministic
synthetic webpages table, BASELINE.json input_hint shape), each with a DuckDB
oracle twin where ANSI-SQL can express it.

Column names and float rounding are aligned between the Ray pipelines and
the SQL strings because the driver hashes values after sorting columns by
name (see /root/repo/__ray_entry__.py docstring).

None of these call ray.init — the driver owns the session.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# versioned: bump when gen_webpages_table content changes so stale /tmp
# fixtures from an earlier round can never desync from the generator
SYNTH_ROOT = "/tmp/webval_synth/v4"
_SF_ROWS = {"sf0.001": 4_000, "sf0.01": 20_000, "sf0.1": 200_000}
REAL_LANGS = ["en", "de", "fr", "es", "nl", "ru", "zh"]
URL_RE = r"^https?://[^ ]+$"
EVENT_TYPES = ["click", "view", "purchase", "signup"]


# Fused exact-oracle gate (VERDICT r4 wrong-1): a handful of queries fold a
# driver-side EXACT oracle into the query body as a self-assert (pandas
# quantiles, numpy eigh, union-find).  Those asserts are the point at fixture
# scale, but they must never become the compute path: above this row count
# the oracle branch is SKIPPED and the distributed production path alone
# produces the output.  Tests force the gate low and prove the oracle code
# never runs (tests/test_round5.py).
EXACT_ORACLE_MAX_ROWS = 2_000_000


def exact_oracle_enabled(n_rows: int) -> bool:
    return n_rows <= EXACT_ORACLE_MAX_ROWS


def synth_rows_for(sf_dir: str) -> int:
    return _SF_ROWS.get(os.path.basename(os.path.normpath(sf_dir)), 4_000)


def ensure_synth(sf_dir: str) -> tuple[str, str]:
    """Deterministically materialize the webpages/links fixture for this sf
    under /tmp (pure function of the sf name; idempotent)."""
    import pyarrow.parquet as pq

    from webval.synth import gen_links_table, gen_webpages_table

    name = os.path.basename(os.path.normpath(sf_dir))
    n = synth_rows_for(sf_dir)
    out = os.path.join(SYNTH_ROOT, name)
    pages = os.path.join(out, "webpages.parquet")
    links = os.path.join(out, "links.parquet")
    os.makedirs(out, exist_ok=True)
    if not os.path.exists(pages):
        tmp = f"{pages}.tmp.{os.getpid()}"  # unique per writer; replace atomic
        pq.write_table(gen_webpages_table(np.arange(n)), tmp)
        os.replace(tmp, pages)
    if not os.path.exists(links):
        tmp = f"{links}.tmp.{os.getpid()}"
        pq.write_table(gen_links_table(np.arange(n // 4), n), tmp)
        os.replace(tmp, links)
    return pages, links


def _round_cols(t: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Decimal-correct rounding: pc.round computes x*10^n/10^n in binary and
    can land on the OTHER double neighbor than DuckDB's decimal round (e.g.
    60.879999999999995 vs 60.88) — format-then-parse matches SQL exactly,
    EXCEPT when x·10^n is an exact binary half (17/32 = 0.53125 at 4
    decimals, r4s9 sf0.1 finding): Python's formatter rounds half-to-even
    (…5312) while DuckDB rounds half away from zero (…5313).  Exact halves
    are detected in binary and nudged DuckDB's way; every non-half value
    keeps the proven format-parse path byte-identically."""
    import math

    for c, nd in cols.items():
        i = t.column_names.index(c)
        scale = 10.0 ** nd

        def r1(v):
            if v is None:
                return None
            scaled = v * scale
            if math.isfinite(scaled) and abs(scaled) < 2**52 \
                    and scaled - math.floor(scaled) == 0.5:
                return math.floor(scaled + 0.5) / scale if v >= 0 \
                    else math.ceil(scaled - 0.5) / scale
            return float(f"{v:.{nd}f}")

        vals = [r1(v) for v in t.column(c).to_pylist()]
        t = t.set_column(i, c, pa.array(vals, type=pa.float64()))
    return t


def ds_to_table(ds, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Eagerly collect a (small!) Dataset to one pyarrow Table, PRESERVING
    the schema even when there are zero rows (Dataset.to_pandas on an empty
    result loses column names, which would fail the driver's schema check).
    ``empty_schema`` covers operators whose empty output has no runtime
    schema at all (e.g. an aggregate over zero groups)."""
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
    if batches:
        return pa.concat_tables(batches, promote_options="permissive")
    sch = ds.schema()
    if sch is None or sch.names is None:
        if empty_schema is None:
            return pa.table({})
        return pa.table({f.name: pa.array([], type=f.type) for f in empty_schema})
    return pa.table({n: pa.array([], type=t)
                     for n, t in zip(sch.names, sch.types)})


# ---------------------------------------------------------------------------
# individual queries — each takes sf_dir, returns Dataset / Table / DataFrame
# ---------------------------------------------------------------------------


def q_column_stats(sf_dir: str):
    """E1-E3: global min/max/mean/null-count via the fused profile pass."""
    import ray.data as rd

    from webval.aggregates import profile_dataset
    from webval.sketches import Moments

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    spec = profile_dataset(ds, {"l_quantity": "numeric", "l_extendedprice": "numeric"})
    mq = Moments.from_dict(spec.column("l_quantity").moments)
    mp = Moments.from_dict(spec.column("l_extendedprice").moments)
    return pa.table({
        "n_rows": pa.array([mq.total], pa.int64()),
        "qty_min": [mq.min], "qty_max": [mq.max],
        "qty_mean": [round(mq.mean, 6)],
        "qty_nulls": pa.array([mq.null_count], pa.int64()),
        "price_min": [mp.min], "price_max": [mp.max],
        "price_mean": [round(mp.mean, 6)],
    })


SQL_COLUMN_STATS = """
SELECT count(*) AS n_rows,
       min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
       round(avg(l_quantity), 6) AS qty_mean,
       count(*) - count(l_quantity) AS qty_nulls,
       min(l_extendedprice) AS price_min, max(l_extendedprice) AS price_max,
       round(avg(l_extendedprice), 6) AS price_mean
FROM lineitem
"""


def q_grouped_stats(sf_dir: str):
    """E8: grouped aggregates (shuffle) via ds.groupby().aggregate()."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = ds.groupby("l_returnflag").aggregate(
        Count(alias_name="n"),
        Sum("l_quantity", alias_name="sum_qty"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"),
        Mean("l_extendedprice", alias_name="avg_price"),
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = _round_cols(t, {"sum_qty": 4, "avg_price": 4})
    return t.set_column(t.column_names.index("n"), "n",
                        pc.cast(t.column("n"), pa.int64()))


SQL_GROUPED_STATS = """
SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem GROUP BY l_returnflag
"""


def q_lang_freq(sf_dir: str):
    """E6: categorical frequency histogram (exact oracle path)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    out = ds.groupby("lang").aggregate(Count(alias_name="cnt"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("cnt"), "cnt",
                        pc.cast(t.column("cnt"), pa.int64()))


SQL_LANG_FREQ = "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang"


def q_null_rates(sf_dir: str):
    """B3/E3: null counting through the profile pass."""
    import ray.data as rd

    from webval.aggregates import profile_dataset

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
    spec = profile_dataset(ds, {"text": "text", "lang": "categorical"})
    return pa.table({
        "n_rows": pa.array([spec.column("text").count], pa.int64()),
        "text_nulls": pa.array([spec.column("text").null_count], pa.int64()),
        "lang_nulls": pa.array([spec.column("lang").null_count], pa.int64()),
    })


SQL_NULL_RATES = """
SELECT count(*) AS n_rows, count(*) - count(text) AS text_nulls,
       count(*) - count(lang) AS lang_nulls
FROM documents
"""


def _events_check_schema(*kinds: str):
    from webval.schema import CheckSpec, SchemaSpec

    all_checks = {
        "range": CheckSpec("value-range", "value", "range",
                           {"min": 5.0, "max": 250.0}),
        "domain": CheckSpec("type-domain", "event_type", "domain",
                            {"values": EVENT_TYPES}),
    }
    picked = [all_checks[k] for k in (kinds or all_checks)]
    return SchemaSpec(name="events", built=True, checks=picked)


def q_range_violations(sf_dir: str):
    """B2: numeric range predicate through the verdict engine."""
    import ray.data as rd

    from webval.checks import check_dataset

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value", "event_type"])
    v = check_dataset(ds, _events_check_schema("range"),
                      keep_cols=["event_id", "value"], per_check_cols=True)
    return v.map_batches(
        lambda t: t.filter(t.column("fail_value-range").combine_chunks())
                   .select(["event_id", "value"]),
        batch_format="pyarrow")


SQL_RANGE_VIOLATIONS = """
SELECT event_id, value FROM events WHERE value < 5.0 OR value > 250.0
"""


def q_domain_violations(sf_dir: str):
    """B4: domain membership predicate through the verdict engine."""
    import ray.data as rd

    from webval.checks import check_dataset

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type"])
    v = check_dataset(ds, _events_check_schema("domain"),
                      keep_cols=["event_id", "event_type"], per_check_cols=True)
    return v.map_batches(
        lambda t: t.filter(t.column("fail_type-domain").combine_chunks())
                   .select(["event_id", "event_type"]),
        batch_format="pyarrow")


SQL_DOMAIN_VIOLATIONS = """
SELECT event_id, event_type FROM events
WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
"""


def q_regex_filter(sf_dir: str):
    """B5: RE2 regexp predicate (same engine in pyarrow and DuckDB)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: t.filter(pc.fill_null(
            pc.match_substring_regex(t.column("text"), r"spark \w+ join"), False))
        .select(["doc_id"]),
        batch_format="pyarrow")


SQL_REGEX_FILTER = r"""
SELECT doc_id FROM documents WHERE regexp_matches(text, 'spark \w+ join')
"""


def q_unique_violations(sf_dir: str):
    """G2: uniqueness via combiner pre-aggregation + groupby-sum."""
    import ray.data as rd

    from webval.pipelines import uniqueness_violations

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    out = uniqueness_violations(ds, "o_custkey")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("cnt"), "cnt",
                               pc.cast(t.column("cnt"), pa.int64())),
        batch_format="pyarrow")


SQL_UNIQUE_VIOLATIONS = """
SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey HAVING count(*) > 1
"""


def q_referential_orphans(sf_dir: str):
    """D1 broadcast anti-join: orders whose custkey has no customer (0 rows
    on TPC-H-consistent data — schema/row-count parity still checked)."""
    import ray.data as rd

    from webval.pipelines import referential_orphans

    child = rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey"])
    parent = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return ds_to_table(referential_orphans(child, parent, "o_custkey", "c_custkey",
                                           mode="broadcast"))


SQL_REFERENTIAL_ORPHANS = """
SELECT o.o_orderkey, o.o_custkey FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
"""


def q_links_orphans(sf_dir: str):
    """D1 on the synthetic web tables: link dst urls with no page (planted)."""
    import ray.data as rd

    from webval.pipelines import referential_orphans

    pages_p, links_p = ensure_synth(sf_dir)
    child = rd.read_parquet(links_p)
    parent = rd.read_parquet(pages_p, columns=["url"])
    return referential_orphans(child, parent, "dst_url", "url", mode="broadcast")


SQL_LINKS_ORPHANS = f"""
SELECT l.src_url, l.dst_url
FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet') l
LEFT JOIN read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet') p
  ON l.dst_url = p.url
WHERE p.url IS NULL
"""


def q_webpage_url_violations(sf_dir: str):
    """B5 on the webpages table: malformed urls (planted 0.3%)."""
    import ray.data as rd

    from webval.checks import check_dataset, violations_of
    from webval.schema import CheckSpec, SchemaSpec

    pages_p, _ = ensure_synth(sf_dir)
    schema = SchemaSpec(name="webpages", built=True, checks=[
        CheckSpec("url-regex", "url", "regex", {"pattern": URL_RE})])
    ds = rd.read_parquet(pages_p, columns=["page_id", "url"])
    v = violations_of(check_dataset(ds, schema, keep_cols=["page_id", "url"]))
    return v.map_batches(lambda t: t.select(["page_id", "url"]),
                         batch_format="pyarrow")


SQL_WEBPAGE_URL_VIOLATIONS = f"""
SELECT page_id, url FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE NOT regexp_matches(url, '^https?://[^ ]+$')
"""


def q_webpage_dup_urls(sf_dir: str):
    """G2 on webpages: duplicate urls (planted 0.5%)."""
    import ray.data as rd

    from webval.pipelines import uniqueness_violations

    pages_p, _ = ensure_synth(sf_dir)
    out = uniqueness_violations(rd.read_parquet(pages_p, columns=["url"]), "url")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("cnt"), "cnt",
                               pc.cast(t.column("cnt"), pa.int64())),
        batch_format="pyarrow")


SQL_WEBPAGE_DUP_URLS = f"""
SELECT url, count(*) AS cnt
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
GROUP BY url HAVING count(*) > 1
"""


def q_exact_dup_groups(sf_dir: str):
    """Exact dedup groups on events.props (hash-partitioned combiner)."""
    import ray.data as rd

    from webval.dedup import exact_dup_groups

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "props"])
    out = exact_dup_groups(ds, "event_id", "props", normalize=False)
    return out.map_batches(lambda t: t.select(["keeper_id", "n_copies"]),
                           batch_format="pyarrow")


SQL_EXACT_DUP_GROUPS = """
SELECT min(event_id) AS keeper_id, count(*) AS n_copies
FROM events GROUP BY props HAVING count(*) > 1
"""


def q_minhash_clusters(sf_dir: str):
    """MinHash-LSH near-dedup on webpages; planted dups are exact copies, so
    the cluster set equals the same-text groups (SQL window oracle)."""
    import ray.data as rd

    from webval.dedup import minhash_dedup

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "text"])
    return minhash_dedup(ds, "page_id", "text", jaccard_threshold=0.95)


SQL_MINHASH_CLUSTERS = f"""
SELECT page_id, cluster_id FROM (
  SELECT page_id, min(page_id) OVER (PARTITION BY text) AS cluster_id,
         count(*) OVER (PARTITION BY text) AS c
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
  WHERE text IS NOT NULL) WHERE c > 1
"""


def q_minhash_clusters_sketch(sf_dir: str):
    """The 100-TB minhash shape end-to-end: band-chunked LSH passes
    (bands_per_pass=4), chain pairing for dense buckets, distributed
    components, fingerprint auto-accept (8-byte full-signature fold; exact
    copies have identical signatures, so every planted dup pair accepts in
    tier 1) and bottom-k sketch verify (verify_k=64, ≤512 B/doc) on the
    anti-joined residual.  Planted dups are EXACT copies, which both tiers
    score exactly 1.0 at any k, so the same same-text window oracle stays
    hash-strong; unrelated pages share ~no shingles and estimate ~0."""
    import ray.data as rd

    from webval.dedup import minhash_dedup

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "text"])
    return minhash_dedup(ds, "page_id", "text", jaccard_threshold=0.95,
                         components="distributed", bands_per_pass=4,
                         verify_k=64, fp_accept=True)


SQL_MINHASH_CLUSTERS_SKETCH = SQL_MINHASH_CLUSTERS


def q_top_langs(sf_dir: str):
    """F2: top-k by grouped count (sort + limit)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    out = (ds.groupby("lang").aggregate(Count(alias_name="cnt"))
             .sort(["cnt", "lang"], descending=[True, False]).limit(3))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("cnt"), "cnt",
                        pc.cast(t.column("cnt"), pa.int64()))


SQL_TOP_LANGS = """
SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
ORDER BY cnt DESC, lang LIMIT 3
"""


def q_events_hourly(sf_dir: str):
    """H: timestamp bucketing (floor_temporal) + grouped count."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    ds = ds.map_batches(
        lambda t: pa.table({"hour": pc.floor_temporal(t.column("ts"), unit="hour")}),
        batch_format="pyarrow")
    out = ds.groupby("hour").aggregate(Count(alias_name="cnt"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("cnt"), "cnt",
                        pc.cast(t.column("cnt"), pa.int64()))


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt FROM events GROUP BY 1
"""


def q_token_totals(sf_dir: str):
    """Token counting (vectorized regex) + grouped sum."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from webval.textstats import add_token_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    ds = add_token_counts(ds)
    out = ds.groupby("lang").aggregate(Sum("ws_tokens", alias_name="total_tokens"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("total_tokens"), "total_tokens",
                        pc.cast(t.column("total_tokens"), pa.int64()))


SQL_TOKEN_TOTALS = r"""
SELECT lang, CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang
"""


def q_doc_len_by_source(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Mean

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    out = ds.groupby("source").aggregate(
        Count(alias_name="n"), Mean("n_chars", alias_name="avg_chars"),
        Max("n_chars", alias_name="max_chars"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = _round_cols(t, {"avg_chars": 6})
    for c in ("n", "max_chars"):
        t = t.set_column(t.column_names.index(c), c, pc.cast(t.column(c), pa.int64()))
    return t


SQL_DOC_LEN_BY_SOURCE = """
SELECT source, count(*) AS n, round(avg(n_chars), 6) AS avg_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY source
"""


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 neighbors of vec_id=3 (exact baseline)."""
    import ray.data as rd

    from webval.similarity import brute_force_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(
        [r["embedding"] for r in ds.filter(expr="vec_id == 3").take(1)],
        dtype=np.float32)
    out = brute_force_topk(ds, q, k=10)
    return out.map_batches(lambda t: t.select(["vec_id"]), batch_format="pyarrow")


SQL_ANN_TOPK = """
SELECT vec_id FROM embeddings
ORDER BY list_cosine_similarity(embedding,
    (SELECT embedding FROM embeddings WHERE vec_id = 3)) DESC, vec_id
LIMIT 10
"""


# -- rows-only entries (no faithful ANSI-SQL twin) ---------------------------


def q_quantiles(sf_dir: str):
    """E4: t-digest quantiles — self-asserting (VERDICT r2 next-6 family):
    every reported quantile is bounded by exact percentiles at ±1.5% rank
    (single-column driver read of the small parity slice IS the assertion
    oracle, not the compute path)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webval.aggregates import profile_dataset

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    spec = profile_dataset(ds, {"l_extendedprice": "numeric"})
    p = spec.column("l_extendedprice")
    got = {0.5: p.quantile(0.5), 0.9: p.quantile(0.9), 0.99: p.quantile(0.99)}
    vals = pq.read_table(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"]) \
        .column("l_extendedprice").drop_null().to_numpy()
    # exact rank-band flags ARE the output (VERDICT r3 next-8): a digest
    # regression flips a boolean and breaks the hash against the trivial
    # SELECT-true twin, instead of raising where only pytest would see it
    flags = {}
    for q, v in got.items():
        lo = np.quantile(vals, max(q - 0.015, 0.0))
        hi = np.quantile(vals, min(q + 0.015, 1.0))
        flags[q] = bool(lo - 1e-9 <= v <= hi + 1e-9)
    return pa.table({"p50_in_band": pa.array([flags[0.5]], pa.bool_()),
                     "p90_in_band": pa.array([flags[0.9]], pa.bool_()),
                     "p99_in_band": pa.array([flags[0.99]], pa.bool_())})


SQL_QUANTILES_TDIGEST = """
SELECT true AS p50_in_band, true AS p90_in_band, true AS p99_in_band
"""


def q_approx_distinct(sf_dir: str):
    """E5 (hash-paired): exact distinct via the hash-bucket exchange (the
    scale-safe exact-distinct operator) cross-checked in-query against the
    HLL estimate (must agree within ±3%) — the SQL twin is the plain
    COUNT(DISTINCT)."""
    import ray.data as rd

    from webval.aggregates import profile_dataset
    from webval.exchange import distinct_rows

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    spec = profile_dataset(ds, {"o_custkey": "numeric"})
    est = spec.column("o_custkey").distinct_est
    exact = distinct_rows(ds, ["o_custkey"]).count()
    if abs(est - exact) > 0.03 * max(exact, 1):
        raise AssertionError(f"HLL estimate {est} vs exact {exact}: >3% off")
    return pa.table({"custkey_distinct": pa.array([exact], pa.int64()),
                     "hll_est_ok": pa.array([1], pa.int64())})


SQL_APPROX_DISTINCT = """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
       CAST(1 AS BIGINT) AS hll_est_ok
FROM orders
"""


def q_schema_build(sf_dir: str):
    """P1 flagship (hash-paired): full schema build over webpages; one row
    per column with the EXACT profile fields (count, null_count) the SQL
    twin reproduces.  The sketch fields (t-digest / HLL) are covered by
    their own queries and ±tolerance tests."""
    import ray.data as rd

    from webval.pipelines import build_schema

    pages_p, _ = ensure_synth(sf_dir)
    kinds = {"page_id": "skip", "url": "text", "warc_ts": "timestamp",
             "html": "binary", "text": "text", "lang": "categorical",
             "part_id": "skip"}
    spec = build_schema(rd.read_parquet(pages_p), kinds, name="webpages")
    rows = [{"column": p.name, "kind": p.kind, "count": p.count,
             "null_count": p.null_count}
            for p in spec.columns]
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["column"]))


SQL_SCHEMA_BUILD = f"""
WITH p AS (SELECT * FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet'))
SELECT * FROM (
  SELECT 'html' AS column, 'binary' AS kind, CAST(count(*) AS BIGINT) AS count,
         CAST(count(*) - count(html) AS BIGINT) AS null_count FROM p
  UNION ALL
  SELECT 'lang', 'categorical', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(lang) AS BIGINT) FROM p
  UNION ALL
  SELECT 'text', 'text', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(text) AS BIGINT) FROM p
  UNION ALL
  SELECT 'url', 'text', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(url) AS BIGINT) FROM p
  UNION ALL
  SELECT 'warc_ts', 'timestamp', CAST(count(*) AS BIGINT),
         CAST(count(*) - count(warc_ts) AS BIGINT) FROM p
) ORDER BY "column"
"""


def q_contrast(sf_dir: str):
    """P3: drift report between baseline and drifted builds (rows-only)."""
    import ray.data as rd

    from webval.pipelines import build_schema, contrast
    from webval.synth import gen_webpages_table

    pages_p, _ = ensure_synth(sf_dir)
    kinds = {"page_id": "skip", "url": "skip", "warc_ts": "skip",
             "html": "skip", "text": "text", "lang": "categorical",
             "part_id": "skip"}
    base = build_schema(rd.read_parquet(pages_p), kinds, name="base")
    n = synth_rows_for(sf_dir)
    drift_ds = rd.from_arrow(gen_webpages_table(
        np.arange(n), drift_part=1, rows_per_part=max(1000, n // 4)))
    drifted = build_schema(drift_ds, kinds, name="drifted")
    rep = contrast(base, drifted)
    rows = [{"column": name, "js": round(c.get("js", -1.0), 4),
             "drifted": c["drifted"]}
            for name, c in sorted(rep["columns"].items())]
    # detector-sanity flags ARE the output (VERDICT r3 next-8 pattern):
    # the planted drift must be detected, contrasting a build against
    # ITSELF must stay quiet, and every JS divergence must be in [0, 1] —
    # a regression flips a boolean and breaks the hash against the trivial
    # SELECT-true twin instead of raising where only pytest would see it
    self_rep = contrast(base, base)
    return pa.table({
        "planted_drift_detected": pa.array(
            [any(r["drifted"] for r in rows)], pa.bool_()),
        "self_contrast_quiet": pa.array(
            [not self_rep["drifted"]], pa.bool_()),
        "all_js_in_unit_interval": pa.array(
            [all(0.0 <= r["js"] <= 1.0 for r in rows
                 if r["js"] >= 0.0)], pa.bool_()),
        "n_columns_compared": pa.array([len(rows)], pa.int64())})


SQL_CONTRAST_DRIFT = """
SELECT true AS planted_drift_detected, true AS self_contrast_quiet,
       true AS all_js_in_unit_interval, CAST(2 AS BIGINT) AS n_columns_compared
"""


def q_langid(sf_dir: str):
    """C2: language-tagging accuracy vs the planted ``lang`` column
    (VERDICT r2 next-6: hash-paired).  Output per planted lang: row count +
    ``acc_ok`` = 1 iff the tagger recovered ≥90% of that lang's rows
    (measured ≥95% per lang on the fixture; deterministic tagger).  The SQL
    twin contributes the exact per-lang row counts and the acc_ok=1
    expectation — a tagger regression flips acc_ok and breaks the hash."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from webval.extract import LangTagger

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["text", "lang"])
    tagged = ds.map_batches(LangTagger, batch_format="pyarrow", batch_size=1024,
                            concurrency=(1, 4), max_concurrency=2)

    def correct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("lang")),
                             pc.is_valid(t.column("text"))))
        # planted "__unk__" rows carry vocabulary-free text → expect "unk"
        expect = pc.replace_substring_regex(t.column("lang"),
                                            "^__unk__$", "unk")
        hit = pc.cast(pc.equal(t.column("lang_pred"), expect), pa.int64())
        return pa.table({"lang": t.column("lang"),
                         "one": pa.array(np.ones(t.num_rows, np.int64)),
                         "hit": hit})

    out = (tagged.map_batches(correct, batch_format="pyarrow")
           .groupby("lang").aggregate(Sum("one", alias_name="rows"),
                                      Sum("hit", alias_name="correct")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    rows = pc.cast(t.column("rows"), pa.int64())
    corr = pc.cast(t.column("correct"), pa.float64())
    acc_ok = pc.cast(pc.greater_equal(
        pc.divide(corr, pc.cast(rows, pa.float64())), 0.9), pa.int64())
    return pa.table({"lang": t.column("lang"), "rows": rows,
                     "acc_ok": acc_ok})


SQL_LANGID = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS rows, CAST(1 AS BIGINT) AS acc_ok
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE lang IS NOT NULL AND text IS NOT NULL
GROUP BY lang
"""


def q_quality(sf_dir: str):
    """Quality scoring (hash-paired): mean score per lang.  The scorer is
    a fixed combination of RE2 count features, so the DuckDB twin (RE2 via
    regexp_extract_all) reproduces the per-row quality EXACTLY — verified
    0 per-row mismatches at 1e-9 on the fixture — and the grouped means
    are compared after decimal rounding."""
    import ray.data as rd
    from ray.data.aggregate import Count, Mean

    from webval.textstats import QualityScorer

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["text", "lang"])
    scored = ds.map_batches(QualityScorer, batch_format="pyarrow",
                            batch_size=2048, concurrency=(1, 4), max_concurrency=2)
    out = (scored.map_batches(
        lambda t: t.select(["lang", "quality"]).drop_null(), batch_format="pyarrow")
        .groupby("lang").aggregate(Mean("quality", alias_name="avg_quality"),
                                   Count(alias_name="n")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = t.set_column(t.column_names.index("n"), "n",
                     pc.cast(t.column("n"), pa.int64()))
    return _round_cols(t, {"avg_quality": 4})


def _sql_quality() -> str:
    """Twin built from the SAME stopword pattern the scorer compiles — the
    regex pipeline IS the contract (textstats.py convention)."""
    from webval.textstats import QualityScorer

    stop_pat = QualityScorer().stop_pattern.replace("'", "''")
    word = "len(regexp_extract_all(text, '\\p{L}+'))"
    letters = "len(regexp_extract_all(text, '\\p{L}'))"
    padded = ("' ' || regexp_replace(lower(text), '\\P{L}+', '  ', 'g')"
              " || ' '")
    stop = f"len(regexp_extract_all({padded}, '{stop_pat}'))"
    punct = "len(regexp_extract_all(text, '[^\\p{L}\\p{N}\\s]'))"
    q = (f"0.4 * (CASE WHEN length(text) > 0 THEN {letters}::DOUBLE"
         " / length(text) ELSE 0 END)"
         f" + 0.3 * least((CASE WHEN {word} > 0 THEN {stop}::DOUBLE /"
         f" {word} ELSE 0 END) / 0.4, 1.0)"
         f" + 0.2 * (1.0 - least(abs((CASE WHEN {word} > 0 THEN"
         f" {letters}::DOUBLE / {word} ELSE 0 END) - 5.0) / 5.0, 1.0))"
         f" + 0.1 * (1.0 - least((CASE WHEN length(text) > 0 THEN"
         f" {punct}::DOUBLE / length(text) ELSE 0 END) / 0.3, 1.0))")
    return f"""
WITH scored AS (
  SELECT lang, round({q}, 6) AS quality
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
  WHERE text IS NOT NULL AND lang IS NOT NULL
)
SELECT lang, round(avg(quality), 4) AS avg_quality,
       CAST(count(*) AS BIGINT) AS n
FROM scored GROUP BY lang
"""


SQL_QUALITY = _sql_quality()


def q_extraction(sf_dir: str):
    """C1 flagship slice: html → text on an actor pool, hash-paired
    (VERDICT r2 next-6).  Groups by (lang, is_match) where is_match
    compares re-extracted text to the stored ground truth; the SQL twin
    asserts is_match=1 for EVERY lang bucket (the byte-identical
    invariant), so any mismatching row creates an is_match=0 group the
    oracle doesn't have → row-count + hash failure."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from webval.extract import HtmlTextExtractor

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["html", "text", "lang"])
    re_ex = ds.map_batches(
        HtmlTextExtractor, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4), max_concurrency=2,
        fn_constructor_kwargs={"html_col": "html", "out_col": "text2"})
    out = (re_ex.map_batches(
        lambda t: pa.table({
            # null lang would break the groupby sort — bucket as a literal
            "lang": pc.fill_null(t.column("lang"), "__null__"),
            "is_match": pc.cast(pc.equal(pc.fill_null(t.column("text"), ""),
                                         pc.fill_null(t.column("text2"), "")),
                                pa.int64())}),
        batch_format="pyarrow")
        .groupby(["lang", "is_match"]).aggregate(Count(alias_name="rows")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("rows"), "rows",
                        pc.cast(t.column("rows"), pa.int64()))


SQL_EXTRACTION_PARITY = f"""
SELECT coalesce(lang, '__null__') AS lang, CAST(1 AS BIGINT) AS is_match,
       CAST(count(*) AS BIGINT) AS rows
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
GROUP BY 1
"""


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs at hamming 0 (hash-paired): the fixture's
    near-dup structure is exact text copies, so the pair set equals the
    same-text self-join the SQL twin computes (docs under the 8-char
    shingle window produce no simhash and are excluded on both sides)."""
    import ray.data as rd

    from webval.dedup import simhash_dup_pairs

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "text"])
    return simhash_dup_pairs(ds, "page_id", "text", max_hamming=0,
                             concurrency=(1, 4))


SQL_SIMHASH_PAIRS = f"""
SELECT a.page_id AS id_a, b.page_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet') a
JOIN read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet') b
  ON a.text = b.text AND a.page_id < b.page_id
WHERE length(a.text) >= 8
"""


def q_embedding_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs (hash-paired, NON-vacuously — review
    r3): the exact all-pairs SQL twin finds one true pair at cosine ≥ 0.5
    on the fixture (0.5128), and the LSH parameters (3 planes × 16 tables
    → miss probability ≈ 0.3% per qualifying pair, deterministic seed) are
    sized so the pipeline must recover it — a recall regression now breaks
    the row count, not just a false positive."""
    import ray.data as rd

    from webval.dedup import embedding_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    t = ds_to_table(
        embedding_dup_pairs(ds, "vec_id", cosine_threshold=0.5,
                            n_planes=3, n_tables=16),
        empty_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                ("cosine", pa.float64())]))
    return _round_cols(t, {"cosine": 3})


SQL_EMBEDDING_DUPS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 3) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
"""


def q_curation_e2e(sf_dir: str):
    """Flagship LLM-data-curation COMPOSITE (hash-paired): C4 quality
    filter → exact dedup (min-id keeper per normalized text) → token
    counts → per-lang rollup, all one streaming pipeline
    (pipelines.curation_pipeline).  The SQL twin replays the identical
    regex formulas, dedup window, and token count — any stage OR the
    composition drifting breaks the hash."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from webval.pipelines import curation_pipeline

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "text", "lang"])

    def assert_ws_normalized(b: pa.Table) -> pa.Table:
        # oracle precondition (review r3): the engine's dedup key trims
        # UNICODE whitespace, the SQL twin only ASCII — equivalent only
        # when the text is already whitespace-normalized (true for
        # extractor output by construction; checked so a fixture change
        # raises instead of hash-mismatching)
        col = b.column("text")
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.fill_null(col, ""), r"\s+", " "))
        bad = pc.sum(pc.cast(pc.not_equal(pc.fill_null(col, ""), norm),
                             pa.int64())).as_py()
        if bad:
            raise AssertionError(
                f"{bad} docs are not whitespace-normalized; the SQL dedup "
                "twin's ASCII trim would diverge from add_fingerprints")
        return b

    ds = ds.map_batches(assert_ws_normalized, batch_format="pyarrow")
    curated = curation_pipeline(ds, "page_id")
    out = (curated.map_batches(
        lambda t: pa.table({
            "lang": pc.fill_null(t.column("lang"), "__null__"),
            "ws_tokens": pc.cast(t.column("ws_tokens"), pa.int64())}),
        batch_format="pyarrow")
        .groupby("lang").aggregate(Count(alias_name="docs"),
                                   Sum("ws_tokens", alias_name="ws_tokens")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    for c in ("docs", "ws_tokens"):
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(t.column(c), pa.int64()))
    return t


# the c4 formulas mirror SQL_C4_QUALITY / textstats thresholds.  The dedup
# window uses ASCII-whitespace trim/collapse + lower; add_fingerprints trims
# UNICODE whitespace — equal ONLY on whitespace-normalized text, which the
# query ASSERTS per batch before the pipeline runs (review r3)
SQL_CURATION_E2E = (r"""
WITH f AS (SELECT page_id, lang, text,
    len(regexp_extract_all(text, '[^ \t\n\r]+')) AS wc,
    len(regexp_extract_all(text, '\p{L}')) AS letters,
    length(text) AS n,
    len(regexp_extract_all(text, '[\p{L}\p{N}\s]')) AS okc
  FROM read_parquet('__PAGES__') WHERE text IS NOT NULL),
kept AS (SELECT page_id, lang, text FROM f
  WHERE wc >= 5
    AND (CASE WHEN wc > 0 THEN letters * 1.0 / wc ELSE 0 END) >= 2.0
    AND (CASE WHEN wc > 0 THEN letters * 1.0 / wc ELSE 0 END) <= 12.0
    AND (CASE WHEN n > 0 THEN 1.0 - okc * 1.0 / n ELSE 0 END) <= 0.3),
d AS (SELECT *, row_number() OVER (
        PARTITION BY lower(regexp_replace(regexp_replace(text,
            '^[ \t\n\f\r]+|[ \t\n\f\r]+$', '', 'g'), '[ \t\n\f\r]+', ' ',
            'g'))
        ORDER BY page_id) AS rn
      FROM kept)
SELECT coalesce(lang, '__null__') AS lang,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
           AS ws_tokens
FROM d WHERE rn = 1 GROUP BY 1
""").replace("__PAGES__", f"{SYNTH_ROOT}/sf0.01/webpages.parquet")


def q_ivf_topk(sf_dir: str):
    """IVF-partitioned ANN (hash-paired): with n_probe = every centroid
    the pruned scan must reproduce exact brute-force cosine top-k — the
    SQL twin is the same ORDER BY list_cosine_similarity as ann_topk, so
    any vector lost by the partition/scan machinery breaks the hash.
    (Partial-probe recall behavior is covered in tests/test_similarity.py;
    on this near-random synthetic embedding table partial probes have no
    cluster structure to exploit.)"""
    import os

    import ray.data as rd

    from webval.similarity import build_ivf_index, ivf_index_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(
        [r["embedding"] for r in ds.filter(expr="vec_id == 3").take(1)],
        dtype=np.float32)
    name = os.path.basename(os.path.normpath(sf_dir))
    idx_dir = f"/tmp/webval_ivf/{name}"
    meta = build_ivf_index(ds, idx_dir, n_centroids=16, sample_size=500)
    out = ivf_index_topk(idx_dir, q, k=10, n_probe=meta["n_centroids"])
    return ds_to_table(
        out.map_batches(lambda t: t.select(["vec_id"]),
                        batch_format="pyarrow"),
        empty_schema=pa.schema([("vec_id", pa.int64())]))


def q_heavy_hitters(sf_dir: str):
    """E-family extension (hash-paired): Misra-Gries worst-offenders via
    the AggregateFnV2 path.  k=64 exceeds the lang column's cardinality,
    so the certified bounds collapse to exact counts and the SQL twin is
    the plain GROUP BY; with k below cardinality the bounds widen but stay
    certified (property-tested in tests/test_sketches.py)."""
    import ray.data as rd

    from webval.aggregates import HeavyHitters

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["lang"])
    res = ds.aggregate(HeavyHitters("lang", k=64, alias_name="hh"))
    rows = res["hh"]
    return pa.table({
        "value": pa.array([r["value"] for r in rows], pa.string()),
        "lo": pa.array([r["lo"] for r in rows], pa.int64()),
        "hi": pa.array([r["hi"] for r in rows], pa.int64())})


SQL_HEAVY_HITTERS = f"""
SELECT lang AS value, CAST(count(*) AS BIGINT) AS lo,
       CAST(count(*) AS BIGINT) AS hi
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE lang IS NOT NULL
GROUP BY lang
"""


def q_warc_read(sf_dir: str):
    """A1 family (hash-paired): the WARC source.  The synth webpages table
    is sharded into .warc.gz files once (cached beside the parquet), read
    back through webval.sources.read_warc, and summarized; the SQL twin
    computes the identical summary from the PARQUET — counts, distinct
    urls, total payload bytes and µs-exact timestamp range all survive the
    container round-trip or the hash breaks."""
    import glob
    import os

    import pyarrow.parquet as pq

    from webval.exchange import distinct_rows
    from webval.sources import read_warc, write_warc

    pages_p, _ = ensure_synth(sf_dir)
    warc_dir = os.path.join(os.path.dirname(pages_p), "warc")
    marker = os.path.join(warc_dir, "_DONE")
    if not os.path.exists(marker):
        write_warc(pq.read_table(pages_p,
                                 columns=["url", "warc_ts", "html"]),
                   warc_dir, shard_rows=5000)
        open(marker, "w").write("ok")
    paths = sorted(glob.glob(os.path.join(warc_dir, "*.warc.gz")))
    # materialize ONCE: the summary pass and the distinct-url pass then
    # both read object-store blocks instead of gunzipping+parsing every
    # shard twice (review r3 finding)
    ds = read_warc(paths).materialize()

    def partial(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("warc_ts"), pa.int64())
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "bytes": pa.array([pc.sum(pc.binary_length(
                b.column("html"))).as_py() or 0], pa.int64()),
            "ts_min": pa.array([pc.min(ts).as_py()], pa.int64()),
            "ts_max": pa.array([pc.max(ts).as_py()], pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_urls = distinct_rows(ds.select_columns(["url"]), ["url"]).count()
    mins = [r["ts_min"] for r in rows if r["ts_min"] is not None]
    maxs = [r["ts_max"] for r in rows if r["ts_max"] is not None]
    return pa.table({
        "n_records": pa.array([sum(r["n"] for r in rows)], pa.int64()),
        "n_urls": pa.array([n_urls], pa.int64()),
        "html_bytes": pa.array([sum(r["bytes"] for r in rows)], pa.int64()),
        "ts_min": pa.array([min(mins)], pa.int64()),
        "ts_max": pa.array([max(maxs)], pa.int64())})


SQL_WARC_READ = f"""
SELECT CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(sum(octet_length(html)) AS BIGINT) AS html_bytes,
       CAST(min(epoch_us(warc_ts)) AS BIGINT) AS ts_min,
       CAST(max(epoch_us(warc_ts)) AS BIGINT) AS ts_max
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE html IS NOT NULL AND url IS NOT NULL AND warc_ts IS NOT NULL
"""


def q_ngram_dup_pairs(sf_dir: str):
    """G3 direct flavor (hash-paired): all-pairs character-n-gram Jaccard
    over the documents table.  The DuckDB twin rebuilds the same distinct
    8-char shingle sets with substr() and computes exact set Jaccard.

    Oracle precondition (CHECKED, not assumed — review r3 finding): the
    engine shingles utf-8 BYTE windows while SQL substr() takes CHARACTER
    windows, so the twin is exact only for ASCII text; the query asserts
    char length == byte length on every doc so a fixture change that
    introduces multibyte text raises instead of silently hash-mismatching."""
    import ray.data as rd

    from webval.dedup import ngram_all_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def assert_ascii(b: pa.Table) -> pa.Table:
        col = b.column("text")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)), pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII docs: byte-window shingles no longer "
                "match the SQL twin's character windows")
        return b

    ds = ds.map_batches(assert_ascii, batch_format="pyarrow")
    t = ds_to_table(
        ngram_all_pairs(ds, "doc_id", "text", window=8, threshold=0.4),
        empty_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                ("jaccard", pa.float64())]))
    return _round_cols(t, {"jaccard": 4})


SQL_NGRAM_DUP_PAIRS = """
-- DuckDB range() allows neither lateral correlation nor subquery bounds,
-- so positions use a fixed ceiling (documents.text maxes at ~550 chars;
-- 8192 is a safe static bound for this fixed-size table)
WITH pos AS (SELECT CAST(i AS INT) AS i FROM range(1, 8192) t(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 8) AS g
  FROM documents, pos
  WHERE text IS NOT NULL AND length(text) >= 8 AND i <= length(text) - 7
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.4
"""


def q_media_features(sf_dir: str):
    """Multimodal plumbing (hash-paired): features must be present exactly
    for the non-null media rows — the SQL twin counts html nullity."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from webval.multimodal import MediaFeatureExtractor

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "html"])
    feats = ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                           batch_size=256, concurrency=(1, 4), max_concurrency=2,
                           fn_constructor_kwargs={"media_col": "html"})
    out = (feats.map_batches(
        lambda t: pa.table({"has_features":
                            pc.cast(pc.is_valid(t.column("features")), pa.string())}),
        batch_format="pyarrow")
        .groupby("has_features").aggregate(Count(alias_name="cnt")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("cnt"), "cnt",
                        pc.cast(t.column("cnt"), pa.int64()))


SQL_MEDIA_FEATURES = f"""
SELECT CASE WHEN html IS NULL THEN 'false' ELSE 'true' END AS has_features,
       CAST(count(*) AS BIGINT) AS cnt
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
GROUP BY 1
"""


def q_json_extract(sf_dir: str):
    """H: JSON string column parse (Python json in a map stage — Arrow 16
    has no JSON scalar kernel) + grouped sum."""
    import json as _json

    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def parse(batch: pa.Table) -> pa.Table:
        ks = [(_json.loads(p).get("k") if p is not None else None)
              for p in batch.column("props").to_pylist()]
        return pa.table({"event_type": batch.column("event_type"),
                         "k": pa.array(ks, pa.int64())})

    out = (ds.map_batches(parse, batch_format="pyarrow")
             .groupby("event_type").aggregate(Sum("k", alias_name="sum_k")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("sum_k"), "sum_k",
                        pc.cast(t.column("sum_k"), pa.int64()))


SQL_JSON_EXTRACT = """
SELECT event_type, CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def q_union_shards(sf_dir: str):
    """G1: ds.union of two filtered shards reassembles the table exactly."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    lo = ds.map_batches(lambda t: t.filter(pc.less(t.column("value"), 100.0)),
                        batch_format="pyarrow")
    hi = ds.map_batches(lambda t: t.filter(pc.greater_equal(t.column("value"), 100.0)),
                        batch_format="pyarrow")
    out = lo.union(hi).groupby("event_type").aggregate(Count(alias_name="cnt"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(t.column_names.index("cnt"), "cnt",
                        pc.cast(t.column("cnt"), pa.int64()))


SQL_UNION_SHARDS = """
SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
"""


def q_windowed_agg(sf_dir: str):
    """Tumbling-window aggregate per (event_type, hour) via the exchange
    (batch window semantics — assignment is pure row arithmetic)."""
    import ray.data as rd

    from webval.windows import tumbling_window_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    out = tumbling_window_agg(ds, "ts", [("value", "count"), ("value", "sum")],
                              size="hour", key_cols=["event_type"])
    out = out.map_batches(
        lambda t: pa.table({
            "event_type": t.column("event_type"),
            "window_start": t.column("window_start"),
            "n": pc.cast(t.column("value_count"), pa.int64()),
            "sum_value": t.column("value_sum"),
        }), batch_format="pyarrow")
    return _round_cols(ds_to_table(out), {"sum_value": 4})


SQL_WINDOWED_AGG = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(value) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_normalize_types(sf_dir: str):
    """B8: type normalization with null-on-error semantics — cast the
    fetch_ms STRING column to int64; unparseable values ("N/A") become NULL
    and are counted as cast errors.  SQL twin uses TRY_CAST."""
    import ray.data as rd

    from webval.normalize import normalize_types

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "fetch_ms"])
    out = normalize_types(ds, {"fetch_ms": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "cast_errors": pa.array(
                [pc.sum(t.column("__cast_errors__")).as_py() or 0], pa.int64()),
            "fetch_ms_sum": pa.array(
                [pc.sum(t.column("fetch_ms")).as_py() or 0], pa.int64()),
        })

    parts = ds_to_table(out.map_batches(partial, batch_format="pyarrow"))
    return pa.table({
        "n_rows": pa.array([pc.sum(parts.column("n_rows")).as_py()], pa.int64()),
        "cast_errors": pa.array([pc.sum(parts.column("cast_errors")).as_py()],
                                pa.int64()),
        "fetch_ms_sum": pa.array([pc.sum(parts.column("fetch_ms_sum")).as_py()],
                                 pa.int64()),
    })


SQL_NORMALIZE_TYPES = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN fetch_ms IS NOT NULL
                      AND TRY_CAST(fetch_ms AS BIGINT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS cast_errors,
       CAST(sum(TRY_CAST(fetch_ms AS BIGINT)) AS BIGINT) AS fetch_ms_sum
FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
""".replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_partition_nulls(sf_dir: str):
    """Per-partition null-count report (north_rule 'per-partition
    pass/fail'): the partition_profiles accumulator exchange, finalized to
    exact per-part null counts with a SQL GROUP BY twin."""
    import pickle

    import ray.data as rd

    from webval.pipelines import partition_profiles

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["part_id", "text", "lang"])
    prof = partition_profiles(ds, "part_id",
                              {"text": "text", "lang": "categorical"})
    parts, nrows, ntext, nlang = [], [], [], []
    for r in prof.take_all():  # one tiny row per partition
        accs = pickle.loads(r["acc"])
        parts.append(r["part_id"])
        nrows.append(accs["text"].moments.total)
        ntext.append(accs["text"].moments.null_count)
        nlang.append(accs["lang"].moments.null_count)
    order = np.argsort(parts)
    return pa.table({
        "part_id": pa.array(np.asarray(parts)[order], pa.int64()),
        "n_rows": pa.array(np.asarray(nrows)[order], pa.int64()),
        "null_text": pa.array(np.asarray(ntext)[order], pa.int64()),
        "null_lang": pa.array(np.asarray(nlang)[order], pa.int64()),
    })


SQL_PARTITION_NULLS = f"""
SELECT part_id, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(text) AS BIGINT) AS null_text,
       CAST(count(*) - count(lang) AS BIGINT) AS null_lang
FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
GROUP BY part_id ORDER BY part_id
""".replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_ann_index_topk(sf_dir: str):
    """Persisted multi-table LSH index: build partitioned-by-bucket parquet
    under /tmp, query with partition pruning.  Rows-only (approximate ids),
    but SELF-ASSERTING: in-query recall vs the exact brute-force top-k must
    be ≥ 0.9 or the query raises (VERDICT r2 next-6 family)."""
    import os

    import ray.data as rd

    from webval.similarity import ann_index_topk, brute_force_topk, build_ann_index

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(
        [r["embedding"] for r in ds.filter(expr="vec_id == 3").take(1)],
        dtype=np.float32)
    name = os.path.basename(os.path.normpath(sf_dir))
    idx_dir = f"/tmp/webval_ann/{name}"
    build_ann_index(ds, idx_dir, n_planes=6, n_tables=4, seed=23)
    out = ann_index_topk(idx_dir, q, k=10, multiprobe=2)
    t = ds_to_table(
        out.map_batches(lambda t: t.select(["vec_id", "rank"]),
                        batch_format="pyarrow"),
        empty_schema=pa.schema([("vec_id", pa.int64()),
                                ("rank", pa.int32())]))
    exact = {r["vec_id"] for r in brute_force_topk(ds, q, k=10).take_all()}
    got = set(t.column("vec_id").to_pylist())
    recall = len(got & exact) / max(len(exact), 1)
    # flags ARE the output (VERDICT r3 next-8 pattern): a recall or
    # result-size regression breaks the hash against the SELECT-true twin
    return pa.table({
        "recall_ok": pa.array([recall >= 0.9], pa.bool_()),
        "k_ok": pa.array([t.num_rows == 10], pa.bool_())})


SQL_ANN_INDEX_TOPK = """
SELECT true AS recall_ok, true AS k_ok
"""


_PII_DECOR_SQL = ("text || ' u' || page_id || '@ex' || (page_id % 7) || "
                  "'.org ph +1 555-010-' || (1000 + page_id % 9000)")


def q_pii_redaction(sf_dir: str):
    """PII redaction (emails + phone spans → markers) with exact counts.

    The fixture text carries no PII, so a deterministic contact line is
    appended IN-QUERY from page_id — the identical expression appears in
    the SQL twin, so both sides redact the same bytes (null text stays
    null on both: SQL || and Arrow join are null-propagating)."""
    import ray.data as rd

    from webval.textstats import EMAIL_RE, PHONE_RE, redact_pii

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "text"])

    def decorate(t: pa.Table) -> pa.Table:
        pid = t.column("page_id").to_numpy(zero_copy_only=False)
        suffix = pa.array(
            [f" u{p}@ex{p % 7}.org ph +1 555-010-{1000 + p % 9000}"
             for p in pid], pa.large_string())
        dec = pc.binary_join_element_wise(
            pc.cast(t.column("text").combine_chunks(), pa.large_string()),
            suffix, pa.scalar("", pa.large_string()))
        return pa.table({"page_id": t.column("page_id"), "text": dec})

    red = redact_pii(ds.map_batches(decorate, batch_format="pyarrow"), "text")

    def rollup(t: pa.Table) -> pa.Table:
        valid = t.filter(pc.is_valid(t.column("text")))
        return pa.table({
            "n_rows": pa.array([valid.num_rows], pa.int64()),
            "n_emails": pa.array(
                [pc.sum(valid.column("n_emails")).as_py() or 0], pa.int64()),
            "n_phones": pa.array(
                [pc.sum(valid.column("n_phones")).as_py() or 0], pa.int64()),
            "red_chars": pa.array(
                [pc.sum(pc.utf8_length(valid.column("text"))).as_py() or 0],
                pa.int64()),
        })

    parts = ds_to_table(red.map_batches(rollup, batch_format="pyarrow"))
    return pa.table({c: pa.array([pc.sum(parts.column(c)).as_py() or 0],
                                 pa.int64())
                     for c in ("n_rows", "n_emails", "n_phones", "red_chars")})


SQL_PII_REDACTION = f"""
WITH t AS (SELECT {_PII_DECOR_SQL} AS d
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')),
r AS (SELECT regexp_replace(d, '{{EMAIL}}', '[EMAIL]', 'g') AS e, d FROM t
      WHERE d IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(len(regexp_extract_all(d, '{{EMAIL}}'))) AS BIGINT) AS n_emails,
       CAST(sum(len(regexp_extract_all(e, '{{PHONE}}'))) AS BIGINT) AS n_phones,
       CAST(sum(length(regexp_replace(e, '{{PHONE}}', '[PHONE]', 'g')))
            AS BIGINT) AS red_chars
FROM r
"""
SQL_PII_REDACTION = (SQL_PII_REDACTION
                     .replace("{SYNTH_ROOT}", SYNTH_ROOT)
                     .replace("{EMAIL}", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
                     .replace("{PHONE}", r"\+?[0-9][0-9()./ -]{7,14}[0-9]"))


def q_url_canonical(sf_dir: str):
    """URL canonicalization: fragments + utm_* params stripped, query
    separator re-anchored.  Tracking decorations appended IN-QUERY from
    page_id (mirrored in the SQL twin); emits the rows whose canonical
    form differs."""
    import ray.data as rd

    from webval.textstats import canonicalize_urls

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "url"])

    def decorate(t: pa.Table) -> pa.Table:
        pid = t.column("page_id").to_numpy(zero_copy_only=False)
        sufs = []
        for p in pid:
            m = p % 4
            sufs.append(f"?utm_source=s{p % 5}" if m == 0 else
                        f"#frag{p}" if m == 1 else
                        "?a=1&utm_medium=m&b=2" if m == 2 else "")
        url = pc.binary_join_element_wise(
            t.column("url").combine_chunks(), pa.array(sufs, pa.string()),
            pa.scalar("", pa.string()))
        return pa.table({"page_id": t.column("page_id"), "url": url})

    canon = canonicalize_urls(ds.map_batches(decorate, batch_format="pyarrow"))
    out = canon.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("canon_url"),
                                        t.column("url")))
                   .select(["page_id", "canon_url"]),
        batch_format="pyarrow")
    return ds_to_table(out, empty_schema=pa.schema(
        [("page_id", pa.int64()), ("canon_url", pa.string())]))


SQL_URL_CANONICAL = """
WITH t AS (SELECT page_id, url || CASE page_id % 4
             WHEN 0 THEN '?utm_source=s' || (page_id % 5)
             WHEN 1 THEN '#frag' || page_id
             WHEN 2 THEN '?a=1&utm_medium=m&b=2'
             ELSE '' END AS url
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')),
c AS (SELECT page_id, url, regexp_replace(regexp_replace(regexp_replace(
         url, '#.*', '', 'g'), '[?&]utm_[^&]*', '', 'g'),
         '^([^?]*?)&', '\\1?') AS canon_url FROM t)
SELECT page_id, canon_url FROM c WHERE canon_url <> url
"""
SQL_URL_CANONICAL = SQL_URL_CANONICAL.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_c4_quality(sf_dir: str):
    """C4-style quality filter over the documents table: word count, mean
    word length, symbol ratio — keep thresholds mirrored in SQL (both
    sides evaluate the identical RE2 counts and IEEE divisions)."""
    import ray.data as rd

    from webval.textstats import c4_quality_filter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    kept = c4_quality_filter(ds)
    out = kept.map_batches(
        lambda t: t.select(["doc_id", "word_count", "mean_word_len",
                            "symbol_ratio"]), batch_format="pyarrow")
    return _round_cols(ds_to_table(out),
                       {"mean_word_len": 6, "symbol_ratio": 6})


SQL_C4_QUALITY = r"""
WITH f AS (SELECT doc_id,
    len(regexp_extract_all(text, '[^ \t\n\r]+')) AS wc,
    len(regexp_extract_all(text, '\p{L}')) AS letters,
    length(text) AS n,
    len(regexp_extract_all(text, '[\p{L}\p{N}\s]')) AS okc
  FROM documents WHERE text IS NOT NULL),
g AS (SELECT doc_id, wc,
    CASE WHEN wc > 0 THEN letters * 1.0 / wc ELSE 0 END AS mwl,
    CASE WHEN n > 0 THEN 1.0 - okc * 1.0 / n ELSE 0 END AS sym
  FROM f)
SELECT doc_id, CAST(wc AS BIGINT) AS word_count,
       round(mwl, 6) AS mean_word_len, round(sym, 6) AS symbol_ratio
FROM g WHERE wc >= 5 AND mwl >= 2.0 AND mwl <= 12.0 AND sym <= 0.3
"""


def q_sessionize(sf_dir: str):
    """Gap-based sessionization (30-minute gap) per user — segmented
    cumsum inside the exchange; SQL twin via lag()/sum() window
    functions."""
    import ray.data as rd

    from webval.windows import sessionize

    gap_us = 30 * 60 * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    out = sessionize(ds, ts_col="ts", by="user_id", gap_us=gap_us)
    return ds_to_table(out.map_batches(
        lambda t: t.select(["event_id", "session_seq"]),
        batch_format="pyarrow"))


SQL_SESSIONIZE = """
WITH m AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id,
       CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS session_seq
FROM m
"""


def q_interval_join(sf_dir: str):
    """Range join: every click within one hour AFTER a purchase by the
    same user, multi-match (bounded-span interval join; plain SQL range
    join twin)."""
    import ray.data as rd

    from webval.exchange import distinct_rows
    from webval.joins import interval_join

    hour_us = 3_600_000_000
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click"))
                   .select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow")
    purchases = distinct_rows(
        ev.map_batches(
            lambda t: t.filter(pc.equal(t.column("event_type"), "purchase"))
                       .select(["user_id", "ts"]),
            batch_format="pyarrow"),
        ["user_id", "ts"])

    def to_intervals(t: pa.Table) -> pa.Table:
        lo = pc.cast(t.column("ts"), pa.int64())
        return pa.table({"user_id": t.column("user_id"),
                         "lo": lo, "hi": pc.add(lo, hour_us)})

    iv = purchases.map_batches(to_intervals, batch_format="pyarrow")
    out = interval_join(clicks, iv, on="ts", lo="lo", hi="hi", by="user_id",
                        right_cols=["lo"], max_span_us=hour_us)
    return ds_to_table(
        out.map_batches(
            lambda t: pa.table({"event_id": t.column("event_id"),
                                "purchase_us": pc.cast(t.column("lo_r"),
                                                       pa.int64())}),
            batch_format="pyarrow"),
        empty_schema=pa.schema([("event_id", pa.int64()),
                                ("purchase_us", pa.int64())]))


SQL_INTERVAL_JOIN = """
WITH p AS (SELECT DISTINCT user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT c.event_id, CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us
FROM c JOIN p ON c.user_id = p.user_id
               AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
"""


def q_filtered_read(sf_dir: str):
    """A1: predicate pushdown at the READ — the filter expression reaches
    pyarrow's dataset scanner, so row groups whose column statistics
    exclude ``value > 250`` never leave storage (prune-at-the-read)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"],
                         filter=(pads.field("value") > 250.0))

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "s": pa.array([pc.sum(t.column("value")).as_py() or 0.0],
                          pa.float64())})

    parts = ds_to_table(ds.map_batches(partial, batch_format="pyarrow"))
    total = pc.sum(parts.column("s")).as_py() or 0.0
    return pa.table({
        "n": pa.array([pc.sum(parts.column("n")).as_py() or 0], pa.int64()),
        "sum_value": pa.array([float(f"{total:.4f}")], pa.float64())})


SQL_FILTERED_READ = """
SELECT CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
FROM events WHERE value > 250.0
"""


def q_asof_join(sf_dir: str):
    """Custom operator: backward-inclusive as-of join — each click event
    matched to the user's latest prior-or-equal purchase (DuckDB ASOF LEFT
    JOIN twin).  Timestamps emitted as epoch µs with -1 for no-match so
    both sides stringify identically."""
    import ray.data as rd

    from webval.joins import asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click"))
                   .select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow")
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "purchase"))
                   .select(["user_id", "ts"])
                   .group_by(["user_id", "ts"]).aggregate([]),
        batch_format="pyarrow")
    from webval.exchange import distinct_rows
    purchases = distinct_rows(purchases, ["user_id", "ts"])
    out = asof_join(clicks, purchases, on="ts", by="user_id")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "purchase_us": pc.fill_null(
                pc.cast(t.column("ts_r"), pa.int64()), -1),
        })

    return ds_to_table(out.map_batches(finish, batch_format="pyarrow"))


SQL_ASOF_JOIN = """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
r AS (SELECT DISTINCT user_id, ts FROM events
      WHERE event_type = 'purchase')
SELECT l.event_id,
       COALESCE(CAST(epoch_us(r.ts) AS BIGINT), -1) AS purchase_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_grouped_quantiles(sf_dir: str):
    """E8 + E4/E5: mergeable sketches inside ds.groupby().aggregate() via
    the AggregateFnV2 wrappers (per-lang p50 length + distinct docs).

    Self-asserting (VERDICT r2 next-6): every t-digest p50 is bounded by
    the group's EXACT 45th/55th percentiles, computed directly from the
    (500-row, fixed-size) documents table — a digest regression raises
    instead of returning plausible numbers."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webval.aggregates import ApproxDistinct, TDigestQuantile

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars", "doc_id"])
    out = ds.groupby("lang").aggregate(
        TDigestQuantile("n_chars", q=0.5, alias_name="p50_chars"),
        ApproxDistinct("doc_id", alias_name="distinct_docs"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    # exact-rank bound oracle (documents is 500 rows at every sf — this
    # read is the assertion, not the compute path).  The flags ARE the
    # output (VERDICT r3 next-8): a digest/HLL regression flips a boolean
    # and breaks the hash against the per-lang SELECT-true twin.  GATED
    # (VERDICT r4 wrong-1): above EXACT_ORACLE_MAX_ROWS the driver-side
    # pandas read is skipped and the flags report un-falsified (true) —
    # the production aggregate stands alone.
    if not exact_oracle_enabled(ds.count()):
        langs = [v for v in t.column("lang").to_pylist() if v is not None]
        flags = [True] * len(langs)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "p50_in_band": pa.array(flags, pa.bool_()),
                         "distinct_in_band": pa.array(flags, pa.bool_())})
    full = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars", "doc_id"]).to_pandas()
    exact = full.dropna(subset=["lang", "n_chars"]).groupby("lang")["n_chars"]
    lo = exact.quantile(0.45)
    hi = exact.quantile(0.55)
    exact_distinct = full.dropna(subset=["lang"]).groupby("lang")["doc_id"] \
        .nunique()
    langs, p50_ok, distinct_ok = [], [], []
    for lang, p50, dd in zip(t.column("lang").to_pylist(),
                             t.column("p50_chars").to_pylist(),
                             t.column("distinct_docs").to_pylist()):
        if lang is None or lang not in lo.index:
            continue  # the pandas oracle dropna'd these groups (review r3)
        langs.append(lang)
        p50_ok.append(bool(lo[lang] - 1e-9 <= p50 <= hi[lang] + 1e-9))
        distinct_ok.append(
            bool(abs(dd - exact_distinct[lang])
                 <= 0.03 * max(exact_distinct[lang], 1)))
    return pa.table({"lang": pa.array(langs, pa.string()),
                     "p50_in_band": pa.array(p50_ok, pa.bool_()),
                     "distinct_in_band": pa.array(distinct_ok, pa.bool_())})


SQL_GROUPED_QUANTILES = """
SELECT lang, true AS p50_in_band, true AS distinct_in_band
FROM (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL)
"""


def q_sampled_profile(sf_dir: str):
    """F3: schema build on the membership-exact deterministic sample
    (VERDICT r3 next-5: upgraded from a seeded random_sample rows-only
    check to the Knuth-hash sampler, whose membership is the identical
    ANSI-SQL predicate — the twin reproduces the exact sample, so rows,
    schema AND value hash are driver-checkable).  Row id = l_orderkey*10 +
    l_linenumber (linenumber ≤ 7 → injective; far below the 2^63/2654435761
    SQL-overflow bound).  Self-asserts the fraction stays ~10%."""
    import ray.data as rd

    from webval.pipelines import build_schema

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])
    total = ds.count()

    def add_rid(t: pa.Table) -> pa.Table:
        rid = pc.add(pc.multiply(pc.cast(t.column("l_orderkey"), pa.int64()),
                                 pa.scalar(10, pa.int64())),
                     pc.cast(t.column("l_linenumber"), pa.int64()))
        return t.append_column("rid", rid)

    ds = ds.map_batches(add_rid, batch_format="pyarrow")
    spec = build_schema(ds, {"l_quantity": "numeric"}, histogram=False,
                        sample_fraction=0.1, sample_id_col="rid")
    p = spec.column("l_quantity")
    if abs(p.count / total - 0.1) > 0.02:
        raise AssertionError(f"sample fraction {p.count}/{total} not ~10%")
    t = pa.table({
        "sampled_rows": pa.array([p.count], pa.int64()),
        "min_qty": pa.array([p.moments["min"]], pa.float64()),
        "max_qty": pa.array([p.moments["max"]], pa.float64()),
        "mean_qty": pa.array([p.moments["sum"] / p.moments["count"]],
                             pa.float64())})
    return _round_cols(t, {"min_qty": 4, "max_qty": 4, "mean_qty": 4})


SQL_SAMPLED_PROFILE = """
WITH s AS (
  SELECT l_quantity
  FROM lineitem
  WHERE ((l_orderkey * 10 + l_linenumber) * 2654435761) % 4294967296
        < CAST(0.1 * 4294967296 AS BIGINT)
)
SELECT CAST(count(*) AS BIGINT) AS sampled_rows,
       round(min(l_quantity), 4) AS min_qty,
       round(max(l_quantity), 4) AS max_qty,
       round(avg(l_quantity), 4) AS mean_qty
FROM s
"""


# -- round-3 relational/curation additions ----------------------------------


def q_grouped_exact_quantiles(sf_dir: str):
    """E4/E8 exact path: per-group discrete quantiles through the exchange
    (shuffle carries (key, value) only; DuckDB quantile_disc semantics —
    index ceil(q*n)-1 on the non-null ascending values)."""
    import ray.data as rd

    from webval.rank import grouped_exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    out = grouped_exact_quantiles(ds, "lang", "n_chars",
                                  {"p50": 0.5, "p90": 0.9, "p99": 0.99})
    return ds_to_table(out).sort_by("lang")


SQL_GROUPED_EXACT_QUANTILES = """
SELECT lang, quantile_disc(n_chars, 0.5) AS p50,
       quantile_disc(n_chars, 0.9) AS p90,
       quantile_disc(n_chars, 0.99) AS p99
FROM documents WHERE n_chars IS NOT NULL GROUP BY lang
"""


def q_grouped_cont_quantiles(sf_dir: str):
    """F/E8: exact CONTINUOUS (linear-interpolated) per-group quantiles —
    percentile_cont semantics, DuckDB quantile_cont twin."""
    import ray.data as rd

    from webval.rank import grouped_exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    out = grouped_exact_quantiles(
        ds, "l_returnflag", "l_extendedprice",
        {"p25": 0.25, "p50": 0.5, "p90": 0.9}, interpolate=True)
    return _round_cols(ds_to_table(out), {"p25": 6, "p50": 6, "p90": 6})


SQL_GROUPED_CONT_QUANTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
FROM lineitem WHERE l_extendedprice IS NOT NULL
GROUP BY l_returnflag
"""


def q_top_docs_per_lang(sf_dir: str):
    """F2 per-group: top-3 longest docs per lang, deterministic doc_id
    tie-break — exact row_number() OVER (PARTITION BY ...) <= k semantics
    with a per-batch top-k combiner before the shuffle."""
    import ray.data as rd

    from webval.rank import top_k_per_group

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "doc_id", "n_chars"])
    out = top_k_per_group(ds, "lang", "n_chars", 3, tie_cols=["doc_id"])
    return ds_to_table(out).sort_by([("lang", "ascending"),
                                     ("doc_id", "ascending")])


SQL_TOP_DOCS_PER_LANG = """
SELECT lang, doc_id, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) <= 3
"""


def q_revenue_by_region(sf_dir: str):
    """D-family broadcast INNER join: lineitem (big side, streamed) against
    a supplier→nation→region dimension built driver-side (130 rows) and
    ray.put ONCE — no shuffle touches the fact table."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from webval.broadcast import broadcast_join

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    dim = (sup.join(nat, keys="s_nationkey", right_keys="n_nationkey")
              .join(reg, keys="n_regionkey", right_keys="r_regionkey")
              .select(["s_suppkey", "r_name"])
              .rename_columns(["l_suppkey", "r_name"]))

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    joined = broadcast_join(ds, dim, "l_suppkey")

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"r_name": t.column("r_name"), "rev": rev})

    out = (joined.map_batches(add_rev, batch_format="pyarrow")
                 .groupby("r_name")
                 .aggregate(Count(alias_name="n"),
                            Sum("rev", alias_name="revenue")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = _round_cols(t, {"revenue": 2})
    return t.set_column(t.column_names.index("n"), "n",
                        pc.cast(t.column("n"), pa.int64()))


SQL_REVENUE_BY_REGION = """
SELECT r_name, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_hash_sample(sf_dir: str):
    """F3 reproducible sampling: Knuth-multiplicative-hash membership on
    event_id — the SAME predicate runs in SQL, so membership (not just the
    rate) is verified exactly.  10% of events, summarized per type."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from webval.pipelines import deterministic_sample

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    out = (deterministic_sample(ds, "event_id", 0.1)
           .groupby("event_type")
           .aggregate(Count(alias_name="n"),
                      Sum("value", alias_name="sum_value")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = _round_cols(t, {"sum_value": 4})
    return t.set_column(t.column_names.index("n"), "n",
                        pc.cast(t.column("n"), pa.int64()))


SQL_HASH_SAMPLE = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
WHERE (event_id * 2654435761) % 4294967296 < 429496729
GROUP BY event_type
"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed k-means over the embeddings table (rows-only: no SQL can
    run Lloyd's).  Self-asserting on the mathematically guaranteed
    invariant — inertia strictly improves from the k-means++ init to the
    fitted centroids, and every row lands on its exact nearest centroid
    (driver recompute over the fixed-size table IS the assertion oracle,
    not the compute path).  The blob-recovery / parallelism-determinism
    properties are pytest-covered (tests/test_clustering.py)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webval.clustering import (_assign, _matrix_of, _plusplus_init,
                                   kmeans_assign, kmeans_fit)

    k, seed = 8, 5
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cents = kmeans_fit(ds, "embedding", k, seed=seed, n_iter=15)
    assigned = ds_to_table(kmeans_assign(ds, "embedding", cents))

    # assertion oracle: exact recompute on the (500-row) table
    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    x = _matrix_of(full.column("embedding"))
    init = _plusplus_init(x, k, seed)  # limit(4096) >= table ⇒ same sample

    def inertia(c):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return float(d2.min(axis=1).sum())

    init_inertia, fit_inertia = inertia(init), inertia(cents)
    # both sides in vec_id order before comparing
    got = (assigned.sort_by("vec_id").column("cluster")
           .to_numpy(zero_copy_only=False))
    order = np.argsort(full.column("vec_id").to_numpy(zero_copy_only=False))
    want = _assign(x, cents)[order]
    # invariant flags ARE the output (VERDICT r3 next-8 pattern): a Lloyd's
    # or assignment regression flips a boolean and breaks the hash against
    # the twin (which also contributes the exact row count)
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n_rows": pa.array([len(got)], pa.int64()),
        "inertia_improved": pa.array(
            [bool(fit_inertia < init_inertia)], pa.bool_()),
        "assignment_exact": pa.array(
            [bool(np.array_equal(got, want))], pa.bool_())})


SQL_KMEANS_CLUSTERS = """
SELECT CAST(8 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_rows,
       true AS inertia_improved, true AS assignment_exact
FROM embeddings
"""


def q_orders_by_segment(sf_dir: str):
    """D-family large×large equi-join through the exchange: orders ⋈
    customer on custkey (neither side broadcast — both streams co-bucketed
    on the key hash, Arrow C++ hash join per bucket), then a small
    market-segment rollup.  The same equi_join also provides scalable
    semi/anti modes (referential orphans when the parent side outgrows a
    Bloom broadcast)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from webval.joins import equi_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    joined = equi_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       how="inner")
    out = (joined.groupby("c_mktsegment")
                 .aggregate(Count(alias_name="n"),
                            Sum("o_totalprice", alias_name="total")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = _round_cols(t, {"total": 2})
    return t.set_column(t.column_names.index("n"), "n",
                        pc.cast(t.column("n"), pa.int64()))


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_rollup_lineitem(sf_dir: str):
    """E8 hierarchical aggregate: GROUP BY ROLLUP(returnflag, linestatus)
    — finest level scans the input once through the exchange; coarser
    levels re-aggregate the previous level's grouped output (raw data read
    exactly once regardless of hierarchy depth)."""
    import ray.data as rd

    from webval.relational import rollup_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity"])
    out = rollup_agg(ds, ["l_returnflag", "l_linestatus"],
                     [("l_quantity", "sum"), ("l_quantity", "count")])
    t = ds_to_table(out).sort_by([("l_returnflag", "ascending"),
                                  ("l_linestatus", "ascending")])
    return _round_cols(t, {"l_quantity_sum": 2})


SQL_ROLLUP_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS l_quantity_sum,
       count(l_quantity) AS l_quantity_count
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_distinct_suppliers_by_flag(sf_dir: str):
    """E8/G: exact count(DISTINCT) per group at any cardinality — (key,
    val) pairs deduped through one exchange, counted through a second."""
    import ray.data as rd

    from webval.exchange import grouped_distinct_count

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_suppkey"])
    return ds_to_table(grouped_distinct_count(ds, "l_returnflag",
                                              "l_suppkey"))


SQL_DISTINCT_SUPPLIERS = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_distinct
FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag
"""


def q_fixed_size_sample(sf_dir: str):
    """F3: exactly-n deterministic sample — the n smallest multiplicative
    hashes of the id, tie-broken by id; per-batch top-n combiner +
    fan-in-64 tree, membership reproduced exactly by the SQL ORDER BY
    hash LIMIT n twin."""
    import ray.data as rd

    from webval.pipelines import fixed_size_sample

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_quantity"])
    # lineitem has no single unique int id; synthesize one deterministically
    ds = ds.map_batches(
        lambda t: t.append_column(
            "li_id", pc.add(pc.multiply(t.column("l_orderkey"), 8),
                            t.column("l_linenumber"))),
        batch_format="pyarrow")
    out = fixed_size_sample(ds, "li_id", 1000)
    return ds_to_table(out.map_batches(
        lambda t: t.select(["li_id", "l_quantity"]),
        batch_format="pyarrow"))


SQL_FIXED_SIZE_SAMPLE = """
SELECT (l_orderkey * 8 + l_linenumber) AS li_id, l_quantity
FROM lineitem
ORDER BY (li_id * 2654435761) % 4294967296, li_id
LIMIT 1000
"""


def q_stratified_sample(sf_dir: str):
    """F3 extension: per-stratum deterministic hash sampling — downsample
    dominant languages, keep rare ones whole; membership is a pure
    function of (doc_id, lang fraction), so the SQL twin reproduces it
    EXACTLY (same multiplicative-hash predicate per stratum)."""
    import ray.data as rd

    from webval.pipelines import stratified_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"])
    out = stratified_sample(ds, "doc_id", "lang",
                            {"en": 0.25, "de": 0.5, "nl": 1.0},
                            default=0.1)
    return ds_to_table(out)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source FROM documents
WHERE (doc_id * 2654435761) % 4294967296 <
      CASE lang WHEN 'en' THEN CAST(0.25 * 4294967296 AS BIGINT)
                WHEN 'de' THEN CAST(0.5 * 4294967296 AS BIGINT)
                WHEN 'nl' THEN CAST(1.0 * 4294967296 AS BIGINT)
                ELSE CAST(0.1 * 4294967296 AS BIGINT) END
"""


def q_boilerplate_removal(sf_dir: str):
    """CCNet-style corpus line dedup over the documents table (delimiter
    = ' ' so every word acts as a 'line'): tokens appearing in >= 300 of
    the 500 docs are boilerplate and dropped from every doc.  Hash-only
    shuffle + broadcast frequent set; SQL twin via unnest + list_filter."""
    import ray.data as rd

    from webval.textclean import remove_boilerplate_lines

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = remove_boilerplate_lines(ds, "doc_id", "text", min_docs=300,
                                   delimiter=" ")
    return ds_to_table(out)


SQL_BOILERPLATE_REMOVAL = """
WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS line
           FROM documents),
freq AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS c
                           FROM l GROUP BY line) WHERE c >= 300),
fl AS (SELECT coalesce(list(line), []) AS ls FROM freq)
SELECT d.doc_id,
       coalesce(list_aggr(list_filter(string_split(d.text, ' '),
                                      x -> NOT list_contains(fl.ls, x)),
                          'string_agg', ' '), '') AS clean_text,
       CAST(len(string_split(d.text, ' '))
            - len(list_filter(string_split(d.text, ' '),
                              x -> NOT list_contains(fl.ls, x)))
            AS BIGINT) AS n_removed
FROM documents d CROSS JOIN fl
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style within-doc repetition metrics (duplicate-'line'
    count/char fraction + top overlapping 2-gram coverage), one shuffle-
    free vectorized pass; exact SQL twin via unnest / list_transform."""
    import ray.data as rd

    from webval.textclean import repetition_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    t = ds_to_table(repetition_stats(ds, "doc_id", "text", delimiter=" "))
    # exact integers (dup_chars/total_chars) instead of the rounded ratio:
    # the ratio can land on an exact decimal tie where SQL's
    # half-away-from-zero and binary half-even disagree
    return t.drop_columns(["dup_char_frac"])


SQL_DOC_REPETITION = """
WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS line
           FROM documents),
per AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
        FROM l GROUP BY doc_id, line),
lm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
              CAST(sum(c - 1) AS BIGINT) AS n_dup_lines,
              CAST(sum((c - 1) * len) AS BIGINT) AS dup_chars,
              CAST(sum(c * len) AS BIGINT) AS total_chars
       FROM per GROUP BY doc_id),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1])) AS b
       FROM w),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
bm AS (SELECT doc_id, CAST(max(c * length(b)) AS BIGINT)
                  AS top_bigram_chars
       FROM bc GROUP BY doc_id)
SELECT lm.doc_id, lm.n_lines, lm.n_dup_lines, lm.dup_chars,
       lm.total_chars, bm.top_bigram_chars
FROM lm LEFT JOIN bm ON lm.doc_id = bm.doc_id
"""


def q_contamination(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing any 8-char
    shingle with a (deliberately leaked) eval set — the first 64 chars of
    docs 3 and 7 plus one unleaked probe.  Eval shingles broadcast once;
    docs probed via searchsorted over Arrow-buffer rolling hashes.  Exact
    DuckDB twin via substr shingles (ASCII precondition asserted, same as
    ngram_dup_pairs)."""
    import ray.data as rd

    from webval.textclean import contamination_check

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def assert_ascii(b: pa.Table) -> pa.Table:
        col = b.column("text")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)), pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII docs: byte-window shingles no longer "
                "match the SQL twin's character windows")
        return b

    ds = ds.map_batches(assert_ascii, batch_format="pyarrow")
    leaked = {r["doc_id"]: r["text"][:64] for r in ds.take_all()
              if r["doc_id"] in (3, 7)}
    eval_texts = [leaked[3], leaked[7], "zz unleaked probe text zz"]
    return ds_to_table(contamination_check(ds, "doc_id", "text",
                                           eval_texts=eval_texts, window=8))


SQL_CONTAMINATION = """
WITH pos AS (SELECT CAST(i AS INT) AS i FROM range(1, 8192) t(i)),
ev AS (SELECT substr(text, 1, 64) AS t FROM documents WHERE doc_id IN (3, 7)
       UNION ALL SELECT 'zz unleaked probe text zz'),
evsh AS (SELECT DISTINCT substr(t, i, 8) AS g FROM ev, pos
         WHERE length(t) >= 8 AND i <= length(t) - 7),
dsh AS (SELECT DISTINCT doc_id, substr(text, i, 8) AS g
        FROM documents, pos
        WHERE text IS NOT NULL AND length(text) >= 8
          AND i <= length(text) - 7),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
hits AS (SELECT doc_id, count(*) AS c FROM dsh JOIN evsh USING (g)
         GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(s.n, 0) AS n_shingles,
       coalesce(h.c, 0) AS n_contaminated,
       coalesce(h.c, 0) > 0 AS contaminated
FROM documents d
LEFT JOIN sizes s ON d.doc_id = s.doc_id
LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def q_pca_embeddings(sf_dir: str):
    """Distributed exact PCA over the embeddings table (one streaming
    (n, Σx, XᵀX) pass, driver eigh of the d×d covariance).  Twice-checked
    (r3s4: was rows-only): in-query the components must match an exact
    in-memory numpy PCA to 1e-6, be orthonormal, and project variance
    equal to the eigenvalues; the HASHED output is the upper triangle of
    the model's sample covariance, whose SQL twin is covar_samp over
    every dimension pair — the matrix the eigendecomposition consumed."""
    import ray.data as rd

    from webval.clustering import pca_fit, pca_transform

    k = 8
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    model = pca_fit(ds, "embedding", k)

    # orthonormality is cheap (k×k on the driver) — always asserted
    g = model["components"] @ model["components"].T
    assert np.abs(g - np.eye(k)).max() < 1e-10, "components not orthonormal"
    # exact oracle (embeddings table is driver-small at every sf) — GATED
    # (VERDICT r4 wrong-1): above EXACT_ORACLE_MAX_ROWS neither the driver
    # np.stack nor the full-projection variance check runs; the output
    # below comes from the streaming-fit model alone either way.
    if exact_oracle_enabled(ds.count()):
        x = np.stack(ds.to_pandas().sort_values("vec_id")["embedding"]
                     .to_numpy()).astype(np.float64)
        cov = np.cov(x, rowvar=False)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:k]
        for i, ci in enumerate(order):
            v, got = evecs[:, ci], model["components"][i]
            assert min(np.abs(got - v).max(), np.abs(got + v).max()) < 1e-6, \
                f"pca component {i} deviates from the exact oracle"
        y = np.stack(pca_transform(ds, "embedding", model).to_pandas()["pc"]
                     .to_numpy())
        assert np.allclose(np.var(y, axis=0, ddof=1),
                           model["explained_variance"], rtol=1e-3), \
            "projection variance != eigenvalues"
    cov = model["cov"]
    d = cov.shape[0]
    iu, ju = np.triu_indices(d)
    out = pa.table({
        "i": pa.array((iu + 1).astype(np.int64)),
        "j": pa.array((ju + 1).astype(np.int64)),
        "cov": pa.array(cov[iu, ju], pa.float64()),
    })
    return _round_cols(out, {"cov": 6})


SQL_PCA_EMBEDDINGS = """
WITH p AS (SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j
           FROM range(1, 65) r(i), range(1, 65) q(j) WHERE j >= i)
SELECT p.i, p.j,
       round(covar_samp(CAST(e.embedding[CAST(p.i AS INT)] AS DOUBLE),
                        CAST(e.embedding[CAST(p.j AS INT)] AS DOUBLE)),
             6) AS cov
FROM embeddings e CROSS JOIN p GROUP BY p.i, p.j
"""


def q_chunk_text(sf_dir: str):
    """Training-data passage chunking: sliding 32-token windows with
    8-token overlap over every document (flat_map shape, pure Arrow/numpy
    gather over list offsets); the SQL twin re-derives every chunk via
    range + list_slice."""
    import ray.data as rd

    from webval.textclean import chunk_text

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds_to_table(chunk_text(ds, "doc_id", "text",
                                  window=32, overlap=8))


SQL_CHUNK_TEXT = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (SELECT doc_id, ws,
             unnest(range(0, greatest(len(ws) - 8, 1), 24)) AS st
      FROM w)
SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(ws, st + 1, st + 32), ' ') AS chunk_text,
       CAST(len(list_slice(ws, st + 1, st + 32)) AS BIGINT) AS n_tokens
FROM s
"""


def q_curation_v2(sf_dir: str):
    """Flagship web-text curation COMPOSITE: corpus boilerplate-line
    removal → repetition filter on the cleaned text (≤1/4 of chars in
    repeated tokens, exact integer cross-multiplication) → 32-token
    chunking with 8-token overlap — one streaming pipeline, one SQL twin
    for the whole composition."""
    import ray.data as rd

    from webval.textclean import curate_web_text

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = curate_web_text(ds, "doc_id", "text", min_docs=300,
                          window=32, overlap=8, delimiter=" ")
    return ds_to_table(out)


SQL_CURATION_V2 = """
WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS line
           FROM documents),
freq AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS c
                           FROM l GROUP BY line) WHERE c >= 300),
fl AS (SELECT coalesce(list(line), []) AS ls FROM freq),
clean AS (SELECT doc_id,
          coalesce(list_aggr(list_filter(string_split(text, ' '),
                                         x -> NOT list_contains(fl.ls, x)),
                             'string_agg', ' '), '') AS ct
          FROM documents CROSS JOIN fl),
per AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
        FROM (SELECT doc_id, unnest(string_split(ct, ' ')) AS line
              FROM clean) GROUP BY doc_id, line),
rep AS (SELECT doc_id, CAST(sum((c - 1) * len) AS BIGINT) AS dup,
               CAST(sum(c * len) AS BIGINT) AS tot
        FROM per GROUP BY doc_id),
kept AS (SELECT clean.doc_id, ct FROM clean
         JOIN rep ON clean.doc_id = rep.doc_id WHERE dup * 4 <= tot),
w AS (SELECT doc_id, string_split(ct, ' ') AS ws FROM kept),
s AS (SELECT doc_id, ws,
             unnest(range(0, greatest(len(ws) - 8, 1), 24)) AS st
      FROM w)
SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(ws, st + 1, st + 32), ' ') AS chunk_text,
       CAST(len(list_slice(ws, st + 1, st + 32)) AS BIGINT) AS n_tokens
FROM s
"""


def q_corr_by_returnflag(sf_dir: str):
    """E-family cross-column stat: exact per-group Pearson correlation of
    quantity vs extendedprice — co-moment sums ride the exchange with
    per-batch combiners (mergeable by addition), plus the global corr from
    the same 6-number partials."""
    import ray.data as rd

    from webval.aggregates import corr_of, grouped_corr

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    out = grouped_corr(ds, "l_returnflag", "l_quantity", "l_extendedprice")
    t = ds_to_table(out)
    g = corr_of(ds, "l_quantity", "l_extendedprice")
    t = t.append_column("corr_global",
                        pa.array([g] * t.num_rows, pa.float64()))
    return _round_cols(t, {"corr": 6, "corr_global": 6})


SQL_CORR_BY_RETURNFLAG = """
SELECT l_returnflag,
       count(*) FILTER (l_quantity IS NOT NULL
                        AND l_extendedprice IS NOT NULL) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr,
       round((SELECT corr(l_quantity, l_extendedprice) FROM lineitem), 6)
           AS corr_global
FROM lineitem GROUP BY l_returnflag
"""


def q_intersect_custkeys(sf_dir: str):
    """G-family set op: SQL INTERSECT — customer keys that also appear as
    order custkeys (distinct, co-bucketed exchange with per-batch dedup
    combiners)."""
    import ray.data as rd

    from webval.relational import intersect_distinct

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"]) \
               .map_batches(lambda t: t.rename_columns(["c_custkey"]),
                            batch_format="pyarrow")
    return ds_to_table(intersect_distinct(cust, orders, ["c_custkey"]))


SQL_INTERSECT_CUSTKEYS = """
SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders
"""


def q_except_orderkeys(sf_dir: str):
    """G-family set op: SQL EXCEPT — order keys with no lineitem rows
    (non-empty on this fixture; the set-difference dual of the
    referential anti-join)."""
    import ray.data as rd

    from webval.relational import except_distinct

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"]) \
           .map_batches(lambda t: t.rename_columns(["o_orderkey"]),
                        batch_format="pyarrow")
    return ds_to_table(except_distinct(orders, li, ["o_orderkey"]))


SQL_EXCEPT_ORDERKEYS = """
SELECT o_orderkey FROM orders EXCEPT SELECT l_orderkey FROM lineitem
"""


def q_cube_orders(sf_dir: str):
    """E8 multidimensional aggregate: GROUP BY CUBE(orderstatus,
    orderpriority) — 2^k grouping sets, every non-finest set derived from
    the finest level's grouped output (one raw scan)."""
    import ray.data as rd

    from webval.relational import cube_agg

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])
    out = cube_agg(ds, ["o_orderstatus", "o_orderpriority"],
                   [("o_totalprice", "sum"), ("o_totalprice", "count")])
    t = ds_to_table(out)
    return _round_cols(t, {"o_totalprice_sum": 2})


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS o_totalprice_sum,
       count(o_totalprice) AS o_totalprice_count
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(sf_dir: str):
    """E8: arbitrary GROUPING SETS — per (status), per (priority), and the
    grand total, all derived from one raw scan's finest grouping."""
    import ray.data as rd

    from webval.relational import grouping_sets_agg

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])
    out = grouping_sets_agg(
        ds, [["o_orderstatus"], ["o_orderpriority"], []],
        [("o_totalprice", "sum"), ("o_totalprice", "count")])
    return _round_cols(ds_to_table(out), {"o_totalprice_sum": 2})


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS o_totalprice_sum,
       count(o_totalprice) AS o_totalprice_count
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_pivot_chars_by_lang(sf_dir: str):
    """E8/wide reshape: per-source character totals pivoted to one column
    per language (declared column set — fixed output schema keeps the
    operator streaming-safe; SQL twin is FILTER-style conditional
    aggregation)."""
    import ray.data as rd

    from webval.relational import pivot_wider

    langs = ["de", "en", "es", "fr", "zh"]
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang", "n_chars"])
    out = pivot_wider(ds, "source", "lang", "n_chars", values=langs,
                      agg="sum", fill=0)
    return ds_to_table(out).sort_by([("source", "ascending")])


SQL_PIVOT_CHARS_BY_LANG = """
SELECT source,
       CAST(coalesce(sum(n_chars) FILTER (lang = 'de'), 0) AS BIGINT) AS "de",
       CAST(coalesce(sum(n_chars) FILTER (lang = 'en'), 0) AS BIGINT) AS "en",
       CAST(coalesce(sum(n_chars) FILTER (lang = 'es'), 0) AS BIGINT) AS "es",
       CAST(coalesce(sum(n_chars) FILTER (lang = 'fr'), 0) AS BIGINT) AS "fr",
       CAST(coalesce(sum(n_chars) FILTER (lang = 'zh'), 0) AS BIGINT) AS "zh"
FROM documents GROUP BY source
"""


def q_tfidf_top_terms(sf_dir: str):
    """Distributed TF-IDF (corpus statistics without driver state): doc-term
    counts → exchange DF count → large×large term join → per-doc top-k with
    a per-batch combiner.  Tokenizer is RE2 [^a-z0-9]+ on lowered text —
    byte-identical to the SQL twin's regexp_split_to_array."""
    import ray.data as rd

    from webval.tfidf import tfidf_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = tfidf_topk(ds, "doc_id", "text", 3)
    return (ds_to_table(out)
            .select(["doc_id", "term", "tf", "df", "tfidf"])
            .sort_by([("doc_id", "ascending"), ("term", "ascending")]))


SQL_TFIDF_TOP_TERMS = """
WITH terms AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
        FROM documents) WHERE t <> ''
), tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT doc_id, term, tf, df, round(tf * ln(n.n / df), 6) AS tfidf
FROM tf JOIN df USING (term), n
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, term) <= 3
"""


def q_link_components(sf_dir: str):
    """Connected components of the link graph (min-label propagation over
    the exchange).  Twice-checked (r3s4: was rows-only): in-query the full
    labeling must equal a driver union-find exactly, AND the returned
    component-size distribution (label-invariant) hashes against a DuckDB
    WITH RECURSIVE reachability twin."""
    import ray.data as rd

    from webval.graph import connected_components
    from webval.sketches import hash64

    pages, links = ensure_synth(sf_dir)
    ds = rd.read_parquet(links)

    def to_ids(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.array(hash64(t.column("src_url").to_numpy(
                zero_copy_only=False)).astype(np.int64)),
            "dst": pa.array(hash64(t.column("dst_url").to_numpy(
                zero_copy_only=False)).astype(np.int64)),
        })

    edges = ds.map_batches(to_ids, batch_format="pyarrow")
    comps = connected_components(edges, "src", "dst").materialize()

    # exact oracle: driver union-find over the same hashed edge list —
    # GATED (VERDICT r4 wrong-1): above EXACT_ORACLE_MAX_ROWS edges,
    # neither the edge list nor the labeling concentrates on the driver
    if exact_oracle_enabled(ds.count()):
        got = comps.to_pandas()
        e = edges.to_pandas()
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(e["src"], e["dst"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        got_map = dict(zip(got["id"], got["component"]))
        assert got_map == want, "distributed CC != driver union-find"

    # size distribution computed DISTRIBUTED (two count exchanges:
    # component -> size, size -> n_components); output is tiny either way
    from webval.exchange import grouped_count

    sz = grouped_count(comps, "component", out_col="component_size")
    dist = grouped_count(sz.select_columns(["component_size"]),
                         "component_size", out_col="n_components")
    return ds_to_table(dist).sort_by("component_size")


def q_pagerank_links(sf_dir: str):
    """Iterative PageRank over the synthetic link graph.  Twice-checked:
    in-query the distributed ranks must match the exact in-memory power
    method (webval.graph.pagerank_reference) to 1e-10 and sum to 1, AND
    the driver hashes the top-10 against a DuckDB twin that unrolls the
    8 power iterations as chained CTEs (r3s4: was rows-only)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webval.graph import pagerank, pagerank_reference

    _pages, links_p = ensure_synth(sf_dir)
    edges = rd.read_parquet(links_p)
    ranks = ds_to_table(pagerank(edges, "src_url", "dst_url", n_iter=8))

    full = pq.read_table(links_p)
    nodes, want = pagerank_reference(
        full.column("src_url").to_numpy(zero_copy_only=False),
        full.column("dst_url").to_numpy(zero_copy_only=False), n_iter=8)
    got_t = ranks.sort_by([("node", "ascending")])
    got = got_t.column("rank").to_numpy(zero_copy_only=False)
    if not np.array_equal(
            got_t.column("node").to_numpy(zero_copy_only=False), nodes):
        raise AssertionError("pagerank node set != reference")
    if np.abs(got - want).max() > 1e-10:
        raise AssertionError(
            f"pagerank diverged from reference by {np.abs(got - want).max()}")
    if abs(float(got.sum()) - 1.0) > 1e-9:
        raise AssertionError(f"ranks sum to {got.sum()}, not 1")
    top = ranks.sort_by([("rank", "descending"),
                         ("node", "ascending")]).slice(0, 10)
    out = pa.table({
        "node": top.column("node"),
        "rank_e6": pc.multiply(top.column("rank"), 1e6)})
    return _round_cols(out, {"rank_e6": 3})


def _sql_pagerank(n_iter: int = 8, damping: float = 0.85) -> str:
    """The power iteration unrolled as chained CTEs — one layer per
    iteration, each reproducing exactly webval.graph.pagerank's update:
    r(v) = (1−d)/n + d·dangling/n + d·Σ_{s→v} r(s)/outdeg(s)."""
    links = f"read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')"
    layers = [f"""
nodes AS (SELECT DISTINCT node FROM (
  SELECT src_url AS node FROM {links}
  UNION ALL SELECT dst_url FROM {links})),
deg AS (SELECT n.node, coalesce(d.c, 0) AS deg
        FROM nodes n LEFT JOIN (SELECT src_url, count(*) AS c FROM {links}
                                GROUP BY src_url) d ON n.node = d.src_url),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, deg, 1.0 / (SELECT n FROM meta) AS rank FROM deg)"""]
    for k in range(1, n_iter + 1):
        p = k - 1
        layers.append(f"""
r{k} AS (
  SELECT d.node, d.deg,
         (1.0 - {damping}) / m.n
         + {damping} * (SELECT coalesce(sum(rank), 0) FROM r{p}
                        WHERE deg = 0) / m.n
         + {damping} * coalesce(c.w, 0) AS rank
  FROM deg d CROSS JOIN meta m
  LEFT JOIN (SELECT l.dst_url AS node, sum(r.rank / r.deg) AS w
             FROM {links} l JOIN r{p} r ON l.src_url = r.node
             GROUP BY l.dst_url) c ON d.node = c.node)""")
    return ("WITH " + ",".join(layers) + f"""
SELECT node, round(rank * 1e6, 3) AS rank_e6
FROM r{n_iter} ORDER BY rank DESC, node LIMIT 10
""")


SQL_PAGERANK_LINKS = _sql_pagerank()


SQL_LINK_COMPONENTS = f"""
WITH RECURSIVE
e AS (SELECT src_url AS a, dst_url AS b
      FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
      UNION ALL
      SELECT dst_url, src_url
      FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')),
n AS (SELECT DISTINCT a AS node FROM e),
reach AS (
  SELECT node AS id, node AS r FROM n
  UNION
  SELECT e.b AS id, reach.r FROM reach JOIN e ON reach.id = e.a),
lab AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
cs AS (SELECT component, count(*) AS sz FROM lab GROUP BY component)
SELECT CAST(sz AS BIGINT) AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM cs GROUP BY sz
"""


def q_window_functions(sf_dir: str):
    """SQL window functions per user partition ordered by (ts, event_id):
    row_number, running sum(value), lag(value) — computed in one
    vectorized pass per hash bucket (rank.window_ops)."""
    import ray.data as rd

    from webval.rank import window_ops

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    out = window_ops(ds, "user_id", ["ts", "event_id"],
                     cumsum_cols=["value"], lag_cols=["value"],
                     rolling_mean_cols=["value"], rolling_window=5,
                     ntile=4, percent_rank=True)
    t = ds_to_table(out.map_batches(
        lambda t: t.select(["event_id", "row_number", "cum_value",
                            "lag_value", "rmean_value", "ntile",
                            "percent_rank"]),
        batch_format="pyarrow"))
    return _round_cols(t, {"cum_value": 6, "rmean_value": 6})


SQL_WINDOW_FUNCTIONS = """
SELECT event_id,
       row_number() OVER w AS row_number,
       round(sum(value) OVER w, 6) AS cum_value,
       lag(value) OVER w AS lag_value,
       round(avg(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             6) AS rmean_value,
       ntile(4) OVER w AS ntile,
       percent_rank() OVER w AS percent_rank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_lm_quality(sf_dir: str):
    """CCNet-style LM quality scoring (Wenzek et al., arXiv:1911.00359):
    fit a unigram LM on the corpus itself (exchange-aggregated term counts
    → add-one smoothed log-probs), broadcast the vocab once, score every
    document's mean negative log-likelihood in a stateless map.  The SQL
    twin reproduces the tokenizer, the smoothing formula, and the per-doc
    average exactly (rounded to 4 decimals)."""
    import ray.data as rd

    from webval.lm import fit_unigram_lm, score_unigram_lm

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    lm = fit_unigram_lm(ds, "text")
    out = score_unigram_lm(ds, lm).select_columns(
        ["doc_id", "n_tokens", "nll"])
    t = ds_to_table(out).sort_by([("doc_id", "ascending")])
    return _round_cols(t, {"nll": 4})


SQL_LM_QUALITY = """
WITH tok AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
  WHERE t <> ''),
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS v FROM cnt),
sc AS (SELECT tok.doc_id, count(*) AS n_tokens,
              -avg(ln((cnt.c + 1) / (tot.total + tot.v + 1))) AS nll
       FROM tok JOIN cnt USING (term) CROSS JOIN tot
       GROUP BY tok.doc_id)
SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens, round(sc.nll, 4) AS nll
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""


def q_lm_buckets(sf_dir: str):
    """CCNet's head/middle/tail corpus partition (Wenzek et al. §4.3):
    score every document with the corpus-trained unigram LM, cut each
    language at the exact discrete terciles of the score distribution,
    and report per-(lang, bucket) document counts.  Thresholds ride the
    (key, value)-only quantile exchange and broadcast once; zero-token
    documents (null score) are excluded, like CCNet drops empty docs.

    Robustness note: only bucket COUNTS are emitted — bucket membership
    compares each doc's nll to a threshold that is itself some doc's nll,
    so cross-engine float noise (~1e-15) can't flip any comparison except
    between duplicate-text docs exactly at a tercile boundary (verified
    absent in the fixture at all sfs)."""
    import ray
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.lm import fit_unigram_lm, score_unigram_lm
    from webval.rank import grouped_exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    lm = fit_unigram_lm(ds, "text")
    scored = score_unigram_lm(ds, lm).map_batches(
        lambda t: t.select(["doc_id", "lang", "nll"])
                   .filter(pc.is_valid(t.column("nll").combine_chunks())),
        batch_format="pyarrow").materialize()
    # materialized: the scoring pass feeds BOTH the threshold quantiles and
    # the bucket assignment — without this the whole tokenize+score lineage
    # executes twice (review r3s4 finding)
    th_ds = grouped_exact_quantiles(scored, "lang", "nll",
                                    {"t1": 1 / 3, "t2": 2 / 3})
    th = pa.concat_tables(
        [b for b in (ray.get(r) for r in
                     th_ds.materialize().to_arrow_refs()) if b.num_rows]
    ).combine_chunks()
    th_ref = ray.put(th)

    def assign(t: pa.Table) -> pa.Table:
        b = ray.get(th_ref)
        pos = pc.index_in(t.column("lang").combine_chunks(),
                          value_set=b.column("lang"))
        t1 = pc.take(b.column("t1"), pos)
        t2 = pc.take(b.column("t2"), pos)
        nll = t.column("nll").combine_chunks()
        bucket = pc.if_else(
            pc.less_equal(nll, t1), "head",
            pc.if_else(pc.less_equal(nll, t2), "middle", "tail"))
        return pa.table({"lang": t.column("lang"), "bucket": bucket})

    counts = grouped_agg(scored.map_batches(assign, batch_format="pyarrow"),
                         ["lang", "bucket"], [("bucket", "count")],
                         rename={"bucket_count": "n_docs"})
    return ds_to_table(counts).sort_by(
        [("lang", "ascending"), ("bucket", "ascending")])


SQL_LM_BUCKETS = """
WITH tok AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
  WHERE t <> ''),
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS v FROM cnt),
sc AS (SELECT tok.doc_id,
              -avg(ln((cnt.c + 1) / (tot.total + tot.v + 1))) AS nll
       FROM tok JOIN cnt USING (term) CROSS JOIN tot
       GROUP BY tok.doc_id),
j AS (SELECT d.lang, sc.nll FROM documents d JOIN sc USING (doc_id)),
th AS (SELECT lang, quantile_disc(nll, 1.0/3) AS t1,
              quantile_disc(nll, 2.0/3) AS t2
       FROM j GROUP BY lang)
SELECT j.lang,
       CASE WHEN j.nll <= th.t1 THEN 'head'
            WHEN j.nll <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM j JOIN th USING (lang)
GROUP BY 1, 2
"""


def q_conditional_violations(sf_dir: str):
    """Cross-column conditional constraint through the verdict engine
    (BATCH_CHECK_KINDS extension surface): WHEN lang='en' THEN n_chars must
    be ≤ 400; rows out of scope pass trivially.  rdv has no cross-column
    checks — this is the §2-J surface carrying an operator the validation
    tier needs (conditional expectations à la Great Expectations'
    expect_column_values_to_... row_condition)."""
    import ray.data as rd

    from webval.checks import check_dataset
    from webval.schema import CheckSpec, SchemaSpec

    spec = SchemaSpec(name="documents", built=True, checks=[
        CheckSpec("en-len", "n_chars", "conditional", {
            "when": {"column": "lang", "kind": "domain",
                     "params": {"values": ["en"]}},
            "then": {"column": "n_chars", "kind": "range",
                     "params": {"min": 0, "max": 400}},
        })])
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    v = check_dataset(ds, spec, keep_cols=["doc_id", "lang", "n_chars"],
                      per_check_cols=True)
    return v.map_batches(
        lambda t: t.filter(t.column("fail_en-len").combine_chunks())
                   .select(["doc_id", "lang", "n_chars"]),
        batch_format="pyarrow")


SQL_CONDITIONAL_VIOLATIONS = """
SELECT doc_id, lang, n_chars FROM documents
WHERE lang = 'en' AND NOT (n_chars BETWEEN 0 AND 400)
"""


def q_iqr_outliers(sf_dir: str):
    """Per-group Tukey-fence outlier rows (validation anomaly surface):
    exact discrete quartiles per event_type through the quantile exchange,
    broadcast once, fences evaluated multiplied-through by k_den so the
    comparison is bit-identical to SQL (same IEEE op order for floats,
    exact int64 for integer columns)."""
    import ray.data as rd

    from webval.pipelines import iqr_outliers

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return iqr_outliers(ds, "event_type", "value")


SQL_IQR_OUTLIERS = """
WITH b AS (SELECT event_type, quantile_disc(value, 0.25) AS q1,
                  quantile_disc(value, 0.75) AS q3
           FROM events GROUP BY event_type)
SELECT t.event_id, t.event_type, t.value
FROM events t JOIN b USING (event_type)
WHERE 2 * t.value < 2 * b.q1 - 3 * (b.q3 - b.q1)
   OR 2 * t.value > 2 * b.q3 + 3 * (b.q3 - b.q1)
"""


def q_frequent_bigrams(sf_dir: str):
    """Corpus-wide frequent bigram discovery (template/boilerplate mining):
    Arrow take+join n-gram construction, per-batch value_counts combiner,
    exact exchange count, min_count filter."""
    import ray.data as rd

    from webval.textclean import frequent_ngrams

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return frequent_ngrams(ds, "text", n=2, min_count=25)


SQL_FREQUENT_BIGRAMS = """
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1])) AS b
       FROM w)
SELECT b AS ngram, CAST(count(*) AS BIGINT) AS cnt
FROM bg GROUP BY b HAVING count(*) >= 25
"""


def q_fetch_gaps(sf_dir: str):
    """Per-user inter-arrival gap stats (the crawl-politeness audit shape):
    sorted vectorized diffs per co-bucketed key, reduced to count/min/avg
    microsecond gaps; SQL twin via lag() OVER."""
    import ray.data as rd

    from webval.windows import inter_arrival_stats

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = inter_arrival_stats(ds, "user_id", "ts",
                              order_cols=["event_id"])
    # avg is one exact int/int IEEE division on both sides (gap sums are
    # exactly representable) — no rounding, bit-identical
    return ds_to_table(out).sort_by([("user_id", "ascending")])


SQL_FETCH_GAPS = """
WITH x AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT user_id,
             t - lag(t) OVER (PARTITION BY user_id
                              ORDER BY t, event_id) AS gap
      FROM x)
SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS min_gap_us,
       CAST(sum(gap) AS DOUBLE) / count(gap) AS avg_gap_us
FROM g GROUP BY user_id HAVING count(gap) > 0
"""


def q_kmeans_sql(sf_dir: str):
    """Lloyd's algorithm made engine-reproducible: deterministic init (the
    min-vec_id embedding of each planted label, labels ascending), a fixed
    3 iterations, and the EXACT per-row assignment rule the engine uses
    (argmax of x·c − ½‖c‖², ties to the lowest centroid id).  The SQL twin
    unrolls the 3 iterations as long-form centroid CTEs — the hash only
    matches if every assignment agrees after 3 rounds of drift."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webval.clustering import kmeans_assign, kmeans_fit

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
    # deterministic init: per label (ascending), the min-vec_id embedding
    labels = full.column("label").to_numpy(zero_copy_only=False)
    vids = full.column("vec_id").to_numpy(zero_copy_only=False)
    init_rows = []
    for lab in sorted(set(labels.tolist())):
        sel = np.flatnonzero(labels == lab)
        init_rows.append(int(sel[np.argmin(vids[sel])]))
    emb = full.column("embedding")
    init = np.asarray([emb[i].as_py() for i in init_rows],
                      dtype=np.float64)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cents = kmeans_fit(ds, "embedding", len(init_rows), n_iter=3, tol=0.0,
                       init_centroids=init)
    out = kmeans_assign(ds, "embedding", cents)
    t = ds_to_table(out.map_batches(
        lambda t: pa.table({"vec_id": t.column("vec_id"),
                            "cluster": pc.cast(t.column("cluster"),
                                               pa.int64())}),
        batch_format="pyarrow"))
    # precondition of the SQL twin: its c{t+1} CTE drops a centroid that
    # captured zero rows, while the engine keeps it — the twin is only
    # valid while every cluster stays populated, so fail LOUDLY here
    # instead of as an unexplained hash mismatch
    got_clusters = set(t.column("cluster").to_pylist())
    if got_clusters != set(range(len(init_rows))):
        raise AssertionError(
            f"kmeans_sql: empty cluster(s) "
            f"{set(range(len(init_rows))) - got_clusters} — the SQL twin's "
            "unroll diverges on empty clusters (see _sql_kmeans)")
    return t.sort_by([("vec_id", "ascending")])


def _sql_kmeans(n_iter: int = 3, dim: int = 64) -> str:
    """3 Lloyd iterations unrolled; centroids kept LONG (cid, i, v) so
    dot products and means are plain joins + grouped aggregates."""
    score = ("sum(CAST(e.embedding[CAST(c.i AS INT)] AS DOUBLE) * c.v) "
             "- 0.5 * sum(c.v * c.v)")
    layers = [f"""
m AS (SELECT label, min(vec_id) AS vid FROM embeddings GROUP BY label),
c0 AS (SELECT CAST(dense_rank() OVER (ORDER BY m.label) - 1 AS BIGINT)
              AS cid, CAST(r.i AS BIGINT) AS i,
              CAST(e.embedding[CAST(r.i AS INT)] AS DOUBLE) AS v
       FROM m JOIN embeddings e ON e.vec_id = m.vid
       CROSS JOIN range(1, {dim + 1}) r(i))"""]
    for t in range(n_iter):
        layers.append(f"""
s{t} AS (SELECT e.vec_id, c.cid, {score} AS sc
         FROM embeddings e JOIN c{t} c ON true
         GROUP BY e.vec_id, c.cid),
a{t} AS (SELECT vec_id, cid FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sc DESC, cid) AS rn
           FROM s{t}) WHERE rn = 1),
c{t + 1} AS (SELECT a.cid, CAST(r.i AS BIGINT) AS i,
                    avg(CAST(e.embedding[CAST(r.i AS INT)] AS DOUBLE)) AS v
             FROM a{t} a JOIN embeddings e USING (vec_id)
             CROSS JOIN range(1, {dim + 1}) r(i)
             GROUP BY a.cid, r.i)""")
    last = n_iter
    return ("WITH " + ",".join(layers) + f"""
, sf AS (SELECT e.vec_id, c.cid, {score} AS sc
         FROM embeddings e JOIN c{last} c ON true
         GROUP BY e.vec_id, c.cid)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sc DESC, cid) AS rn
  FROM sf) WHERE rn = 1
""")


SQL_KMEANS_SQL = _sql_kmeans()


def q_weighted_sample(sf_dir: str):
    """FineWeb-style soft sampling: keep probability proportional to the
    event value (p = min(value, 250)/250), membership decided by the same
    Knuth hash in both engines — bit-identical floats end to end."""
    import ray.data as rd

    from webval.pipelines import weighted_sample

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def withp_fn(t: pa.Table) -> pa.Table:
        # drop nulls BEFORE deriving p: min_element_wise skips nulls, so a
        # null value would otherwise launder into p=1.0 (review r3s4)
        t = t.filter(pc.is_valid(t.column("value").combine_chunks()))
        return t.append_column(
            "p", pc.divide(pc.min_element_wise(
                pc.cast(t.column("value"), pa.float64()), 250.0), 250.0))

    withp = ds.map_batches(withp_fn, batch_format="pyarrow")
    out = weighted_sample(withp, "event_id", "p")
    return out.map_batches(lambda t: t.select(["event_id", "value"]),
                           batch_format="pyarrow")


SQL_WEIGHTED_SAMPLE = """
SELECT event_id, value FROM events
WHERE value IS NOT NULL
  AND CAST((event_id * 2654435761) % 4294967296 AS DOUBLE)
      < floor((least(CAST(value AS DOUBLE), 250.0) / 250.0) * 4294967296.0)
"""


def q_normalize_unicode(sf_dir: str):
    """Unicode NFC normalization (ASCII fast path; per-row unicodedata only
    on non-ASCII rows), reduced to per-doc changed/byte-length columns."""
    import ray.data as rd

    from webval.textclean import normalize_unicode

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = normalize_unicode(ds, "text", form="NFC", out_col="norm")
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_bytes": pc.binary_length(
                pc.cast(t.column("norm"), pa.large_binary())),
            "changed": pc.not_equal(t.column("norm"), t.column("text"))}),
        batch_format="pyarrow")


SQL_NORMALIZE_UNICODE = """
SELECT doc_id,
       CAST(strlen(nfc_normalize(text)) AS BIGINT) AS n_bytes,
       nfc_normalize(text) != text AS changed
FROM documents
"""


def q_grouped_approx_distinct(sf_dir: str):
    """Per-group HLL distinct counts (the scale path for grouped
    COUNT(DISTINCT): register blobs ride the shuffle instead of every
    (key, val) pair), cross-checked IN-QUERY against the exchange-exact
    path — the driver hashes (key, exact, hll_ok), so a >3%-off sketch
    flips hll_ok and fails the oracle compare."""
    import ray.data as rd

    from webval.exchange import grouped_approx_distinct, grouped_distinct_count

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_suppkey"])
    approx = ds_to_table(grouped_approx_distinct(
        ds, "l_returnflag", "l_suppkey"))
    exact = ds_to_table(grouped_distinct_count(
        ds, "l_returnflag", "l_suppkey"))
    a = dict(zip(approx.column("l_returnflag").to_pylist(),
                 approx.column("approx_distinct").to_pylist()))
    rows = sorted(zip(exact.column("l_returnflag").to_pylist(),
                      exact.column("n_distinct").to_pylist()))
    out = {"l_returnflag": [], "n_exact": [], "hll_ok": []}
    for k, n in rows:
        est = a.get(k, 0)
        out["l_returnflag"].append(k)
        out["n_exact"].append(int(n))
        out["hll_ok"].append(abs(est - n) / max(n, 1) <= 0.03)
    return pa.table({"l_returnflag": pa.array(out["l_returnflag"]),
                     "n_exact": pa.array(out["n_exact"], pa.int64()),
                     "hll_ok": pa.array(out["hll_ok"], pa.bool_())})


SQL_GROUPED_APPROX_DISTINCT = """
SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_exact,
       true AS hll_ok
FROM lineitem GROUP BY l_returnflag
"""


def q_unpivot(sf_dir: str):
    """Wide→long reshape of three lineitem measures, rolled up per
    variable (stateless flat-map; the rollup keeps the result tiny)."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.relational import unpivot

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
    long = unpivot(ds, ["l_orderkey"],
                   ["l_quantity", "l_extendedprice", "l_discount"])
    out = grouped_agg(long, ["variable"],
                      [("value", "count"), ("value", "sum")],
                      rename={"value_count": "n", "value_sum": "total"})
    t = ds_to_table(out).sort_by([("variable", "ascending")])
    return _round_cols(t, {"total": 2})


SQL_UNPIVOT = """
WITH long AS (
  SELECT 'l_quantity' AS variable, CAST(l_quantity AS DOUBLE) AS value
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem)
SELECT variable, CAST(count(value) AS BIGINT) AS n,
       round(sum(value), 2) AS total
FROM long GROUP BY variable
"""


def q_lang_entropy(sf_dir: str):
    """Per-source Shannon entropy of the language mix (class-balance
    diagnostic): exact (key, val) count exchange → vectorized −Σ p·ln p
    per key."""
    import ray.data as rd

    from webval.aggregates import grouped_entropy

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])
    out = grouped_entropy(ds, "source", "lang")
    t = ds_to_table(out).sort_by([("source", "ascending")])
    return _round_cols(t, {"entropy": 6})


SQL_LANG_ENTROPY = """
WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents
           WHERE source IS NOT NULL AND lang IS NOT NULL
           GROUP BY source, lang),
t AS (SELECT source, sum(cnt) AS n FROM c GROUP BY source)
SELECT c.source,
       round(-sum((cnt / n) * ln(cnt / n)), 6) AS entropy
FROM c JOIN t USING (source) GROUP BY c.source
"""


def q_incremental_dedup(sf_dir: str):
    """Dedup an increment against a PERSISTED fingerprint index (the
    cross-run crawl primitive): index the even-doc_id half, then dedup the
    full table against it — survivors are odd-doc texts unseen in the
    index, keep-min-id within the increment.  Bucket-partitioned index
    parquet is read pruned per exchange task."""
    import tempfile

    import ray.data as rd

    from webval.dedup import build_dedup_index, incremental_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def evens(t: pa.Table) -> pa.Table:
        pid = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pid % 2 == 0))

    idx = tempfile.mkdtemp(prefix="webval_dedupidx_")
    build_dedup_index(ds.map_batches(evens, batch_format="pyarrow"), idx)
    out = incremental_dedup(ds, "doc_id", idx, append=False)
    return ds_to_table(out.select_columns(["doc_id"])) \
        .sort_by([("doc_id", "ascending")])


SQL_INCREMENTAL_DEDUP = r"""
WITH norm AS (SELECT doc_id,
                     lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS nt
              FROM documents WHERE text IS NOT NULL),
a AS (SELECT DISTINCT nt FROM norm WHERE doc_id % 2 = 0)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
FROM norm WHERE nt NOT IN (SELECT nt FROM a)
GROUP BY nt
"""


def q_reconcile(sf_dir: str):
    """Cross-table aggregate reconciliation: does o_totalprice equal the
    sum of the order's lineitem extended prices (tol 0.01)?  Child sums
    exchange-aggregated, left-joined to the parent stream, reduced to one
    count row (driver sums per-block scalars)."""
    import ray.data as rd

    from webval.pipelines import reconcile_aggregate

    parent = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    child = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice"])
    return reconcile_aggregate(parent, child, "o_orderkey", "l_orderkey",
                               "o_totalprice", "l_extendedprice", tol=0.01)


SQL_RECONCILE = """
WITH c AS (SELECT l_orderkey, sum(l_extendedprice) AS s
           FROM lineitem GROUP BY l_orderkey),
j AS (SELECT o.o_totalprice AS p, c.s
      FROM orders o LEFT JOIN c ON o.o_orderkey = c.l_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_parents,
       CAST(count(*) FILTER (s IS NULL) AS BIGINT) AS n_missing_child,
       CAST(count(*) FILTER (s IS NOT NULL AND abs(p - s) > 0.01)
            AS BIGINT) AS n_mismatched,
       CAST(count(*) FILTER (s IS NOT NULL AND abs(p - s) <= 0.01)
            AS BIGINT) AS n_matched
FROM j
"""


def q_table_diff(sf_dir: str):
    """Snapshot diff (what changed between two crawls): old = pages with
    page_id % 7 != 0, new = pages with page_id % 5 != 0 and n_chars bumped
    where page_id % 11 == 0.  Emits only added/removed/changed keys via a
    co-bucketed null-safe full-outer compare; SQL twin = FULL OUTER JOIN
    with IS DISTINCT FROM over identically-derived snapshots."""
    import ray.data as rd

    from webval.relational import table_diff

    pages_p, _ = ensure_synth(sf_dir)
    base = rd.read_parquet(pages_p, columns=["page_id", "url", "lang"])
    def mk_old(t: pa.Table) -> pa.Table:
        pid = t.column("page_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pid % 7 != 0))

    old = base.map_batches(mk_old, batch_format="pyarrow")

    def mk_new(t: pa.Table) -> pa.Table:
        pid = t.column("page_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(pid % 5 != 0))
        pid = t.column("page_id").to_numpy(zero_copy_only=False)
        lang = t.column("lang").combine_chunks()
        mod = pc.if_else(pa.array(pid % 11 == 0),
                         pc.utf8_upper(lang), lang)
        return t.set_column(t.column_names.index("lang"), "lang", mod)

    new = base.map_batches(mk_new, batch_format="pyarrow")
    out = table_diff(old, new, "page_id", ["url", "lang"])
    return ds_to_table(out).sort_by([("page_id", "ascending")])


SQL_TABLE_DIFF = f"""
WITH base AS (SELECT page_id, url, lang
              FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')),
o AS (SELECT * FROM base WHERE page_id % 7 != 0),
n AS (SELECT page_id, url,
             CASE WHEN page_id % 11 = 0 THEN upper(lang) ELSE lang END
                 AS lang
      FROM base WHERE page_id % 5 != 0)
SELECT coalesce(o.page_id, n.page_id) AS page_id,
       CASE WHEN o.page_id IS NULL THEN 'added'
            WHEN n.page_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.page_id = n.page_id
WHERE o.page_id IS NULL OR n.page_id IS NULL
   OR o.url IS DISTINCT FROM n.url
   OR o.lang IS DISTINCT FROM n.lang
"""


def q_bm25_search(sf_dir: str):
    """Okapi BM25 top-10 for the query "fast vector scan": one stats pass
    reducing to Q+2 ints per batch (driver-summed), one scoring pass with
    per-batch local top-k + fan-in tree.  SQL twin evaluates the identical
    formula with the same IEEE op order from the same integer stats."""
    import ray.data as rd

    from webval.search import bm25_search

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = bm25_search(ds, "doc_id", "text", "fast vector scan", k=10)
    t = ds_to_table(out).sort_by([("score", "descending"),
                                  ("doc_id", "ascending")])
    return _round_cols(t, {"score": 6})


SQL_BM25_SEARCH = """
WITH tok AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
        FROM documents)
  WHERE t <> ''),
q(term) AS (VALUES ('fast'), ('scan'), ('vector')),
dl AS (SELECT d.doc_id, CAST(coalesce(c.n, 0) AS DOUBLE) AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok
                                   GROUP BY doc_id) c USING (doc_id)),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(count(*) AS DOUBLE) FROM tok)
              / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT q.term,
              (SELECT count(DISTINCT doc_id) FROM tok
               WHERE tok.term = q.term) AS df FROM q),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM tok JOIN q USING (term) GROUP BY doc_id, term),
sc AS (SELECT tf.doc_id,
              sum(tf.tf * (1.2 + 1.0)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))
                  * ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)) AS score
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY tf.doc_id)
SELECT doc_id, round(score, 6) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 10
"""


def q_index_search(sf_dir: str):
    """BM25 via the PERSISTED inverted index (search.build_text_index +
    index_search): postings parquet partitioned by term-hash shard,
    query reads only its terms' shards, doc lengths joined co-bucketed
    — same formula, same twin as bm25_search, proving the scan and
    index paths interchangeable.  Scores round 6 (exchange sum
    order)."""
    import os

    import ray.data as rd

    from webval.search import build_text_index, index_search

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    name = os.path.basename(os.path.normpath(sf_dir))
    idx_dir = f"/tmp/webval_textidx_v1/{name}"
    build_text_index(ds, "doc_id", "text", idx_dir, n_shards=16)
    out = index_search(idx_dir, "fast vector scan", k=10)
    t = ds_to_table(out).sort_by([("score", "descending"),
                                  ("doc_id", "ascending")])
    return _round_cols(t, {"score": 6})


def q_funnel(sf_dir: str):
    """First-touch funnel click→view→purchase over the events table:
    per-user deepest strictly-ordered prefix (co-bucketed exchange, k
    vectorized passes per bucket), rolled up to users-reaching-stage
    counts.  SQL twin chains min-ts CTEs with strict inequalities —
    identical greedy semantics."""
    import ray.data as rd

    from webval.windows import funnel_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    out = funnel_counts(ds, "user_id", "ts", "event_type",
                        ["click", "view", "purchase"])
    return ds_to_table(out).sort_by([("stage", "ascending")])


SQL_FUNNEL = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'click' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT 1 AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM s2
UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM s3
"""


def q_dedup_keep_latest(sf_dir: str):
    """Crawl recency dedup — the standard recrawl policy: of each url's
    duplicate fetches keep the LATEST snapshot (max warc_ts, page_id
    tie-break), exactly row_number() OVER (PARTITION BY url ORDER BY
    warc_ts DESC, page_id) = 1.  Rides top_k_per_group's per-batch top-k
    combiner, so hot urls move ≤1 row per batch through the shuffle."""
    import ray.data as rd

    from webval.rank import top_k_per_group

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "url", "warc_ts"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("warc_ts").combine_chunks())),
        batch_format="pyarrow")
    out = top_k_per_group(ds, "url", "warc_ts", 1, descending=True,
                          tie_cols=["page_id"])
    return out.map_batches(lambda t: t.select(["page_id", "url"]),
                           batch_format="pyarrow")


SQL_DEDUP_KEEP_LATEST = f"""
SELECT page_id, url FROM (
  SELECT page_id, url,
         row_number() OVER (PARTITION BY url
                            ORDER BY warc_ts DESC, page_id) AS rn
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
  WHERE warc_ts IS NOT NULL) WHERE rn = 1
"""


def q_embedding_centroids(sf_dir: str):
    """Per-label mean embedding (the vector-column grouped aggregate): each
    batch reduces to (label, dim, partial sum, count) rows — 64 rows per
    label per batch — the exchange sums them, and the mean finalizes
    vectorized.  Long-form output matches SQL's unnest-by-index twin."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def explode(t: pa.Table) -> pa.Table:
        emb = t.column("embedding").combine_chunks()
        # offsets-based explode: null lists contribute nothing and ragged
        # lengths stay aligned (no fixed-dim assumption)
        lens = pc.fill_null(pc.list_value_length(emb), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        labels = t.column("label").to_numpy(zero_copy_only=False)
        starts = np.cumsum(lens) - lens
        dim_idx = np.arange(len(flat), dtype=np.int64) \
            - np.repeat(starts, lens) + 1
        long = pa.table({
            "label": pa.array(np.repeat(labels, lens).astype(np.int32),
                              pa.int32()),
            "dim": pa.array(dim_idx),
            "s": pa.array(flat, pa.float64()),
        })
        part = long.group_by(["label", "dim"]).aggregate(
            [("s", "sum"), ("s", "count")])
        return part.rename_columns(["label", "dim", "s", "cnt"])

    parts = ds.map_batches(explode, batch_format="pyarrow")
    summed = grouped_agg(parts, ["label", "dim"],
                         [("s", "sum"), ("cnt", "sum")],
                         rename={"s_sum": "s", "cnt_sum": "cnt"})
    out = summed.map_batches(
        lambda t: pa.table({
            "label": t.column("label"),
            "dim": t.column("dim"),
            "c": pc.divide(t.column("s"),
                           pc.cast(t.column("cnt"), pa.float64()))}),
        batch_format="pyarrow")
    t = ds_to_table(out).sort_by([("label", "ascending"),
                                  ("dim", "ascending")])
    return _round_cols(t, {"c": 6})


SQL_EMBEDDING_CENTROIDS = """
WITH e AS (SELECT label, CAST(i AS BIGINT) AS dim,
                  CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
           FROM embeddings, range(1, 65) r(i))
SELECT label, dim, round(avg(v), 6) AS c
FROM e GROUP BY label, dim
"""


def q_standardize(sf_dir: str):
    """Z-score standardization (fit mergeable moments in one pass, apply as
    a stateless map): events.value against the global mean/population-std.
    Rounded to 6 decimals — the fit's naive sumsq formula and SQL's
    stddev_pop agree to ~1e-10 relative."""
    import ray.data as rd

    from webval.clustering import standardize_fit, standardize_transform

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    model = standardize_fit(ds, ["value"])
    out = standardize_transform(ds, model).select_columns(
        ["event_id", "value_z"])
    t = ds_to_table(out).sort_by([("event_id", "ascending")])
    return _round_cols(t, {"value_z": 6})


SQL_STANDARDIZE = """
WITH s AS (SELECT avg(value) AS a, stddev_pop(value) AS sd FROM events)
SELECT event_id, round((value - s.a) / s.sd, 6) AS value_z
FROM events CROSS JOIN s
"""


def q_link_degrees(sf_dir: str):
    """Per-node in/out degree over the synthetic link graph: one explode +
    per-batch combiner + exchange sum."""
    import ray.data as rd

    from webval.graph import link_degrees

    _, links_p = ensure_synth(sf_dir)
    return link_degrees(rd.read_parquet(links_p), "src_url", "dst_url")


SQL_LINK_DEGREES = f"""
WITH u AS (
  SELECT src_url AS node, 1 AS o, 0 AS i
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
  WHERE src_url IS NOT NULL
  UNION ALL
  SELECT dst_url, 0, 1
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
  WHERE dst_url IS NOT NULL)
SELECT node, CAST(sum(o) AS BIGINT) AS out_deg,
       CAST(sum(i) AS BIGINT) AS in_deg
FROM u GROUP BY node
"""


def q_media_dimensions(sf_dir: str):
    """Codec-free image header parsing, round-tripped: plant real
    PNG/GIF/JPEG headers whose dimensions are pure functions of page_id
    (fmt = id%3; w = id%640+16; h = id%480+16), parse them back off the
    binary column with parse_image_headers, and aggregate per format.
    The SQL twin recomputes the same aggregate from the id formulas — the
    hashes only match if the byte-level parser is correct."""
    import struct

    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.multimodal import parse_image_headers

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id"])

    def make_media(t: pa.Table) -> pa.Table:
        ids = t.column("page_id").to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            w, h = int(i % 640 + 16), int(i % 480 + 16)
            k = int(i % 3)
            if k == 0:
                payloads.append(b"\x89PNG\r\n\x1a\n"
                                + struct.pack(">I", 13) + b"IHDR"
                                + struct.pack(">II", w, h) + b"\0" * 13)
            elif k == 1:
                payloads.append(b"GIF89a" + struct.pack("<HH", w, h)
                                + b"\0" * 11)
            else:
                payloads.append(
                    b"\xff\xd8\xff\xe0" + struct.pack(">H", 16)
                    + b"JFIF\x00" + b"\0" * 9
                    + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                    + struct.pack(">HH", h, w) + b"\x03" + b"\0" * 9
                    + b"\xff\xd9")
        return t.append_column("media", pa.array(payloads, pa.binary()))

    parsed = parse_image_headers(
        ds.map_batches(make_media, batch_format="pyarrow"), "media")
    proj = parsed.map_batches(
        lambda t: pa.table({
            "fmt": t.column("media_format"),
            "w": pc.cast(t.column("media_width"), pa.int64()),
            "h": pc.cast(t.column("media_height"), pa.int64())}),
        batch_format="pyarrow")
    out = grouped_agg(
        proj, ["fmt"], [("fmt", "count"), ("w", "sum"), ("h", "sum")],
        rename={"fmt_count": "n", "w_sum": "sum_w", "h_sum": "sum_h"})
    return ds_to_table(out).sort_by([("fmt", "ascending")])


SQL_MEDIA_DIMENSIONS = f"""
SELECT CASE page_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
       ELSE 'jpeg' END AS fmt,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(page_id % 640 + 16) AS BIGINT) AS sum_w,
       CAST(sum(page_id % 480 + 16) AS BIGINT) AS sum_h
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
GROUP BY 1
"""


def q_dup_substrings(sf_dir: str):
    """Cross-document repeated-substring stats (Lee et al. ExactSubstr
    signal): per doc, its distinct 16-char shingles occurring in ≥2 docs
    corpus-wide.  Hash pairs exchange-counted, never broadcast; totals
    left-joined through the bucketed equi-join.  Exact DuckDB substring
    twin (fixture text is ASCII, so byte windows ≡ char windows)."""
    import ray.data as rd

    from webval.dedup import dup_substring_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = dup_substring_stats(ds, "doc_id", "text", window=16, min_docs=2)
    return ds_to_table(out).sort_by([("doc_id", "ascending")])


SQL_DUP_SUBSTRINGS = """
WITH pos AS (SELECT CAST(i AS INT) AS i FROM range(1, 8192) t(i)),
dsh AS (SELECT DISTINCT doc_id, substr(text, i, 16) AS g
        FROM documents, pos
        WHERE text IS NOT NULL AND length(text) >= 16
          AND i <= length(text) - 15),
cnt AS (SELECT g, count(*) AS docs FROM dsh GROUP BY g),
d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_shingles
      FROM dsh JOIN cnt USING (g) WHERE cnt.docs >= 2 GROUP BY doc_id),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh
          GROUP BY doc_id)
SELECT doc.doc_id,
       coalesce(s.n, 0) AS n_shingles,
       coalesce(d.n_dup_shingles, 0) AS n_dup_shingles,
       coalesce(d.n_dup_shingles, 0) > 0 AS has_dup
FROM documents doc
LEFT JOIN sizes s USING (doc_id)
LEFT JOIN d USING (doc_id)
"""


def q_check_pass_rates(sf_dir: str):
    """Expectation-suite summary: per-check failure counts + rates over the
    whole events table in one streaming pass (each batch reduces to one
    partial-counts row; driver sums per-block scalars)."""
    import ray.data as rd

    from webval.pipelines import check_pass_rates

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value", "event_type"])
    return check_pass_rates(ds, _events_check_schema("range", "domain"))


SQL_CHECK_PASS_RATES = """
WITH t AS (SELECT count(*) AS n,
                  count(*) FILTER (value < 5.0 OR value > 250.0) AS f_range,
                  count(*) FILTER (event_type NOT IN
                      ('click', 'view', 'purchase', 'signup')) AS f_domain
           FROM events)
SELECT 'value-range' AS check_name, f_range AS n_failed, n AS n_rows,
       CAST(f_range AS DOUBLE) / n AS fail_rate FROM t
UNION ALL
SELECT 'type-domain', f_domain, n, CAST(f_domain AS DOUBLE) / n FROM t
"""


def _two_side_counts(sf_dir: str, table: str, id_col: str, val_col: str,
                     cast_bin: pa.DataType | None = None, bin_fn=None):
    """Shared shape of the two-sample drift queries: exact (side, bin)
    counts where side = id parity, aligned on the union of bins.
    ``bin_fn`` (numpy values → bin labels) buckets continuous columns.
    Returns (sorted_bins, expected_counts, actual_counts) numpy arrays."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet",
                         columns=[id_col, val_col])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(val_col).combine_chunks()))
        side = pc.cast(pc.bit_wise_and(t.column(id_col).combine_chunks(),
                                       pa.scalar(1, pa.int64())), pa.int32())
        b = t.column(val_col)
        if bin_fn is not None:
            b = pa.array(bin_fn(
                b.combine_chunks().to_numpy(zero_copy_only=False)))
        elif cast_bin is not None:
            b = pc.cast(b, cast_bin)
        return pa.table({"side": side, "bin": b})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["side", "bin"], [("bin", "count")],
                         rename={"bin_count": "cnt"})
    t = ds_to_table(counts)
    side = t.column("side").to_numpy(zero_copy_only=False)
    bins = t.column("bin").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    ub = np.unique(bins)
    pos = np.searchsorted(ub, bins)
    e = np.zeros(len(ub), dtype=np.float64)
    a = np.zeros(len(ub), dtype=np.float64)
    np.add.at(e, pos[side == 0], cnt[side == 0])
    np.add.at(a, pos[side == 1], cnt[side == 1])
    return ub, e, a


def q_psi_drift(sf_dir: str):
    """Population Stability Index of the l_quantity distribution between
    even and odd orderkeys — the standard model-monitoring drift score,
    SQL-exact because the bins are the (integral) quantity values and the
    twin mirrors drift.psi's clamp-at-1e-4 + renormalize term-for-term."""
    from webval.drift import psi

    ub, e, a = _two_side_counts(sf_dir, "lineitem", "l_orderkey",
                                "l_quantity", cast_bin=pa.int64())
    return _round_cols(pa.table({
        "n_bins": pa.array([len(ub)], pa.int64()),
        "psi": pa.array([psi(e, a)], pa.float64()),
    }), {"psi": 6})


SQL_PSI_DRIFT = """
WITH c AS (SELECT CAST(l_orderkey % 2 AS INT) AS side,
                  CAST(l_quantity AS BIGINT) AS bin, count(*) AS cnt
           FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
b AS (SELECT DISTINCT bin FROM c),
m AS (SELECT b.bin,
             CAST(COALESCE(e.cnt, 0) AS DOUBLE) AS ce,
             CAST(COALESCE(a.cnt, 0) AS DOUBLE) AS ca
      FROM b LEFT JOIN c e ON e.bin = b.bin AND e.side = 0
             LEFT JOIN c a ON a.bin = b.bin AND a.side = 1),
f AS (SELECT greatest(ce / (SELECT sum(ce) FROM m), 1e-4) AS fe,
             greatest(ca / (SELECT sum(ca) FROM m), 1e-4) AS fa FROM m),
g AS (SELECT fe / (SELECT sum(fe) FROM f) AS pe,
             fa / (SELECT sum(fa) FROM f) AS pq FROM f)
SELECT CAST((SELECT count(*) FROM b) AS BIGINT) AS n_bins,
       round((SELECT sum((pq - pe) * ln(pq / pe)) FROM g), 6) AS psi
"""


def q_js_drift(sf_dir: str):
    """Jensen-Shannon divergence (base 2) plus the Pearson chi-square
    statistic of the documents language mix between even and odd doc_ids;
    the SQL twin mirrors drift.js_divergence / drift.chi2_test
    term-for-term, including the p>0 masks and the zero-expected pooled
    pseudo-bin."""
    from webval.drift import chi2_test, js_divergence

    ub, e, a = _two_side_counts(sf_dir, "documents", "doc_id", "lang")
    stat, _ = chi2_test(a, e)
    return _round_cols(pa.table({
        "n_classes": pa.array([len(ub)], pa.int64()),
        "js": pa.array([js_divergence(e, a)], pa.float64()),
        "chi2_stat": pa.array([stat], pa.float64()),
    }), {"js": 6, "chi2_stat": 6})


SQL_JS_DRIFT = """
WITH c AS (SELECT CAST(doc_id % 2 AS INT) AS side, lang, count(*) AS cnt
           FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
k AS (SELECT DISTINCT lang FROM c),
m AS (SELECT k.lang,
             CAST(COALESCE(e.cnt, 0) AS DOUBLE) AS ce,
             CAST(COALESCE(a.cnt, 0) AS DOUBLE) AS ca
      FROM k LEFT JOIN c e ON e.lang = k.lang AND e.side = 0
             LEFT JOIN c a ON a.lang = k.lang AND a.side = 1),
t AS (SELECT sum(ce) AS te, sum(ca) AS ta FROM m),
p AS (SELECT ce / te AS pe, ca / ta AS pq,
             (ce / te + ca / ta) / 2 AS pm FROM m, t),
kl AS (SELECT sum(CASE WHEN pe > 0 THEN pe * ln(pe / pm) ELSE 0 END) AS kpm,
              sum(CASE WHEN pq > 0 THEN pq * ln(pq / pm) ELSE 0 END) AS kqm
       FROM p),
x AS (SELECT sum(CASE WHEN ce > 0
                      THEN (ca - ce / te * ta) * (ca - ce / te * ta)
                           / (ce / te * ta) ELSE 0 END) AS s0,
             sum(CASE WHEN ce = 0 THEN ca ELSE 0 END) AS extra
      FROM m, t)
SELECT CAST((SELECT count(*) FROM k) AS BIGINT) AS n_classes,
       round((SELECT (kpm + kqm) / 2 / ln(2) FROM kl), 6) AS js,
       round((SELECT s0 + CASE WHEN extra > 0
                               THEN (extra - 0.5) * (extra - 0.5) / 0.5
                               ELSE 0 END FROM x), 6) AS chi2_stat
"""


def q_cramers_v(sf_dir: str):
    """Cramér's V association between the documents lang and source
    columns (profiling's categorical-dependence diagnostic): exact
    contingency counts through the exchange, then the chi-square
    statistic over the full (row-total × col-total) grid — SQL-exact."""
    import ray.data as rd

    from webval.drift import contingency_stats
    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["lang", "source"])
        return t.filter(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.is_valid(t.column("source").combine_chunks())))

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["lang", "source"], [("lang", "count")],
                         rename={"lang_count": "cnt"})
    t = ds_to_table(counts)
    langs = t.column("lang").to_numpy(zero_copy_only=False)
    srcs = t.column("source").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    ul, us = np.unique(langs), np.unique(srcs)
    mat = np.zeros((len(ul), len(us)), dtype=np.float64)
    mat[np.searchsorted(ul, langs), np.searchsorted(us, srcs)] = cnt
    stat, _, v = contingency_stats(mat)
    return _round_cols(pa.table({
        "n_langs": pa.array([len(ul)], pa.int64()),
        "n_sources": pa.array([len(us)], pa.int64()),
        "chi2_stat": pa.array([stat], pa.float64()),
        "cramers_v": pa.array([v], pa.float64()),
    }), {"chi2_stat": 6, "cramers_v": 6})


SQL_CRAMERS_V = """
WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS cnt
           FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
           GROUP BY 1, 2),
rt AS (SELECT lang, sum(cnt) AS r FROM c GROUP BY 1),
ct AS (SELECT source, sum(cnt) AS cl FROM c GROUP BY 1),
n AS (SELECT sum(cnt) AS n FROM c),
cell AS (SELECT COALESCE(c.cnt, 0) AS o, rt.r * ct.cl / n.n AS e
         FROM rt CROSS JOIN ct CROSS JOIN n
         LEFT JOIN c ON c.lang = rt.lang AND c.source = ct.source),
st AS (SELECT sum((o - e) * (o - e) / e) AS stat FROM cell)
SELECT CAST((SELECT count(*) FROM rt) AS BIGINT) AS n_langs,
       CAST((SELECT count(*) FROM ct) AS BIGINT) AS n_sources,
       round((SELECT stat FROM st), 6) AS chi2_stat,
       round(sqrt((SELECT stat FROM st)
                  / ((SELECT n FROM n)
                     * least((SELECT count(*) FROM rt) - 1,
                             (SELECT count(*) FROM ct) - 1))), 6) AS cramers_v
"""


def q_monotonic_violations(sf_dir: str):
    """Ordering check: within each order (rows ordered by l_linenumber),
    ship dates should be non-decreasing; emits the orders where at least
    one adjacent pair goes backwards.  SQL twin via lag() windows."""
    import ray.data as rd

    from webval.windows import ordered_inversions

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    out = ordered_inversions(ds, "l_orderkey", "l_linenumber", "l_shipdate")
    t = ds_to_table(out)
    t = t.filter(pc.greater(t.column("n_inversions"), 0))
    return t.sort_by([("l_orderkey", "ascending")])


SQL_MONOTONIC_VIOLATIONS = """
WITH s AS (
  SELECT l_orderkey,
         CASE WHEN lag(l_shipdate) OVER w IS NULL THEN 0 ELSE 1 END AS pair,
         CASE WHEN l_shipdate < lag(l_shipdate) OVER w THEN 1 ELSE 0
              END AS inv
  FROM lineitem WHERE l_shipdate IS NOT NULL
  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_shipdate))
SELECT l_orderkey, CAST(sum(pair) AS BIGINT) AS n_pairs,
       CAST(sum(inv) AS BIGINT) AS n_inversions
FROM s GROUP BY 1 HAVING sum(inv) > 0 ORDER BY 1
"""


def q_session_stats(sf_dir: str):
    """Session-level rollup of the 30-minute-gap sessionization: per-session
    (count, duration) through the exchange, then a tiny per-block partial
    summary finished on the driver — the scale shape for "how long are our
    sessions" over billions of events."""
    import ray.data as rd

    from webval.windows import session_rollup

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    per = session_rollup(ds, ts_col="ts", by="user_id",
                         gap_us=30 * 60 * 1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_sessions": pa.array([t.num_rows], pa.int64()),
            "events": pa.array([pc.sum(t.column("n_events")).as_py() or 0],
                               pa.int64()),
            "max_events": pa.array([pc.max(t.column("n_events")).as_py() or 0],
                                   pa.int64()),
            "dur_sum": pa.array([pc.sum(t.column("duration_us")).as_py() or 0],
                                pa.int64()),
        })

    s = ds_to_table(per.map_batches(partial, batch_format="pyarrow"))
    if "n_sessions" not in s.column_names or s.num_rows == 0:
        ns = ev = mx = dur = 0
    else:
        ns = pc.sum(s.column("n_sessions")).as_py() or 0
        ev = pc.sum(s.column("events")).as_py() or 0
        mx = pc.max(s.column("max_events")).as_py() or 0
        dur = pc.sum(s.column("dur_sum")).as_py() or 0
    return _round_cols(pa.table({
        "n_sessions": pa.array([ns], pa.int64()),
        "n_events": pa.array([ev], pa.int64()),
        "max_events": pa.array([mx], pa.int64()),
        "avg_events": pa.array([ev / ns if ns else 0.0], pa.float64()),
        "avg_duration_us": pa.array([dur / ns if ns else 0.0],
                                    pa.float64()),
    }), {"avg_events": 6, "avg_duration_us": 6})


SQL_SESSION_STATS = """
WITH m AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS BIGINT) AS session_seq, ts
      FROM m),
per AS (SELECT user_id, session_seq, count(ts) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        FROM s GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(max(n_events) AS BIGINT) AS max_events,
       round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS avg_events,
       round(CAST(sum(dur_us) AS DOUBLE) / count(*), 6) AS avg_duration_us
FROM per
"""


def q_freshness(sf_dir: str):
    """Freshness audit: per event type, the last-seen timestamp and its
    staleness against the newest event anywhere — exact int64 µs, the
    "is this partition still being fed" check."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["event_type", "ts"])
        t = t.filter(pc.and_(
            pc.is_valid(t.column("event_type").combine_chunks()),
            pc.is_valid(t.column("ts").combine_chunks())))
        return pa.table({"event_type": t.column("event_type"),
                         "ts_us": pc.cast(t.column("ts"), pa.int64())})

    agg = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                      ["event_type"], [("ts_us", "max")],
                      rename={"ts_us_max": "last_ts_us"})
    t = ds_to_table(agg).sort_by([("event_type", "ascending")])
    gmax = pc.max(t.column("last_ts_us"))
    return t.append_column("staleness_us",
                           pc.subtract(gmax, t.column("last_ts_us")))


SQL_FRESHNESS = """
WITH m AS (SELECT event_type, max(epoch_us(ts)) AS last_ts_us
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1)
SELECT event_type, last_ts_us,
       (SELECT max(last_ts_us) FROM m) - last_ts_us AS staleness_us
FROM m ORDER BY event_type
"""


def q_histogram_fixed(sf_dir: str):
    """Fixed-width histogram of l_extendedprice (width 5000, top bin
    clamped at 23) — the profile histogram as an exact, SQL-pairable
    integer aggregate (the adaptive t-digest-CDF histogram stays in
    schema_build)."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        x = t.column("l_extendedprice").combine_chunks()
        x = x.filter(pc.is_valid(x)).to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor(x / 5000.0), 23.0).astype(np.int64)
        return pa.table({"bin": pa.array(b)})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["bin"], [("bin", "count")],
                         rename={"bin_count": "cnt"})
    return ds_to_table(counts).sort_by([("bin", "ascending")])


SQL_HISTOGRAM_FIXED = """
SELECT CAST(least(floor(l_extendedprice / 5000), 23.0) AS BIGINT) AS bin,
       count(*) AS cnt
FROM lineitem WHERE l_extendedprice IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def _docs_export(sf_dir: str, fmt: str) -> str:
    """Materialize documents (doc_id, lang, n_chars) as NDJSON / CSV shards
    under the versioned synth root (once; written to a tmp dir then renamed
    so readers never see a partial export) — fixtures for the non-parquet
    source queries, exercising Ray's native write_json/write_csv sinks."""
    import ray.data as rd

    name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(SYNTH_ROOT, name, f"docs_{fmt}")
    if os.path.isdir(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = f"{out}.tmp.{os.getpid()}"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    if fmt == "jsonl":
        ds.write_json(tmp)
    elif fmt == "orc":
        from webval.sources import write_orc
        write_orc(ds, tmp)
    elif fmt == "ipc":
        from webval.sources import write_ipc
        write_ipc(ds, tmp)
    else:
        ds.write_csv(tmp)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)   # another writer won
    return out


def q_jsonl_read(sf_dir: str):
    """A1 source coverage beyond parquet/WARC: newline-delimited JSON
    shards read with Ray's native read_json, aggregated per lang; the
    oracle runs the same aggregate over the parquet ground truth, so a
    hash match proves the JSON round-trip lossless."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_json(_docs_export(sf_dir, "jsonl"))
    agg = grouped_agg(ds, ["lang"],
                      [("doc_id", "count"), ("n_chars", "sum")],
                      rename={"doc_id_count": "n_docs",
                              "n_chars_sum": "chars"})
    return ds_to_table(agg).sort_by([("lang", "ascending")])


SQL_DOCS_BY_LANG = """
SELECT lang, CAST(count(doc_id) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_csv_read(sf_dir: str):
    """A1 source coverage: the same documents slice as CSV shards via
    Ray's native read_csv (arrow CSV reader with type inference), proving
    the CSV round-trip against the parquet oracle.  The convert options
    make the round-trip null-exact: the arrow CSV writer emits null as an
    UNQUOTED empty field and real strings quoted, so unquoted-empty→null
    with quoted `\"\"` kept as a true empty string is lossless."""
    from pyarrow import csv as pacsv

    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_csv(_docs_export(sf_dir, "csv"),
                     convert_options=pacsv.ConvertOptions(
                         strings_can_be_null=True,
                         quoted_strings_can_be_null=False))
    agg = grouped_agg(ds, ["lang"],
                      [("doc_id", "count"), ("n_chars", "sum")],
                      rename={"doc_id_count": "n_docs",
                              "n_chars_sum": "chars"})
    return ds_to_table(agg).sort_by([("lang", "ascending")])


def q_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlations of the lineitem numeric columns in
    one streaming pass (per-batch moment partials, SQL corr() pairwise
    null semantics via count(x+y))."""
    import ray.data as rd

    from webval.aggregates import pairwise_corr

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"])
    t = pairwise_corr(ds, [("l_quantity", "l_extendedprice"),
                           ("l_quantity", "l_discount"),
                           ("l_extendedprice", "l_discount")])
    return _round_cols(t, {"corr": 6})


SQL_CORR_MATRIX = """
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       CAST(count(l_quantity + l_extendedprice) AS BIGINT) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_discount', CAST(count(l_quantity + l_discount)
       AS BIGINT), round(corr(l_quantity, l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
       CAST(count(l_extendedprice + l_discount) AS BIGINT),
       round(corr(l_extendedprice, l_discount), 6) FROM lineitem
"""


def _median_from_counts(vals: np.ndarray, counts: np.ndarray) -> float:
    """Exact continuous median (quantile_cont 0.5 / SQL median()) from a
    sorted distinct-value histogram: the mean of the two middle order
    statistics for even n."""
    order = np.argsort(vals)
    v, c = vals[order], counts[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    hi = int(np.searchsorted(cum, n // 2 + 1))       # 0-based rank n//2
    if n % 2 == 1:
        return float(v[hi])
    lo = int(np.searchsorted(cum, n // 2))           # 0-based rank n//2-1
    return (float(v[lo]) + float(v[hi])) / 2.0


def q_mad_outliers(sf_dir: str):
    """Robust outlier audit via the median absolute deviation: exact
    median and MAD computed from the value-count exchange (no second data
    pass — the |x − med| histogram is derived from the value histogram),
    then the count of rows beyond 3×MAD."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])
    proj = ds.map_batches(
        lambda t: pa.table({"v": t.column("l_quantity").combine_chunks()
                           .filter(pc.is_valid(
                               t.column("l_quantity").combine_chunks()))}),
        batch_format="pyarrow")
    counts = grouped_agg(proj, ["v"], [("v", "count")],
                         rename={"v_count": "cnt"})
    t = ds_to_table(counts)
    v = t.column("v").to_numpy(zero_copy_only=False).astype(np.float64)
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    med = _median_from_counts(v, c)
    d = np.abs(v - med)
    # collapse equal deviations before taking their median
    ud = np.unique(d)
    dc = np.zeros(len(ud), dtype=np.int64)
    np.add.at(dc, np.searchsorted(ud, d), c)
    mad = _median_from_counts(ud, dc)
    n_out = int(c[d > 3 * mad].sum())
    return _round_cols(pa.table({
        "median": pa.array([med], pa.float64()),
        "mad": pa.array([mad], pa.float64()),
        "n_outliers": pa.array([n_out], pa.int64()),
    }), {"median": 6, "mad": 6})


SQL_MAD_OUTLIERS = """
WITH m AS (SELECT median(l_quantity) AS med FROM lineitem
           WHERE l_quantity IS NOT NULL),
d AS (SELECT median(abs(l_quantity - med)) AS mad FROM lineitem, m
      WHERE l_quantity IS NOT NULL)
SELECT round((SELECT med FROM m), 6) AS median,
       round((SELECT mad FROM d), 6) AS mad,
       CAST((SELECT count(*) FROM lineitem, m, d
             WHERE l_quantity IS NOT NULL
               AND abs(l_quantity - med) > 3 * mad) AS BIGINT) AS n_outliers
"""


def q_hourly_complete(sf_dir: str):
    """Zero-filled hourly time spine (gap filling): exact hourly counts
    through the exchange, then the [min, max] hour grid materialized on
    the driver (a spine is small — years of hours ≈ 10⁴ rows — even when
    the events are 100 TB) with absent hours emitted as cnt = 0."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    hour_us = 3_600_000_000

    def proj(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks()
        ts = ts.filter(pc.is_valid(ts))
        h = pc.cast(pc.floor_temporal(ts, unit="hour"), pa.int64())
        return pa.table({"h_us": h})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["h_us"], [("h_us", "count")],
                         rename={"h_us_count": "cnt"})
    t = ds_to_table(counts)
    if t.num_rows == 0:
        return pa.table({"hour": pa.array([], pa.timestamp("us")),
                         "cnt": pa.array([], pa.int64())})
    h = t.column("h_us").to_numpy(zero_copy_only=False)
    c = t.column("cnt").to_numpy(zero_copy_only=False)
    spine = np.arange(h.min(), h.max() + 1, hour_us, dtype=np.int64)
    filled = np.zeros(len(spine), dtype=np.int64)
    filled[(h - h.min()) // hour_us] = c
    return pa.table({"hour": pa.array(spine).cast(pa.timestamp("us")),
                     "cnt": pa.array(filled)})


SQL_HOURLY_COMPLETE = """
WITH RECURSIVE b AS (SELECT epoch_us(date_trunc('hour', min(ts))) AS lo,
                            epoch_us(date_trunc('hour', max(ts))) AS hi
                     FROM events WHERE ts IS NOT NULL),
spine(h_us) AS (
  SELECT lo FROM b
  UNION ALL
  SELECT h_us + 3600000000 FROM spine, b
  WHERE h_us + 3600000000 <= hi),
c AS (SELECT epoch_us(date_trunc('hour', ts)) AS h_us, count(*) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1)
SELECT make_timestamp(spine.h_us) AS hour,
       CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
FROM spine LEFT JOIN c ON c.h_us = spine.h_us ORDER BY 1
"""


_HOST_RE = r"^https?://(?P<host>[a-z0-9-]+)\."


def q_host_freq(sf_dir: str):
    """Regex group extraction (RE2 on both engines): the first host label
    of each webpage URL (the shard domain, ~input_hint cardinality),
    counted — rows whose URL does not match (the planted malformed class)
    are excluded on both sides."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        st = pc.extract_regex(u, _HOST_RE)
        host = pc.struct_field(st, "host")
        keep = pc.is_valid(host)
        return pa.table({"host": host.filter(keep)})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["host"], [("host", "count")],
                         rename={"host_count": "cnt"})
    return ds_to_table(counts).sort_by([("host", "ascending")])


SQL_HOST_FREQ = f"""
SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1) AS host,
       count(*) AS cnt
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
GROUP BY 1 ORDER BY 1
"""


def q_mode_by_group(sf_dir: str):
    """Profiling's modal-category column: the most frequent lang per
    source (exact; ties to the smallest lang on both sides)."""
    import ray.data as rd

    from webval.aggregates import grouped_mode

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])
    out = grouped_mode(ds, "source", "lang")
    return ds_to_table(out).sort_by([("source", "ascending")])


SQL_MODE_BY_GROUP = """
WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents
           WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
r AS (SELECT source, lang, cnt, row_number() OVER
          (PARTITION BY source ORDER BY cnt DESC, lang) AS rn
      FROM c)
SELECT source, lang AS mode_lang, CAST(cnt AS BIGINT) AS n
FROM r WHERE rn = 1 ORDER BY source
"""


def q_retention(sf_dir: str):
    """Cohort retention: users bucketed by first-seen day; for each
    (cohort_day, day_offset) the count of distinct users active that day
    (windows.retention_cells — four exchanges, no driver loop)."""
    import ray.data as rd

    from webval.windows import retention_cells

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    cells = retention_cells(ds, key="user_id", ts_col="ts")
    t = ds_to_table(cells)
    t = t.set_column(t.column_names.index("cohort_us"), "cohort_day",
                     pc.cast(t.column("cohort_us"), pa.timestamp("us")))
    return t.sort_by([("cohort_day", "ascending"),
                      ("day_offset", "ascending")])


SQL_RETENTION = """
WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT f.cohort AS cohort_day,
       (epoch_us(a.day) - epoch_us(f.cohort)) // 86400000000 AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_vocab_drift(sf_dir: str):
    """Vocabulary drift / OOV-rate between two corpus halves (the LM
    freshness question "how many never-seen tokens is the new crawl
    adding") — textstats.vocab_overlap: distinct (side, token) sets
    through the exchange, per-token presence flags, per-block rollup;
    token sets never touch the driver.  Tokenization is lower + split on
    [^a-z0-9]+, chosen because arrow and DuckDB run the same RE2/utf8proc
    kernels so the twin is byte-identical."""
    import ray.data as rd

    from webval.textstats import vocab_overlap

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "html"])
    nb, na, nn = vocab_overlap(ds, "page_id", "html")
    return _round_cols(pa.table({
        "n_vocab_base": pa.array([nb], pa.int64()),
        "n_vocab_actual": pa.array([na], pa.int64()),
        "n_new": pa.array([nn], pa.int64()),
        "new_rate": pa.array([nn / na if na else 0.0], pa.float64()),
    }), {"new_rate": 6})


SQL_VOCAB_DRIFT = f"""
WITH s AS (SELECT DISTINCT CAST(page_id % 2 AS INT) AS side, t.tok AS tok
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet'),
       unnest(regexp_split_to_array(lower(decode(html)),
                                    '[^a-z0-9]+')) AS t(tok)
  WHERE html IS NOT NULL AND t.tok <> ''),
f AS (SELECT tok, max(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS b,
             max(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS a
      FROM s GROUP BY 1)
SELECT CAST(sum(b) AS BIGINT) AS n_vocab_base,
       CAST(sum(a) AS BIGINT) AS n_vocab_actual,
       CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       round(CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(a), 6) AS new_rate
FROM f
"""


def q_rare_collapse(sf_dir: str):
    """Long-tail category collapse (the standard pre-encoding step for
    high-cardinality categoricals): hosts with fewer than 100 pages fold
    into '__other__'.  Collapsing happens on the already-aggregated count
    stream through a second (tiny) exchange — the raw rows are never
    re-touched and no count table lands on the driver."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host.filter(pc.is_valid(host))})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["host"], [("host", "count")],
                         rename={"host_count": "cnt"})

    def relabel(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("cnt").combine_chunks(), 100)
        label = pc.if_else(keep, t.column("host").combine_chunks(),
                           pa.scalar("__other__"))
        return pa.table({"label": label, "cnt": t.column("cnt")})

    out = grouped_agg(counts.map_batches(relabel, batch_format="pyarrow"),
                      ["label"], [("cnt", "sum")], rename={"cnt_sum": "n"})
    return ds_to_table(out).sort_by([("label", "ascending")])


SQL_RARE_COLLAPSE = f"""
WITH h AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1) AS host
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')),
c AS (SELECT host, count(*) AS cnt FROM h GROUP BY 1)
SELECT CASE WHEN cnt >= 100 THEN host ELSE '__other__' END AS label,
       CAST(sum(cnt) AS BIGINT) AS n
FROM c GROUP BY 1 ORDER BY 1
"""


def q_hourly_anomalies(sf_dir: str):
    """Monitoring-style anomaly flags: hours whose event count deviates
    more than 2 sample-stddevs from the mean hourly count; the hourly
    count table is exchange-built and small (one row per hour), so the
    mean/σ finalize is a driver scalar pass."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def proj(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks()
        ts = ts.filter(pc.is_valid(ts))
        return pa.table({"h_us": pc.cast(
            pc.floor_temporal(ts, unit="hour"), pa.int64())})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["h_us"], [("h_us", "count")],
                         rename={"h_us_count": "cnt"})
    t = ds_to_table(counts)
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
    if len(c) < 2:
        return pa.table({"hour": pa.array([], pa.timestamp("us")),
                         "cnt": pa.array([], pa.int64()),
                         "z": pa.array([], pa.float64())})
    mu = float(c.mean())
    sd = float(c.std(ddof=1))
    keep = np.abs(c - mu) > 2 * sd
    out = t.filter(pa.array(keep)).sort_by([("h_us", "ascending")])
    z = (out.column("cnt").to_numpy(zero_copy_only=False) - mu) / sd
    return _round_cols(pa.table({
        "hour": pc.cast(out.column("h_us"), pa.timestamp("us")),
        "cnt": pc.cast(out.column("cnt"), pa.int64()),
        "z": pa.array(z, pa.float64()),
    }), {"z": 6})


SQL_HOURLY_ANOMALIES = """
WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt
           FROM events WHERE ts IS NOT NULL GROUP BY 1),
s AS (SELECT avg(cnt) AS mu, stddev_samp(cnt) AS sd FROM c)
SELECT hour, CAST(cnt AS BIGINT) AS cnt, round((cnt - mu) / sd, 6) AS z
FROM c, s WHERE abs(cnt - mu) > 2 * sd ORDER BY hour
"""


def q_dow_hour_profile(sf_dir: str):
    """Temporal profile: event counts per (day-of-week, hour-of-day) cell
    — the seasonality heat-map behind crawl/traffic scheduling.  Exact
    int64 µs arithmetic (epoch day 0 = Thursday → +4 mod 7 matches SQL
    dayofweek's Sunday=0 convention)."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    day_us, hour_us = 86_400_000_000, 3_600_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def proj(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks()
        ts = ts.filter(pc.is_valid(ts))
        us = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "dow": pa.array((us // day_us + 4) % 7),
            "hour": pa.array(us % day_us // hour_us),
        })

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["dow", "hour"], [("hour", "count")],
                         rename={"hour_count": "cnt"})
    return ds_to_table(counts).sort_by([("dow", "ascending"),
                                        ("hour", "ascending")])


SQL_DOW_HOUR_PROFILE = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour, count(*) AS cnt
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_temperature_mix(sf_dir: str):
    """Data-mixing weights for multi-source training corpora: per-source
    counts reweighted by temperature α = 0.5 (w_i = √c_i / Σ√c_j — the
    multilingual-sampling standard) and the resulting per-source target
    document counts at the current corpus size."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    proj = ds.map_batches(
        lambda t: t.select(["source"]).filter(
            pc.is_valid(t.column("source").combine_chunks())),
        batch_format="pyarrow")
    counts = grouped_agg(proj, ["source"], [("source", "count")],
                         rename={"source_count": "n_docs"})
    t = ds_to_table(counts).sort_by([("source", "ascending")])
    c = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
    w = np.sqrt(c)
    w = w / w.sum()
    total = float(c.sum())
    # decimal-round the product BEFORE floor on BOTH sides: a 1-ulp
    # cross-engine difference in the sqrt-sum must not flip the integer
    wt = [float(f"{x:.6f}") for x in w * total]
    return _round_cols(pa.table({
        "source": t.column("source"),
        "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
        "weight": pa.array(w, pa.float64()),
        "target_n": pa.array(np.floor(wt).astype(np.int64)),
    }), {"weight": 6})


SQL_TEMPERATURE_MIX = """
WITH c AS (SELECT source, count(*) AS n_docs FROM documents
           WHERE source IS NOT NULL GROUP BY 1),
s AS (SELECT sum(sqrt(n_docs)) AS sw, sum(n_docs) AS tot FROM c)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       round(sqrt(n_docs) / sw, 6) AS weight,
       CAST(floor(round(sqrt(n_docs) / sw * tot, 6)) AS BIGINT) AS target_n
FROM c, s ORDER BY source
"""


def q_degree_histogram(sf_dir: str):
    """Degree distribution of the link graph (count of nodes per
    out-degree — the power-law sanity check): link_degrees' per-node
    exchange output re-counted through a second, tiny exchange."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.graph import link_degrees

    _, links_p = ensure_synth(sf_dir)
    deg = link_degrees(rd.read_parquet(links_p), "src_url", "dst_url")
    counts = grouped_agg(deg, ["out_deg"], [("out_deg", "count")],
                         rename={"out_deg_count": "n_nodes"})
    return ds_to_table(counts).sort_by([("out_deg", "ascending")])


SQL_DEGREE_HISTOGRAM = f"""
WITH u AS (
  SELECT src_url AS node, 1 AS o
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
  WHERE src_url IS NOT NULL
  UNION ALL
  SELECT dst_url, 0
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
  WHERE dst_url IS NOT NULL),
d AS (SELECT node, CAST(sum(o) AS BIGINT) AS out_deg FROM u GROUP BY node)
SELECT out_deg, count(*) AS n_nodes FROM d GROUP BY 1 ORDER BY 1
"""


def q_peak_fetch_rate(sf_dir: str):
    """Crawl-politeness ceiling: each host's PEAK fetches-per-minute (max
    over minutes of the per-(host, minute) count) — the rate-limit audit
    that complements fetch_gaps' spacing view.  Two chained exchanges:
    minute-cell counts, then per-host max of the (already tiny) cells."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    minute_us = 60_000_000
    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "warc_ts"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("warc_ts").combine_chunks()))
        host = pc.struct_field(
            pc.extract_regex(t.column("url").combine_chunks(), _HOST_RE),
            "host")
        m = pc.cast(pc.floor_temporal(t.column("warc_ts"), unit="minute"),
                    pa.int64())
        keep = pc.is_valid(host)
        return pa.table({"host": host, "m": m}).filter(keep)

    cells = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                        ["host", "m"], [("m", "count")],
                        rename={"m_count": "cnt"})
    peaks = grouped_agg(cells, ["host"], [("cnt", "max")],
                        rename={"cnt_max": "peak_per_min"})
    out = ds_to_table(peaks).sort_by([("host", "ascending")])
    return out.set_column(out.column_names.index("peak_per_min"),
                          "peak_per_min",
                          pc.cast(out.column("peak_per_min"), pa.int64()))


SQL_PEAK_FETCH_RATE = f"""
WITH h AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1) AS host,
                  date_trunc('minute', warc_ts) AS m
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
             AND warc_ts IS NOT NULL),
c AS (SELECT host, m, count(*) AS cnt FROM h GROUP BY 1, 2)
SELECT host, CAST(max(cnt) AS BIGINT) AS peak_per_min
FROM c GROUP BY 1 ORDER BY 1
"""


_TITLE_RE = r"<title>(?P<title>[^<]*)</title>"


def q_title_stats(sf_dir: str):
    """HTML field extraction profile: per declared lang, the count and
    length stats of <title> contents (RE2 field extraction on both
    engines; pages without a title excluded on both sides)."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["lang", "html"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.is_valid(t.column("html").combine_chunks())))
        h = pc.cast(t.column("html").combine_chunks(), pa.string())
        title = pc.struct_field(pc.extract_regex(h, _TITLE_RE), "title")
        keep = pc.is_valid(title)
        return pa.table({
            "lang": t.column("lang").combine_chunks().filter(keep),
            "tlen": pc.cast(pc.utf8_length(title.filter(keep)), pa.int64()),
        })

    agg = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                      ["lang"],
                      [("tlen", "count"), ("tlen", "sum"), ("tlen", "max")],
                      rename={"tlen_count": "n_pages", "tlen_sum": "len_sum",
                              "tlen_max": "max_len"})
    t = ds_to_table(agg).sort_by([("lang", "ascending")])
    n = t.column("n_pages").to_numpy(zero_copy_only=False).astype(np.float64)
    s = t.column("len_sum").to_numpy(zero_copy_only=False).astype(np.float64)
    return _round_cols(pa.table({
        "lang": t.column("lang"),
        "n_pages": pc.cast(t.column("n_pages"), pa.int64()),
        "avg_len": pa.array(s / n, pa.float64()),
        "max_len": pc.cast(t.column("max_len"), pa.int64()),
    }), {"avg_len": 6})


SQL_TITLE_STATS = f"""
WITH x AS (SELECT lang,
                  length(regexp_extract(decode(html),
                                        '<title>([^<]*)</title>', 1)) AS tlen
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE lang IS NOT NULL AND html IS NOT NULL
             AND regexp_matches(decode(html), '<title>([^<]*)</title>'))
SELECT lang, CAST(count(*) AS BIGINT) AS n_pages,
       round(CAST(sum(tlen) AS DOUBLE) / count(*), 6) AS avg_len,
       CAST(max(tlen) AS BIGINT) AS max_len
FROM x GROUP BY 1 ORDER BY 1
"""


def q_rolling_active_users(sf_dir: str):
    """Trailing-7-day distinct active users per day (exact windowed
    distinct at any user cardinality — see
    windows.rolling_distinct_count for the bounded-expansion shape)."""
    import ray.data as rd

    from webval.windows import rolling_distinct_count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = rolling_distinct_count(ds, key="user_id", ts_col="ts", window=7)
    t = ds_to_table(out).sort_by([("wd", "ascending")])
    day_us = 86_400_000_000
    wd = t.column("wd").to_numpy(zero_copy_only=False) * day_us
    return pa.table({
        "window_day": pa.array(wd).cast(pa.timestamp("us")),
        "active_users": pc.cast(t.column("active"), pa.int64()),
    })


SQL_ROLLING_ACTIVE_USERS = """
WITH a AS (SELECT DISTINCT user_id,
                  epoch_us(date_trunc('day', ts)) // 86400000000 AS d
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
days AS (SELECT DISTINCT d FROM a),
w AS (SELECT DISTINCT a.user_id, days.d AS wd
      FROM a JOIN days ON days.d BETWEEN a.d AND a.d + 6)
SELECT make_timestamp(wd * 86400000000) AS window_day,
       CAST(count(*) AS BIGINT) AS active_users
FROM w GROUP BY 1 ORDER BY 1
"""


def q_split_assign(sf_dir: str):
    """Deterministic 90/5/5 train/val/test assignment by the Knuth
    multiplicative hash (pipelines.assign_split) — the SAME CASE predicate
    runs in SQL, so per-split membership (not just the rates) is verified
    exactly; summarized as per-split doc and char counts."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.pipelines import assign_split

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    tagged = assign_split(ds, "doc_id")
    agg = grouped_agg(tagged, ["split"],
                      [("doc_id", "count"), ("n_chars", "sum")],
                      rename={"doc_id_count": "n_docs",
                              "n_chars_sum": "chars"})
    return ds_to_table(agg).sort_by([("split", "ascending")])


SQL_SPLIT_ASSIGN = """
SELECT CASE WHEN (doc_id * 2654435761) % 4294967296 < 3865470566
                THEN 'train'
            WHEN (doc_id * 2654435761) % 4294967296 < 4080218931
                THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(doc_id) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_zipf_fit(sf_dir: str):
    """Zipf's-law slope of the token frequency head (ln freq vs ln rank
    least squares over tokens with count ≥ 10) — the corpus-naturalness
    diagnostic.  Token counts come from the exchange; only the HEAD of
    the distribution (small by Zipf's own law) reaches the driver for the
    rank sort."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["html"])

    def toks(t: pa.Table) -> pa.Table:
        h = t.column("html").combine_chunks()
        h = pc.cast(h.filter(pc.is_valid(h)), pa.string())
        la = pc.split_pattern_regex(pc.utf8_lower(h), "[^a-z0-9]+")
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = pa.table({"tok": la.values})
        return flat.filter(pc.not_equal(flat.column("tok"), ""))

    counts = grouped_agg(ds.map_batches(toks, batch_format="pyarrow"),
                         ["tok"], [("tok", "count")],
                         rename={"tok_count": "cnt"})
    head = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt").combine_chunks(),
                                            10)),
        batch_format="pyarrow")
    t = ds_to_table(head)
    t = t.sort_by([("cnt", "descending"), ("tok", "ascending")])
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
    # <2 head points ⇒ slope undefined: emit NULL to match regr_slope's
    # NULL (ADVICE r3: the 0/0 here was a latent parity break on tiny sf)
    if len(c) < 2:
        slope = None
    else:
        x = np.log(np.arange(1, len(c) + 1, dtype=np.float64))
        y = np.log(c)
        xm, ym = x.mean(), y.mean()
        slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
    return _round_cols(pa.table({
        "n_head_tokens": pa.array([len(c)], pa.int64()),
        "zipf_slope": pa.array([slope], pa.float64()),
    }), {"zipf_slope": 6})


SQL_ZIPF_FIT = f"""
WITH tokc AS (SELECT t.tok AS tok, count(*) AS cnt
  FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet'),
       unnest(regexp_split_to_array(lower(decode(html)),
                                    '[^a-z0-9]+')) AS t(tok)
  WHERE html IS NOT NULL AND t.tok <> ''
  GROUP BY 1 HAVING count(*) >= 10),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
      FROM tokc)
SELECT CAST(count(*) AS BIGINT) AS n_head_tokens,
       round(regr_slope(ln(cnt), ln(rank)), 6) AS zipf_slope
FROM r
"""


def q_normalized_dup_groups(sf_dir: str):
    """Dedup after text normalization (lower + non-alnum collapse + trim
    — the first tier every dedup pipeline applies before hashing): groups
    of documents identical post-normalization, with sizes.  The
    normalization chain is the same RE2/utf8proc kernels in both
    engines."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["text"])

    def norm(t: pa.Table) -> pa.Table:
        s = t.column("text").combine_chunks()
        s = s.filter(pc.is_valid(s))
        n = pc.utf8_trim(pc.replace_substring_regex(
            pc.utf8_lower(s), "[^a-z0-9]+", " "), " ")
        return pa.table({"norm_text": n})

    counts = grouped_agg(ds.map_batches(norm, batch_format="pyarrow"),
                         ["norm_text"], [("norm_text", "count")],
                         rename={"norm_text_count": "n"})
    t = ds_to_table(counts)
    t = t.filter(pc.greater(t.column("n"), 1))
    return t.sort_by([("norm_text", "ascending")])


SQL_NORMALIZED_DUP_GROUPS = f"""
SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')
           AS norm_text,
       count(*) AS n
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE text IS NOT NULL
GROUP BY 1 HAVING count(*) > 1 ORDER BY 1
"""


def q_ks_drift(sf_dir: str):
    """Binned two-sample Kolmogorov-Smirnov statistic of l_extendedprice
    between even and odd orderkeys (drift.ks_statistic over shared
    width-5000 bins — the scalable KS variant; SQL twin via windowed
    cumulative sums)."""
    from webval.drift import ks_statistic

    ub, e, a = _two_side_counts(sf_dir, "lineitem", "l_orderkey",
                                "l_extendedprice", bin_fn=lambda x:
                                np.minimum(np.floor(x / 5000.0), 23.0)
                                .astype(np.int64))
    return _round_cols(pa.table({
        "n_bins": pa.array([len(ub)], pa.int64()),
        "ks": pa.array([ks_statistic(e, a)], pa.float64()),
    }), {"ks": 6})


SQL_KS_DRIFT = """
WITH c AS (SELECT CAST(l_orderkey % 2 AS INT) AS side,
                  CAST(least(floor(l_extendedprice / 5000), 23.0) AS BIGINT)
                      AS bin, count(*) AS cnt
           FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
b AS (SELECT DISTINCT bin FROM c),
m AS (SELECT b.bin,
             CAST(COALESCE(e.cnt, 0) AS DOUBLE) AS ce,
             CAST(COALESCE(a.cnt, 0) AS DOUBLE) AS ca
      FROM b LEFT JOIN c e ON e.bin = b.bin AND e.side = 0
             LEFT JOIN c a ON a.bin = b.bin AND a.side = 1),
g AS (SELECT sum(ce) OVER w / (SELECT sum(ce) FROM m) AS fe,
             sum(ca) OVER w / (SELECT sum(ca) FROM m) AS fa
      FROM m WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW))
SELECT CAST((SELECT count(*) FROM b) AS BIGINT) AS n_bins,
       round((SELECT max(abs(fa - fe)) FROM g), 6) AS ks
"""


def q_audio_stats(sf_dir: str):
    """Codec-free audio header parsing, round-tripped: plant canonical
    PCM WAV headers whose fields are pure functions of page_id
    (sr = {16000,22050,44100}[id%3]; ch = 1+id%2; 16-bit;
    n_samples = (id%1000)*100+1000), parse them back off the binary
    column with parse_wav_headers, and aggregate per sample rate.  The
    SQL twin recomputes the same aggregate from the id formulas — hashes
    match only if the byte-level WAV parser is correct."""
    import struct

    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.multimodal import parse_wav_headers

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id"])

    def make_media(t: pa.Table) -> pa.Table:
        ids = t.column("page_id").to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            sr = (16000, 22050, 44100)[int(i % 3)]
            ch = 1 + int(i % 2)
            nsamp = int(i % 1000) * 100 + 1000
            dsz = nsamp * ch * 2
            payloads.append(
                b"RIFF" + struct.pack("<I", 36 + dsz) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2,
                              ch * 2, 16)
                + b"data" + struct.pack("<I", dsz))
        return t.append_column("audio", pa.array(payloads, pa.binary()))

    parsed = parse_wav_headers(
        ds.map_batches(make_media, batch_format="pyarrow"), "audio")
    proj = parsed.map_batches(
        lambda t: pa.table({
            "sample_rate": pc.cast(t.column("audio_sample_rate"),
                                   pa.int64()),
            "samp": t.column("audio_n_samples"),
            "ch": pc.cast(t.column("audio_channels"), pa.int64())}),
        batch_format="pyarrow")
    out = grouped_agg(
        proj, ["sample_rate"],
        [("sample_rate", "count"), ("samp", "sum"), ("ch", "sum")],
        rename={"sample_rate_count": "n", "samp_sum": "sum_samples",
                "ch_sum": "sum_channels"})
    return ds_to_table(out).sort_by([("sample_rate", "ascending")])


SQL_AUDIO_STATS = f"""
SELECT CASE CAST(page_id % 3 AS INT) WHEN 0 THEN 16000
            WHEN 1 THEN 22050 ELSE 44100 END AS sample_rate,
       count(*) AS n,
       CAST(sum((page_id % 1000) * 100 + 1000) AS BIGINT) AS sum_samples,
       CAST(sum(1 + page_id % 2) AS BIGINT) AS sum_channels
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
GROUP BY 1 ORDER BY 1
"""


def q_grouped_regression(sf_dir: str):
    """Per-group least-squares slope/intercept (l_extendedprice vs
    l_quantity per returnflag) from one pass of exchange-summed moment
    columns — the grouped regr_slope/regr_intercept analytic, no
    per-group data materialization anywhere."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(
            pc.is_valid(t.column("l_returnflag").combine_chunks()),
            pc.is_valid(t.column("l_quantity").combine_chunks())),
            pc.is_valid(t.column("l_extendedprice").combine_chunks())))
        x = t.column("l_quantity").combine_chunks() \
             .to_numpy(zero_copy_only=False)
        y = t.column("l_extendedprice").combine_chunks() \
             .to_numpy(zero_copy_only=False)
        return pa.table({
            "flag": t.column("l_returnflag"),
            "x": pa.array(x), "y": pa.array(y),
            "xx": pa.array(x * x), "xy": pa.array(x * y),
        })

    agg = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                      ["flag"],
                      [("x", "count"), ("x", "sum"), ("y", "sum"),
                       ("xx", "sum"), ("xy", "sum")])
    t = ds_to_table(agg).sort_by([("flag", "ascending")])
    n = t.column("x_count").to_numpy(zero_copy_only=False) \
         .astype(np.float64)
    sx = t.column("x_sum").to_numpy(zero_copy_only=False)
    sy = t.column("y_sum").to_numpy(zero_copy_only=False)
    sxx = t.column("xx_sum").to_numpy(zero_copy_only=False)
    sxy = t.column("xy_sum").to_numpy(zero_copy_only=False)
    slope = (sxy / n - sx / n * (sy / n)) / (sxx / n - (sx / n) ** 2)
    intercept = sy / n - slope * (sx / n)
    return _round_cols(pa.table({
        "flag": t.column("flag"),
        "n": pc.cast(t.column("x_count"), pa.int64()),
        "slope": pa.array(slope, pa.float64()),
        "intercept": pa.array(intercept, pa.float64()),
    }), {"slope": 4, "intercept": 4})


SQL_GROUPED_REGRESSION = """
SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
  AND l_extendedprice IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_weighted_avg(sf_dir: str):
    """Weighted grouped average: revenue-weighted mean discount per
    returnflag (weight = extendedprice) — sum(w·x)/sum(w) from exchange
    partials, the SQL sum/sum idiom."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_discount", "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.and_(
            pc.is_valid(t.column("l_returnflag").combine_chunks()),
            pc.is_valid(t.column("l_discount").combine_chunks())),
            pc.is_valid(t.column("l_extendedprice").combine_chunks())))
        w = t.column("l_extendedprice").combine_chunks() \
             .to_numpy(zero_copy_only=False)
        x = t.column("l_discount").combine_chunks() \
             .to_numpy(zero_copy_only=False)
        return pa.table({"flag": t.column("l_returnflag"),
                         "w": pa.array(w), "wx": pa.array(w * x)})

    agg = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                      ["flag"], [("w", "sum"), ("wx", "sum")])
    t = ds_to_table(agg).sort_by([("flag", "ascending")])
    w = t.column("w_sum").to_numpy(zero_copy_only=False)
    wx = t.column("wx_sum").to_numpy(zero_copy_only=False)
    return _round_cols(pa.table({
        "flag": t.column("flag"),
        "wavg_discount": pa.array(wx / w, pa.float64()),
    }), {"wavg_discount": 6})


SQL_WEIGHTED_AVG = """
SELECT l_returnflag AS flag,
       round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6)
           AS wavg_discount
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL
  AND l_extendedprice IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_triangles(sf_dir: str):
    """Directed triangle count over the link graph (a→b, b→c, a→c — the
    graph-integrity density probe): distinct edges, a co-bucketed
    two-hop equi-join, then a composite-key SEMI join of the (a, c)
    closing pairs against the edge set — three exchanges, counts summed
    per block; no edge list ever lands on the driver."""
    import ray.data as rd

    from webval.exchange import distinct_rows, sum_block_scalars
    from webval.joins import equi_join

    _, links_p = ensure_synth(sf_dir)
    raw = rd.read_parquet(links_p, columns=["src_url", "dst_url"])
    proj = raw.map_batches(
        lambda t: t.filter(pc.and_(
            pc.is_valid(t.column("src_url").combine_chunks()),
            pc.is_valid(t.column("dst_url").combine_chunks()))),
        batch_format="pyarrow")
    # distinct edges, materialized: three consumers (two-hop left/right +
    # the closing semi-join probe)
    edges = distinct_rows(proj, ["src_url", "dst_url"]).materialize()

    hop1 = edges.map_batches(
        lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow")
    hop2 = edges.map_batches(
        lambda t: t.rename_columns(["b", "c"]), batch_format="pyarrow")
    # materialized: feeds both the path counter and the closing semi-join;
    # .count() on a materialized dataset is metadata-only (no extra pass)
    two_hop = equi_join(hop1, hop2, on="b", how="inner").materialize()
    n_paths = two_hop.count()
    closing = two_hop.map_batches(
        lambda t: t.select(["a", "c"]), batch_format="pyarrow")
    probe = edges.map_batches(
        lambda t: t.rename_columns(["a", "c"]), batch_format="pyarrow")
    tri = equi_join(closing, probe, on=["a", "c"], how="semi")
    parts = tri.map_batches(
        lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow")
    n = sum_block_scalars(parts.materialize(), ["n"])["n"]
    return pa.table({"n_two_hop_paths": pa.array([n_paths], pa.int64()),
                     "n_triangles": pa.array([n], pa.int64())})


SQL_TRIANGLES = f"""
WITH e AS (SELECT DISTINCT src_url, dst_url
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
           WHERE src_url IS NOT NULL AND dst_url IS NOT NULL)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e e1
        JOIN e e2 ON e1.dst_url = e2.src_url) AS n_two_hop_paths,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1 JOIN e e2 ON e1.dst_url = e2.src_url
JOIN e e3 ON e3.src_url = e1.src_url AND e3.dst_url = e2.dst_url
"""


def q_geo_mean(sf_dir: str):
    """Grouped geometric mean (exp of the mean log — the multiplicative
    average for skewed positive metrics) of l_extendedprice per
    returnflag, from one exchange pass of (Σ ln x, n) partials."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.is_valid(t.column("l_returnflag").combine_chunks()),
            pc.is_valid(t.column("l_extendedprice").combine_chunks())))
        x = t.column("l_extendedprice").combine_chunks() \
             .to_numpy(zero_copy_only=False)
        keep = x > 0
        return pa.table({
            "flag": t.column("l_returnflag").combine_chunks()
                     .filter(pa.array(keep)),
            "lx": pa.array(np.log(x[keep])),
        })

    agg = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                      ["flag"], [("lx", "count"), ("lx", "sum")])
    t = ds_to_table(agg).sort_by([("flag", "ascending")])
    n = t.column("lx_count").to_numpy(zero_copy_only=False) \
         .astype(np.float64)
    s = t.column("lx_sum").to_numpy(zero_copy_only=False)
    return _round_cols(pa.table({
        "flag": t.column("flag"),
        "n": pc.cast(t.column("lx_count"), pa.int64()),
        "geo_mean": pa.array(np.exp(s / n), pa.float64()),
    }), {"geo_mean": 4})


SQL_GEO_MEAN = """
SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
       round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_extendedprice > 0
GROUP BY 1 ORDER BY 1
"""


def q_gini_hosts(sf_dir: str):
    """Gini coefficient of the per-host page-count distribution — the
    crawl-coverage-inequality probe (0 = perfectly even crawl, →1 = one
    host dominates).  Host counts come off the exchange; the rank-sum
    finalize runs on the (host-cardinality-sized) count table."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host.filter(pc.is_valid(host))})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["host"], [("host", "count")],
                         rename={"host_count": "cnt"})
    t = ds_to_table(counts)
    x = np.sort(t.column("cnt").to_numpy(zero_copy_only=False)
                 .astype(np.float64))
    n = len(x)
    if n == 0 or x.sum() == 0:
        gini = 0.0
    else:
        i = np.arange(1, n + 1, dtype=np.float64)
        gini = float((2.0 * (i * x).sum()) / (n * x.sum()) - (n + 1.0) / n)
    return _round_cols(pa.table({
        "n_hosts": pa.array([n], pa.int64()),
        "gini": pa.array([gini], pa.float64()),
    }), {"gini": 6})


SQL_GINI_HOSTS = f"""
WITH c AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
               AS host, CAST(count(*) AS DOUBLE) AS cnt
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
           GROUP BY 1),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, host) AS i FROM c)
SELECT CAST(count(*) AS BIGINT) AS n_hosts,
       round(2.0 * sum(i * cnt) / (count(*) * sum(cnt))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r
"""


def q_benford_digits(sf_dir: str):
    """Benford's-law first-digit audit of l_extendedprice (the classic
    fabricated-numbers screen): observed first-digit counts of the
    integer part plus the chi-square statistic against the Benford
    expectation.  Digit extraction is pure int64 arithmetic (floor, then
    divide by 10 until < 10) so both engines agree exactly."""
    import math

    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        x = t.column("l_extendedprice").combine_chunks()
        x = x.filter(pc.is_valid(x)).to_numpy(zero_copy_only=False)
        d = np.floor(np.abs(x)).astype(np.int64)
        d = d[d >= 1]
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        return pa.table({"digit": pa.array(d)})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["digit"], [("digit", "count")],
                         rename={"digit_count": "cnt"})
    t = ds_to_table(counts).sort_by([("digit", "ascending")])
    dig = t.column("digit").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False) \
           .astype(np.float64)
    n = cnt.sum()
    obs = np.zeros(9)
    obs[dig - 1] = cnt
    exp = np.array([math.log10(1 + 1 / k) for k in range(1, 10)]) * n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    out = pa.table({
        "digit": pc.cast(t.column("digit"), pa.int64()),
        "cnt": pc.cast(t.column("cnt"), pa.int64()),
        "chi2_vs_benford": pa.array([chi2] * len(dig), pa.float64()),
    })
    return _round_cols(out, {"chi2_vs_benford": 4})


SQL_BENFORD_DIGITS = """
WITH d0 AS (SELECT CAST(floor(abs(l_extendedprice)) AS BIGINT) AS d
            FROM lineitem WHERE l_extendedprice IS NOT NULL),
d AS (SELECT CAST(substr(CAST(d AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM d0 WHERE d >= 1),
c AS (SELECT digit, CAST(count(*) AS DOUBLE) AS cnt FROM d GROUP BY 1),
n AS (SELECT sum(cnt) AS n FROM c),
x AS (SELECT sum((COALESCE(c.cnt, 0) - log10(1.0 + 1.0 / k.k) * n.n)
                 * (COALESCE(c.cnt, 0) - log10(1.0 + 1.0 / k.k) * n.n)
                 / (log10(1.0 + 1.0 / k.k) * n.n)) AS chi2
      FROM (SELECT unnest(range(1, 10)) AS k) k
      CROSS JOIN n LEFT JOIN c ON c.digit = k.k)
SELECT c.digit, CAST(c.cnt AS BIGINT) AS cnt,
       round((SELECT chi2 FROM x), 4) AS chi2_vs_benford
FROM c ORDER BY c.digit
"""


def _hourly_counts_table(sf_dir: str) -> pa.Table:
    """Shared: exact events-per-hour through the exchange, sorted (the
    small series the time-series diagnostics finalize on)."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def proj(t: pa.Table) -> pa.Table:
        ts = t.column("ts").combine_chunks()
        ts = ts.filter(pc.is_valid(ts))
        return pa.table({"h_us": pc.cast(
            pc.floor_temporal(ts, unit="hour"), pa.int64())})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["h_us"], [("h_us", "count")],
                         rename={"h_us_count": "cnt"})
    return ds_to_table(counts).sort_by([("h_us", "ascending")])


def q_cusum_changepoint(sf_dir: str):
    """CUSUM level-shift detection on the hourly event-count series: the
    hour where the cumulative sum of (count − mean) attains its maximum
    absolute value — the classic single-changepoint estimate.  Series is
    exchange-built and hour-sized; ties break to the earliest hour on
    both engines."""
    t = _hourly_counts_table(sf_dir)
    if t.num_rows == 0:                  # SQL twin: LIMIT 1 over empty CTE
        return pa.table({"cp_hour": pa.array([], pa.timestamp("us")),
                         "max_abs_cusum": pa.array([], pa.float64())})
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
    h = t.column("h_us").to_numpy(zero_copy_only=False)
    s = np.cumsum(c - c.mean())
    i = int(np.argmax(np.abs(s)))        # first max — earliest-hour tie rule
    return _round_cols(pa.table({
        "cp_hour": pa.array([h[i]]).cast(pa.timestamp("us")),
        "max_abs_cusum": pa.array([abs(float(s[i]))], pa.float64()),
    }), {"max_abs_cusum": 6})


SQL_CUSUM_CHANGEPOINT = """
WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt
           FROM events WHERE ts IS NOT NULL GROUP BY 1),
s AS (SELECT hour,
             sum(cnt - (SELECT avg(cnt) FROM c)) OVER
                 (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS cus
      FROM c)
SELECT hour AS cp_hour, round(abs(cus), 6) AS max_abs_cusum
FROM s ORDER BY abs(cus) DESC, hour LIMIT 1
"""


def q_lag1_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series (the
    self-similarity / seasonality screen): Pearson corr of consecutive
    ordered rows — corr(x_t, x_{t-1}) over the hour-ordered series (gaps,
    if any, pair across them; the fixture's hours are dense)."""
    t = _hourly_counts_table(sf_dir)
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
    x, y = c[1:], c[:-1]
    n = len(x)
    vx = (x * x).sum() * n - x.sum() ** 2
    vy = (y * y).sum() * n - y.sum() ** 2
    # degenerate series (constant counts or < 2 hours): SQL corr() is NULL
    r = (float((n * (x * y).sum() - x.sum() * y.sum())
               / np.sqrt(vx * vy))
         if n > 0 and vx > 0 and vy > 0 else None)
    return _round_cols(pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        "lag1_autocorr": pa.array([r], pa.float64()),
    }), {"lag1_autocorr": 6})


SQL_LAG1_AUTOCORR = """
WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt
           FROM events WHERE ts IS NOT NULL GROUP BY 1),
p AS (SELECT cnt AS x, lag(cnt) OVER (ORDER BY hour) AS y FROM c)
SELECT CAST(count(y) AS BIGINT) AS n_pairs,
       round(corr(x, y), 6) AS lag1_autocorr
FROM p WHERE y IS NOT NULL
"""


def q_mutual_info(sf_dir: str):
    """Mutual information (nats) between the documents lang and source
    columns — the drift family's dependence measure alongside chi-square /
    Cramér's V, from the same exact contingency-count exchange."""
    import ray.data as rd

    from webval.drift import mutual_information
    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["lang", "source"])
        return t.filter(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.is_valid(t.column("source").combine_chunks())))

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["lang", "source"], [("lang", "count")],
                         rename={"lang_count": "cnt"})
    t = ds_to_table(counts)
    langs = t.column("lang").to_numpy(zero_copy_only=False)
    srcs = t.column("source").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    ul, us = np.unique(langs), np.unique(srcs)
    mat = np.zeros((len(ul), len(us)), dtype=np.float64)
    mat[np.searchsorted(ul, langs), np.searchsorted(us, srcs)] = cnt
    mi, n = mutual_information(mat)
    return _round_cols(pa.table({
        "n_cells": pa.array([t.num_rows], pa.int64()),
        "n": pa.array([n], pa.int64()),
        "mi_nats": pa.array([mi], pa.float64()),
    }), {"mi_nats": 6})


SQL_MUTUAL_INFO = """
WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
           FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
           GROUP BY 1, 2),
n AS (SELECT sum(o) AS n FROM c),
rt AS (SELECT lang, sum(o) AS r FROM c GROUP BY 1),
ct AS (SELECT source, sum(o) AS cl FROM c GROUP BY 1)
SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cells,
       CAST((SELECT n FROM n) AS BIGINT) AS n,
       round(sum((c.o / n.n) * ln(c.o * n.n / (rt.r * ct.cl))), 6) AS mi_nats
FROM c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
"""


def q_winsorized_stats(sf_dir: str):
    """Winsorized (p05/p95-clipped) summary of l_quantity: exact
    quantile_cont fences and the clipped mean / clip counts, ALL finalized
    from ONE value-count exchange (rank.value_histogram — bounded by
    distinct-value cardinality, the right exact path for bounded-domain
    measures; near-unique columns take the t-digest route instead)."""
    import ray.data as rd

    from webval.rank import quantiles_from_histogram, value_histogram

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])
    t = ds_to_table(value_histogram(ds, "l_quantity"))
    v = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(
        np.float64)
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = quantiles_from_histogram(v, c, [0.05, 0.95], interpolate=True)
    clipped = np.clip(v, lo, hi)
    n = int(c.sum())
    return _round_cols(pa.table({
        "lo": pa.array([lo], pa.float64()),
        "hi": pa.array([hi], pa.float64()),
        "wmean": pa.array([float((clipped * c).sum() / n)], pa.float64()),
        "n_clipped_lo": pa.array([int(c[v < lo].sum())], pa.int64()),
        "n_clipped_hi": pa.array([int(c[v > hi].sum())], pa.int64()),
    }), {"lo": 6, "hi": 6, "wmean": 6})


SQL_WINSORIZED_STATS = """
WITH q AS (SELECT quantile_cont(l_quantity, 0.05) AS lo,
                  quantile_cont(l_quantity, 0.95) AS hi
           FROM lineitem WHERE l_quantity IS NOT NULL)
SELECT round((SELECT lo FROM q), 6) AS lo,
       round((SELECT hi FROM q), 6) AS hi,
       round(avg(least(greatest(l_quantity, q.lo), q.hi)), 6) AS wmean,
       CAST(count(*) FILTER (l_quantity < q.lo) AS BIGINT) AS n_clipped_lo,
       CAST(count(*) FILTER (l_quantity > q.hi) AS BIGINT) AS n_clipped_hi
FROM lineitem CROSS JOIN q WHERE l_quantity IS NOT NULL
"""


def q_equidepth_hist(sf_dir: str):
    """Equi-depth (quantile-binned) histogram of l_quantity, k=5: bucket
    upper edges are the exact quantile_disc order statistics, counts are
    the rows in each half-open (prev_edge, edge] bin."""
    import ray.data as rd

    from webval.rank import equidepth_histogram

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])
    return equidepth_histogram(ds, "l_quantity", 5)


SQL_EQUIDEPTH_HIST = """
WITH q AS (SELECT quantile_disc(l_quantity, 0.2) AS e1,
                  quantile_disc(l_quantity, 0.4) AS e2,
                  quantile_disc(l_quantity, 0.6) AS e3,
                  quantile_disc(l_quantity, 0.8) AS e4,
                  quantile_disc(l_quantity, 1.0) AS e5
           FROM lineitem WHERE l_quantity IS NOT NULL),
l AS (SELECT l_quantity AS v FROM lineitem WHERE l_quantity IS NOT NULL)
SELECT 1 AS bin, q.e1 AS hi_edge,
       CAST(count(*) FILTER (v <= q.e1) AS BIGINT) AS cnt FROM l, q GROUP BY 2
UNION ALL SELECT 2, q.e2,
       CAST(count(*) FILTER (v > q.e1 AND v <= q.e2) AS BIGINT) FROM l, q GROUP BY 2
UNION ALL SELECT 3, q.e3,
       CAST(count(*) FILTER (v > q.e2 AND v <= q.e3) AS BIGINT) FROM l, q GROUP BY 2
UNION ALL SELECT 4, q.e4,
       CAST(count(*) FILTER (v > q.e3 AND v <= q.e4) AS BIGINT) FROM l, q GROUP BY 2
UNION ALL SELECT 5, q.e5,
       CAST(count(*) FILTER (v > q.e4 AND v <= q.e5) AS BIGINT) FROM l, q GROUP BY 2
"""


def q_group_sample(sf_dir: str):
    """Exactly-5-per-lang deterministic document sample (the per-stratum
    quota sampler): membership = the 5 smallest Knuth hashes of doc_id per
    lang, identical to the SQL row_number() twin on any engine."""
    import ray.data as rd

    from webval.pipelines import grouped_fixed_size_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    out = grouped_fixed_size_sample(ds, "doc_id", "lang", 5)
    return ds_to_table(out).select(["lang", "doc_id"]).sort_by(
        [("lang", "ascending"), ("doc_id", "ascending")])


SQL_GROUP_SAMPLE = """
WITH h AS (SELECT lang, doc_id,
                  (doc_id * 2654435761) % 4294967296 AS hash
           FROM documents),
r AS (SELECT lang, doc_id, row_number() OVER
          (PARTITION BY lang ORDER BY hash, doc_id) AS rn FROM h)
SELECT lang, doc_id FROM r WHERE rn <= 5 ORDER BY lang, doc_id
"""


def q_hll_setops(sf_dir: str):
    """Set-cardinality audit of two event cohorts (click vs purchase
    user_ids): EXACT |A|, |B|, |A∪B| via the distinct exchange and |A∩B|
    by inclusion-exclusion — with the grouped-HLL estimates of all three
    sets (one tripled-stream exchange pass) self-asserted within 3%."""
    import ray.data as rd

    from webval.exchange import grouped_agg, grouped_approx_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def proj(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        uid = t.column("user_id").combine_chunks()
        keep = pc.and_(pc.is_valid(uid),
                       pc.is_in(et, value_set=pa.array(["click",
                                                        "purchase"])))
        et, uid = et.filter(keep), uid.filter(keep)
        # doubled stream: each row also feeds the "__union__" pseudo-side
        # (constant column built vectorized: nulls + fill, no Python list)
        side = pa.concat_arrays(
            [et, pa.nulls(len(et), pa.string()).fill_null("__union__")])
        return pa.table({"side": side, "user_id": pa.concat_arrays([uid] * 2)})

    tripled = ds.map_batches(proj, batch_format="pyarrow")
    from webval.exchange import distinct_rows

    exact = ds_to_table(grouped_agg(
        distinct_rows(tripled, ["side", "user_id"]),
        ["side"], [("user_id", "count")], rename={"user_id_count": "n"}))
    ex = {s: n for s, n in zip(exact.column("side").to_pylist(),
                               exact.column("n").to_pylist())}
    est_t = ds_to_table(grouped_approx_distinct(tripled, "side", "user_id"))
    for s, e in zip(est_t.column("side").to_pylist(),
                    est_t.column("approx_distinct").to_pylist()):
        if abs(e - ex[s]) > 0.03 * max(ex[s], 1):
            raise AssertionError(f"HLL {s}: est {e} vs exact {ex[s]}")
    a, b, u = ex["click"], ex["purchase"], ex["__union__"]
    return pa.table({
        "a_distinct": pa.array([a], pa.int64()),
        "b_distinct": pa.array([b], pa.int64()),
        "union_distinct": pa.array([u], pa.int64()),
        "intersect_distinct": pa.array([a + b - u], pa.int64()),
        "hll_est_ok": pa.array([1], pa.int64()),
    })


SQL_HLL_SETOPS = """
WITH e AS (SELECT event_type, user_id FROM events
           WHERE user_id IS NOT NULL
             AND event_type IN ('click', 'purchase'))
SELECT CAST(count(DISTINCT user_id) FILTER (event_type = 'click')
            AS BIGINT) AS a_distinct,
       CAST(count(DISTINCT user_id) FILTER (event_type = 'purchase')
            AS BIGINT) AS b_distinct,
       CAST(count(DISTINCT user_id) AS BIGINT) AS union_distinct,
       CAST(count(DISTINCT user_id) FILTER (event_type = 'click')
            + count(DISTINCT user_id) FILTER (event_type = 'purchase')
            - count(DISTINCT user_id) AS BIGINT) AS intersect_distinct,
       CAST(1 AS BIGINT) AS hll_est_ok
FROM e
"""


def q_impute_mode(sf_dir: str):
    """Mode imputation of the webpages lang column (nulls → corpus modal
    lang, ties to the smallest): post-fill per-lang counts, so the hash
    check verifies both the mode selection and the fill."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.pipelines import impute_mode

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["lang"])
    filled, mode_val = impute_mode(ds, "lang")
    counts = grouped_agg(filled, ["lang"], [("lang", "count")],
                         rename={"lang_count": "cnt"})
    return ds_to_table(counts).sort_by([("lang", "ascending")])


SQL_IMPUTE_MODE = f"""
WITH p AS (SELECT lang FROM
           read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')),
m AS (SELECT lang FROM (SELECT lang, count(*) AS c FROM p
                        WHERE lang IS NOT NULL GROUP BY 1)
      ORDER BY c DESC, lang LIMIT 1)
SELECT COALESCE(p.lang, (SELECT lang FROM m)) AS lang,
       count(*) AS cnt
FROM p GROUP BY 1 ORDER BY 1
"""


def q_transition_counts(sf_dir: str):
    """First-order Markov transition counts of event_type along each
    user's time-ordered sequence (windows.transition_counts: co-bucketed
    lag pairs → pair-count exchange); the behavioral-drift profile."""
    import ray.data as rd

    from webval.windows import transition_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    out = transition_counts(ds, "user_id", "ts", "event_type",
                            tie_cols=["event_id"])
    return ds_to_table(out).sort_by([("prev_state", "ascending"),
                                     ("state", "ascending")])


SQL_TRANSITION_COUNTS = """
WITH x AS (SELECT user_id, ts, event_id, event_type FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IS NOT NULL),
l AS (SELECT event_type AS state,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM x)
SELECT prev_state, state, CAST(count(*) AS BIGINT) AS cnt
FROM l WHERE prev_state IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_wasserstein_drift(sf_dir: str):
    """Binned 1-D earth-mover (Wasserstein-1) drift of l_extendedprice
    between even and odd orderkeys — the magnitude-aware companion of
    ks_drift over the same shared width-5000 bins (value-unit distance =
    bin-index W1 × width; SQL twin via the windowed cumulative CDFs)."""
    from webval.drift import wasserstein_binned

    ub, e, a = _two_side_counts(sf_dir, "lineitem", "l_orderkey",
                                "l_extendedprice", bin_fn=lambda x:
                                np.minimum(np.floor(x / 5000.0), 23.0)
                                .astype(np.int64))
    return _round_cols(pa.table({
        "n_bins": pa.array([len(ub)], pa.int64()),
        "w1": pa.array([wasserstein_binned(e, a, width=5000.0)],
                       pa.float64()),
    }), {"w1": 6})


SQL_WASSERSTEIN_DRIFT = """
WITH c AS (SELECT CAST(l_orderkey % 2 AS INT) AS side,
                  CAST(least(floor(l_extendedprice / 5000), 23.0) AS BIGINT)
                      AS bin, count(*) AS cnt
           FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
b AS (SELECT DISTINCT bin FROM c),
m AS (SELECT b.bin,
             CAST(COALESCE(e.cnt, 0) AS DOUBLE) AS ce,
             CAST(COALESCE(a.cnt, 0) AS DOUBLE) AS ca
      FROM b LEFT JOIN c e ON e.bin = b.bin AND e.side = 0
             LEFT JOIN c a ON a.bin = b.bin AND a.side = 1),
g AS (SELECT sum(ce) OVER w / (SELECT sum(ce) FROM m) AS fe,
             sum(ca) OVER w / (SELECT sum(ca) FROM m) AS fa
      FROM m WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW))
SELECT CAST((SELECT count(*) FROM b) AS BIGINT) AS n_bins,
       round((SELECT 5000.0 * sum(abs(fa - fe)) FROM g), 6) AS w1
"""


def q_pmi_bigrams(sf_dir: str):
    """PMI-scored frequent bigrams (collocation mining): the ≥25-count
    bigrams with ln of their pointwise mutual information against the
    unigram frequencies.  Scale shape: bigram counts via the
    frequent_ngrams combiner exchange (output bounded by the threshold);
    unigram counts computed only for the words of those bigrams (filter
    against the broadcast word set before the count exchange); corpus
    totals as per-block scalars (exchange.sum_block_scalars)."""
    import math

    import ray.data as rd

    from webval.exchange import grouped_agg, sum_block_scalars
    from webval.textclean import _split_lines, frequent_ngrams

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    bg = ds_to_table(frequent_ngrams(ds, "text", n=2, min_count=25))
    if bg.num_rows == 0:
        return pa.table({"ngram": pa.array([], pa.large_string()),
                         "cnt": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})
    grams = bg.column("ngram").to_pylist()
    words = sorted({w for g in grams for w in g.split(" ")})
    word_set = pa.array(words, pa.large_string())

    def uni(t: pa.Table) -> pa.Table:
        flat, _off = _split_lines(t.column("text"), " ")
        return pa.table({"w": flat.filter(pc.is_in(flat,
                                                   value_set=word_set))})

    uc_t = ds_to_table(grouped_agg(
        ds.map_batches(uni, batch_format="pyarrow"),
        ["w"], [("w", "count")], rename={"w_count": "c"}))
    uc = dict(zip(uc_t.column("w").to_pylist(),
                  uc_t.column("c").to_pylist()))

    def totals(t: pa.Table) -> pa.Table:
        flat, off = _split_lines(t.column("text"), " ")
        counts = np.diff(off)
        return pa.table({
            "n_tok": pa.array([int(counts.sum())], pa.int64()),
            "n_bg": pa.array([int(np.maximum(counts - 1, 0).sum())],
                             pa.int64())})

    tot = sum_block_scalars(
        ds.map_batches(totals, batch_format="pyarrow").materialize(),
        ["n_tok", "n_bg"])
    n_tok, n_bg = tot["n_tok"], tot["n_bg"]
    cnts = bg.column("cnt").to_pylist()
    pmi = [math.log((c / n_bg) * (n_tok / uc[g.split(" ")[0]])
                    * (n_tok / uc[g.split(" ")[1]]))
           for g, c in zip(grams, cnts)]
    return _round_cols(pa.table({
        "ngram": pa.array(grams, pa.large_string()),
        "cnt": pa.array(cnts, pa.int64()),
        "pmi": pa.array(pmi, pa.float64()),
    }).sort_by([("ngram", "ascending")]), {"pmi": 6})


SQL_PMI_BIGRAMS = """
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents
           WHERE text IS NOT NULL),
tot AS (SELECT sum(len(ws)) AS n_tok,
               sum(greatest(len(ws) - 1, 0)) AS n_bg FROM w),
bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1])) AS b
       FROM w),
bc AS (SELECT b, count(*) AS c FROM bg GROUP BY b HAVING count(*) >= 25),
ug AS (SELECT unnest(ws) AS u FROM w),
uc AS (SELECT u, count(*) AS c FROM ug GROUP BY u)
SELECT bc.b AS ngram, CAST(bc.c AS BIGINT) AS cnt,
       round(ln((bc.c / tot.n_bg) * (tot.n_tok / u1.c)
                * (tot.n_tok / u2.c)), 6) AS pmi
FROM bc, tot, uc u1, uc u2
WHERE u1.u = string_split(bc.b, ' ')[1]
  AND u2.u = string_split(bc.b, ' ')[2]
ORDER BY ngram
"""


def q_event_type_lift(sf_dir: str):
    """Event-type co-occurrence lift (market-basket association over
    users): for each unordered type pair, n_users·P(a,b)/(P(a)·P(b)) —
    distinct (user, type) exchange → co-bucketed self equi-join → pair
    count; singles/user counts from the same distinct stream."""
    import ray.data as rd

    from webval.exchange import distinct_rows, grouped_agg
    from webval.joins import equi_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "event_type"])
        return t.filter(pc.and_(
            pc.is_valid(t.column("user_id").combine_chunks()),
            pc.is_valid(t.column("event_type").combine_chunks())))

    d = ds.map_batches(proj, batch_format="pyarrow")
    dd = distinct_rows(d, ["user_id", "event_type"]).materialize()
    pairs = equi_join(dd, dd, on="user_id").map_batches(
        lambda t: t.filter(pc.less(t.column("event_type"),
                                   t.column("event_type_r"))),
        batch_format="pyarrow")
    pc_t = ds_to_table(grouped_agg(
        pairs, ["event_type", "event_type_r"], [("user_id", "count")],
        rename={"user_id_count": "n_ab"}))
    singles = ds_to_table(grouped_agg(
        dd, ["event_type"], [("user_id", "count")],
        rename={"user_id_count": "n"}))
    cs = dict(zip(singles.column("event_type").to_pylist(),
                  singles.column("n").to_pylist()))
    n_users = distinct_rows(dd, ["user_id"]).count()
    t1 = pc_t.column("event_type").to_pylist()
    t2 = pc_t.column("event_type_r").to_pylist()
    ab = pc_t.column("n_ab").to_pylist()
    lift = [(n_users * c) / (cs[a] * cs[b])
            for a, b, c in zip(t1, t2, ab)]
    return _round_cols(pa.table({
        "t1": pa.array(t1), "t2": pa.array(t2),
        "n_ab": pa.array(ab, pa.int64()),
        "lift": pa.array(lift, pa.float64()),
    }).sort_by([("t1", "ascending"), ("t2", "ascending")]), {"lift": 6})


SQL_EVENT_TYPE_LIFT = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_ab
      FROM d a JOIN d b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
      GROUP BY 1, 2),
c AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
u AS (SELECT count(DISTINCT user_id) AS n FROM d)
SELECT p.t1, p.t2, CAST(p.n_ab AS BIGINT) AS n_ab,
       round((u.n * p.n_ab) / (c1.n * c2.n), 6) AS lift
FROM p, u, c c1, c c2
WHERE c1.event_type = p.t1 AND c2.event_type = p.t2
ORDER BY 1, 2
"""


def q_dup_cluster_sizes(sf_dir: str):
    """Dedup diagnostics: the distribution of duplicate-url cluster sizes
    (how much of the crawl is 2×, 3×, … re-fetches) — the url-count
    exchange re-aggregated by count value; both shuffles combiner-bounded."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url"])
    per_url = grouped_agg(ds, ["url"], [("url", "count")],
                          rename={"url_count": "sz"})
    dups = per_url.map_batches(
        lambda t: t.select(["sz"]).filter(
            pc.greater(t.column("sz"), pa.scalar(1, pa.int64()))),
        batch_format="pyarrow")
    out = grouped_agg(dups, ["sz"], [("sz", "count")],
                      rename={"sz_count": "n_clusters"})
    return ds_to_table(out).sort_by([("sz", "ascending")])


SQL_DUP_CLUSTER_SIZES = f"""
WITH c AS (SELECT url, count(*) AS sz FROM
           read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           GROUP BY url)
SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
FROM c WHERE sz > 1 GROUP BY sz ORDER BY sz
"""


def q_quality_top_fraction(sf_dir: str):
    """Quality top-X% selection (the LLM-curation 'keep the best quartile
    per language' op): per-lang exact p75 length thresholds from the
    (key, value) quantile exchange, broadcast into a stateless filter,
    kept-count per lang — data never leaves the stream."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.rank import grouped_exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    thr_t = ds_to_table(grouped_exact_quantiles(
        ds, "lang", "n_chars", {"thr": 0.75}))
    thr_langs = thr_t.column("lang").combine_chunks()
    thr_vals = pc.cast(thr_t.column("thr"), pa.int64()).combine_chunks()
    thr = dict(zip(thr_langs.to_pylist(), thr_vals.to_pylist()))

    def keep(t: pa.Table) -> pa.Table:
        lang = t.column("lang").combine_chunks()
        nc = t.column("n_chars").combine_chunks()
        lo = thr_vals.take(pc.index_in(lang, value_set=thr_langs))
        m = pc.and_(pc.is_valid(nc), pc.greater_equal(nc, lo))
        return t.filter(pc.fill_null(m, False))

    kept = grouped_agg(ds.map_batches(keep, batch_format="pyarrow"),
                       ["lang"], [("lang", "count")],
                       rename={"lang_count": "n_kept"})
    out = ds_to_table(kept)
    out = out.append_column("thr", pa.array(
        [thr[v] for v in out.column("lang").to_pylist()], pa.int64()))
    return out.sort_by([("lang", "ascending")])


SQL_QUALITY_TOP_FRACTION = """
WITH t AS (SELECT lang, quantile_disc(n_chars, 0.75) AS thr
           FROM documents WHERE n_chars IS NOT NULL GROUP BY lang)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept, t.thr
FROM documents d JOIN t ON d.lang = t.lang
WHERE d.n_chars >= t.thr
GROUP BY d.lang, t.thr ORDER BY d.lang
"""


def q_fd_multi_lang_hosts(sf_dir: str):
    """Functional-dependency audit (data-quality classic): does the URL's
    first host label determine the page language?  Hosts carrying >1
    distinct lang are FD violations — distinct (host, lang) pairs through
    the exchange, per-host distinct counts, filtered.  The scale variant
    fingerprints wide determinant/dependent columns first (dedup.py); here
    both sides are short strings so the twin is value-exact.  (r5s: was
    named q_fd_violations and silently SHADOWED by the later row-level
    repair query of the same name — the r4s9 lesson recurring at module
    scope; renamed so both surfaces stay live, and an AST test now pins
    module-level definition uniqueness.)"""
    import ray.data as rd

    from webval.exchange import distinct_rows, grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "lang"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        st = pc.extract_regex(u, _HOST_RE)
        host = pc.struct_field(st, "host")
        lang = t.column("lang").combine_chunks()
        keep = pc.and_(pc.is_valid(host), pc.is_valid(lang))
        return pa.table({"host": host.filter(keep),
                         "lang": lang.filter(keep)})

    pairs = distinct_rows(ds.map_batches(proj, batch_format="pyarrow"),
                          ["host", "lang"])
    per_host = grouped_agg(pairs, ["host"], [("lang", "count")],
                           rename={"lang_count": "n_langs"})
    viol = per_host.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_langs"),
                                      pa.scalar(1, pa.int64()))),
        batch_format="pyarrow")
    return ds_to_table(viol).sort_by([("host", "ascending")])


SQL_FD_MULTI_LANG_HOSTS = f"""
WITH p AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS host, lang
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
             AND lang IS NOT NULL)
SELECT host, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM p GROUP BY host HAVING count(DISTINCT lang) > 1 ORDER BY host
"""


def q_category_codes(sf_dir: str):
    """Stable categorical encoding (the feature-pipeline dictionary
    build): dense integer codes for the documents source column in sorted
    value order, with per-category counts — a pure function of the value
    set, so codes are identical across runs, engines and cluster sizes."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source"])
    counts = ds_to_table(grouped_agg(
        ds.map_batches(
            lambda t: pa.table({"source":
                                t.column("source").combine_chunks().filter(
                                    pc.is_valid(t.column("source")
                                                .combine_chunks()))}),
            batch_format="pyarrow"),
        ["source"], [("source", "count")], rename={"source_count": "n"}))
    counts = counts.sort_by([("source", "ascending")])
    return counts.append_column(
        "code", pa.array(np.arange(1, counts.num_rows + 1), pa.int64()))


SQL_CATEGORY_CODES = """
SELECT source, CAST(count(*) AS BIGINT) AS n,
       CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) AS code
FROM documents WHERE source IS NOT NULL
GROUP BY source ORDER BY source
"""


def q_grouped_skew_kurt(sf_dir: str):
    """Per-group distribution-shape diagnostics: bias-corrected sample
    skewness (G1) and excess kurtosis (G2) of l_quantity by returnflag —
    the moments family completed past mean/std (aggregates.
    grouped_higher_moments: additive power-sum partials through the hash
    exchange, SQL skewness()/kurtosis() NULL semantics at n<3 / n<4 /
    zero variance)."""
    import ray.data as rd

    from webval.aggregates import grouped_higher_moments

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    out = ds_to_table(grouped_higher_moments(ds, "l_returnflag",
                                             "l_quantity"))
    return _round_cols(out, {"skewness": 6, "kurtosis": 6}) \
        .sort_by([("l_returnflag", "ascending")])


SQL_GROUPED_SKEW_KURT = """
SELECT l_returnflag, CAST(count(l_quantity) AS BIGINT) AS n,
       round(skewness(l_quantity), 6) AS skewness,
       round(kurtosis(l_quantity), 6) AS kurtosis
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_interval_coverage(sf_dir: str):
    """Per-user covered active time after merging overlapping spans
    (interval-union rollup, windows.interval_coverage): each event opens a
    span of floor(value) minutes; overlaps collapse into islands and only
    the union counts.  Combiner-less key exchange + one vectorized
    segmented cummax sweep per bucket; the SQL twin is the classic
    window-function islands query."""
    import ray.data as rd

    from webval.windows import interval_coverage

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def proj(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("ts").combine_chunks(), pa.int64())
        v = t.column("value").combine_chunks()
        dur = pc.cast(pc.floor(pc.multiply(
            pc.cast(v, pa.float64()),
            pa.scalar(60_000_000.0))), pa.int64())
        return pa.table({"user_id": t.column("user_id"),
                         "s": s, "e": pc.add(s, dur)})

    out = interval_coverage(ds.map_batches(proj, batch_format="pyarrow"),
                            "user_id", "s", "e")
    return ds_to_table(out).sort_by([("user_id", "ascending")])


def q_reciprocity(sf_dir: str):
    """Directed-edge reciprocity (graph.reciprocity) over a dense derived
    graph (supplier→part mod-200 id space — the real links fixture is a
    pure crawl tree with reciprocity 0, which exercises nothing): distinct
    edges via the dedup exchange, reversed-key SEMI self-join for the
    reciprocal count."""
    import ray.data as rd

    from webval.graph import reciprocity

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])
    edges = ds.map_batches(
        lambda t: pa.table({
            "src": pa.array(t.column("l_suppkey").to_numpy(
                zero_copy_only=False) % 200, pa.int64()),
            "dst": pa.array(t.column("l_partkey").to_numpy(
                zero_copy_only=False) % 200, pa.int64())}),
        batch_format="pyarrow")
    out = reciprocity(edges, "src", "dst")
    return _round_cols(out, {"reciprocity": 6})


SQL_RECIPROCITY = """
WITH e AS (SELECT DISTINCT l_suppkey % 200 AS a, l_partkey % 200 AS b
           FROM lineitem WHERE l_suppkey % 200 <> l_partkey % 200)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(*) FILTER (EXISTS (SELECT 1 FROM e r
                                     WHERE r.a = e.b AND r.b = e.a))
            AS BIGINT) AS n_reciprocal,
       round(count(*) FILTER (EXISTS (SELECT 1 FROM e r
                                      WHERE r.a = e.b AND r.b = e.a))
             * 1.0 / count(*), 6) AS reciprocity
FROM e
"""


def q_cms_host_freq(sf_dir: str):
    """Count-min point-frequency sketch (hash-paired like the HLL twin):
    the top-10 hosts by EXACT count (exchange) with the CMS estimate
    asserted in-query against its published guarantee — exact ≤ est ≤
    exact + eps·N (CMS never underestimates).  Sketch built distributed
    (one per batch, fan-in tree merge — sketches.cms_of); output is the
    exact counts, so the SQL twin is plain GROUP BY/LIMIT."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.sketches import cms_of

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host.filter(pc.is_valid(host))})

    hosts = ds.map_batches(proj, batch_format="pyarrow")
    counts = ds_to_table(grouped_agg(
        hosts, ["host"], [("host", "count")],
        rename={"host_count": "cnt"}))
    top = counts.sort_by([("cnt", "descending"),
                          ("host", "ascending")]).slice(0, 10)
    sk = cms_of(hosts, "host", eps=1e-3, delta=0.01)
    est = sk.estimate(top.column("host").to_numpy(zero_copy_only=False))
    exact = top.column("cnt").to_numpy(zero_copy_only=False)
    slack = 1e-3 * sk.n
    if (est < exact).any() or (est > exact + slack).any():
        raise AssertionError(
            f"CMS guarantee violated: exact={exact.tolist()} "
            f"est={est.tolist()} slack={slack}")
    return top.append_column(
        "cms_ok", pa.array(np.ones(top.num_rows, np.int64)))


SQL_CMS_HOST_FREQ = f"""
SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1) AS host,
       CAST(count(*) AS BIGINT) AS cnt, CAST(1 AS BIGINT) AS cms_ok
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
GROUP BY 1 ORDER BY cnt DESC, host LIMIT 10
"""


def q_ewma_smooth(sf_dir: str):
    """Per-user EWMA smoothing of event values (alpha=0.1, y_0=x_0 —
    windows.grouped_ewma: combiner-less key exchange + pandas' cython
    grouped-EWM kernel per bucket); the anomaly-baseline transform.  SQL
    twin unrolls the recurrence with WITH RECURSIVE (series ≤ ~100 events
    per user), keyed back by event_id."""
    import ray.data as rd

    from webval.windows import grouped_ewma

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    out = grouped_ewma(ds, "user_id", "ts", "value", alpha=0.1,
                       tie_cols=["event_id"])
    t = ds_to_table(out.map_batches(
        lambda t: t.select(["event_id", "ewma"]), batch_format="pyarrow"))
    # no rounding: both engines run the same double recurrence in the same
    # order, so the raw values are bit-identical (verified) — rounding
    # would only ADD half-boundary risk
    return t.sort_by([("event_id", "ascending")])


SQL_EWMA_SMOOTH = """
WITH RECURSIVE x AS (
  SELECT event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS i,
         user_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
r AS (
  SELECT user_id, event_id, i, value AS ewma FROM x WHERE i = 1
  UNION ALL
  SELECT x.user_id, x.event_id, x.i, 0.9 * r.ewma + 0.1 * x.value
  FROM x JOIN r ON x.user_id = r.user_id AND x.i = r.i + 1)
SELECT event_id, ewma FROM r ORDER BY event_id
"""


def q_k_anonymity(sf_dir: str):
    """Privacy audit (pipelines.k_anonymity_audit): equivalence classes
    over the (lang, source) quasi-identifiers that are k-anonymity
    violations (fewer than 5 rows) or l-diversity violations (fewer than
    3 distinct n_chars values) — count-combiner exchange for class sizes,
    dedup-combiner pair exchange for diversity, multi-key left equi-join,
    nothing raw materializes."""
    import ray.data as rd

    from webval.pipelines import k_anonymity_audit

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source", "n_chars"])
    out = k_anonymity_audit(ds, ["lang", "source"], k=5,
                            sensitive="n_chars", l_div=3)
    return ds_to_table(out).sort_by([("lang", "ascending"),
                                     ("source", "ascending")])


SQL_K_ANONYMITY = """
WITH cls AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS class_size,
                    CAST(count(DISTINCT n_chars) AS BIGINT) AS n_sensitive
             FROM documents
             WHERE lang IS NOT NULL AND source IS NOT NULL
             GROUP BY 1, 2)
SELECT * FROM cls WHERE class_size < 5 OR n_sensitive < 3
ORDER BY lang, source
"""


def q_orc_read(sf_dir: str):
    """A1 source coverage: the documents slice round-tripped through the
    ORC container (webval.sources read_orc/write_orc — stripe-streamed
    reader with column pruning, one-file-per-block zstd sink), aggregated
    per lang against the parquet ground truth; a hash match proves the
    ORC round-trip lossless."""
    from webval.exchange import grouped_agg
    from webval.sources import read_orc

    ds = read_orc(_docs_export(sf_dir, "orc"),
                  columns=["doc_id", "lang", "n_chars"])
    agg = grouped_agg(ds, ["lang"],
                      [("doc_id", "count"), ("n_chars", "sum")],
                      rename={"doc_id_count": "n_docs",
                              "n_chars_sum": "chars"})
    return ds_to_table(agg).sort_by([("lang", "ascending")])


def q_ipc_read(sf_dir: str):
    """A1 source coverage: the documents slice round-tripped through the
    Arrow IPC / Feather-v2 container (webval.sources read_ipc/write_ipc —
    record-batch-streamed reader with column pruning, one-file-per-block
    zstd sink), aggregated per lang against the parquet ground truth; a
    hash match proves the IPC round-trip lossless."""
    from webval.exchange import grouped_agg
    from webval.sources import read_ipc

    ds = read_ipc(_docs_export(sf_dir, "ipc"),
                  columns=["doc_id", "lang", "n_chars"])
    agg = grouped_agg(ds, ["lang"],
                      [("doc_id", "count"), ("n_chars", "sum")],
                      rename={"doc_id_count": "n_docs",
                              "n_chars_sum": "chars"})
    return ds_to_table(agg).sort_by([("lang", "ascending")])


def q_full_outer_join(sf_dir: str):
    """Full-outer reconciliation via the general large×large equi-join
    (joins.equi_join how="full"): high-balance customers vs per-customer
    open-order counts — unmatched rows of BOTH sides survive with the key
    coalesced (customers with no open orders / open-order customers below
    the balance cut).  Same co-bucketed exchange as inner/left; Arrow's
    full-outer bucket join, canonical column order across buckets."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.joins import equi_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"]) \
        .map_batches(lambda t: t.filter(
            pc.greater(t.column("c_acctbal"), pa.scalar(9000.0))),
            batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderstatus"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t.column("o_orderstatus"), pa.scalar("O")))
            .select(["o_custkey"]), batch_format="pyarrow")
    per_cust = grouped_agg(orders, ["o_custkey"],
                           [("o_custkey", "count")],
                           rename={"o_custkey_count": "n_orders"})
    out = equi_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                    how="full")
    return ds_to_table(out).sort_by([("c_custkey", "ascending")])


SQL_FULL_OUTER_JOIN = """
WITH l AS (SELECT c_custkey, c_acctbal FROM customer
           WHERE c_acctbal > 9000),
r AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
SELECT coalesce(l.c_custkey, r.o_custkey) AS c_custkey, l.c_acctbal,
       r.n_orders
FROM l FULL OUTER JOIN r ON l.c_custkey = r.o_custkey
ORDER BY 1
"""


SQL_INTERVAL_COVERAGE = """
WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts)
                   + CAST(floor(value * 60000000) AS BIGINT) AS e
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND value IS NOT NULL AND value >= 0),
l AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM iv),
g AS (SELECT user_id, s, e,
             sum(CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY s, e) AS isl
      FROM l),
isl AS (SELECT user_id, isl, min(s) AS st, max(e) AS en,
               count(*) AS n_iv
        FROM g GROUP BY 1, 2)
SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(en - st) AS BIGINT) AS covered
FROM isl GROUP BY user_id ORDER BY user_id
"""


def q_fuzzy_part_names(sf_dir: str):
    """Blocked edit-distance similarity self-join (entity-resolution fuzzy
    matching): part-name pairs within the same (first word, p_size) block
    at Levenshtein distance ≤ 3.  Blocking is part of the operator's
    contract; the DuckDB twin runs the SAME blocked self-join with its
    built-in levenshtein().  The engine's distances are byte-level DP —
    exact vs SQL's character levenshtein only for ASCII, so the query
    asserts byte length == char length like ngram_dup_pairs."""
    import ray.data as rd

    from webval.fuzzy import fuzzy_pairs

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_size"])

    def add_block(b: pa.Table) -> pa.Table:
        col = b.column("p_name")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)), pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII part names: byte-level DP no longer "
                "matches the SQL twin's character levenshtein")
        return b.append_column(
            "w", pc.replace_substring_regex(col, pattern=" .*$",
                                            replacement=""))

    pairs = fuzzy_pairs(ds.map_batches(add_block, batch_format="pyarrow"),
                        "p_partkey", "p_name", ["w", "p_size"], max_dist=3)
    return ds_to_table(
        pairs, empty_schema=pa.schema([("id_a", pa.int64()),
                                       ("id_b", pa.int64()),
                                       ("edit_distance", pa.int64())]))


SQL_FUZZY_PART_NAMES = """
WITH p AS (SELECT p_partkey, p_name, p_size,
                  split_part(p_name, ' ', 1) AS w
           FROM part)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       levenshtein(a.p_name, b.p_name) AS edit_distance
FROM p a JOIN p b
  ON a.w = b.w AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY 1, 2
"""


def q_validity_intervals(sf_dir: str):
    """SCD2 validity intervals over each user's event history
    (windows.validity_intervals: combiner-less key exchange, one sort +
    shifted compare per bucket) — valid_to = lead(ts), null for the
    current row; emitted as epoch-µs ints for exact cross-engine compare."""
    import ray.data as rd

    from webval.windows import validity_intervals

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    out = validity_intervals(ds, "user_id", "ts",
                             attr_cols=["event_id"], tie_cols=["event_id"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "valid_from": pc.cast(t.column("valid_from"), pa.int64()),
            "valid_to": pc.cast(t.column("valid_to"), pa.int64())})

    return ds_to_table(out.map_batches(to_us, batch_format="pyarrow")) \
        .sort_by([("event_id", "ascending")])


SQL_VALIDITY_INTERVALS = """
SELECT event_id, user_id, epoch_us(ts) AS valid_from,
       epoch_us(lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)) AS valid_to
FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
ORDER BY event_id
"""


def q_event_debounce(sf_dir: str):
    """Debounce each user's event stream at a 1-hour minimum gap
    (windows.debounce_events, lag semantics: gap to the previous RAW
    event — exactly SQL lag(), one vectorized pass per bucket)."""
    import ray.data as rd

    from webval.windows import debounce_events

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    out = debounce_events(ds, "user_id", "ts",
                          min_gap_us=3_600_000_000, tie_cols=["event_id"])
    t = ds_to_table(out.map_batches(
        lambda t: t.select(["event_id", "gap_us"]), batch_format="pyarrow"))
    return t.sort_by([("event_id", "ascending")])


SQL_EVENT_DEBOUNCE = """
WITH x AS (
  SELECT event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
           AS gap_us
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT event_id, gap_us FROM x
WHERE gap_us IS NULL OR gap_us >= 3600000000
ORDER BY event_id
"""


def q_rank_auc(sf_dir: str):
    """ROC-AUC (Mann-Whitney) of l_quantity as a separator of returned
    lineitems (rank.rank_auc: one count exchange bounded by distinct
    values, driver cumsum finalize).  The SQL twin reproduces the
    per-distinct-value formula with a windowed cumulative sum."""
    import ray.data as rd

    from webval.rank import rank_auc

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    return _round_cols(rank_auc(ds, "l_returnflag", "l_quantity",
                                positive="R"), {"auc": 6})


SQL_RANK_AUC = """
WITH c AS (SELECT l_quantity AS v,
                  CAST(count(*) FILTER (WHERE l_returnflag = 'R')
                       AS DOUBLE) AS a,
                  CAST(count(*) FILTER (WHERE l_returnflag <> 'R')
                       AS DOUBLE) AS b
           FROM lineitem GROUP BY 1),
w AS (SELECT v, a, b,
             COALESCE(SUM(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                      PRECEDING AND 1 PRECEDING), 0) AS bb
      FROM c)
SELECT CAST((SELECT SUM(a) FROM c) AS BIGINT) AS n_pos,
       CAST((SELECT SUM(b) FROM c) AS BIGINT) AS n_neg,
       round(SUM(a * (bb + 0.5 * b))
             / ((SELECT SUM(a) FROM c) * (SELECT SUM(b) FROM c)), 6) AS auc
FROM w
"""


def q_trimmed_mean(sf_dir: str):
    """Per-returnflag 5–95% trimmed mean of extended price
    (rank.grouped_trimmed_mean: exact continuous fences via the quantile
    exchange, broadcast once, count/sum-combiner rollup)."""
    import ray.data as rd

    from webval.rank import grouped_trimmed_mean

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    out = grouped_trimmed_mean(ds, "l_returnflag", "l_extendedprice",
                               lo=0.05, hi=0.95)
    t = ds_to_table(out).sort_by([("l_returnflag", "ascending")])
    return _round_cols(t, {"trimmed_mean": 6})


SQL_TRIMMED_MEAN = """
WITH f AS (SELECT l_returnflag AS k,
                  quantile_cont(l_extendedprice, 0.05) AS flo,
                  quantile_cont(l_extendedprice, 0.95) AS fhi
           FROM lineitem GROUP BY 1)
SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
       round(avg(l.l_extendedprice), 6) AS trimmed_mean
FROM lineitem l JOIN f ON l.l_returnflag = f.k
WHERE l.l_extendedprice >= f.flo AND l.l_extendedprice <= f.fhi
GROUP BY 1 ORDER BY 1
"""


def q_minmax_scale(sf_dir: str):
    """Per-language min-max scaling of document lengths
    (clustering.minmax_scale: key-sized extrema exchange broadcast once,
    stateless scale map).  Integer subtraction stays exact and only the
    final division is float64 — same ops in the SQL twin, so the values
    are bit-identical unrounded."""
    import ray.data as rd

    from webval.clustering import minmax_scale

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.is_valid(t.column("n_chars").combine_chunks()))),
        batch_format="pyarrow")
    out = minmax_scale(ds, "lang", "n_chars")
    t = ds_to_table(out.map_batches(
        lambda t: t.select(["doc_id", "scaled"]), batch_format="pyarrow"))
    return t.sort_by([("doc_id", "ascending")])


SQL_MINMAX_SCALE = """
SELECT doc_id,
       CAST(n_chars - min(n_chars) OVER (PARTITION BY lang) AS DOUBLE)
       / NULLIF(CAST(max(n_chars) OVER (PARTITION BY lang)
                     - min(n_chars) OVER (PARTITION BY lang) AS DOUBLE), 0)
         AS scaled
FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
ORDER BY doc_id
"""


def q_readability(sf_dir: str):
    """Per-doc Automated Readability Index from exact RE2 counts
    (textstats.readability_stats, stateless vectorized map; Senter &
    Smith 1967 formula).  Counts are integers and the formula is the
    same IEEE expression on both engines — unrounded parity."""
    import ray.data as rd

    from webval.textstats import readability_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = readability_stats(ds, "doc_id")
    return ds_to_table(out).sort_by([("doc_id", "ascending")])


SQL_READABILITY = r"""
WITH c AS (SELECT doc_id,
    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]')) AS BIGINT)
      AS n_alnum,
    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
      AS n_words,
    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences
  FROM documents)
SELECT doc_id, n_alnum, n_words, n_sentences,
       4.71 * (CAST(n_alnum AS DOUBLE) / NULLIF(CAST(n_words AS DOUBLE), 0))
       + 0.5 * (CAST(n_words AS DOUBLE)
                / NULLIF(CAST(n_sentences AS DOUBLE), 0))
       - 21.43 AS ari
FROM c ORDER BY doc_id
"""


def q_dup_share_by_host(sf_dir: str):
    """Per-host duplicate-content share over the synthetic crawl
    (dedup.dup_share_by_group: fingerprint map → (fingerprint, host)
    count exchange → per-fingerprint totals → co-bucketed join → host
    rollup; raw text never enters a shuffle).  dup_share is the same
    int/int double division on both engines — unrounded."""
    import ray.data as rd

    from webval.dedup import dup_share_by_group

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "text"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host, "text": t.column("text")}).filter(
            pc.and_(pc.is_valid(host),
                    pc.is_valid(t.column("text").combine_chunks())))

    out = dup_share_by_group(ds.map_batches(add_host, batch_format="pyarrow"),
                             "host", "text", normalize=False)
    return ds_to_table(out).sort_by([("host", "ascending")])


SQL_DUP_SHARE_BY_HOST = f"""
WITH p AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                    AS host, text
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
             AND text IS NOT NULL),
t AS (SELECT text, count(*) AS n_total FROM p GROUP BY 1)
SELECT p.host, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE t.n_total > 1) AS BIGINT) AS n_dup_docs,
       CAST(count(*) FILTER (WHERE t.n_total > 1) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_share
FROM p JOIN t USING (text) GROUP BY 1 ORDER BY 1
"""


def q_dedup_weights(sf_dir: str):
    """Soft-dedup effective corpus size per host
    (dedup.duplication_weights): each doc weighted 1/k by its text's
    corpus-wide duplicate count, summed per host — the sampling-weight
    view of dup_share_by_host (a host serving one page 40× has 40 docs
    but ~1 effective doc).  Counts exact; the reciprocal sums round 6."""
    import ray.data as rd

    from webval.dedup import duplication_weights

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "text"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host, "text": t.column("text")}).filter(
            pc.and_(pc.is_valid(host),
                    pc.is_valid(t.column("text").combine_chunks())))

    out = duplication_weights(
        ds.map_batches(add_host, batch_format="pyarrow"),
        "host", "text", normalize=False)
    return _round_cols(ds_to_table(out).sort_by([("host", "ascending")]),
                       {"effective_docs": 6, "effective_ratio": 6})


SQL_DEDUP_WEIGHTS = f"""
WITH p AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                    AS host, text
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
             AND text IS NOT NULL),
pr AS (SELECT host, text, count(*) AS n_fg FROM p GROUP BY 1, 2),
t AS (SELECT text, sum(n_fg) AS n_total FROM pr GROUP BY 1)
SELECT pr.host, CAST(sum(pr.n_fg) AS BIGINT) AS n_docs,
       round(sum(CAST(pr.n_fg AS DOUBLE) / t.n_total), 6)
           AS effective_docs,
       round(sum(CAST(pr.n_fg AS DOUBLE) / t.n_total) / sum(pr.n_fg), 6)
           AS effective_ratio
FROM pr JOIN t USING (text) GROUP BY 1 ORDER BY 1
"""


def q_pmi_collocations(sf_dir: str):
    """Top-20 PMI collocations (textstats.pmi_collocations): adjacent
    word pairs co-occurring most above chance — the phrase-mining /
    boilerplate-template signal.  Pair and unigram counts are exact
    (one exchange each); pmi rounds 6 and the rank key round(pmi, 6)
    with (w1, w2)-ascending ties is deterministic on both engines."""
    import ray.data as rd

    from webval.textstats import pmi_collocations

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    t = ds_to_table(pmi_collocations(ds, "text", min_count=5, top_k=20))
    for c in ("w1", "w2"):
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(t.column(c), pa.string()))
    return _round_cols(t, {"pmi": 6})


SQL_PMI_COLLOCATIONS = """
WITH tok AS (SELECT list_filter(regexp_split_to_array(lower(text),
                                                      '[^a-z0-9]+'),
                                x -> x <> '') AS ts
             FROM documents WHERE text IS NOT NULL),
uc AS (SELECT term, count(*) AS cnt
       FROM (SELECT unnest(ts) AS term FROM tok) GROUP BY 1),
pp AS (SELECT p[1] AS w1, p[2] AS w2
       FROM (SELECT unnest(list_zip(ts, ts[2:])) AS p FROM tok)
       WHERE p[2] IS NOT NULL),
pcnt AS (SELECT w1, w2, count(*) AS c12 FROM pp
         GROUP BY 1, 2 HAVING count(*) >= 5),
tot AS (SELECT (SELECT CAST(sum(cnt) AS DOUBLE) FROM uc) AS n,
               (SELECT CAST(count(*) AS DOUBLE) FROM pp) AS p)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       CAST(u1.cnt AS BIGINT) AS c1, CAST(u2.cnt AS BIGINT) AS c2,
       round(ln((c12 / tot.p) / ((u1.cnt / tot.n) * (u2.cnt / tot.n))), 6)
           AS pmi
FROM pcnt JOIN uc u1 ON pcnt.w1 = u1.term
          JOIN uc u2 ON pcnt.w2 = u2.term, tot
ORDER BY round(ln((c12 / tot.p) / ((u1.cnt / tot.n) * (u2.cnt / tot.n))), 6)
             DESC, w1, w2
LIMIT 20
"""


def q_benford_audit(sf_dir: str):
    """Benford first-digit audit (drift.benford_audit) of
    l_extendedprice: observed vs log10(1+1/d) digit shares with
    standardized residuals — the fabricated-data smell test.  Digits
    are extracted integer-exactly (floor → int64 → first character) on
    both engines so no libm log10 boundary can flip a row."""
    import ray.data as rd

    from webval.drift import benford_audit

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    return _round_cols(ds_to_table(benford_audit(ds, "l_extendedprice")),
                       {"share": 6, "expected": 6, "resid": 6})


SQL_BENFORD_AUDIT = """
WITH c AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                  count(*) AS n
           FROM lineitem WHERE l_extendedprice >= 1 GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n, round(n / total, 6) AS share,
       round(log10(1 + 1.0 / digit), 6) AS expected,
       round((n - total * log10(1 + 1.0 / digit))
             / sqrt(total * log10(1 + 1.0 / digit)
                    * (1 - log10(1 + 1.0 / digit))), 6) AS resid
FROM c, t ORDER BY digit
"""


def q_json_key_profile(sf_dir: str):
    """JSON schema inference (textstats.json_key_profile): key-path ×
    value-type document counts over a semi-structured payload column.
    The payload is built deterministically from events fields with
    identical string concatenation on both engines (optional nested
    geo object, array, null and double fields keyed off user_id
    divisibility), so the profile exercises every JSON type and a
    depth-2 descent; counts exact, share rounds 6."""
    import ray.data as rd

    from webval.textstats import json_key_profile

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def build(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.is_valid(t.column("user_id").combine_chunks()),
            pc.is_valid(t.column("event_type").combine_chunks())))
        uid = t.column("user_id").combine_chunks() \
            .to_numpy(zero_copy_only=False)

        def opt(mod: int, lit: str):
            return pc.if_else(pa.array(uid % mod == 0),
                              pa.scalar(lit), pa.scalar(""))

        js = pc.binary_join_element_wise(
            pa.scalar('{"et":"'), t.column("event_type"),
            pa.scalar('","uid":'),
            pc.cast(t.column("user_id"), pa.string()),
            opt(3, ',"geo":{"lat":1,"lon":2}'),
            opt(5, ',"tags":["a","b"]'),
            opt(7, ',"opt":null'),
            opt(11, ',"score":1.5'),
            pa.scalar('}'), pa.scalar(""))
        return pa.table({"js": js})

    out = json_key_profile(ds.map_batches(build, batch_format="pyarrow"),
                           "js", max_depth=2)
    t = ds_to_table(out)
    for c in ("path", "jtype"):
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(t.column(c), pa.string()))
    return _round_cols(t, {"share": 6})


SQL_JSON_KEY_PROFILE = """
WITH j AS (SELECT '{"et":"' || event_type || '","uid":'
                  || CAST(user_id AS VARCHAR)
                  || CASE WHEN user_id % 3 = 0
                          THEN ',"geo":{"lat":1,"lon":2}' ELSE '' END
                  || CASE WHEN user_id % 5 = 0
                          THEN ',"tags":["a","b"]' ELSE '' END
                  || CASE WHEN user_id % 7 = 0
                          THEN ',"opt":null' ELSE '' END
                  || CASE WHEN user_id % 11 = 0
                          THEN ',"score":1.5' ELSE '' END
                  || '}' AS js
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM j),
l1 AS (SELECT js, unnest(json_keys(js)) AS path FROM j),
t1 AS (SELECT path, coalesce(json_type(js, '$.' || path), 'NULL')
           AS rt, js FROM l1),
l2 AS (SELECT t1.path || '.'
                || unnest(json_keys(t1.js, '$.' || t1.path)) AS path,
              t1.path AS parent, t1.js AS js
       FROM t1 WHERE t1.rt = 'OBJECT'),
t2 AS (SELECT path, coalesce(json_type(js, '$.' || path), 'NULL')
           AS rt FROM l2),
allp AS (SELECT path, rt FROM t1 UNION ALL SELECT path, rt FROM t2)
SELECT path,
       CASE WHEN rt IN ('BIGINT', 'UBIGINT') THEN 'INTEGER' ELSE rt END
           AS jtype,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) / tot.n_docs, 6) AS share
FROM allp, tot GROUP BY 1, 2, tot.n_docs ORDER BY 1, 2
"""


def q_mahalanobis_outliers(sf_dir: str):
    """Cross-column anomaly top-20 (clustering.mahalanobis_outliers):
    largest squared Mahalanobis distance over (l_quantity,
    l_extendedprice) — catches jointly-implausible rows per-column
    z-scores miss.  Sample covariance fit in one mergeable-partial
    pass; rank key round(d², 6) with unique-line-id ties."""
    import ray.data as rd

    from webval.clustering import mahalanobis_outliers

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_quantity", "l_extendedprice"])

    def add_lid(t: pa.Table) -> pa.Table:
        lid = pc.add(pc.multiply(t.column("l_orderkey"),
                                 pa.scalar(10, pa.int64())),
                     pc.cast(t.column("l_linenumber"), pa.int64()))
        return pa.table({"l_quantity": t.column("l_quantity"),
                         "l_extendedprice": t.column("l_extendedprice"),
                         "lid": lid})

    out = mahalanobis_outliers(
        ds.map_batches(add_lid, batch_format="pyarrow"),
        ["l_quantity", "l_extendedprice"], top_k=20, id_col="lid")
    return _round_cols(ds_to_table(out), {"d2": 6})


SQL_MAHALANOBIS_OUTLIERS = """
WITH v AS (SELECT l_orderkey * 10 + l_linenumber AS lid,
                  l_quantity AS x, l_extendedprice AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
s AS (SELECT avg(x) AS mx, avg(y) AS my, var_samp(x) AS vxx,
             var_samp(y) AS vyy, covar_samp(x, y) AS vxy FROM v),
d AS (SELECT v.x, v.y, v.lid,
             (s.vyy * (v.x - s.mx) * (v.x - s.mx)
              - 2 * s.vxy * (v.x - s.mx) * (v.y - s.my)
              + s.vxx * (v.y - s.my) * (v.y - s.my))
             / (s.vxx * s.vyy - s.vxy * s.vxy) AS d2
      FROM v, s)
SELECT x AS l_quantity, y AS l_extendedprice, lid, round(d2, 6) AS d2
FROM d ORDER BY round(d2, 6) DESC, lid LIMIT 20
"""


def q_cluster_canonicals(sf_dir: str):
    """Keep-best near-dedup curation (dedup.cluster_canonicals over
    minhash_dedup clusters): per near-dup cluster, the member with the
    longest url (ties to smallest page_id) — "keep the best copy, not
    an arbitrary one".  Planted dups are exact text copies, so the SQL
    twin clusters by same-text windows and picks with row_number."""
    import ray.data as rd

    from webval.dedup import cluster_canonicals, minhash_dedup

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "url", "text"])
    clusters = minhash_dedup(ds, "page_id", "text",
                             jaccard_threshold=0.95)
    scored = ds.map_batches(
        lambda t: pa.table({
            "page_id": t.column("page_id"),
            "score": pc.cast(pc.utf8_length(
                t.column("url").combine_chunks()), pa.int64())}),
        batch_format="pyarrow")
    return ds_to_table(cluster_canonicals(
        clusters, scored, "page_id", score_col="score")) \
        .sort_by([("cluster_id", "ascending")])


SQL_CLUSTER_CANONICALS = f"""
WITH w AS (SELECT page_id, length(url) AS score,
                  min(page_id) OVER (PARTITION BY text) AS cluster_id,
                  count(*) OVER (PARTITION BY text) AS c
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE text IS NOT NULL),
r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY score DESC, page_id) AS rn
      FROM w WHERE c > 1)
SELECT cluster_id, page_id AS kept_id, CAST(score AS BIGINT) AS score,
       CAST(c AS BIGINT) AS n_docs
FROM r WHERE rn = 1 ORDER BY cluster_id
"""
SQL_CLUSTER_CANONICALS = SQL_CLUSTER_CANONICALS.replace("{SYNTH_ROOT}",
                                                        SYNTH_ROOT)


def q_concat_packing(sf_dir: str):
    """Concatenation-packing plan (pipelines.concat_packing): documents
    laid end to end in doc_id order and cut into 512-token training
    sequences — per doc its global token offset, first sequence index,
    and whether it straddles a boundary.  The SQL twin is one running
    sum window; integer-exact on both engines."""
    import ray.data as rd

    from webval.pipelines import concat_packing
    from webval.textstats import add_token_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = add_token_counts(ds).map_batches(
        lambda t: t.select(["doc_id", "ws_tokens"]).filter(
            pc.is_valid(t.column("doc_id").combine_chunks())),
        batch_format="pyarrow")
    return ds_to_table(concat_packing(ds, "doc_id", "ws_tokens", 512)) \
        .sort_by([("doc_id", "ascending")])


SQL_CONCAT_PACKING = r"""
WITH d AS (SELECT doc_id,
                  CASE WHEN text IS NULL THEN 0
                       ELSE len(regexp_extract_all(text, '\S+')) END AS tk
           FROM documents WHERE doc_id IS NOT NULL),
s AS (SELECT doc_id, tk,
             sum(tk) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                 AS cend
      FROM d)
SELECT doc_id, CAST(tk AS BIGINT) AS ws_tokens,
       CAST(cend - tk AS BIGINT) AS "offset",
       CAST((cend - tk) // 512 AS BIGINT) AS bin,
       (tk > 0 AND (cend - 1) // 512 > (cend - tk) // 512) AS straddles
FROM s ORDER BY doc_id
"""


def q_path_prefix_rollup(sf_dir: str):
    """Site-section hierarchy counts (textstats.path_prefix_rollup):
    rows per path prefix at depths 1-3 over a deterministic
    section/category/page path built identically on both engines from
    page_id — the "which subtrees dominate the crawl" rollup."""
    import ray.data as rd

    from webval.textstats import path_prefix_rollup

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id"])

    def build(t: pa.Table) -> pa.Table:
        pid = t.column("page_id").combine_chunks()
        pid = pid.filter(pc.is_valid(pid))
        path = pc.binary_join_element_wise(
            pa.scalar("s"),
            pc.cast(pc.bit_wise_and(pid, pa.scalar(3, pa.int64())),
                    pa.string()),
            pa.scalar("/c"), pc.cast(_pc_mod(pid, 7), pa.string()),
            pa.scalar("/p"), pc.cast(pid, pa.string()), pa.scalar(""))
        return pa.table({"path": path})

    out = path_prefix_rollup(ds.map_batches(build, batch_format="pyarrow"),
                             "path", max_depth=3)
    t = ds_to_table(out)
    return t.set_column(t.column_names.index("prefix"), "prefix",
                        pc.cast(t.column("prefix"), pa.string()))


def _pc_mod(arr, m: int):
    """Nonnegative int64 modulo via Arrow arithmetic (no pc.mod kernel in
    Arrow 16): a - (a // m) * m with integer division."""
    import pyarrow.compute as _pc

    q = _pc.divide(arr, pa.scalar(m, pa.int64()))
    return _pc.subtract(arr, _pc.multiply(q, pa.scalar(m, pa.int64())))


SQL_PATH_PREFIX_ROLLUP = f"""
WITH p AS (SELECT 's' || CAST(page_id % 4 AS VARCHAR)
                  || '/c' || CAST(page_id % 7 AS VARCHAR)
                  || '/p' || CAST(page_id AS VARCHAR) AS path
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE page_id IS NOT NULL),
seg AS (SELECT string_split(path, '/') AS s FROM p),
d AS (SELECT 1 AS depth, array_to_string(list_slice(s, 1, 1), '/')
             AS prefix FROM seg WHERE len(s) >= 1
      UNION ALL
      SELECT 2, array_to_string(list_slice(s, 1, 2), '/')
      FROM seg WHERE len(s) >= 2
      UNION ALL
      SELECT 3, array_to_string(list_slice(s, 1, 3), '/')
      FROM seg WHERE len(s) >= 3)
SELECT CAST(depth AS BIGINT) AS depth, prefix,
       CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""
SQL_PATH_PREFIX_ROLLUP = SQL_PATH_PREFIX_ROLLUP.replace("{SYNTH_ROOT}",
                                                        SYNTH_ROOT)


def q_cocitation(sf_dir: str):
    """Top-20 co-cited host pairs (graph.cocitation_pairs): hosts most
    often linked by the SAME source page — topical relatedness with no
    direct edge (Small 1973).  Distinct (src, host) edges, deterministic
    per-source out-degree cap (smallest 64 targets — non-binding here),
    pair counts exact; rank (n desc, d1, d2)."""
    import ray.data as rd

    from webval.graph import cocitation_pairs

    _, links = ensure_synth(sf_dir)
    ds = rd.read_parquet(links, columns=["src_url", "dst_url"])

    def to_host(t: pa.Table) -> pa.Table:
        u = t.column("dst_url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"src_url": t.column("src_url"),
                         "dst_host": host}).filter(pc.is_valid(host))

    out = cocitation_pairs(ds.map_batches(to_host, batch_format="pyarrow"),
                           "src_url", "dst_host", max_out=64,
                           min_cocite=2, top_k=20)
    t = ds_to_table(out)
    for c in ("d1", "d2"):
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(t.column(c), pa.string()))
    return t


SQL_COCITATION = f"""
WITH e AS (SELECT DISTINCT src_url,
                  regexp_extract(dst_url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS h
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/links.parquet')
           WHERE src_url IS NOT NULL AND dst_url IS NOT NULL
             AND regexp_matches(dst_url, '^https?://([a-z0-9-]+)\\.')),
c AS (SELECT src_url, h FROM
      (SELECT *, row_number() OVER (PARTITION BY src_url ORDER BY h)
           AS rn FROM e)
      WHERE rn <= 64),
p AS (SELECT a.h AS d1, b.h AS d2 FROM c a JOIN c b
      ON a.src_url = b.src_url AND a.h < b.h)
SELECT d1, d2, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY 3 DESC, 1, 2 LIMIT 20
"""
SQL_COCITATION = SQL_COCITATION.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_plan_shards(sf_dir: str):
    """LPT shard planning (pipelines.plan_shards): hosts packed onto 4
    shards by page count, heaviest first, each to the lightest shard
    (ties to the lowest id).  The SQL twin replays the greedy scan as
    a recursive CTE carrying the shard-load list; loads are
    integer-valued doubles, so the argmin comparisons are exact on
    both engines."""
    import ray.data as rd

    from webval.pipelines import plan_shards

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        ones = pa.nulls(len(host), pa.int64()).fill_null(1)
        return pa.table({"host": host, "w": ones}).filter(
            pc.is_valid(host))

    out = plan_shards(ds.map_batches(add_host, batch_format="pyarrow"),
                      "host", "w", 4)
    t = ds_to_table(out).sort_by([("host", "ascending")])
    t = t.set_column(t.column_names.index("host"), "host",
                     pc.cast(t.column("host"), pa.string()))
    return t.set_column(t.column_names.index("weight"), "weight",
                        pc.cast(t.column("weight"), pa.int64()))


SQL_PLAN_SHARDS = f"""
WITH RECURSIVE
w AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1) AS host,
             CAST(count(*) AS DOUBLE) AS wt
      FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
      WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
      GROUP BY 1),
ranked AS (SELECT host, wt,
                  row_number() OVER (ORDER BY wt DESC, host) AS rn
           FROM w),
asg AS (
  SELECT 0 AS rn, CAST(NULL AS VARCHAR) AS host,
         CAST(NULL AS DOUBLE) AS wt, CAST(NULL AS BIGINT) AS shard,
         CAST([0.0, 0.0, 0.0, 0.0] AS DOUBLE[]) AS loads
  UNION ALL
  SELECT r.rn, r.host, r.wt,
         CAST(list_position(a.loads, list_aggregate(a.loads, 'min')) - 1
              AS BIGINT),
         list_transform(a.loads, (x, i) ->
             CASE WHEN i = list_position(a.loads,
                                         list_aggregate(a.loads, 'min'))
                  THEN CAST(x + r.wt AS DOUBLE) ELSE x END)
  FROM asg a JOIN ranked r ON r.rn = a.rn + 1)
SELECT host, CAST(wt AS BIGINT) AS weight, shard
FROM asg WHERE rn > 0 ORDER BY host
"""
SQL_PLAN_SHARDS = SQL_PLAN_SHARDS.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_shrunk_host_quality(sf_dir: str):
    """Empirical-Bayes per-host mean text length
    (aggregates.shrunk_group_means, k=20): small hosts shrink toward
    the corpus mean so they can't outrank big hosts on noise.  Sums
    are integer-valued doubles and both engines evaluate the SAME
    (Σx + k·M)/(n + k) expression, so values are emitted UNROUNDED
    (bit-identical per the identical-recurrence convention)."""
    import ray.data as rd

    from webval.aggregates import shrunk_group_means

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "text"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        ln = pc.utf8_length(t.column("text").combine_chunks())
        return pa.table({"host": host, "len": ln}).filter(
            pc.is_valid(host))

    out = shrunk_group_means(
        ds.map_batches(add_host, batch_format="pyarrow"), "host", "len",
        prior_strength=20.0)
    t = ds_to_table(out).sort_by([("host", "ascending")])
    return t.set_column(t.column_names.index("host"), "host",
                        pc.cast(t.column("host"), pa.string()))


SQL_SHRUNK_HOST_QUALITY = f"""
WITH p AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS host,
                  length(text) AS len
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')),
g AS (SELECT CAST(sum(len) AS DOUBLE) / count(len) AS gmean FROM p
      WHERE len IS NOT NULL)
SELECT host, CAST(count(len) AS BIGINT) AS n,
       CAST(sum(len) AS DOUBLE) / count(len) AS mean,
       (CAST(sum(len) AS DOUBLE) + 20.0 * g.gmean)
           / (count(len) + 20.0) AS shrunk_mean
FROM p, g WHERE len IS NOT NULL GROUP BY host, g.gmean ORDER BY host
"""
SQL_SHRUNK_HOST_QUALITY = SQL_SHRUNK_HOST_QUALITY.replace("{SYNTH_ROOT}",
                                                          SYNTH_ROOT)


def q_blocklist_counts(sf_dir: str):
    """Blocklist audit (textclean.blocklist_counts): per-phrase document
    hit counts + the __any__ union row over a 5-phrase case-insensitive
    substring blocklist (Latin, obfuscated-profanity and Cyrillic
    entries, one multi-word).  Counts exact; share is the same n/total
    division on both engines, emitted unrounded."""
    import ray.data as rd

    from webval.textclean import blocklist_counts

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["text"])
    out = blocklist_counts(
        ds, "text", ["video", "photo", "f—g", "музыка", "data page"])
    t = ds_to_table(out)
    return t.set_column(t.column_names.index("phrase"), "phrase",
                        pc.cast(t.column("phrase"), pa.string()))


SQL_BLOCKLIST_COUNTS = f"""
WITH p AS (SELECT lower(text) AS t
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE text IS NOT NULL),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM p),
c AS (
  SELECT 'video' AS phrase,
         count(*) FILTER (contains(t, 'video')) AS n FROM p
  UNION ALL SELECT 'photo', count(*) FILTER (contains(t, 'photo')) FROM p
  UNION ALL SELECT 'f—g', count(*) FILTER (contains(t, 'f—g')) FROM p
  UNION ALL SELECT 'музыка',
         count(*) FILTER (contains(t, 'музыка')) FROM p
  UNION ALL SELECT 'data page',
         count(*) FILTER (contains(t, 'data page')) FROM p
  UNION ALL SELECT '__any__',
         count(*) FILTER (contains(t, 'video') OR contains(t, 'photo')
                          OR contains(t, 'f—g') OR contains(t, 'музыка')
                          OR contains(t, 'data page')) FROM p)
SELECT phrase, CAST(c.n AS BIGINT) AS n_docs, c.n / tot.n AS share
FROM c, tot ORDER BY phrase
"""
SQL_BLOCKLIST_COUNTS = SQL_BLOCKLIST_COUNTS.replace("{SYNTH_ROOT}",
                                                    SYNTH_ROOT)


def q_host_gini(sf_dir: str):
    """Corpus-concentration audit (rank.gini_coefficient): exact Gini
    of per-host page counts — how much of the crawl a few megahosts
    own.  Rank formula is tie-permutation-invariant, so no ordering
    subtlety; gini rounds 6 (different accumulation order)."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.rank import gini_coefficient

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host}).filter(pc.is_valid(host))

    counts = grouped_agg(
        ds.map_batches(add_host, batch_format="pyarrow"),
        ["host"], [("host", "count")], rename={"host_count": "c"})
    g = gini_coefficient(counts, "c")
    stats = ds_to_table(grouped_agg(
        counts.map_batches(lambda t: pa.table({
            "k": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
            "n_hosts": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "total_pages": t.column("c")}), batch_format="pyarrow"),
        ["k"], [("n_hosts", "sum"), ("total_pages", "sum")],
        rename={"n_hosts_sum": "n_hosts", "total_pages_sum":
                "total_pages"}))
    return pa.table({
        "n_hosts": stats.column("n_hosts"),
        "total_pages": stats.column("total_pages"),
        "gini": pa.array([round(g, 6)], pa.float64())})


SQL_HOST_GINI = f"""
WITH w AS (SELECT count(*) AS c
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
           GROUP BY regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM w)
SELECT CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(c) AS BIGINT) AS total_pages,
       round(2.0 * sum(rn * c) / (count(*) * sum(c))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r
"""
SQL_HOST_GINI = SQL_HOST_GINI.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_cusum_drift(sf_dir: str):
    """CUSUM change-point scores (windows.cusum_scores): per event type,
    the one-sided Page statistic of daily event counts against that
    type's own mean daily count (slack k=1, alarm h=5).  The Ray side
    evaluates the reflected-walk closed form, the twin the recurrence —
    mathematically equal, so cusum rounds 6 and the alarm compares the
    rounded value on both engines."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.joins import equi_join
    from webval.windows import cusum_scores

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def daily(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        ts = t.column("ts").combine_chunks()
        m = pc.and_(pc.is_valid(et), pc.is_valid(ts))
        return pa.table({"event_type": et.filter(m),
                         "day": pc.floor_temporal(ts.filter(m),
                                                  unit="day")})

    counts = grouped_agg(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["event_type", "day"], [("day", "count")],
        rename={"day_count": "n"})
    means = grouped_agg(
        counts.map_batches(lambda t: pa.table({
            "event_type": t.column("event_type"),
            "s": pc.cast(t.column("n"), pa.float64()),
            "c": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow"),
        ["event_type"], [("s", "sum"), ("c", "sum")],
        rename={"s_sum": "s", "c_sum": "c"})
    means = means.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "base": pc.divide(t.column("s"),
                                              pc.cast(t.column("c"),
                                                      pa.float64()))}),
        batch_format="pyarrow")
    joined = equi_join(counts.map_batches(
        lambda t: t.set_column(t.column_names.index("n"), "n",
                               pc.cast(t.column("n"), pa.float64())),
        batch_format="pyarrow"), means, on=["event_type"])
    out = cusum_scores(joined, "event_type", "day", "n",
                       target_col="base", slack=1.0, threshold=5.0)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "day": t.column("day"),
                         "n": pc.cast(t.column("n"), pa.int64()),
                         "base": t.column("base"),
                         "cusum": pc.round(t.column("cusum"), 6),
                         "alarm": t.column("alarm")})

    return ds_to_table(out.map_batches(shape, batch_format="pyarrow")) \
        .sort_by([("event_type", "ascending"), ("day", "ascending")])


SQL_CUSUM_DRIFT = """
WITH RECURSIVE
d AS (SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
b AS (SELECT event_type, sum(n) / count(n) AS base FROM d GROUP BY 1),
r AS (SELECT d.event_type, d.day, d.n, b.base,
             row_number() OVER (PARTITION BY d.event_type
                                ORDER BY d.day) AS rn
      FROM d JOIN b USING (event_type)),
c AS (SELECT event_type, day, n, base, rn,
             greatest(0.0, n - base - 1.0) AS s
      FROM r WHERE rn = 1
      UNION ALL
      SELECT r.event_type, r.day, r.n, r.base, r.rn,
             greatest(0.0, c.s + r.n - r.base - 1.0)
      FROM c JOIN r ON r.event_type = c.event_type AND r.rn = c.rn + 1)
SELECT event_type, day, CAST(n AS BIGINT) AS n, base,
       round(s, 6) AS cusum, round(s, 6) > 5.0 AS alarm
FROM c ORDER BY event_type, day
"""


def q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth (textstats.vocab_growth): distinct
    terms seen before token position N for six checkpoints, documents
    concatenated in doc_id order — the "is more crawl still buying new
    vocabulary" saturation curve.  Positions and counts are integers;
    exact on both engines."""
    import ray.data as rd

    from webval.textstats import vocab_growth

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds_to_table(vocab_growth(
        ds, "doc_id", "text",
        checkpoints=[1000, 2000, 5000, 10000, 20000, 50000]))


SQL_VOCAB_GROWTH = """
WITH d AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text),
                                                    '[^a-z0-9]+'),
                              x -> x <> '') AS ts
           FROM documents
           WHERE doc_id IS NOT NULL AND text IS NOT NULL),
o AS (SELECT doc_id, ts,
             sum(len(ts)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                 - len(ts) AS off
      FROM d),
tok AS (SELECT off + s['idx'] - 1 AS pos, s['term'] AS term
        FROM (SELECT off,
                     unnest(list_transform(ts, (x, i) ->
                                           {'term': x, 'idx': i})) AS s
              FROM o)),
f AS (SELECT term, min(pos) AS p FROM tok GROUP BY 1),
cp AS (SELECT unnest([1000, 2000, 5000, 10000, 20000, 50000])
           AS checkpoint)
SELECT CAST(cp.checkpoint AS BIGINT) AS checkpoint,
       CAST(count(*) FILTER (f.p < cp.checkpoint) AS BIGINT) AS vocab
FROM f, cp GROUP BY 1 ORDER BY 1
"""


def q_user_freshness(sf_dir: str):
    """Time-decayed activity (windows.decayed_counts): per user, events
    weighted 2^(−age/7d) against a fixed 2024-02-01 cutoff — recency-
    weighted volume a plain count can't see.  freshness rounds 6 (sum
    order + libm pow differ across engines)."""
    import ray.data as rd

    from webval.windows import decayed_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = decayed_counts(ds, "user_id", "ts", half_life_days=7.0,
                         as_of="2024-02-01")
    return _round_cols(ds_to_table(out).sort_by([("user_id",
                                                  "ascending")]),
                       {"freshness": 6})


SQL_USER_FRESHNESS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(pow(2.0, -(epoch_us(TIMESTAMP '2024-02-01')
                            - epoch_us(ts))
                           / (7.0 * 86400.0 * 1e6))), 6) AS freshness
FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def q_key_candidates(sf_dir: str):
    """Primary-key candidate audit (schema.key_candidate_audit) over
    four orders columns: exact distinct/null counts, uniqueness ratio,
    is_key verdict — the "what can I join on" profile.  o_orderkey is
    the planted true key; o_custkey/o_orderstatus are not."""
    import ray.data as rd

    from webval.schema import key_candidate_audit

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
    out = ds_to_table(key_candidate_audit(ds, cols))
    return _round_cols(out, {"uniqueness": 6})


SQL_KEY_CANDIDATES = """
WITH a AS (
  SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
         count(*) - count(o_orderkey) AS n_nulls,
         count(DISTINCT o_orderkey) AS n_distinct FROM orders
  UNION ALL
  SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
         count(DISTINCT o_custkey) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
         count(DISTINCT o_orderstatus) FROM orders
  UNION ALL
  SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
         count(DISTINCT o_totalprice) FROM orders)
SELECT "column", CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       round(CAST(n_distinct AS DOUBLE) / (n_rows - n_nulls), 6)
           AS uniqueness,
       (n_nulls = 0 AND n_distinct = n_rows AND n_rows > 0) AS is_key
FROM a ORDER BY "column"
"""


def q_format_inference(sf_dir: str):
    """String-format inference (schema.format_inference): anchored-RE2
    match shares over a mixed VARCHAR column built deterministically
    from orders (ints, ISO dates, urls, emails, and an unparseable
    'n/a' arm, keyed off o_orderkey % 5) — the B8 type-normalization
    advisor.  Both engines are RE2-backed, so matches are exact;
    share is the same division, emitted unrounded."""
    import ray.data as rd

    from webval.schema import format_inference

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])

    def build(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        k = t.column("o_orderkey").combine_chunks()
        m = _pc_mod(k, 5)
        cust = pc.cast(t.column("o_custkey"), pa.string())
        # strftime on BOTH engines (o_orderdate is a timestamp; engine
        # default stringifications differ by the .000000 suffix)
        date = pc.strftime(t.column("o_orderdate"), format="%Y-%m-%d")
        url = pc.binary_join_element_wise(
            pa.scalar("https://example.com/o/"),
            pc.cast(k, pa.string()), pa.scalar(""))
        email = pc.binary_join_element_wise(
            pa.scalar("user"), cust, pa.scalar("@example.com"),
            pa.scalar(""))
        v = pc.if_else(pc.equal(m, 0), cust,
                       pc.if_else(pc.equal(m, 1), date,
                                  pc.if_else(pc.equal(m, 2), url,
                                             pc.if_else(pc.equal(m, 3),
                                                        email,
                                                        pa.scalar("n/a")))))
        return pa.table({"v": v})

    out = format_inference(ds.map_batches(build, batch_format="pyarrow"),
                           "v")
    t = ds_to_table(out)
    return t.set_column(t.column_names.index("format"), "format",
                        pc.cast(t.column("format"), pa.string()))


SQL_FORMAT_INFERENCE = """
WITH v AS (SELECT CASE o_orderkey % 5
                  WHEN 0 THEN CAST(o_custkey AS VARCHAR)
                  WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                  WHEN 2 THEN 'https://example.com/o/'
                              || CAST(o_orderkey AS VARCHAR)
                  WHEN 3 THEN 'user' || CAST(o_custkey AS VARCHAR)
                              || '@example.com'
                  ELSE 'n/a' END AS s
           FROM orders
           WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
             AND o_orderdate IS NOT NULL),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
c AS (
  SELECT 'int' AS fmt, count(*) FILTER
         (regexp_full_match(s, '[+-]?[0-9]+')) AS n FROM v
  UNION ALL SELECT 'float', count(*) FILTER (regexp_full_match(s,
         '[+-]?([0-9]+\\.[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?')) FROM v
  UNION ALL SELECT 'iso_date', count(*) FILTER (regexp_full_match(s,
         '[0-9]{4}-[0-9]{2}-[0-9]{2}')) FROM v
  UNION ALL SELECT 'iso_timestamp', count(*) FILTER (regexp_full_match(s,
         '[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?'))
         FROM v
  UNION ALL SELECT 'uuid', count(*) FILTER (regexp_full_match(s,
         '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}'))
         FROM v
  UNION ALL SELECT 'email', count(*) FILTER (regexp_full_match(s,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) FROM v
  UNION ALL SELECT 'url', count(*) FILTER (regexp_full_match(s,
         'https?://[^\\s]+')) FROM v
  UNION ALL SELECT 'bool', count(*) FILTER (regexp_full_match(s,
         '(?i)(true|false)')) FROM v)
SELECT fmt AS format, CAST(c.n AS BIGINT) AS n_match,
       c.n / tot.n AS share
FROM c, tot ORDER BY fmt
"""


def q_script_mix(sf_dir: str):
    """Mixed-script audit per claimed lang (textstats.script_mix_stats):
    Latin/Cyrillic/Han char counts per doc, mix ratio = 1 − majority
    share, mixed when > 0.1 — language-label hygiene.  The per-doc mix
    is the same expression over the same integer counts on both
    engines, so the mixed flag is exact; avg_mix rounds 6 (sum
    order)."""
    import ray.data as rd

    from webval.textstats import script_mix_stats

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["lang", "text"])
    out = script_mix_stats(ds, "lang", "text", mix_threshold=0.1)
    t = ds_to_table(out).sort_by([("lang", "ascending")])
    t = t.set_column(t.column_names.index("lang"), "lang",
                     pc.cast(t.column("lang"), pa.string()))
    return _round_cols(t, {"avg_mix": 6})


SQL_SCRIPT_MIX = f"""
WITH d AS (SELECT lang,
                  CAST(len(regexp_extract_all(text, '\\p{{Latin}}'))
                       AS DOUBLE) AS lat,
                  CAST(len(regexp_extract_all(text, '\\p{{Cyrillic}}'))
                       AS DOUBLE) AS cyr,
                  CAST(len(regexp_extract_all(text, '\\p{{Han}}'))
                       AS DOUBLE) AS han
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE lang IS NOT NULL AND text IS NOT NULL),
m AS (SELECT lang, lat + cyr + han AS total,
             CASE WHEN lat + cyr + han > 0
                  THEN 1.0 - greatest(lat, cyr, han) / (lat + cyr + han)
                  ELSE 0.0 END AS mix,
             (lat + cyr + han > 0) AS scripted
      FROM d)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (scripted AND mix > 0.1) AS BIGINT)
           AS n_mixed,
       round(sum(mix) FILTER (scripted)
             / count(*) FILTER (scripted), 6) AS avg_mix
FROM m GROUP BY lang ORDER BY lang
"""
SQL_SCRIPT_MIX = SQL_SCRIPT_MIX.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_ols_fit(sf_dir: str):
    """Distributed two-feature OLS (clustering.fit_linear): price (in
    k$) regressed on quantity and discount over lineitem, solved from
    mergeable normal-equation partials.  The twin solves the same
    centered-covariance system via Cramer's rule; coefficients round 6
    (same covariances, different solve order)."""
    import ray.data as rd

    from webval.clustering import fit_linear

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_discount",
                                  "l_extendedprice"])
    ds = ds.map_batches(
        lambda t: pa.table({
            "l_quantity": t.column("l_quantity"),
            "l_discount": t.column("l_discount"),
            "price_k": pc.divide(t.column("l_extendedprice"),
                                 pa.scalar(1000.0))}),
        batch_format="pyarrow")
    m = fit_linear(ds, ["l_quantity", "l_discount"], "price_k")
    return pa.table({
        "n": pa.array([m["n"]], pa.int64()),
        "coef_quantity": pa.array([round(m["coef"]["l_quantity"], 6)]),
        "coef_discount": pa.array([round(m["coef"]["l_discount"], 6)]),
        "intercept": pa.array([round(m["intercept"], 6)]),
        "r2": pa.array([round(m["r2"], 6)])})


SQL_OLS_FIT = """
WITH v AS (SELECT l_quantity AS x1, l_discount AS x2,
                  l_extendedprice / 1000.0 AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
             AND l_extendedprice IS NOT NULL),
s AS (SELECT count(*) AS n, avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my,
             var_samp(x1) AS v11, var_samp(x2) AS v22,
             covar_samp(x1, x2) AS v12, covar_samp(x1, y) AS c1,
             covar_samp(x2, y) AS c2, var_samp(y) AS vy
      FROM v)
SELECT CAST(n AS BIGINT) AS n,
       round((c1 * v22 - c2 * v12) / (v11 * v22 - v12 * v12), 6)
           AS coef_quantity,
       round((c2 * v11 - c1 * v12) / (v11 * v22 - v12 * v12), 6)
           AS coef_discount,
       round(my - (c1 * v22 - c2 * v12) / (v11 * v22 - v12 * v12) * m1
                - (c2 * v11 - c1 * v12) / (v11 * v22 - v12 * v12) * m2, 6)
           AS intercept,
       round(((c1 * v22 - c2 * v12) / (v11 * v22 - v12 * v12) * c1
              + (c2 * v11 - c1 * v12) / (v11 * v22 - v12 * v12) * c2)
             / vy, 6) AS r2
FROM s
"""


def q_rrf_hosts(sf_dir: str):
    """Reciprocal-rank fusion (search.rrf_fuse, k=60): the top-50
    hosts by page count fused with the top-50 by mean text length into
    one top-20 — the lexical+dense retrieval-merge pattern on host
    rankings.  Ranks use (metric desc, host asc) tiebreaks on both
    engines; rrf rounds 9."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.search import rrf_fuse

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "text"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        ln = pc.utf8_length(t.column("text").combine_chunks())
        return pa.table({"host": host, "len": ln}).filter(
            pc.is_valid(host))

    hosted = ds.map_batches(add_host, batch_format="pyarrow")
    stats = grouped_agg(
        hosted.map_batches(lambda t: pa.table({
            "host": t.column("host"),
            "n": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "s": pc.cast(pc.fill_null(t.column("len"), 0), pa.int64()),
            "c": pc.cast(pc.is_valid(t.column("len").combine_chunks()),
                         pa.int64())}), batch_format="pyarrow"),
        ["host"], [("n", "sum"), ("s", "sum"), ("c", "sum")],
        rename={"n_sum": "n", "s_sum": "s", "c_sum": "c"})

    stats = stats.map_batches(
        lambda t: t.append_column(
            "mean_len", pc.divide(pc.cast(t.column("s"), pa.float64()),
                                  pc.cast(t.column("c"), pa.float64()))),
        batch_format="pyarrow")

    def rank_by(col: str) -> "pa.Table":
        # distributed sort + limit; only the 50-row list reaches the
        # driver (the host table itself never does)
        top = ds_to_table(stats.sort([col, "host"],
                                     descending=[True, False]).limit(50))
        return top.append_column(
            "rank", pa.array(np.arange(1, top.num_rows + 1), pa.int64()))

    r1 = rank_by("n")
    r2 = rank_by("mean_len")
    fused = rrf_fuse([rd.from_arrow(r1.select(["host", "rank"])),
                      rd.from_arrow(r2.select(["host", "rank"]))],
                     "host", k=60.0, top_k=20)
    t = ds_to_table(fused)
    t = t.set_column(t.column_names.index("host"), "host",
                     pc.cast(t.column("host"), pa.string()))
    return _round_cols(t, {"rrf": 9})


SQL_RRF_HOSTS = f"""
WITH h AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS host,
                  count(*) AS n,
                  CAST(sum(coalesce(length(text), 0)) AS DOUBLE)
                      / count(text) AS mean_len
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
           GROUP BY 1),
r1 AS (SELECT host, rn AS rank FROM
       (SELECT host, row_number() OVER (ORDER BY n DESC, host) AS rn
        FROM h) WHERE rn <= 50),
r2 AS (SELECT host, rn AS rank FROM
       (SELECT host, row_number() OVER (ORDER BY mean_len DESC, host)
            AS rn FROM h) WHERE rn <= 50),
u AS (SELECT host, rank FROM r1 UNION ALL SELECT host, rank FROM r2)
SELECT host, round(sum(1.0 / (60.0 + rank)), 9) AS rrf,
       CAST(count(*) AS BIGINT) AS n_lists
FROM u GROUP BY host
ORDER BY round(sum(1.0 / (60.0 + rank)), 9) DESC, host LIMIT 20
"""
SQL_RRF_HOSTS = SQL_RRF_HOSTS.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_rbo_stability(sf_dir: str):
    """Rank-biased overlap (drift.rank_biased_overlap, p=0.9) between
    the top-30 host lists of the even- and odd-page_id halves of the
    crawl — "did the leaderboard change" list drift that correlation
    coefficients can't answer on partial lists.  Counts are exact;
    rbo rounds 6 (pow/series accumulation)."""
    import ray.data as rd

    from webval.drift import rank_biased_overlap
    from webval.exchange import grouped_agg

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "page_id"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        side = _pc_mod(t.column("page_id").combine_chunks(), 2)
        return pa.table({"host": host, "side": side}).filter(
            pc.is_valid(host))

    counts = grouped_agg(
        ds.map_batches(add_host, batch_format="pyarrow"),
        ["side", "host"], [("host", "count")],
        rename={"host_count": "n"}).materialize()

    def top30(side: int) -> list:
        # distributed filter + sort + limit; only 30 rows land driver-side
        s = ds_to_table(counts.filter(expr=f"side == {side}")
                        .sort(["n", "host"], descending=[True, False])
                        .limit(30))
        return s.column("host").to_pylist()

    a, b = top30(0), top30(1)
    rbo = rank_biased_overlap(a, b, p=0.9)
    return pa.table({
        "k": pa.array([30], pa.int64()),
        "n_common": pa.array([len(set(a) & set(b))], pa.int64()),
        "rbo": pa.array([round(rbo, 6)], pa.float64())})


SQL_RBO_STABILITY = f"""
WITH h AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS host,
                  page_id % 2 AS side
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')),
ra AS (SELECT host, rn FROM
       (SELECT host, row_number() OVER (ORDER BY count(*) DESC, host)
            AS rn FROM h WHERE side = 0 GROUP BY host)
       WHERE rn <= 30),
rb AS (SELECT host, rn FROM
       (SELECT host, row_number() OVER (ORDER BY count(*) DESC, host)
            AS rn FROM h WHERE side = 1 GROUP BY host)
       WHERE rn <= 30),
j AS (SELECT greatest(ra.rn, rb.rn) AS d FROM ra JOIN rb USING (host)),
ds AS (SELECT unnest(generate_series(1, 30)) AS d),
o AS (SELECT ds.d, (SELECT count(*) FROM j WHERE j.d <= ds.d) AS ov
      FROM ds)
SELECT CAST(30 AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM j) AS n_common,
       round(0.1 * sum(pow(0.9, d - 1) * ov / d), 6) AS rbo
FROM o
"""
SQL_RBO_STABILITY = SQL_RBO_STABILITY.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_peak_rate(sf_dir: str):
    """Burst detection (windows.peak_rate): per user, the max number of
    events in any sliding 1-hour window — the scraper/rate-limit audit
    hourly buckets smear.  Semantics are exactly SQL's RANGE 1-hour
    window count (timestamp peers included); integers, exact."""
    import ray.data as rd

    from webval.windows import peak_rate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return ds_to_table(peak_rate(ds, "user_id", "ts",
                                 window_seconds=3600)) \
        .sort_by([("user_id", "ascending")])


SQL_PEAK_RATE = """
WITH w AS (SELECT user_id,
                  count(*) OVER (PARTITION BY user_id ORDER BY ts
                                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                 AND CURRENT ROW) AS c
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(c) AS BIGINT) AS peak_rate
FROM w GROUP BY user_id ORDER BY user_id
"""


def q_rebalance_sample(sf_dir: str):
    """Distribution-matching downsample
    (pipelines.match_distribution_sample): rebalance the en-heavy crawl
    to uniform shares over {en, de, ru, zh} at the largest achievable
    size — per-lang Knuth-hash thresholds, membership-exact on both
    engines, verified by per-lang kept counts."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.pipelines import match_distribution_sample

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "lang"])
    kept = match_distribution_sample(
        ds, "lang", "page_id",
        {"en": 0.25, "de": 0.25, "ru": 0.25, "zh": 0.25})
    counts = grouped_agg(kept, ["lang"], [("lang", "count")],
                         rename={"lang_count": "kept"})
    t = ds_to_table(counts).sort_by([("lang", "ascending")])
    return t.set_column(t.column_names.index("lang"), "lang",
                        pc.cast(t.column("lang"), pa.string()))


SQL_REBALANCE_SAMPLE = f"""
WITH p AS (SELECT page_id, lang
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE lang IN ('en', 'de', 'ru', 'zh')
             AND page_id IS NOT NULL),
c AS (SELECT lang, count(*) AS n FROM p GROUP BY 1),
nt AS (SELECT min(n / 0.25) AS t FROM c),
r AS (SELECT lang,
             CAST(floor(0.25 * nt.t / c.n * 4294967296.0) AS BIGINT)
                 AS thr
      FROM c, nt)
SELECT p.lang, CAST(count(*) AS BIGINT) AS kept
FROM p JOIN r USING (lang)
WHERE (p.page_id * 2654435761) % 4294967296 < r.thr
GROUP BY p.lang ORDER BY p.lang
"""
SQL_REBALANCE_SAMPLE = SQL_REBALANCE_SAMPLE.replace("{SYNTH_ROOT}",
                                                    SYNTH_ROOT)


def q_event_rules(sf_dir: str):
    """Association rules (relational.association_rules): event-type
    pairs co-triggered by the same users, ranked by lift — presence-
    based market-basket mining.  All ratios are the same integer-fed
    expressions on both engines, emitted unrounded; rank key is
    round(lift, 6) with (a, b) ties."""
    import ray.data as rd

    from webval.relational import association_rules

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    out = association_rules(ds, "user_id", "event_type", min_pair=5,
                            top_k=20)
    t = ds_to_table(out)
    for c in ("a", "b"):
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(t.column(c), pa.string()))
    return t


SQL_EVENT_RULES = """
WITH e AS (SELECT DISTINCT user_id, event_type FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
nb AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM e),
ic AS (SELECT event_type, count(*) AS c FROM e GROUP BY 1),
pr AS (SELECT a.event_type AS a, b.event_type AS b, count(*) AS n_ab
       FROM e a JOIN e b
         ON a.user_id = b.user_id AND a.event_type < b.event_type
       GROUP BY 1, 2 HAVING count(*) >= 5)
SELECT pr.a, pr.b, CAST(pr.n_ab AS BIGINT) AS n_ab,
       CAST(ia.c AS BIGINT) AS n_a, CAST(ib.c AS BIGINT) AS n_b,
       pr.n_ab / nb.n AS support,
       CAST(pr.n_ab AS DOUBLE) / ia.c AS conf_a_b,
       CAST(pr.n_ab AS DOUBLE) / ib.c AS conf_b_a,
       (nb.n * pr.n_ab) / (CAST(ia.c AS DOUBLE) * ib.c) AS lift
FROM pr JOIN ic ia ON pr.a = ia.event_type
        JOIN ic ib ON pr.b = ib.event_type, nb
ORDER BY round((nb.n * pr.n_ab) / (CAST(ia.c AS DOUBLE) * ib.c), 6)
             DESC, pr.a, pr.b
LIMIT 20
"""


def q_ppr_hosts(sf_dir: str):
    """Personalized PageRank (graph.personalized_pagerank) from seeds
    {d0, d1} over the host link graph, 3 iterations — "hosts related
    to the seeds" proximity.  The twin unrolls the same update as
    chained CTEs (teleport+dangling mass to seeds only); ranks round 6
    (different contribution-sum order)."""
    import ray.data as rd

    from webval.graph import personalized_pagerank

    _, links = ensure_synth(sf_dir)
    ds = rd.read_parquet(links, columns=["src_url", "dst_url"])

    def hosts(t: pa.Table) -> pa.Table:
        s = pc.struct_field(pc.extract_regex(
            t.column("src_url").combine_chunks(), _HOST_RE), "host")
        d = pc.struct_field(pc.extract_regex(
            t.column("dst_url").combine_chunks(), _HOST_RE), "host")
        return pa.table({"s": s, "d": d}).filter(
            pc.and_(pc.is_valid(s), pc.is_valid(d)))

    out = personalized_pagerank(
        ds.map_batches(hosts, batch_format="pyarrow"), "s", "d",
        ["d0", "d1"], damping=0.85, n_iter=3)
    t = ds_to_table(out).sort_by([("node", "ascending")])
    t = t.set_column(t.column_names.index("node"), "node",
                     pc.cast(t.column("node"), pa.string()))
    return _round_cols(t, {"rank": 6})


SQL_PPR_HOSTS = f"""
WITH e AS (SELECT regexp_extract(src_url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS s,
                  regexp_extract(dst_url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS d
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/links.parquet')
           WHERE regexp_matches(src_url, '^https?://([a-z0-9-]+)\\.')
             AND regexp_matches(dst_url, '^https?://([a-z0-9-]+)\\.')),
nodes AS (SELECT DISTINCT node FROM
          (SELECT s AS node FROM e UNION ALL SELECT d FROM e
           UNION ALL SELECT unnest(['d0', 'd1']))),
dg AS (SELECT s AS node, count(*) AS deg FROM e GROUP BY 1),
nd AS (SELECT n.node, coalesce(dg.deg, 0) AS deg,
              n.node IN ('d0', 'd1') AS seed
       FROM nodes n LEFT JOIN dg USING (node)),
r0 AS (SELECT node, deg, seed,
              CASE WHEN seed THEN 0.5 ELSE 0.0 END AS r FROM nd),
r1 AS (SELECT nd.node, nd.deg, nd.seed,
              0.85 * coalesce(c.w, 0.0) + CASE WHEN nd.seed THEN
                  (0.15 + 0.85 * dang.dm) / 2.0 ELSE 0.0 END AS r
       FROM nd
       LEFT JOIN (SELECT e.d AS node, sum(p.r / p.deg) AS w
                  FROM e JOIN r0 p ON e.s = p.node GROUP BY 1) c
           USING (node)
       CROSS JOIN (SELECT coalesce(sum(CASE WHEN deg = 0 THEN r END),
                                   0.0) AS dm FROM r0) dang),
r2 AS (SELECT nd.node, nd.deg, nd.seed,
              0.85 * coalesce(c.w, 0.0) + CASE WHEN nd.seed THEN
                  (0.15 + 0.85 * dang.dm) / 2.0 ELSE 0.0 END AS r
       FROM nd
       LEFT JOIN (SELECT e.d AS node, sum(p.r / p.deg) AS w
                  FROM e JOIN r1 p ON e.s = p.node GROUP BY 1) c
           USING (node)
       CROSS JOIN (SELECT coalesce(sum(CASE WHEN deg = 0 THEN r END),
                                   0.0) AS dm FROM r1) dang),
r3 AS (SELECT nd.node, nd.deg, nd.seed,
              0.85 * coalesce(c.w, 0.0) + CASE WHEN nd.seed THEN
                  (0.15 + 0.85 * dang.dm) / 2.0 ELSE 0.0 END AS r
       FROM nd
       LEFT JOIN (SELECT e.d AS node, sum(p.r / p.deg) AS w
                  FROM e JOIN r2 p ON e.s = p.node GROUP BY 1) c
           USING (node)
       CROSS JOIN (SELECT coalesce(sum(CASE WHEN deg = 0 THEN r END),
                                   0.0) AS dm FROM r2) dang)
SELECT node, round(r, 6) AS rank FROM r3 ORDER BY node
"""
SQL_PPR_HOSTS = SQL_PPR_HOSTS.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_tukey_outliers(sf_dir: str):
    """Tukey-fence outlier audit (rank.tukey_outlier_audit, k=1.5):
    per event type, exact interpolated Q1/Q3 and counts outside the
    boxplot fences.  Fences are the same arithmetic over the same
    interpolated quantiles on both engines, so flags are exact;
    quantiles and out_rate round 6."""
    import ray.data as rd

    from webval.rank import tukey_outlier_audit

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    out = tukey_outlier_audit(ds, "event_type", "value", k=1.5)
    t = ds_to_table(out).sort_by([("event_type", "ascending")])
    return _round_cols(t, {"q1": 6, "q3": 6, "out_rate": 6})


SQL_TUKEY_OUTLIERS = """
WITH v AS (SELECT event_type, value FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
f AS (SELECT event_type, quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM v GROUP BY 1)
SELECT v.event_type, CAST(count(*) AS BIGINT) AS n,
       round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
       CAST(count(*) FILTER (v.value < f.q1 - 1.5 * (f.q3 - f.q1))
            AS BIGINT) AS n_low,
       CAST(count(*) FILTER (v.value > f.q3 + 1.5 * (f.q3 - f.q1))
            AS BIGINT) AS n_high,
       round(CAST(count(*) FILTER (v.value < f.q1 - 1.5 * (f.q3 - f.q1)
                                   OR v.value > f.q3
                                      + 1.5 * (f.q3 - f.q1))
                  AS DOUBLE) / count(*), 6) AS out_rate
FROM v JOIN f USING (event_type)
GROUP BY v.event_type, f.q1, f.q3 ORDER BY v.event_type
"""


def q_blocking_quality(sf_dir: str):
    """Pairwise blocking evaluation (dedup.cluster_pair_quality):
    16-char-prefix blocking scored against exact-text truth — pair
    precision (over-merge), recall (misses) and F1, computed via the
    contingency identity with no pair set materialized.  Counts exact;
    ratios are the same divisions on both engines, unrounded."""
    import ray.data as rd

    from webval.dedup import cluster_pair_quality

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["text"])

    def assign(t: pa.Table) -> pa.Table:
        txt = t.column("text").combine_chunks()
        txt = txt.filter(pc.is_valid(txt)).cast(pa.large_string())
        return pa.table({"pred": pc.utf8_slice_codeunits(txt, 0, 16),
                         "truth": txt})

    m = cluster_pair_quality(
        ds.map_batches(assign, batch_format="pyarrow"), "pred", "truth")
    return pa.table({
        "pred_pairs": pa.array([m["pred_pairs"]], pa.int64()),
        "true_pairs": pa.array([m["true_pairs"]], pa.int64()),
        "common_pairs": pa.array([m["common_pairs"]], pa.int64()),
        "precision": pa.array([m["precision"]], pa.float64()),
        "recall": pa.array([m["recall"]], pa.float64()),
        "f1": pa.array([m["f1"]], pa.float64())})


SQL_BLOCKING_QUALITY = f"""
WITH a AS (SELECT substr(text, 1, 16) AS pred, text AS truth
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE text IS NOT NULL),
pp AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS p FROM
       (SELECT count(*) AS n FROM a GROUP BY pred)),
tp AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS t FROM
       (SELECT count(*) AS n FROM a GROUP BY truth)),
cp AS (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS c FROM
       (SELECT count(*) AS n FROM a GROUP BY pred, truth))
SELECT pp.p AS pred_pairs, tp.t AS true_pairs, cp.c AS common_pairs,
       CAST(cp.c AS DOUBLE) / pp.p AS precision,
       CAST(cp.c AS DOUBLE) / tp.t AS recall,
       2 * (CAST(cp.c AS DOUBLE) / pp.p) * (CAST(cp.c AS DOUBLE) / tp.t)
           / (CAST(cp.c AS DOUBLE) / pp.p + CAST(cp.c AS DOUBLE) / tp.t)
           AS f1
FROM pp, tp, cp
"""
SQL_BLOCKING_QUALITY = SQL_BLOCKING_QUALITY.replace("{SYNTH_ROOT}",
                                                    SYNTH_ROOT)


def q_pythagorean_means(sf_dir: str):
    """Grouped AM/GM/HM (aggregates.grouped_pythagorean_means) of
    event values per type — harmonic for rates, geometric for factors,
    arithmetic for levels; AM ≥ GM ≥ HM is asserted by construction.
    Zero/negative/null values are excluded and counted.  Means round 6
    (sum order differs)."""
    import ray.data as rd

    from webval.aggregates import grouped_pythagorean_means

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    out = grouped_pythagorean_means(ds, "event_type", "value")
    t = ds_to_table(out).sort_by([("event_type", "ascending")])
    return _round_cols(t, {"arith_mean": 6, "geo_mean": 6,
                           "harm_mean": 6})


SQL_PYTHAGOREAN_MEANS = """
WITH v AS (SELECT event_type, value FROM events
           WHERE event_type IS NOT NULL AND value IS NOT NULL)
SELECT event_type,
       CAST(count(*) FILTER (value > 0) AS BIGINT) AS n,
       CAST(count(*) FILTER (value <= 0) AS BIGINT) AS n_excluded,
       round(sum(value) FILTER (value > 0)
             / count(*) FILTER (value > 0), 6) AS arith_mean,
       round(exp(sum(CASE WHEN value > 0 THEN ln(value) END)
                 / count(*) FILTER (value > 0)), 6) AS geo_mean,
       round(count(*) FILTER (value > 0)
             / sum(1.0 / value) FILTER (value > 0), 6) AS harm_mean
FROM v GROUP BY event_type ORDER BY event_type
"""


def q_rolling_zscore(sf_dir: str):
    """Trailing-window anomaly scores (windows.rolling_zscore, w=7,
    min_periods=3): each event type's daily volume judged against the
    previous week only — the self-masking-proof monitoring score.
    (type, day) keys are unique, so ordering is tie-free; z rounds 6
    (pandas rolling vs SQL window accumulation order)."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.windows import rolling_zscore

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def daily(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        ts = t.column("ts").combine_chunks()
        m = pc.and_(pc.is_valid(et), pc.is_valid(ts))
        return pa.table({"event_type": et.filter(m),
                         "day": pc.floor_temporal(ts.filter(m),
                                                  unit="day")})

    counts = grouped_agg(ds.map_batches(daily, batch_format="pyarrow"),
                         ["event_type", "day"], [("day", "count")],
                         rename={"day_count": "n"})
    counts = counts.map_batches(
        lambda t: t.set_column(t.column_names.index("n"), "n",
                               pc.cast(t.column("n"), pa.float64())),
        batch_format="pyarrow")
    out = rolling_zscore(counts, "event_type", "day", "n", window=7,
                         min_periods=3)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "day": t.column("day"),
                         "n": pc.cast(t.column("n"), pa.int64()),
                         "zscore": t.column("zscore")})

    return _round_cols(
        ds_to_table(out.map_batches(shape, batch_format="pyarrow"))
        .sort_by([("event_type", "ascending"), ("day", "ascending")]),
        {"zscore": 6})


SQL_ROLLING_ZSCORE = """
WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(count(*) AS DOUBLE) AS n
           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
w AS (SELECT event_type, day, n,
             avg(n) OVER win AS m, stddev_samp(n) OVER win AS s,
             count(*) OVER win AS c
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       round(CASE WHEN c >= 3 AND s > 0 THEN (n - m) / s END, 6)
           AS zscore
FROM w ORDER BY event_type, day
"""


def q_winsorized_mean(sf_dir: str):
    """Winsorized mean of l_extendedprice per return flag
    (rank.winsorized_mean, 5%/95%): tails clamped to exact interpolated
    quantiles, every row still votes — the robust location companion
    of trimmed_mean.  Clamp is bit-identical; mean rounds 6 (sum
    order)."""
    import ray.data as rd

    from webval.rank import winsorized_mean

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    out = winsorized_mean(ds, "l_returnflag", "l_extendedprice",
                          lo=0.05, hi=0.95)
    t = ds_to_table(out).sort_by([("l_returnflag", "ascending")])
    return _round_cols(t, {"q_lo": 6, "q_hi": 6, "winsorized_mean": 6})


SQL_WINSORIZED_MEAN = """
WITH v AS (SELECT l_returnflag AS k, l_extendedprice AS x FROM lineitem
           WHERE l_extendedprice IS NOT NULL
             AND l_returnflag IS NOT NULL),
q AS (SELECT k, quantile_cont(x, 0.05) AS q_lo,
             quantile_cont(x, 0.95) AS q_hi
      FROM v GROUP BY 1)
SELECT v.k AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(q.q_lo, 6) AS q_lo, round(q.q_hi, 6) AS q_hi,
       round(sum(least(greatest(v.x, q.q_lo), q.q_hi)) / count(*), 6)
           AS winsorized_mean
FROM v JOIN q USING (k) GROUP BY v.k, q.q_lo, q.q_hi ORDER BY v.k
"""


def q_negative_edges(sf_dir: str):
    """Deterministic negative sampling (graph.negative_edge_samples,
    k=2) over the host link graph: Knuth-hash candidates into the
    ranked target vocabulary, true edges anti-joined away —
    reproducible contrastive pairs for link prediction.  Membership is
    integer-exact on both engines."""
    import ray.data as rd

    from webval.graph import negative_edge_samples

    _, links = ensure_synth(sf_dir)
    ds = rd.read_parquet(links, columns=["src_url", "dst_url"])

    def hosts(t: pa.Table) -> pa.Table:
        s = pc.struct_field(pc.extract_regex(
            t.column("src_url").combine_chunks(), _HOST_RE), "host")
        d = pc.struct_field(pc.extract_regex(
            t.column("dst_url").combine_chunks(), _HOST_RE), "host")
        return pa.table({"s": s, "d": d}).filter(
            pc.and_(pc.is_valid(s), pc.is_valid(d)))

    out = negative_edge_samples(
        ds.map_batches(hosts, batch_format="pyarrow"), "s", "d", 2)
    t = ds_to_table(out).sort_by([("s", "ascending"),
                                  ("slot", "ascending")])
    for c in ("s", "d"):
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(t.column(c), pa.string()))
    return t


SQL_NEGATIVE_EDGES = f"""
WITH e AS (SELECT DISTINCT
                  regexp_extract(src_url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS s,
                  regexp_extract(dst_url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS d
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/links.parquet')
           WHERE regexp_matches(src_url, '^https?://([a-z0-9-]+)\\.')
             AND regexp_matches(dst_url, '^https?://([a-z0-9-]+)\\.')),
dsts AS (SELECT d, row_number() OVER (ORDER BY d) - 1 AS r
         FROM (SELECT DISTINCT d FROM e)),
m AS (SELECT count(*) AS c FROM dsts),
srcs AS (SELECT s, row_number() OVER (ORDER BY s) - 1 AS sr
         FROM (SELECT DISTINCT s FROM e)),
cand AS (SELECT DISTINCT srcs.s, dsts.d, sl.slot
         FROM srcs
         CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS slot) sl
         CROSS JOIN m
         JOIN dsts ON dsts.r = ((srcs.sr * 2 + sl.slot) * 2654435761)
                               % 4294967296 % m.c)
SELECT cand.s, cand.d, CAST(cand.slot AS BIGINT) AS slot
FROM cand
WHERE NOT EXISTS (SELECT 1 FROM e
                  WHERE e.s = cand.s AND e.d = cand.d)
ORDER BY cand.s, cand.slot
"""
SQL_NEGATIVE_EDGES = SQL_NEGATIVE_EDGES.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_cap_per_host(sf_dir: str):
    """Frequency-capped sampling (pipelines.cap_per_group, cap=10):
    at most 10 pages per host, survivors chosen by (Knuth hash,
    page_id) rank — crawl balancing with auditable membership.
    Verified by per-host kept counts plus a checksum of kept page_ids
    (membership-exact on both engines)."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.pipelines import cap_per_group

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "url"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host,
                         "page_id": t.column("page_id")}).filter(
            pc.is_valid(host))

    kept = cap_per_group(ds.map_batches(add_host, batch_format="pyarrow"),
                         "host", "page_id", 10)
    out = grouped_agg(kept, ["host"],
                      [("host", "count"), ("page_id", "sum")],
                      rename={"host_count": "kept",
                              "page_id_sum": "id_sum"})
    t = ds_to_table(out).sort_by([("host", "ascending")])
    return t.set_column(t.column_names.index("host"), "host",
                        pc.cast(t.column("host"), pa.string()))


SQL_CAP_PER_HOST = f"""
WITH p AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS host, page_id
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
             AND page_id IS NOT NULL),
r AS (SELECT host, page_id,
             row_number() OVER (PARTITION BY host
                                ORDER BY (page_id * 2654435761)
                                         % 4294967296, page_id) AS rn
      FROM p)
SELECT host, CAST(count(*) AS BIGINT) AS kept,
       CAST(sum(page_id) AS BIGINT) AS id_sum
FROM r WHERE rn <= 10 GROUP BY host ORDER BY host
"""
SQL_CAP_PER_HOST = SQL_CAP_PER_HOST.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_lang_vocab_cosine(sf_dir: str):
    """Inter-language vocabulary cosine (textstats.group_vocab_cosine,
    min_count=2): term-frequency-vector similarity for every lang pair
    — the slice-confusion audit (shared boilerplate tokens give every
    pair a floor; same-script langs sit far above it).  cosine rounds 6
    (sum order)."""
    import ray.data as rd

    from webval.textstats import group_vocab_cosine

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["lang", "text"])
    out = group_vocab_cosine(ds, "lang", "text", min_count=2)
    t = ds_to_table(out).sort_by([("g1", "ascending"),
                                  ("g2", "ascending")])
    return _round_cols(t, {"cosine": 6})


SQL_LANG_VOCAB_COSINE = f"""
WITH tok AS (SELECT lang AS grp,
                    unnest(list_filter(regexp_split_to_array(lower(text),
                                                             '[^a-z0-9]+'),
                                       x -> x <> '')) AS term
             FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
             WHERE lang IS NOT NULL AND text IS NOT NULL),
c AS (SELECT term, grp, CAST(count(*) AS DOUBLE) AS n
      FROM tok GROUP BY 1, 2),
keep AS (SELECT term FROM c GROUP BY term HAVING sum(n) >= 2),
v AS (SELECT c.term, c.grp, c.n FROM c JOIN keep USING (term)),
norms AS (SELECT grp, sum(n * n) AS sq FROM v GROUP BY 1),
dots AS (SELECT a.grp AS g1, b.grp AS g2, sum(a.n * b.n) AS dot
         FROM v a JOIN v b ON a.term = b.term AND a.grp < b.grp
         GROUP BY 1, 2)
SELECT na.grp AS g1, nb.grp AS g2,
       round(coalesce(d.dot, 0.0) / (sqrt(na.sq) * sqrt(nb.sq)), 6)
           AS cosine
FROM norms na JOIN norms nb ON na.grp < nb.grp
LEFT JOIN dots d ON d.g1 = na.grp AND d.g2 = nb.grp
ORDER BY 1, 2
"""
SQL_LANG_VOCAB_COSINE = SQL_LANG_VOCAB_COSINE.replace("{SYNTH_ROOT}",
                                                      SYNTH_ROOT)


def q_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of daily event volume per type
    (windows.lag_autocorr): does yesterday's volume predict today's —
    the persistence/seasonality audit.  (type, day) series are
    tie-free; corr rounds 6."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.windows import lag_autocorr

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def daily(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        ts = t.column("ts").combine_chunks()
        m = pc.and_(pc.is_valid(et), pc.is_valid(ts))
        return pa.table({"event_type": et.filter(m),
                         "day": pc.floor_temporal(ts.filter(m),
                                                  unit="day")})

    counts = grouped_agg(ds.map_batches(daily, batch_format="pyarrow"),
                         ["event_type", "day"], [("day", "count")],
                         rename={"day_count": "n"})
    counts = counts.map_batches(
        lambda t: t.set_column(t.column_names.index("n"), "n",
                               pc.cast(t.column("n"), pa.float64())),
        batch_format="pyarrow")
    out = lag_autocorr(counts, "event_type", "day", "n", lag=1)
    t = ds_to_table(out).sort_by([("event_type", "ascending")])
    return _round_cols(t, {"corr": 6})


SQL_DAILY_AUTOCORR = """
WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(count(*) AS DOUBLE) AS n
           FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1, 2),
p AS (SELECT event_type, n AS x,
             lead(n) OVER (PARTITION BY event_type ORDER BY day) AS y
      FROM d)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(corr(x, y), 6) AS corr
FROM p WHERE y IS NOT NULL GROUP BY event_type ORDER BY event_type
"""


def q_curation_funnel(sf_dir: str):
    """Curation-funnel audit: survivor counts through the cleaning
    stages every training-data pipeline chains — total → non-null text
    → known lang → blocklist pass (tag_blocklist) → length ≥ 40 →
    distinct text (exact dedup) — the "where did my corpus go" report.
    Each stage reuses the engine's real operators; counts exact."""
    import ray.data as rd

    from webval.exchange import distinct_rows, sum_block_scalars
    from webval.textclean import tag_blocklist

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "lang", "text"])

    def count_of(d) -> int:
        return sum_block_scalars(
            d.map_batches(lambda t: pa.table({
                "n": pa.array([t.num_rows], pa.int64())}),
                batch_format="pyarrow").materialize(), ["n"])["n"]

    stages = []
    stages.append(("00_total", count_of(ds)))
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("text").combine_chunks())),
        batch_format="pyarrow")
    stages.append(("01_text_present", count_of(ds)))
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.invert(pc.equal(t.column("lang").combine_chunks(),
                               "__unk__")))),
        batch_format="pyarrow")
    stages.append(("02_lang_known", count_of(ds)))
    ds = tag_blocklist(ds, "text", ["f—g", "музыка"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.invert(t.column("blocked")))
        .drop_columns(["blocked"]),
        batch_format="pyarrow")
    stages.append(("03_blocklist_pass", count_of(ds)))
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(
            pc.utf8_length(t.column("text").combine_chunks()),
            pa.scalar(40))),
        batch_format="pyarrow")
    stages.append(("04_len_ok", count_of(ds)))
    stages.append(("05_distinct_text",
                   count_of(distinct_rows(ds.select_columns(["text"]),
                                          ["text"]))))
    return pa.table({
        "stage": pa.array([s for s, _ in stages], pa.string()),
        "rows": pa.array([n for _, n in stages], pa.int64())})


SQL_CURATION_FUNNEL = f"""
WITH p AS (SELECT lang, text
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')),
s1 AS (SELECT * FROM p WHERE text IS NOT NULL),
s2 AS (SELECT * FROM s1 WHERE lang IS NOT NULL AND lang <> '__unk__'),
s3 AS (SELECT * FROM s2 WHERE NOT (contains(lower(text), 'f—g')
                                   OR contains(lower(text), 'музыка'))),
s4 AS (SELECT * FROM s3 WHERE length(text) >= 40)
SELECT * FROM (
  SELECT '00_total' AS stage, CAST(count(*) AS BIGINT) AS rows FROM p
  UNION ALL SELECT '01_text_present', count(*) FROM s1
  UNION ALL SELECT '02_lang_known', count(*) FROM s2
  UNION ALL SELECT '03_blocklist_pass', count(*) FROM s3
  UNION ALL SELECT '04_len_ok', count(*) FROM s4
  UNION ALL SELECT '05_distinct_text', count(DISTINCT text) FROM s4)
ORDER BY stage
"""
SQL_CURATION_FUNNEL = SQL_CURATION_FUNNEL.replace("{SYNTH_ROOT}",
                                                  SYNTH_ROOT)


def q_parquet_layout(sf_dir: str):
    """Parquet layout audit (sources.parquet_layout_report): per
    row group of lineitem+orders, rows / columns / compressed bytes
    read from FOOTERS only — the scan-throughput health check.  The
    twin reads the same footers via DuckDB's parquet_metadata();
    integers, exact."""
    from webval.sources import parquet_layout_report

    return ds_to_table(parquet_layout_report(
        [f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"]))


SQL_PARQUET_LAYOUT = """
SELECT * FROM (
  SELECT 'lineitem.parquet' AS file,
         CAST(row_group_id AS BIGINT) AS row_group,
         CAST(row_group_num_rows AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_cols,
         CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes
  FROM parquet_metadata('{SF_DIR}/lineitem.parquet')
  GROUP BY row_group_id, row_group_num_rows
  UNION ALL
  SELECT 'orders.parquet', CAST(row_group_id AS BIGINT),
         CAST(row_group_num_rows AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(sum(total_compressed_size) AS BIGINT)
  FROM parquet_metadata('{SF_DIR}/orders.parquet')
  GROUP BY row_group_id, row_group_num_rows)
ORDER BY file, row_group
"""
SQL_PARQUET_LAYOUT = SQL_PARQUET_LAYOUT.replace("{SF_DIR}",
                                                "/root/testdata/sf0.01")


def q_split_balance(sf_dir: str):
    """Split-balance audit: lang composition per assign_split bucket +
    the Pearson chi-square statistic of the split×lang contingency —
    "did the hash split accidentally stratify" (it must not; a large
    chi2 flags id↔lang correlation leaking into the split).  Counts
    exact; chi2 rounds 6 (expected-count arithmetic)."""
    import ray.data as rd

    from webval.drift import contingency_stats
    from webval.exchange import grouped_agg
    from webval.pipelines import assign_split

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "lang"])
    ds = ds.map_batches(lambda t: t.drop_null(), batch_format="pyarrow")
    split = assign_split(ds, "page_id")
    counts = grouped_agg(split, ["split", "lang"], [("lang", "count")],
                         rename={"lang_count": "n"})
    t = ds_to_table(counts).sort_by([("split", "ascending"),
                                     ("lang", "ascending")])
    # contingency chi2 over the (split × lang) cell matrix
    splits = sorted(set(t.column("split").to_pylist()))
    langs = sorted(set(t.column("lang").to_pylist()))
    mat = np.zeros((len(splits), len(langs)))
    for s, l, n in zip(t.column("split").to_pylist(),
                       t.column("lang").to_pylist(),
                       t.column("n").to_pylist()):
        mat[splits.index(s), langs.index(l)] = n
    stat, dof, _ = contingency_stats(mat)
    t = t.set_column(t.column_names.index("split"), "split",
                     pc.cast(t.column("split"), pa.string()))
    t = t.set_column(t.column_names.index("lang"), "lang",
                     pc.cast(t.column("lang"), pa.string()))
    return t.append_column(
        "chi2", pa.array([round(stat, 6)] * t.num_rows, pa.float64()))


SQL_SPLIT_BALANCE = f"""
WITH p AS (SELECT CASE
                  WHEN (page_id * 2654435761) % 4294967296
                       < 3865470566 THEN 'train'
                  WHEN (page_id * 2654435761) % 4294967296
                       < 4080218931 THEN 'val'
                  ELSE 'test' END AS split,
                  lang
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE page_id IS NOT NULL AND lang IS NOT NULL),
c AS (SELECT split, lang, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM c),
chi AS (SELECT round(sum((coalesce(c.n, 0) - rs.rn * cs.cn / tot.nn)
                         * (coalesce(c.n, 0) - rs.rn * cs.cn / tot.nn)
                         / (rs.rn * cs.cn / tot.nn)), 6) AS chi2
        FROM (SELECT split, CAST(sum(n) AS DOUBLE) AS rn FROM c
              GROUP BY 1) rs
        CROSS JOIN (SELECT lang, CAST(sum(n) AS DOUBLE) AS cn FROM c
                    GROUP BY 1) cs
        CROSS JOIN tot
        LEFT JOIN c ON c.split = rs.split AND c.lang = cs.lang)
SELECT c.split, c.lang, c.n, chi.chi2 FROM c, chi
ORDER BY c.split, c.lang
"""
SQL_SPLIT_BALANCE = SQL_SPLIT_BALANCE.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_value_patterns(sf_dir: str):
    """Value-shape discovery (schema.value_pattern_profile): top-20
    character-mask patterns (digits→9, lower→a, upper→A) of the same
    mixed VARCHAR column format_inference tests — shape DISCOVERY vs
    format TESTING.  Counts exact; share is the same division,
    unrounded."""
    import ray.data as rd

    from webval.schema import value_pattern_profile

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])

    def build(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        k = t.column("o_orderkey").combine_chunks()
        m = _pc_mod(k, 5)
        cust = pc.cast(t.column("o_custkey"), pa.string())
        # strftime on BOTH engines: o_orderdate is a timestamp and the
        # engines' default stringifications differ (.000000 suffix)
        date = pc.strftime(t.column("o_orderdate"), format="%Y-%m-%d")
        url = pc.binary_join_element_wise(
            pa.scalar("https://example.com/o/"),
            pc.cast(k, pa.string()), pa.scalar(""))
        email = pc.binary_join_element_wise(
            pa.scalar("user"), cust, pa.scalar("@example.com"),
            pa.scalar(""))
        v = pc.if_else(pc.equal(m, 0), cust,
                       pc.if_else(pc.equal(m, 1), date,
                                  pc.if_else(pc.equal(m, 2), url,
                                             pc.if_else(pc.equal(m, 3),
                                                        email,
                                                        pa.scalar("n/a")))))
        return pa.table({"v": v})

    out = value_pattern_profile(
        ds.map_batches(build, batch_format="pyarrow"), "v", top_k=20)
    t = ds_to_table(out)
    return t.set_column(t.column_names.index("pattern"), "pattern",
                        pc.cast(t.column("pattern"), pa.string()))


SQL_VALUE_PATTERNS = """
WITH v AS (SELECT CASE o_orderkey % 5
                  WHEN 0 THEN CAST(o_custkey AS VARCHAR)
                  WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                  WHEN 2 THEN 'https://example.com/o/'
                              || CAST(o_orderkey AS VARCHAR)
                  WHEN 3 THEN 'user' || CAST(o_custkey AS VARCHAR)
                              || '@example.com'
                  ELSE 'n/a' END AS s
           FROM orders
           WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
             AND o_orderdate IS NOT NULL),
m AS (SELECT regexp_replace(regexp_replace(regexp_replace(s,
                 '[0-9]', '9', 'g'), '[a-z]', 'a', 'g'),
                 '[A-Z]', 'A', 'g') AS pattern
      FROM v),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM m)
SELECT pattern, CAST(count(*) AS BIGINT) AS n,
       count(*) / tot.n AS share
FROM m, tot GROUP BY pattern, tot.n
ORDER BY count(*) DESC, pattern LIMIT 20
"""


def q_join_size(sf_dir: str):
    """Join-size probe (joins.join_size_estimate): exact
    orders⋈lineitem output cardinality from two key-count exchanges —
    the pre-join explosion check.  The asserted truth: inner_rows
    equals the real join's row count, computed by the twin both ways."""
    import ray.data as rd

    from webval.joins import join_size_estimate

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    m = join_size_estimate(orders, li, on=["o_orderkey"],
                           right_on=["l_orderkey"])
    return pa.table({k: pa.array([v], pa.int64())
                     for k, v in sorted(m.items())})


SQL_JOIN_SIZE = """
WITH lc AS (SELECT o_orderkey AS k, count(*) AS c FROM orders
            WHERE o_orderkey IS NOT NULL GROUP BY 1),
rc AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
       WHERE l_orderkey IS NOT NULL GROUP BY 1),
j AS (SELECT lc.c AS cl, rc.c AS cr FROM lc JOIN rc USING (k))
SELECT CAST(sum(cl * cr) AS BIGINT) AS inner_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM lc) AS left_keys,
       (SELECT CAST(sum(c) AS BIGINT) FROM lc) AS left_rows,
       CAST(count(*) AS BIGINT) AS matching_keys,
       CAST(max(cl * cr) AS BIGINT) AS max_key_multiplicity,
       (SELECT CAST(count(*) AS BIGINT) FROM rc) AS right_keys,
       (SELECT CAST(sum(c) AS BIGINT) FROM rc) AS right_rows
FROM j
"""


def q_fd_violations(sf_dir: str):
    """FD-violation extraction (relational.fd_violations): host→lang
    value pairs contradicting each host's majority language (ties to
    the smallest lang) — the row-level repair list fd_strength only
    scores.  Counts exact, tiebreaks deterministic."""
    import ray.data as rd

    from webval.relational import fd_violations

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "lang"])

    def add_host(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        return pa.table({"host": host, "lang": t.column("lang")}).filter(
            pc.is_valid(host))

    out = fd_violations(ds.map_batches(add_host, batch_format="pyarrow"),
                        "host", "lang")
    t = ds_to_table(out).sort_by([("host", "ascending"),
                                  ("lang", "ascending")])
    for c in ("host", "lang", "expected_rhs"):
        t = t.set_column(t.column_names.index(c), c,
                         pc.cast(t.column(c), pa.string()))
    return t


SQL_FD_VIOLATIONS = f"""
WITH p AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
                      AS host, lang
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE lang IS NOT NULL
             AND regexp_matches(url, '^https?://([a-z0-9-]+)\\.')),
c AS (SELECT host, lang, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2),
w AS (SELECT host, lang AS expected_rhs FROM
      (SELECT *, row_number() OVER (PARTITION BY host
                                    ORDER BY n DESC, lang) AS rn
       FROM c) WHERE rn = 1)
SELECT c.host, c.lang, c.n, w.expected_rhs
FROM c JOIN w USING (host) WHERE c.lang <> w.expected_rhs
ORDER BY c.host, c.lang
"""
SQL_FD_VIOLATIONS = SQL_FD_VIOLATIONS.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_sliced_drift(sf_dir: str):
    """Per-slice drift (drift.grouped_js_drift): JS divergence of the
    text-length histogram (8 bins of 50 chars) between the even- and
    odd-page_id crawl halves, PER LANGUAGE — which slice drifted, not
    just whether something did.  Counts exact; js rounds 6."""
    import ray.data as rd

    from webval.drift import grouped_js_drift

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "lang", "text"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.is_valid(t.column("text").combine_chunks())),
            pc.is_valid(t.column("page_id").combine_chunks()))
        t = t.filter(m)
        return pa.table({
            "lang": t.column("lang"),
            "side": _pc_mod(t.column("page_id").combine_chunks(), 2),
            "len": pc.cast(pc.utf8_length(
                t.column("text").combine_chunks()), pa.float64())})

    edges = [0, 50, 100, 150, 200, 250, 300, 350, 400]
    out = grouped_js_drift(ds.map_batches(prep, batch_format="pyarrow"),
                           "lang", "side", "len", edges)
    t = ds_to_table(out).sort_by([("lang", "ascending")])
    t = t.set_column(t.column_names.index("lang"), "lang",
                     pc.cast(t.column("lang"), pa.string()))
    return _round_cols(t, {"js": 6})


SQL_SLICED_DRIFT = f"""
WITH p AS (SELECT lang, page_id % 2 AS side,
                  least(length(text) // 50, 7) AS bin
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE lang IS NOT NULL AND text IS NOT NULL
             AND page_id IS NOT NULL),
c AS (SELECT lang, side, bin, CAST(count(*) AS DOUBLE) AS n
      FROM p GROUP BY 1, 2, 3),
tot AS (SELECT lang, CAST(sum(CASE WHEN side = 0 THEN n END) AS DOUBLE)
                   AS n0,
               CAST(sum(CASE WHEN side = 1 THEN n END) AS DOUBLE) AS n1
        FROM c GROUP BY 1),
pq AS (SELECT c.lang, c.bin,
              coalesce(sum(CASE WHEN side = 0 THEN n END), 0)
                  / tot.n0 AS pp,
              coalesce(sum(CASE WHEN side = 1 THEN n END), 0)
                  / tot.n1 AS qq
       FROM c JOIN tot USING (lang) GROUP BY c.lang, c.bin,
            tot.n0, tot.n1),
js AS (SELECT lang,
              (0.5 * sum(CASE WHEN pp > 0
                              THEN pp * ln(pp / ((pp + qq) / 2))
                              ELSE 0 END)
               + 0.5 * sum(CASE WHEN qq > 0
                                THEN qq * ln(qq / ((pp + qq) / 2))
                                ELSE 0 END)) / ln(2) AS js
       FROM pq GROUP BY 1)
SELECT tot.lang, CAST(tot.n0 AS BIGINT) AS n0,
       CAST(tot.n1 AS BIGINT) AS n1, round(js.js, 6) AS js
FROM tot JOIN js USING (lang) ORDER BY tot.lang
"""
SQL_SLICED_DRIFT = SQL_SLICED_DRIFT.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_order_reconciliation(sf_dir: str):
    """Ledger reconciliation (relational.sum_reconciliation): each
    order's recorded o_totalprice vs the sum of its line items'
    l_extendedprice, tolerance 0.5 — the header-equals-details
    integrity check.  diff rounds 6; the ok flag sits far from the
    tolerance boundary by construction (mismatches are dollars)."""
    import ray.data as rd

    from webval.relational import sum_reconciliation

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])
    out = sum_reconciliation(orders, li, key="o_orderkey",
                             child_key="l_orderkey",
                             parent_col="o_totalprice",
                             child_col="l_extendedprice",
                             tolerance=0.5)
    t = ds_to_table(out).sort_by([("o_orderkey", "ascending")])
    return _round_cols(t, {"parent_total": 6, "child_total": 6,
                           "diff": 6})


SQL_ORDER_RECONCILIATION = """
WITH s AS (SELECT l_orderkey AS o_orderkey,
                  sum(l_extendedprice) AS child_total,
                  CAST(count(*) AS BIGINT) AS n_children
           FROM lineitem
           WHERE l_orderkey IS NOT NULL
             AND l_extendedprice IS NOT NULL
           GROUP BY 1),
p AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS parent_total
      FROM orders
      WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL)
SELECT coalesce(p.o_orderkey, s.o_orderkey) AS o_orderkey,
       round(p.parent_total, 6) AS parent_total,
       round(coalesce(s.child_total, 0.0), 6) AS child_total,
       coalesce(s.n_children, 0) AS n_children,
       round(coalesce(p.parent_total, 0.0)
             - coalesce(s.child_total, 0.0), 6) AS diff,
       (p.parent_total IS NOT NULL
        AND abs(coalesce(p.parent_total, 0.0)
                - coalesce(s.child_total, 0.0)) <= 0.5) AS ok
FROM p FULL JOIN s USING (o_orderkey)
ORDER BY 1
"""


def q_revenue_by_segment(sf_dir: str):
    """TPC-H-Q3-style 3-table pipeline: customer ⋈ orders ⋈ lineitem
    through two co-bucketed equi-joins, revenue Σ price·(1−discount)
    rolled up per market segment — the canonical multi-join relational
    shape.  Revenue rounds 2 (sum order differs across engines)."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.joins import equi_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])
    co = equi_join(orders.map_batches(lambda t: t.drop_null(),
                                      batch_format="pyarrow"),
                   cust.map_batches(lambda t: t.drop_null(),
                                    batch_format="pyarrow"),
                   on=["o_custkey"], right_on=["c_custkey"])
    col = equi_join(li.map_batches(lambda t: t.drop_null(),
                                   batch_format="pyarrow"),
                    co.select_columns(["o_orderkey", "c_mktsegment"]),
                    on=["l_orderkey"], right_on=["o_orderkey"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    t.column("l_discount")))
        tab = pa.table({"c_mktsegment": t.column("c_mktsegment"),
                        "revenue": r,
                        "n_items": pa.nulls(t.num_rows,
                                            pa.int64()).fill_null(1)})
        agg = tab.group_by(["c_mktsegment"]).aggregate(
            [("revenue", "sum"), ("n_items", "sum")])
        return agg.rename_columns(["c_mktsegment", "revenue",
                                   "n_items"])

    out = grouped_agg(col.map_batches(rev, batch_format="pyarrow"),
                      ["c_mktsegment"],
                      [("revenue", "sum"), ("n_items", "sum")],
                      rename={"revenue_sum": "revenue",
                              "n_items_sum": "n_items"})
    t = ds_to_table(out).sort_by([("c_mktsegment", "ascending")])
    return _round_cols(t, {"revenue": 2})


SQL_REVENUE_BY_SEGMENT = """
SELECT c.c_mktsegment,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
           AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_orderkey IS NOT NULL AND l.l_extendedprice IS NOT NULL
  AND l.l_discount IS NOT NULL AND o.o_orderkey IS NOT NULL
  AND o.o_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
  AND c.c_mktsegment IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_id_continuity(sf_dir: str):
    """Id-continuity audit (relational.id_continuity_audit) of
    webpages.page_id: span vs exact distinct count gives missing ids
    and duplicate mass WITHOUT a global sort — the exporter-integrity
    check.  Integers, exact."""
    import ray.data as rd

    from webval.relational import id_continuity_audit

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id"])
    m = id_continuity_audit(ds, "page_id")
    return pa.table({k: pa.array([m[k]], pa.int64())
                     for k in sorted(m)})


SQL_ID_CONTINUITY = f"""
WITH p AS (SELECT page_id FROM
           read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet'))
SELECT CAST(max(page_id) AS BIGINT) AS max,
       CAST(min(page_id) AS BIGINT) AS min,
       CAST(count(DISTINCT page_id) AS BIGINT) AS n_distinct,
       CAST(count(page_id) - count(DISTINCT page_id) AS BIGINT)
           AS n_duplicate_rows,
       CAST(max(page_id) - min(page_id) + 1 - count(DISTINCT page_id)
            AS BIGINT) AS n_missing,
       (SELECT CAST(count(*) - count(page_id) AS BIGINT) FROM p)
           AS n_nulls,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_rows
FROM p
"""
SQL_ID_CONTINUITY = SQL_ID_CONTINUITY.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_truncation_audit(sf_dir: str):
    """VARCHAR-truncation smell test (schema.truncation_audit): the 5
    longest text lengths with counts and the at-max flag — a pileup at
    the max length means an upstream fixed-width cut.  Integers exact;
    share is the same division, unrounded."""
    import ray.data as rd

    from webval.schema import truncation_audit

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["text"])
    return ds_to_table(truncation_audit(ds, "text", top_k=5))


SQL_TRUNCATION_AUDIT = f"""
WITH c AS (SELECT length(text) AS length, CAST(count(*) AS BIGINT) AS n
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE text IS NOT NULL GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM c),
top AS (SELECT * FROM c ORDER BY length DESC LIMIT 5)
SELECT top.length, top.n, top.n / tot.t AS share,
       top.length = (SELECT max(length) FROM top) AS at_max
FROM top, tot ORDER BY top.length DESC
"""
SQL_TRUNCATION_AUDIT = SQL_TRUNCATION_AUDIT.replace("{SYNTH_ROOT}",
                                                    SYNTH_ROOT)


def q_null_blocks(sf_dir: str):
    """Null-burst localization (schema.null_block_scan, block=500,
    rate ≥ 0.5): a planted export outage (lang nulled for page_ids
    3000-3999, built identically on both engines) is pinpointed to its
    two id blocks, while the organic 1%-sprinkled null_text never
    flags.  Integers exact; null_rate is the same division,
    unrounded."""
    import ray.data as rd

    from webval.schema import null_block_scan

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["page_id", "lang"])

    def outage(t: pa.Table) -> pa.Table:
        pid = t.column("page_id").combine_chunks()
        hit = pc.and_(pc.greater_equal(pid, pa.scalar(3000, pa.int64())),
                      pc.less_equal(pid, pa.scalar(3999, pa.int64())))
        lang = pc.if_else(hit, pa.scalar(None, pa.string()),
                          pc.cast(t.column("lang"), pa.string()))
        return pa.table({"page_id": pid, "lang2": lang})

    out = null_block_scan(ds.map_batches(outage, batch_format="pyarrow"),
                          "page_id", "lang2", block=500, min_rate=0.5)
    return ds_to_table(out)


SQL_NULL_BLOCKS = f"""
WITH p AS (SELECT page_id,
                  CASE WHEN page_id BETWEEN 3000 AND 3999 THEN NULL
                       ELSE lang END AS lang2
           FROM read_parquet('{{SYNTH_ROOT}}/sf0.01/webpages.parquet')
           WHERE page_id IS NOT NULL),
b AS (SELECT (page_id // 500) * 500 AS block_start,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(lang2) AS BIGINT) AS n_nulls
      FROM p GROUP BY 1)
SELECT block_start, n_rows, n_nulls,
       CAST(n_nulls AS DOUBLE) / n_rows AS null_rate
FROM b WHERE n_rows >= 10 AND CAST(n_nulls AS DOUBLE) / n_rows >= 0.5
ORDER BY block_start
"""
SQL_NULL_BLOCKS = SQL_NULL_BLOCKS.replace("{SYNTH_ROOT}", SYNTH_ROOT)


def q_assortativity(sf_dir: str):
    """Out-in degree assortativity of the synthetic link graph
    (graph.degree_assortativity: distinct-edge exchange, degree count
    exchanges, two co-bucketed joins, co-moment corr partials — nothing
    edge-sized on the driver)."""
    import ray.data as rd

    from webval.graph import degree_assortativity

    _, links_p = ensure_synth(sf_dir)
    out = degree_assortativity(rd.read_parquet(links_p),
                               "src_url", "dst_url")
    return _round_cols(out, {"assortativity": 6})


SQL_ASSORTATIVITY = f"""
WITH e AS (SELECT DISTINCT src_url AS a, dst_url AS b
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
           WHERE src_url IS NOT NULL AND dst_url IS NOT NULL
             AND src_url <> dst_url),
od AS (SELECT a, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY 1),
ind AS (SELECT b, CAST(count(*) AS BIGINT) AS in_deg FROM e GROUP BY 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       round(corr(out_deg, in_deg), 6) AS assortativity
FROM e JOIN od USING (a) JOIN ind USING (b)
"""


def q_media_sniff(sf_dir: str):
    """Magic-byte media-type triage (multimodal.detect_media_type):
    plant PNG/GIF/JPEG/WAV/PDF/garbage payloads as a pure function of
    page_id (k = id % 6, null when id % 97 == 0), sniff them back off the
    binary column with the vectorized byte test, and count per type.
    The SQL twin recomputes the counts from the id formula — hashes match
    only if the sniffer classifies every planted payload correctly."""
    import struct

    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.multimodal import detect_media_type

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id"])

    def make_media(t: pa.Table) -> pa.Table:
        ids = t.column("page_id").to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            if i % 97 == 0:
                payloads.append(None)
                continue
            k = int(i % 6)
            if k == 0:
                payloads.append(b"\x89PNG\r\n\x1a\n" + b"\0" * 8)
            elif k == 1:
                payloads.append(b"GIF89a" + struct.pack("<HH", 3, 2))
            elif k == 2:
                payloads.append(b"\xff\xd8\xff\xe0" + b"\0" * 6)
            elif k == 3:
                payloads.append(b"RIFF" + struct.pack("<I", 36) + b"WAVE")
            elif k == 4:
                payloads.append(b"%PDF-1.4\n%%EOF")
            else:
                payloads.append(b"just some plain bytes")
        return t.append_column("media", pa.array(payloads, pa.binary()))

    sniffed = detect_media_type(
        ds.map_batches(make_media, batch_format="pyarrow"), "media")
    typed = sniffed.map_batches(
        lambda t: pa.table({"media_type": t.column("media_type")}).filter(
            pc.is_valid(t.column("media_type").combine_chunks())),
        batch_format="pyarrow")
    out = grouped_agg(typed, ["media_type"], [("media_type", "count")],
                      rename={"media_type_count": "n"})
    return ds_to_table(out).sort_by([("media_type", "ascending")])


SQL_MEDIA_SNIFF = f"""
SELECT CASE page_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
            WHEN 2 THEN 'jpeg' WHEN 3 THEN 'wav' WHEN 4 THEN 'pdf'
            ELSE 'unknown' END AS media_type,
       CAST(count(*) AS BIGINT) AS n
FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
WHERE page_id % 97 <> 0
GROUP BY 1 ORDER BY 1
"""


def q_score_lift(sf_dir: str):
    """Decile lift table of event value vs the purchase outcome
    (rank.quantile_bin: exact quantile_disc edges from the value-count
    exchange, broadcast; stateless searchsorted bin map; count exchange
    rollup).  rate and lift are exact int-derived double divisions in the
    same order on both engines — unrounded."""
    import ray.data as rd

    from webval.exchange import grouped_agg, sum_block_scalars
    from webval.rank import quantile_bin

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value", "event_type"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("value").combine_chunks())),
        batch_format="pyarrow")
    binned = quantile_bin(ds, "value", 10)

    def proj(t: pa.Table) -> pa.Table:
        pos = pc.fill_null(pc.equal(
            t.column("event_type").combine_chunks(), "purchase"), False)
        return pa.table({"bin": t.column("bin"),
                         "pos": pc.cast(pos, pa.int64())})

    counts = grouped_agg(binned.map_batches(proj, batch_format="pyarrow"),
                         ["bin"], [("pos", "count"), ("pos", "sum")],
                         rename={"pos_count": "n", "pos_sum": "n_pos"})
    t = ds_to_table(counts).sort_by([("bin", "ascending")])
    tot = t.column("n").to_numpy(zero_copy_only=False).sum()
    tot_pos = t.column("n_pos").to_numpy(zero_copy_only=False).sum()
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    n_pos = t.column("n_pos").to_numpy(zero_copy_only=False) \
             .astype(np.float64)
    rate = n_pos / n
    lift = rate / (float(tot_pos) / float(tot))
    return pa.table({"bin": t.column("bin"), "n": t.column("n"),
                     "n_pos": t.column("n_pos"),
                     "rate": pa.array(rate, pa.float64()),
                     "lift": pa.array(lift, pa.float64())})


SQL_SCORE_LIFT = """
WITH v AS (SELECT value, event_type = 'purchase' AS pos
           FROM events WHERE value IS NOT NULL),
e AS (SELECT unnest(quantile_disc(value, [x / 10.0 for x in range(1, 10)]))
        AS edge FROM v),
b AS (SELECT 1 + (SELECT count(*) FROM e WHERE e.edge <= v.value) AS bin,
             pos FROM v)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
       CAST(count(*) FILTER (WHERE pos) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS rate,
       (CAST(count(*) FILTER (WHERE pos) AS DOUBLE)
         / CAST(count(*) AS DOUBLE))
       / ((SELECT CAST(count(*) FILTER (WHERE pos) AS DOUBLE) FROM v)
          / (SELECT CAST(count(*) AS DOUBLE) FROM v)) AS lift
FROM b GROUP BY 1 ORDER BY 1
"""


def q_jw_part_names(sf_dir: str):
    """Blocked Jaro-Winkler similarity self-join (fuzzy.fuzzy_pairs with
    metric="jaro_winkler"): part-name pairs within the same
    (first word, p_size) block at similarity ≥ 0.94.  The pair-axis
    vectorized kernel is bit-exact vs DuckDB's jaro_winkler_similarity
    (fuzz-verified incl. the 0.7 boost threshold and empty-string zero),
    so values are emitted unrounded; byte-level == char-level asserted
    via the ASCII check like fuzzy_part_names."""
    import ray.data as rd

    from webval.fuzzy import fuzzy_pairs

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_size"])

    def add_block(b: pa.Table) -> pa.Table:
        col = b.column("p_name")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)), pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII part names: byte-level JW no longer "
                "matches the SQL twin's character jaro_winkler")
        return b.append_column(
            "w", pc.replace_substring_regex(col, pattern=" .*$",
                                            replacement=""))

    pairs = fuzzy_pairs(ds.map_batches(add_block, batch_format="pyarrow"),
                        "p_partkey", "p_name", ["w", "p_size"],
                        metric="jaro_winkler", min_sim=0.94)
    return ds_to_table(
        pairs, empty_schema=pa.schema([("id_a", pa.int64()),
                                       ("id_b", pa.int64()),
                                       ("similarity", pa.float64())]))


SQL_JW_PART_NAMES = """
WITH p AS (SELECT p_partkey, p_name, p_size,
                  split_part(p_name, ' ', 1) AS w
           FROM part)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       jaro_winkler_similarity(a.p_name, b.p_name) AS similarity
FROM p a JOIN p b
  ON a.w = b.w AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.94
ORDER BY 1, 2
"""


def q_budget_allocation(sf_dir: str):
    """Largest-remainder apportionment of a 1M-token budget across
    document sources (pipelines.allocate_budget: count exchange →
    key-sized driver table → vectorized Hamilton rounding; budgets sum
    to exactly the total, ties by key).  quota is the same
    total·w/W double expression on both engines — unrounded."""
    import ray.data as rd

    from webval.pipelines import allocate_budget

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source"])
    return allocate_budget(ds, "source", 1_000_000)


SQL_BUDGET_ALLOCATION = """
WITH w AS (SELECT source, CAST(count(*) AS BIGINT) AS weight
           FROM documents WHERE source IS NOT NULL GROUP BY 1),
q AS (SELECT source, weight,
             1000000 * CAST(weight AS DOUBLE)
               / (SELECT CAST(sum(weight) AS DOUBLE) FROM w) AS quota
      FROM w),
f AS (SELECT source, weight, quota, floor(quota) AS fl,
             quota - floor(quota) AS rem FROM q),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rn FROM f)
SELECT source, weight, quota,
       CAST(fl + CASE WHEN rn <= 1000000 - (SELECT CAST(sum(fl) AS BIGINT)
                                            FROM f)
                 THEN 1 ELSE 0 END AS BIGINT) AS budget
FROM r ORDER BY source
"""


def q_bigram_lm_quality(sf_dir: str):
    """Interpolated bigram-LM quality scoring (lm.fit_bigram_lm /
    score_bigram_lm — the conditional-model upgrade of lm_quality's
    CCNet shape; Jelinek-Mercer λ=0.5): term + bigram count exchanges,
    pair/context/vocab tables broadcast once, stateless vectorized
    scoring.  The SQL twin reproduces the exact add-one interpolation
    term-for-term on the same token stream; per-doc avg rounds to 4 like
    lm_quality (summation order differs across engines)."""
    import ray.data as rd

    from webval.lm import fit_bigram_lm, score_bigram_lm

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    blm = fit_bigram_lm(ds, "text", lam=0.5)
    out = score_bigram_lm(ds, blm, text_col="text")
    t = ds_to_table(out.map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "nll"]),
        batch_format="pyarrow"))
    return _round_cols(t.sort_by([("doc_id", "ascending")]), {"nll": 4})


SQL_BIGRAM_LM_QUALITY = """
WITH ws AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '') AS t
            FROM documents),
tok AS (SELECT doc_id, unnest(t) AS term FROM ws),
cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS v FROM cnt),
pr AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                  i -> struct_pack(p := t[i], w := t[i + 1]))) AS s
       FROM ws),
pairs AS (SELECT doc_id, s.p AS p, s.w AS w FROM pr),
bgc AS (SELECT p, w, count(*) AS c2 FROM pairs GROUP BY 1, 2),
ft AS (SELECT doc_id, t[1] AS term FROM ws WHERE len(t) >= 1),
s1 AS (SELECT ft.doc_id, ln((cnt.c + 1) / (tot.total + tot.v + 1)) AS s
       FROM ft JOIN cnt USING (term) CROSS JOIN tot),
s2 AS (SELECT pairs.doc_id,
              ln(0.5 * (bgc.c2 + 1) / (cp.c + tot.v + 1)
                 + 0.5 * (cw.c + 1) / (tot.total + tot.v + 1)) AS s
       FROM pairs JOIN bgc USING (p, w)
            JOIN cnt cp ON cp.term = pairs.p
            JOIN cnt cw ON cw.term = pairs.w
            CROSS JOIN tot),
sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, -avg(s) AS nll
       FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) GROUP BY 1)
SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens, round(sc.nll, 4) AS nll
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY doc_id
"""


def q_interpolate_gaps(sf_dir: str):
    """Per-user linear time interpolation of missing telemetry values
    (windows.interpolate_gaps): nulls planted deterministically at
    event_id % 7 == 0, filled between each user's nearest non-null
    neighbors; leading/trailing gaps stay null.  The multiply-then-divide
    order matches the SQL twin exactly → unrounded bit parity."""
    import ray.data as rd

    from webval.windows import interpolate_gaps

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def plant(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks()
        hole = pc.equal(
            pc.subtract(eid, pc.multiply(pc.divide(eid, 7), 7)), 0)
        v = pc.if_else(hole, pa.scalar(None, pa.float64()),
                       t.column("value").combine_chunks())
        return t.set_column(t.column_names.index("value"), "value", v)

    out = interpolate_gaps(ds.map_batches(plant, batch_format="pyarrow"),
                           "user_id", "ts", "value",
                           tie_cols=["event_id"])
    t = ds_to_table(out.map_batches(
        lambda t: t.select(["event_id", "filled"]), batch_format="pyarrow"))
    return t.sort_by([("event_id", "ascending")])


SQL_INTERPOLATE_GAPS = """
WITH v AS (SELECT user_id, ts, event_id,
                  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS val
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
w AS (SELECT event_id, val, epoch_us(ts) AS t,
             last_value(val IGNORE NULLS) OVER wd AS pv,
             last_value(CASE WHEN val IS NOT NULL THEN epoch_us(ts) END
                        IGNORE NULLS) OVER wd AS pt,
             first_value(val IGNORE NULLS) OVER wu AS nv,
             first_value(CASE WHEN val IS NOT NULL THEN epoch_us(ts) END
                         IGNORE NULLS) OVER wu AS nt
      FROM v
      WINDOW wd AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wu AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
SELECT event_id,
       CASE WHEN val IS NOT NULL THEN val
            WHEN pv IS NULL OR nv IS NULL THEN NULL
            ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END AS filled
FROM w ORDER BY event_id
"""


def q_overlap_dup_pairs(sf_dir: str):
    """Containment audit: all-pairs Szymkiewicz–Simpson overlap
    coefficient |∩|/min(|A|,|B|) over the same distinct 8-char shingle
    sets as ngram_dup_pairs (dedup.ngram_all_pairs metric="overlap") —
    catches a short doc fully embedded in a longer one, which Jaccard
    dilutes below any usable threshold.  Same ASCII precondition and
    DuckDB substr-shingle twin, denominator least()."""
    import ray.data as rd

    from webval.dedup import ngram_all_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def assert_ascii(b: pa.Table) -> pa.Table:
        col = b.column("text")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)), pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII docs: byte-window shingles no longer "
                "match the SQL twin's character windows")
        return b

    ds = ds.map_batches(assert_ascii, batch_format="pyarrow")
    t = ds_to_table(
        ngram_all_pairs(ds, "doc_id", "text", window=8, threshold=0.5,
                        metric="overlap", score_col="overlap"),
        empty_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                ("overlap", pa.float64())]))
    return _round_cols(t, {"overlap": 4})


SQL_OVERLAP_DUP_PAIRS = """
WITH pos AS (SELECT CAST(i AS INT) AS i FROM range(1, 8192) t(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 8) AS g
  FROM documents, pos
  WHERE text IS NOT NULL AND length(text) >= 8 AND i <= length(text) - 7
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(i * 1.0 / least(sa.n, sb.n), 4) AS overlap
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / least(sa.n, sb.n) >= 0.5
"""


def q_kappa_quality(sf_dir: str):
    """Cohen's kappa agreement between two binary document-quality
    heuristics — rater A: n_chars ≥ 300, rater B: whitespace-token count
    ≥ 55 (drift.cohens_kappa over the exact 2×2 contingency exchange).
    The inter-rater reliability audit raw accuracy overstates when one
    label dominates; rounding 6 because the SQL twin derives p_e from
    marginal averages instead of matrix sums."""
    import ray.data as rd

    from webval.drift import cohens_kappa
    from webval.exchange import grouped_agg
    from webval.textstats import add_token_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["n_chars", "text"])
    ds = add_token_counts(ds)

    def rate(t: pa.Table) -> pa.Table:
        a = pc.greater_equal(t.column("n_chars").combine_chunks(), 300)
        b = pc.greater_equal(t.column("ws_tokens").combine_chunks(), 55)
        out = pa.table({"a": a, "b": b})
        return out.filter(pc.and_(pc.is_valid(a), pc.is_valid(b)))

    counts = grouped_agg(ds.map_batches(rate, batch_format="pyarrow"),
                         ["a", "b"], [("a", "count")],
                         rename={"a_count": "cnt"})
    t = ds_to_table(counts)
    mat = np.zeros((2, 2), dtype=np.float64)
    av = t.column("a").to_numpy(zero_copy_only=False)
    bv = t.column("b").to_numpy(zero_copy_only=False)
    cv = t.column("cnt").to_numpy(zero_copy_only=False)
    mat[av.astype(np.int64), bv.astype(np.int64)] = cv
    kappa, po, pe, n = cohens_kappa(mat)
    return _round_cols(pa.table({
        "n": pa.array([n], pa.int64()),
        "p_observed": pa.array([po], pa.float64()),
        "p_expected": pa.array([pe], pa.float64()),
        "kappa": pa.array([kappa], pa.float64()),
    }), {"p_observed": 6, "p_expected": 6, "kappa": 6})


SQL_KAPPA_QUALITY = r"""
WITH r AS (SELECT (n_chars >= 300) AS a,
                  (len(regexp_extract_all(text, '\S+')) >= 55) AS b
           FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
m AS (SELECT count(*) AS n,
             avg(CASE WHEN a = b THEN 1.0 ELSE 0.0 END) AS po,
             avg(CASE WHEN a THEN 1.0 ELSE 0.0 END) AS pa,
             avg(CASE WHEN b THEN 1.0 ELSE 0.0 END) AS pb
      FROM r)
SELECT CAST(n AS BIGINT) AS n, round(po, 6) AS p_observed,
       round(pa * pb + (1 - pa) * (1 - pb), 6) AS p_expected,
       round((po - (pa * pb + (1 - pa) * (1 - pb)))
             / (1 - (pa * pb + (1 - pa) * (1 - pb))), 6) AS kappa
FROM m
"""


def q_null_cooccurrence(sf_dir: str):
    """Co-missingness audit (checks.null_cooccurrence): nulls planted
    deterministically on three event columns (event_type at id%3=0,
    props at id%5=0, value at id%7=0 — so pairs co-occur exactly at the
    lcm positions), then per unordered column pair the exact joint-null
    counts and null-set Jaccard.  Structural missingness (a failed stage
    nulls its outputs together) shows up as jaccard ≈ 1."""
    import ray.data as rd

    from webval.checks import null_cooccurrence

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "props",
                                  "value"])

    def plant(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").combine_chunks()

        def hole(k):
            return pc.equal(
                pc.subtract(eid, pc.multiply(pc.divide(eid, k), k)), 0)

        et = pc.if_else(hole(3), pa.scalar(None, pa.string()),
                        pc.cast(t.column("event_type").combine_chunks(),
                                pa.string()))
        pr = pc.if_else(hole(5), pa.scalar(None, pa.string()),
                        pc.cast(t.column("props").combine_chunks(),
                                pa.string()))
        vl = pc.if_else(hole(7), pa.scalar(None, pa.float64()),
                        pc.cast(t.column("value").combine_chunks(),
                                pa.float64()))
        return pa.table({"event_type": et, "props": pr, "value": vl})

    t = null_cooccurrence(ds.map_batches(plant, batch_format="pyarrow"),
                          ["event_type", "props", "value"])
    return _round_cols(t, {"null_jaccard": 6})


SQL_NULL_COOCCURRENCE = """
WITH p AS (SELECT CASE WHEN event_id % 3 = 0 THEN NULL
                       ELSE event_type END AS event_type,
                  CASE WHEN event_id % 5 = 0 THEN NULL ELSE props END
                      AS props,
                  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                      AS value
           FROM events),
pairs AS (
  SELECT 'event_type' AS col_a, 'props' AS col_b, count(*) AS n_rows,
         count(*) FILTER (WHERE event_type IS NULL) AS null_a,
         count(*) FILTER (WHERE props IS NULL) AS null_b,
         count(*) FILTER (WHERE event_type IS NULL AND props IS NULL)
             AS null_both
  FROM p
  UNION ALL
  SELECT 'event_type', 'value', count(*),
         count(*) FILTER (WHERE event_type IS NULL),
         count(*) FILTER (WHERE value IS NULL),
         count(*) FILTER (WHERE event_type IS NULL AND value IS NULL)
  FROM p
  UNION ALL
  SELECT 'props', 'value', count(*),
         count(*) FILTER (WHERE props IS NULL),
         count(*) FILTER (WHERE value IS NULL),
         count(*) FILTER (WHERE props IS NULL AND value IS NULL)
  FROM p)
SELECT col_a, col_b, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(null_a AS BIGINT) AS null_a, CAST(null_b AS BIGINT) AS null_b,
       CAST(null_both AS BIGINT) AS null_both,
       round(null_both * 1.0 / nullif(null_a + null_b - null_both, 0), 6)
           AS null_jaccard
FROM pairs ORDER BY col_a, col_b
"""


def q_event_paths(sf_dir: str):
    """Top-20 three-step user journeys (windows.path_counts n=3): runs of
    consecutive event types along each user's time-ordered sequence,
    counted corpus-wide; ties broken by path ascending.  The SQL twin is
    two chained lag() windows.  At scale the top-k would run through
    rank.top_k_per_group — the fixture's distinct-path table is tiny, so
    the driver sort IS the assertion, not the compute path."""
    import ray.data as rd

    from webval.windows import path_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    out = path_counts(ds, "user_id", "ts", "event_type", n=3,
                      tie_cols=["event_id"])
    t = ds_to_table(out)
    return t.sort_by([("cnt", "descending"),
                      ("path", "ascending")]).slice(0, 20)


SQL_EVENT_PATHS = """
WITH v AS (SELECT user_id, ts, event_id, event_type FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IS NOT NULL),
w AS (SELECT event_type AS t0,
             lag(event_type, 1) OVER win AS t1,
             lag(event_type, 2) OVER win AS t2
      FROM v
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t2 || '>' || t1 || '>' || t0 AS path,
       CAST(count(*) AS BIGINT) AS cnt
FROM w WHERE t2 IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20
"""


def q_calibration_bins(sf_dir: str):
    """Reliability diagram of l_quantity/50 as a pseudo-probability of a
    lineitem being returned (rank.calibration_bins: ≤10-row sum-combiner
    exchange): per equal-width bin the count, mean confidence and
    observed positive rate.  Rounding 6 — the per-bin means divide sums
    accumulated in different orders across engines."""
    import ray.data as rd

    from webval.rank import calibration_bins

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "pred": pc.divide(pc.cast(t.column("l_quantity")
                                      .combine_chunks(), pa.float64()),
                              50.0),
            "label": pc.cast(pc.equal(t.column("l_returnflag")
                                      .combine_chunks(), "R"),
                             pa.float64())})

    bt = calibration_bins(ds.map_batches(prep, batch_format="pyarrow"),
                          "pred", "label", bins=10)
    n = bt.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    conf = bt.column("sum_score").to_numpy(zero_copy_only=False) / n
    acc = bt.column("sum_label").to_numpy(zero_copy_only=False) / n
    return _round_cols(pa.table({
        "bin": bt.column("bin"),
        "n": bt.column("n"),
        "avg_conf": pa.array(conf, pa.float64()),
        "pos_rate": pa.array(acc, pa.float64()),
    }), {"avg_conf": 6, "pos_rate": 6})


SQL_CALIBRATION_BINS = """
WITH s AS (SELECT l_quantity / 50.0 AS pred,
                  CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL)
SELECT CAST(least(floor(pred * 10), 9) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(pred), 6) AS avg_conf,
       round(avg(y), 6) AS pos_rate
FROM s GROUP BY 1 ORDER BY 1
"""


def q_brier_ece(sf_dir: str):
    """Brier score and 10-bin expected calibration error of the same
    pseudo-probability (one calibration_bins exchange: Brier from the
    squared-error sums, ECE = Σ nᵢ/N·|pos_rateᵢ − confᵢ|)."""
    import ray.data as rd

    from webval.rank import calibration_bins

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "pred": pc.divide(pc.cast(t.column("l_quantity")
                                      .combine_chunks(), pa.float64()),
                              50.0),
            "label": pc.cast(pc.equal(t.column("l_returnflag")
                                      .combine_chunks(), "R"),
                             pa.float64())})

    bt = calibration_bins(ds.map_batches(prep, batch_format="pyarrow"),
                          "pred", "label", bins=10)
    n = bt.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    total = n.sum()
    conf = bt.column("sum_score").to_numpy(zero_copy_only=False) / n
    acc = bt.column("sum_label").to_numpy(zero_copy_only=False) / n
    brier = bt.column("sum_sqerr").to_numpy(zero_copy_only=False).sum() \
        / total
    ece = float((n / total * np.abs(acc - conf)).sum())
    return _round_cols(pa.table({
        "n": pa.array([int(total)], pa.int64()),
        "brier": pa.array([brier], pa.float64()),
        "ece": pa.array([ece], pa.float64()),
    }), {"brier": 6, "ece": 6})


SQL_BRIER_ECE = """
WITH s AS (SELECT l_quantity / 50.0 AS pred,
                  CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
b AS (SELECT least(floor(pred * 10), 9) AS bin, count(*) AS n,
             avg(pred) AS conf, avg(y) AS acc
      FROM s GROUP BY 1)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n,
       round((SELECT avg((pred - y) * (pred - y)) FROM s), 6) AS brier,
       round(sum(n * abs(acc - conf)) / (SELECT count(*) FROM s), 6) AS ece
FROM b
"""


def q_survival_curve(sf_dir: str):
    """Kaplan-Meier user-retention curve (windows.kaplan_meier): per-user
    lifetime in days from first to last event, a death observed when the
    last activity precedes the corpus max timestamp by > 1 day (else
    right-censored); survival = Π(1 − dᵢ/nᵢ) over death times.  Rounding
    6 — the SQL twin computes the running product as exp(Σ ln(·))."""
    import ray.data as rd

    from webval.windows import kaplan_meier

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    t = kaplan_meier(ds, "user_id", "ts", censor_gap_us=86_400_000_000)
    return _round_cols(t, {"survival": 6})


SQL_SURVIVAL_CURVE = """
WITH s AS (SELECT user_id, epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1),
mx AS (SELECT max(l) AS m FROM s),
d AS (SELECT (l - f) // 86400000000 AS t,
             (l < m - 86400000000) AS obs
      FROM s, mx),
c AS (SELECT t, count(*) FILTER (WHERE obs) AS dd, count(*) AS at_t
      FROM d GROUP BY t),
w AS (SELECT t, dd,
             (SELECT count(*) FROM d)
             - coalesce(sum(at_t) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                        PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM c),
k AS (SELECT * FROM w WHERE dd > 0)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(dd AS BIGINT) AS n_events,
       round(exp(sum(ln(1 - dd * 1.0 / n_risk)) OVER (ORDER BY t)), 6)
           AS survival
FROM k ORDER BY t
"""


def q_embedding_quantization(sf_dir: str):
    """Per-dimension int8 quantization audit of the embedding corpus
    (similarity.quantization_error): exact range, worst-case affine
    reconstruction error and the half-step bound it must respect —
    unrounded, because Ray and the SQL twin evaluate the IDENTICAL
    float64 quantize/reconstruct expression term-for-term (the
    within_bound flag uses the same ulp-tolerance literal on both
    sides)."""
    import ray.data as rd

    from webval.similarity import quantization_error

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    return quantization_error(ds, "embedding", levels=255)


SQL_EMBEDDING_QUANTIZATION = """
WITH e AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                  CAST(unnest(range(1, len(embedding) + 1)) AS BIGINT)
                      AS dim
           FROM embeddings),
r AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM e GROUP BY dim),
q AS (SELECT e.dim,
             abs(x - (mn + floor((x - mn) * 255.0 / (mx - mn) + 0.5)
                      * (mx - mn) / 255.0)) AS err
      FROM e JOIN r USING (dim) WHERE mx > mn),
m AS (SELECT dim, max(err) AS max_err FROM q GROUP BY dim)
SELECT r.dim, r.mn, r.mx, coalesce(m.max_err, 0.0) AS max_err,
       (r.mx - r.mn) / 510.0 AS bound,
       coalesce(m.max_err, 0.0)
           <= (r.mx - r.mn) / 510.0 * (1.0 + 1e-12) + 1e-15
           AS within_bound
FROM r LEFT JOIN m USING (dim) ORDER BY r.dim
"""


def q_ttr_by_lang(sf_dir: str):
    """Per-language vocabulary richness (textstats.type_token_stats):
    token/type/hapax counts, type-token ratio and hapax share — template
    spam collapses TTR, OCR noise explodes the hapax share.  Two bounded
    exchanges: (lang, term) counts, then the per-lang rollup off final
    counts (hapax needs exact counts, so the rollup runs strictly after
    the first exchange)."""
    import ray.data as rd

    from webval.textstats import type_token_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    t = ds_to_table(type_token_stats(ds, "lang", "text"))
    return _round_cols(t.sort_by([("lang", "ascending")]),
                       {"ttr": 6, "hapax_share": 6})


SQL_TTR_BY_LANG = """
WITH tok AS (SELECT lang,
                    unnest(list_filter(regexp_split_to_array(lower(text),
                                                             '[^a-z0-9]+'),
                                       x -> x <> '')) AS term
             FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
tc AS (SELECT lang, term, count(*) AS c FROM tok GROUP BY 1, 2)
SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
       round(count(*) * 1.0 / sum(c), 6) AS ttr,
       round(count(*) FILTER (WHERE c = 1) * 1.0 / count(*), 6)
           AS hapax_share
FROM tc GROUP BY lang ORDER BY lang
"""


def q_burstiness_by_user(sf_dir: str):
    """Per-user inter-arrival burstiness (windows.interarrival_stats):
    gap moments and the Goh-Barabási coefficient (σ−μ)/(σ+μ) — the
    bot-vs-human timing signal.  mean_gap_us is UNROUNDED: integer-µs
    gap sums are exact in float64 on both engines, so sum/count is
    bit-identical and rounding could only ADD half-boundary mismatches
    (6 such users at sf0.1).  σ is rounded in seconds instead —
    two-pass vs Welford differ in final ulps, and at µs magnitudes
    (~1e10) round(6) cannot absorb that; in seconds it comfortably
    does."""
    import ray.data as rd

    from webval.windows import interarrival_stats

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    t = ds_to_table(interarrival_stats(ds, "user_id", "ts",
                                       tie_cols=["event_id"]))
    t = pa.table({
        "user_id": t.column("user_id"),
        "n_gaps": t.column("n_gaps"),
        "mean_gap_us": t.column("mean_gap"),
        "std_gap_s": pc.divide(t.column("std_gap"), 1_000_000.0),
        "burstiness": t.column("burstiness")})
    return _round_cols(t.sort_by([("user_id", "ascending")]),
                       {"std_gap_s": 6, "burstiness": 6})


SQL_BURSTINESS_BY_USER = """
WITH v AS (SELECT user_id, ts, event_id FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM v),
a AS (SELECT user_id, count(gap) AS n_gaps, avg(gap) AS mu,
             stddev_pop(gap) AS sd
      FROM g WHERE gap IS NOT NULL GROUP BY 1)
SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
       mu AS mean_gap_us,
       round(sd / 1000000.0, 6) AS std_gap_s,
       round((sd - mu) / nullif(sd + mu, 0), 6) AS burstiness
FROM a ORDER BY user_id
"""


def q_markov_anomaly(sf_dir: str):
    """Behavioral anomaly scoring (windows.sequence_nll): fit the
    corpus-wide first-order Markov model over event types
    (transition_counts), broadcast the add-one-smoothed log-prob tables
    once, score every user's sequence, report the 10 most anomalous
    (highest mean NLL, ties by user id).  Rounding 6 — the engines
    average the per-transition log-probs in different orders."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.windows import sequence_nll, transition_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    trans = ds_to_table(transition_counts(ds, "user_id", "ts",
                                          "event_type",
                                          tie_cols=["event_id"]))

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["user_id", "ts", "event_type"])
        m = pc.and_(pc.and_(
            pc.is_valid(t.column("user_id").combine_chunks()),
            pc.is_valid(t.column("ts").combine_chunks())),
            pc.is_valid(t.column("event_type").combine_chunks()))
        return pa.table({"event_type": t.column("event_type")}).filter(m)

    states = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["event_type"], [("event_type", "count")],
                         rename={"event_type_count": "c"})
    n_states = ds_to_table(states).num_rows
    scored = sequence_nll(ds, "user_id", "ts", "event_type", trans,
                          n_states=n_states, tie_cols=["event_id"])
    t = ds_to_table(scored)
    t = _round_cols(t, {"nll": 6})
    return t.sort_by([("nll", "descending"),
                      ("user_id", "ascending")]).slice(0, 10)


SQL_MARKOV_ANOMALY = """
WITH v AS (SELECT user_id, ts, event_id, event_type FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_type IS NOT NULL),
w AS (SELECT user_id, event_type AS s,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS p
      FROM v),
pr AS (SELECT user_id, p, s FROM w WHERE p IS NOT NULL),
tc AS (SELECT p, s, count(*) AS c FROM pr GROUP BY 1, 2),
cc AS (SELECT p, sum(c) AS cp FROM tc GROUP BY 1),
st AS (SELECT count(DISTINCT event_type) AS ns FROM v),
sc AS (SELECT pr.user_id,
              ln((tc.c + 1.0) / (cc.cp + st.ns + 1.0)) AS lp
       FROM pr JOIN tc USING (p, s) JOIN cc USING (p) CROSS JOIN st)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_trans,
       round(-avg(lp), 6) AS nll
FROM sc GROUP BY 1 ORDER BY nll DESC, user_id LIMIT 10
"""


def q_pareto_customers(sf_dir: str):
    """Pareto frontier of customers maximizing (largest single order,
    order count) — rank.pareto_frontier's skyline with a true local
    combiner (each block collapses to its own frontier before anything
    moves).  The x coordinate is a MAX (bit-exact across engines, no
    summation-order hazard in the dominance tests); the SQL twin is the
    textbook NOT EXISTS dominance predicate."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.rank import pareto_frontier

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"o_custkey": t.column("o_custkey"),
                       "max_price": t.column("o_totalprice"),
                       "n_orders": pa.array(
                           np.ones(t.num_rows, np.int64))})
        agg = t2.group_by("o_custkey").aggregate(
            [("max_price", "max"), ("n_orders", "sum")])
        return agg.rename_columns(["o_custkey", "max_price", "n_orders"])

    per_cust = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                           ["o_custkey"],
                           [("max_price", "max"), ("n_orders", "sum")],
                           rename={"max_price_max": "max_price",
                                   "n_orders_sum": "n_orders"})
    t = pareto_frontier(per_cust, "max_price", "n_orders")
    return t.sort_by([("max_price", "descending"),
                      ("o_custkey", "ascending")])


SQL_PARETO_CUSTOMERS = """
WITH c AS (SELECT o_custkey, max(o_totalprice) AS max_price,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1)
SELECT o_custkey, max_price, n_orders
FROM c a
WHERE NOT EXISTS (
  SELECT 1 FROM c b
  WHERE b.max_price >= a.max_price AND b.n_orders >= a.n_orders
    AND (b.max_price > a.max_price OR b.n_orders > a.n_orders))
ORDER BY max_price DESC, o_custkey
"""


def q_bh_drift(sf_dir: str):
    """Benjamini-Hochberg FDR selection over per-event-type mean-shift
    tests (drift.bh_select): shifts planted deterministically (+8 on
    purchase, +4 on view — both engines plant identically), per-type
    z = (mean_t − mean)/(s/√n_t) against the planted corpus, surrogate
    p = exp(−z²/2), BH at q = 0.05 over the m = 5 tests.  The planted
    types are selected; the untouched ones survive — the corrected
    drift sweep a per-partition monitor needs.  One 5-key power-sum
    exchange; z/p round 6 for display, selection uses unrounded values
    on both sides (planted effects sit far from the thresholds)."""
    import ray.data as rd

    from webval.drift import bh_select
    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks()
        v = pc.cast(t.column("value").combine_chunks(), pa.float64())
        m = pc.and_(pc.is_valid(et), pc.is_valid(v))
        et, v = et.filter(m), v.filter(m)
        shift = pc.case_when(
            pc.make_struct(pc.equal(et, "purchase"), pc.equal(et, "view")),
            8.0, 4.0, 0.0)
        v = pc.add(v, shift)
        t2 = pa.table({"event_type": et, "n": pa.array(
            np.ones(len(v), np.int64)), "s1": v,
            "s2": pc.multiply(v, v)})
        agg = t2.group_by("event_type").aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
        return agg.rename_columns(["event_type", "n", "s1", "s2"])

    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["event_type"],
                      [("n", "sum"), ("s1", "sum"), ("s2", "sum")],
                      rename={"n_sum": "n", "s1_sum": "s1",
                              "s2_sum": "s2"})
    t = ds_to_table(agg).sort_by([("event_type", "ascending")])
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    s1 = t.column("s1").to_numpy(zero_copy_only=False)
    s2 = t.column("s2").to_numpy(zero_copy_only=False)
    big_n, big_s1, big_s2 = n.sum(), s1.sum(), s2.sum()
    gm = big_s1 / big_n
    gs = np.sqrt(big_s2 / big_n - gm * gm)
    z = (s1 / n - gm) / (gs / np.sqrt(n))
    p = np.exp(-z * z / 2.0)
    mask, k, thresh = bh_select(p, q=0.05)
    return _round_cols(pa.table({
        "event_type": t.column("event_type"),
        "n": t.column("n"),
        "z": pa.array(z, pa.float64()),
        "p_surrogate": pa.array(p, pa.float64()),
        "selected": pa.array(mask),
    }), {"z": 6, "p_surrogate": 6})


SQL_BH_DRIFT = """
WITH v AS (SELECT event_type,
                  value + CASE WHEN event_type = 'purchase' THEN 8.0
                               WHEN event_type = 'view' THEN 4.0
                               ELSE 0.0 END AS val
           FROM events
           WHERE event_type IS NOT NULL AND value IS NOT NULL),
a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(val) AS s1,
             sum(val * val) AS s2
      FROM v GROUP BY 1),
g AS (SELECT sum(n) AS nn, sum(s1) AS t1, sum(s2) AS t2 FROM a),
z AS (SELECT event_type, n,
             (s1 / n - t1 / nn) / (sqrt(t2 / nn - (t1 / nn) * (t1 / nn))
                                   / sqrt(n)) AS z
      FROM a CROSS JOIN g),
p AS (SELECT event_type, n, z, exp(-z * z / 2.0) AS ps FROM z),
r AS (SELECT *, row_number() OVER (ORDER BY ps, event_type) AS rk,
             count(*) OVER () AS m
      FROM p),
k AS (SELECT coalesce(max(rk), 0) AS kk FROM r
      WHERE ps <= rk * 0.05 / m)
SELECT event_type, n, round(z, 6) AS z, round(ps, 6) AS p_surrogate,
       (rk <= (SELECT kk FROM k)) AS selected
FROM r ORDER BY event_type
"""


def q_entity_clusters(sf_dir: str):
    """Entity resolution on part names: the blocked Jaro-Winkler
    similarity join (≥ 0.94, same first-word + size block — the
    jw_part_names pair semantics) feeds min-label connected components
    (graph.connected_components), yielding one cluster id per matched
    part with its cluster size — dedupe-by-fuzzy-identity as one
    composed pipeline.  The SQL twin chains DuckDB's native
    jaro_winkler_similarity into the recursive reachability CTE."""
    import ray.data as rd

    from webval.fuzzy import fuzzy_pairs
    from webval.graph import connected_components

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_size"])

    def add_block(b: pa.Table) -> pa.Table:
        col = b.column("p_name")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)), pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII part names: byte-level JW no longer "
                "matches the SQL twin's character jaro_winkler")
        return b.append_column(
            "w", pc.replace_substring_regex(col, pattern=" .*$",
                                            replacement=""))

    pairs = fuzzy_pairs(ds.map_batches(add_block, batch_format="pyarrow"),
                        "p_partkey", "p_name", ["w", "p_size"],
                        metric="jaro_winkler", min_sim=0.94)
    comp = connected_components(pairs, "id_a", "id_b")
    t = ds_to_table(comp, empty_schema=pa.schema(
        [("id", pa.int64()), ("component", pa.int64())]))
    sizes = t.group_by("component").aggregate([("id", "count")])
    sz = dict(zip(sizes.column("component").to_pylist(),
                  sizes.column("id_count").to_pylist()))
    out = pa.table({
        "p_partkey": t.column("id"),
        "cluster": t.column("component"),
        "cluster_size": pa.array(
            [sz[c] for c in t.column("component").to_pylist()],
            pa.int64())})
    return out.sort_by([("cluster", "ascending"),
                        ("p_partkey", "ascending")])


SQL_ENTITY_CLUSTERS = """
WITH RECURSIVE
p AS (SELECT p_partkey, p_name, p_size, split_part(p_name, ' ', 1) AS w
      FROM part),
e0 AS (SELECT a.p_partkey AS a, b.p_partkey AS b
       FROM p a JOIN p b
         ON a.w = b.w AND a.p_size = b.p_size
        AND a.p_partkey < b.p_partkey
       WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.94),
e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
n AS (SELECT DISTINCT a AS node FROM e),
reach AS (SELECT node AS id, node AS r FROM n
          UNION
          SELECT e.b AS id, reach.r FROM reach JOIN e ON reach.id = e.a),
lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz FROM lab
       GROUP BY cluster)
SELECT lab.id AS p_partkey, lab.cluster, cs.sz AS cluster_size
FROM lab JOIN cs USING (cluster)
ORDER BY cluster, p_partkey
"""


def q_rank_corr(sf_dir: str):
    """Spearman ρ and Kendall τ-b between l_quantity and l_linenumber
    (drift.rank_correlations): the tie-aware monotone-dependence pair,
    exact from ONE contingency-count exchange (the mutual_info/cramers_v
    substrate — 50×7 cells, never rows).  The SQL twin computes Spearman
    as corr() over midranks and τ-b by the concordant/discordant
    contingency self-join with Kendall's tie corrections."""
    import ray.data as rd

    from webval.drift import rank_correlations
    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_linenumber"])

    def proj(t: pa.Table) -> pa.Table:
        x = t.column("l_quantity").combine_chunks()
        y = pc.cast(t.column("l_linenumber").combine_chunks(),
                    pa.float64())
        m = pc.and_(pc.is_valid(x), pc.is_valid(y))
        return pa.table({"x": x.filter(m), "y": y.filter(m)})

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["x", "y"], [("x", "count")],
                         rename={"x_count": "cnt"})
    t = ds_to_table(counts)
    xs = t.column("x").to_numpy(zero_copy_only=False)
    ys = t.column("y").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    ux, uy = np.unique(xs), np.unique(ys)
    mat = np.zeros((len(ux), len(uy)), dtype=np.float64)
    mat[np.searchsorted(ux, xs), np.searchsorted(uy, ys)] = cnt
    rho, tau, n = rank_correlations(mat)
    return _round_cols(pa.table({
        "n": pa.array([n], pa.int64()),
        "spearman": pa.array([rho], pa.float64()),
        "kendall_tau_b": pa.array([tau], pa.float64()),
    }), {"spearman": 6, "kendall_tau_b": 6})


SQL_RANK_CORR = """
WITH v AS (SELECT l_quantity AS x, CAST(l_linenumber AS DOUBLE) AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL),
r AS (SELECT x, y,
        rank() OVER (ORDER BY x)
          + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
        rank() OVER (ORDER BY y)
          + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
      FROM v),
c AS (SELECT x, y, CAST(count(*) AS DOUBLE) AS o FROM v GROUP BY 1, 2),
conc AS (SELECT coalesce(sum(c1.o * c2.o), 0) AS s FROM c c1 JOIN c c2
         ON c2.x > c1.x AND c2.y > c1.y),
disc AS (SELECT coalesce(sum(c1.o * c2.o), 0) AS s FROM c c1 JOIN c c2
         ON c2.x > c1.x AND c2.y < c1.y),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
tx AS (SELECT sum(o * (o - 1)) / 2.0 AS t
       FROM (SELECT sum(o) AS o FROM c GROUP BY x)),
ty AS (SELECT sum(o * (o - 1)) / 2.0 AS t
       FROM (SELECT sum(o) AS o FROM c GROUP BY y))
SELECT CAST(nn.n AS BIGINT) AS n,
       round(corr(r.rx, r.ry), 6) AS spearman,
       round((conc.s - disc.s)
             / sqrt((nn.n * (nn.n - 1) / 2.0 - tx.t)
                    * (nn.n * (nn.n - 1) / 2.0 - ty.t)), 6)
           AS kendall_tau_b
FROM r CROSS JOIN conc CROSS JOIN disc CROSS JOIN nn
       CROSS JOIN tx CROSS JOIN ty
GROUP BY nn.n, conc.s, disc.s, tx.t, ty.t
"""


def q_theils_u(sf_dir: str):
    """Theil's uncertainty coefficient U(source | lang) on documents
    (drift.uncertainty_coefficient): the ASYMMETRIC dependence audit —
    how much knowing the language reduces uncertainty about the source —
    from the same exact contingency exchange as mutual_info; U = 1 iff
    lang functionally determines source (the probabilistic FD check)."""
    import ray.data as rd

    from webval.drift import uncertainty_coefficient
    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["lang", "source"])
        return t.filter(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.is_valid(t.column("source").combine_chunks())))

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["lang", "source"], [("lang", "count")],
                         rename={"lang_count": "cnt"})
    t = ds_to_table(counts)
    langs = t.column("lang").to_numpy(zero_copy_only=False)
    srcs = t.column("source").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    ul, us = np.unique(langs), np.unique(srcs)
    mat = np.zeros((len(ul), len(us)), dtype=np.float64)
    mat[np.searchsorted(ul, langs), np.searchsorted(us, srcs)] = cnt
    u, hy, hyx, n = uncertainty_coefficient(mat)
    return _round_cols(pa.table({
        "n": pa.array([n], pa.int64()),
        "h_y": pa.array([hy], pa.float64()),
        "h_y_given_x": pa.array([hyx], pa.float64()),
        "theils_u": pa.array([u], pa.float64()),
    }), {"h_y": 6, "h_y_given_x": 6, "theils_u": 6})


SQL_THEILS_U = """
WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
           FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL
           GROUP BY 1, 2),
n AS (SELECT sum(o) AS n FROM c),
rt AS (SELECT lang, sum(o) AS r FROM c GROUP BY 1),
ct AS (SELECT source, sum(o) AS cl FROM c GROUP BY 1),
hy AS (SELECT -sum((cl / n.n) * ln(cl / n.n)) AS h FROM ct CROSS JOIN n),
hyx AS (SELECT -sum((c.o / n.n) * ln(c.o / rt.r)) AS h
        FROM c JOIN rt USING (lang) CROSS JOIN n)
SELECT CAST(n.n AS BIGINT) AS n, round(hy.h, 6) AS h_y,
       round(hyx.h, 6) AS h_y_given_x,
       round((hy.h - hyx.h) / hy.h, 6) AS theils_u
FROM n CROSS JOIN hy CROSS JOIN hyx
"""


def q_weighted_median(sf_dir: str):
    """Per-returnflag REVENUE-weighted median quantity
    (rank.grouped_weighted_median): the smallest quantity at which half
    the flag's extended-price mass sits — the size-weighted robust
    center a plain median misses.  One (flag, quantity) sum exchange
    (150 keys), key-sized finalize.  total_weight rounds at 2 decimals:
    a ~1e9 sum's last-ulp spread (engine-order summation) sits ~1e-7,
    comfortably inside."""
    import ray.data as rd

    from webval.rank import grouped_weighted_median

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    t = grouped_weighted_median(ds, "l_returnflag", "l_quantity",
                                "l_extendedprice")
    return _round_cols(t.sort_by([("l_returnflag", "ascending")]),
                       {"total_weight": 2})


SQL_WEIGHTED_MEDIAN = """
WITH vw AS (SELECT l_returnflag AS f, l_quantity AS v,
                   sum(l_extendedprice) AS w
            FROM lineitem
            WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL
            GROUP BY 1, 2),
t AS (SELECT f, v, sum(w) OVER (PARTITION BY f) AS tw,
             sum(w) OVER (PARTITION BY f ORDER BY v) AS cw
      FROM vw)
SELECT f AS l_returnflag,
       min(v) FILTER (WHERE cw >= 0.5 * tw) AS weighted_median,
       round(any_value(tw), 2) AS total_weight
FROM t GROUP BY f ORDER BY f
"""


def q_kcore(sf_dir: str):
    """28-core of the supplier–part sourcing graph (graph.kcore): nodes
    keeping ≥ 28 distinct neighbors after iterative peeling — the
    dense-subgraph audit degree alone misses.  Part nodes are offset by
    1,000,000 into the shared id space (same arithmetic in the twin).
    The Ray peel early-exits at the fixpoint and RAISES if still
    shrinking after 8 rounds; the SQL twin unrolls exactly 8 rounds, so
    the two can only agree on a true fixpoint (measured: ≤ 3 sweeps at
    sf0.001/0.01/0.1, empty core at sf0.001 — the zero-row path)."""
    import ray.data as rd

    from webval.graph import kcore

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("l_suppkey"),
            "dst": pc.add(t.column("l_partkey").combine_chunks(),
                          pa.scalar(1_000_000, pa.int64()))})

    out = kcore(ds.map_batches(proj, batch_format="pyarrow"),
                "src", "dst", k=28, max_iter=8)
    t = ds_to_table(out, empty_schema=pa.schema(
        [("node", pa.int64()), ("core_degree", pa.int64())]))
    return t.sort_by([("node", "ascending")])


def _kcore_sql(k: int, iters: int) -> str:
    # every e_i is referenced three times downstream (its degree CTE and
    # both sides of the next semi-filter) — WITHOUT "AS MATERIALIZED",
    # DuckDB inlines CTEs per reference and the unroll re-expands e0
    # 3^iters times (measured: the plain form never finished; the
    # materialized form runs in 0.3 s at sf0.01)
    steps = []
    for i in range(iters):
        steps.append(
            f"d{i} AS MATERIALIZED (SELECT node, count(*) AS deg "
            f"FROM e{i} GROUP BY node),\n"
            f"n{i} AS MATERIALIZED (SELECT node FROM d{i} "
            f"WHERE deg >= {k}),\n"
            f"e{i + 1} AS MATERIALIZED (SELECT e{i}.node, e{i}.nbr "
            f"FROM e{i}\n"
            f"  JOIN n{i} USING (node)\n"
            f"  JOIN n{i} m ON e{i}.nbr = m.node)")
    return (
        "WITH bp AS MATERIALIZED (SELECT DISTINCT l_suppkey AS s,\n"
        "                   l_partkey + 1000000 AS p FROM lineitem\n"
        "            WHERE l_suppkey IS NOT NULL "
        "AND l_partkey IS NOT NULL),\n"
        "e0 AS MATERIALIZED (SELECT s AS node, p AS nbr FROM bp\n"
        "       UNION ALL SELECT p, s FROM bp),\n"
        + ",\n".join(steps)
        + f"\nSELECT node, CAST(count(*) AS BIGINT) AS core_degree\n"
        f"FROM e{iters} GROUP BY node ORDER BY node")


SQL_KCORE = _kcore_sql(28, 8)


def q_jl_projection(sf_dir: str):
    """Johnson-Lindenstrauss sign projection of the embedding corpus to
    16 dims (similarity.jl_project): the index-shrinking scale path that
    approximately preserves geometry.  Output per vector: the first four
    projected coordinates plus input/output norms (rounded 6 — both
    engines sum the same products in different orders).  The SQL twin
    rebuilds the SAME ±1/√16 matrix cell-by-cell from the xorshift hash
    and projects via unnest + join."""
    import ray.data as rd

    from webval.similarity import jl_project

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = jl_project(ds, "embedding", dim_out=16, id_col="vec_id")

    def finish(t: pa.Table) -> pa.Table:
        y = t.column("y").combine_chunks()
        flat = y.flatten().to_numpy(zero_copy_only=False)             .reshape(len(y), -1)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "y0": pa.array(flat[:, 0], pa.float64()),
            "y1": pa.array(flat[:, 1], pa.float64()),
            "y2": pa.array(flat[:, 2], pa.float64()),
            "y3": pa.array(flat[:, 3], pa.float64()),
            "norm_in": t.column("norm_in"),
            "norm_out": t.column("norm_out")})

    t = ds_to_table(out.map_batches(finish, batch_format="pyarrow"))
    return _round_cols(t.sort_by([("vec_id", "ascending")]),
                       {"y0": 6, "y1": 6, "y2": 6, "y3": 6,
                        "norm_in": 6, "norm_out": 6})


SQL_JL_PROJECTION = """
WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                  unnest(range(len(embedding))) AS j
           FROM embeddings),
m AS (SELECT j.j, k.k,
             CASE WHEN xor((xor((j.j * 16 + k.k) * 2654435761 % 4294967296,
                                ((j.j * 16 + k.k) * 2654435761
                                 % 4294967296) >> 16) * 40503)
                           % 4294967296,
                           ((xor((j.j * 16 + k.k) * 2654435761
                                 % 4294967296,
                                 ((j.j * 16 + k.k) * 2654435761
                                  % 4294967296) >> 16) * 40503)
                            % 4294967296) >> 13) % 2 = 0
                  THEN 1.0 ELSE -1.0 END / 4.0 AS s
      FROM (SELECT DISTINCT j FROM x) j
           CROSS JOIN (SELECT unnest(range(16)) AS k) k),
p AS (SELECT x.vec_id, m.k, sum(x.v * m.s) AS y
      FROM x JOIN m ON x.j = m.j GROUP BY 1, 2),
ni AS (SELECT vec_id, sqrt(sum(v * v)) AS norm_in FROM x GROUP BY 1),
no AS (SELECT vec_id, sqrt(sum(y * y)) AS norm_out FROM p GROUP BY 1)
SELECT p.vec_id,
       round(max(CASE WHEN k = 0 THEN y END), 6) AS y0,
       round(max(CASE WHEN k = 1 THEN y END), 6) AS y1,
       round(max(CASE WHEN k = 2 THEN y END), 6) AS y2,
       round(max(CASE WHEN k = 3 THEN y END), 6) AS y3,
       round(any_value(ni.norm_in), 6) AS norm_in,
       round(any_value(no.norm_out), 6) AS norm_out
FROM p JOIN ni USING (vec_id) JOIN no USING (vec_id)
GROUP BY p.vec_id ORDER BY p.vec_id
"""


def q_theilsen_slope(sf_dir: str):
    """Theil-Sen robust slope of mean extended price vs quantity: the
    median of all pairwise slopes over the 50 per-quantity mean points —
    outlier-resistant where OLS (grouped_regression) is not.  The point
    set comes from ONE count/sum exchange bounded by distinct
    quantities; the O(points²) slope sweep runs on that key-sized table
    (1225 pairs), never on rows.  Slopes round 6: both engines build
    them from ulp-identical formulas over engine-order mean sums."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").combine_chunks()
        p = t.column("l_extendedprice").combine_chunks()
        m = pc.and_(pc.is_valid(q), pc.is_valid(p))
        t2 = pa.table({"q": q.filter(m), "s": p.filter(m),
                       "n": pa.array(np.ones(
                           int(pc.sum(pc.cast(m, pa.int64())).as_py()
                               or 0), np.int64))})
        agg = t2.group_by("q").aggregate([("s", "sum"), ("n", "sum")])
        return agg.rename_columns(["q", "s", "n"])

    pts = grouped_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["q"], [("s", "sum"), ("n", "sum")],
                      rename={"s_sum": "s", "n_sum": "n"})
    t = ds_to_table(pts).sort_by([("q", "ascending")])
    q = t.column("q").to_numpy(zero_copy_only=False)
    y = (t.column("s").to_numpy(zero_copy_only=False)
         / t.column("n").to_numpy(zero_copy_only=False))
    iu, ju = np.triu_indices(len(q), k=1)
    slopes = (y[ju] - y[iu]) / (q[ju] - q[iu])
    med = float(np.median(slopes)) if len(slopes) else None
    return _round_cols(pa.table({
        "n_points": pa.array([len(q)], pa.int64()),
        "n_pairs": pa.array([len(slopes)], pa.int64()),
        "theil_sen_slope": pa.array([med], pa.float64()),
    }), {"theil_sen_slope": 6})


def q_activity_streaks(sf_dir: str):
    """Per-user longest consecutive-day activity run
    (windows.longest_streak): the gaps-and-islands engagement signal —
    distinct active days ride the exchange, never events.  Integer
    output, no rounding."""
    import ray.data as rd

    from webval.windows import longest_streak

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    t = ds_to_table(longest_streak(ds, "user_id", "ts"))
    return t.sort_by([("user_id", "ascending")])


SQL_ACTIVITY_STREAKS = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
r AS (SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
i AS (SELECT user_id, day - CAST(rn AS INTEGER) AS grp, count(*) AS len
      FROM r GROUP BY 1, 2)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM i GROUP BY 1 ORDER BY 1
"""


def q_daily_hindex(sf_dir: str):
    """Per-user h-index of daily event counts (rank.grouped_hindex over
    a (user, day) count exchange): h days with >= h events — the
    sustained-volume signal one burst day cannot inflate.  Integer
    output, no rounding."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.rank import grouped_hindex

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def daily(t: pa.Table) -> pa.Table:
        k = t.column("user_id").combine_chunks()
        ts = t.column("ts").combine_chunks()
        m = pc.and_(pc.is_valid(k), pc.is_valid(ts))
        day = pc.cast(pc.cast(ts.filter(m), pa.date32()), pa.int32())
        tt = pa.table({"user_id": k.filter(m), "day": day,
                       "n": pa.array(np.ones(len(day), np.int64))})
        return tt.group_by(["user_id", "day"]) \
                 .aggregate([("n", "sum")]) \
                 .rename_columns(["user_id", "day", "n"])

    dc = grouped_agg(ds.map_batches(daily, batch_format="pyarrow"),
                     ["user_id", "day"], [("n", "sum")],
                     rename={"n_sum": "n"})
    t = ds_to_table(grouped_hindex(dc, "user_id", "n"))
    return t.sort_by([("user_id", "ascending")])


SQL_DAILY_HINDEX = """
WITH dc AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY 1, 2),
r AS (SELECT user_id, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC) AS rn
      FROM dc)
SELECT user_id,
       CAST(coalesce(max(CASE WHEN n >= rn THEN rn END), 0) AS BIGINT)
           AS hindex
FROM r GROUP BY 1 ORDER BY 1
"""


def q_period_movers(sf_dir: str):
    """Top-20 period-over-period movers (windows.period_movers): users
    whose event volume changed most between the first and second half
    of the month — the post-drift-alarm "who did it" query.  Integer
    output; the |delta| tie at the cut breaks on ascending user_id on
    both engines."""
    import ray.data as rd

    from webval.windows import period_movers

    import datetime

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    split = pa.scalar(datetime.datetime(2024, 1, 16),
                      pa.timestamp("us"))
    t = ds_to_table(period_movers(ds, "user_id", "ts", split, k=20))
    return t


SQL_PERIOD_MOVERS = """
WITH c AS (SELECT user_id,
                  count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-16')
                      AS before_n,
                  count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16')
                      AS after_n
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1)
SELECT user_id, CAST(before_n AS BIGINT) AS before_n,
       CAST(after_n AS BIGINT) AS after_n,
       CAST(after_n - before_n AS BIGINT) AS delta
FROM c ORDER BY abs(after_n - before_n) DESC, user_id LIMIT 20
"""


def q_bigram_entropy(sf_dir: str):
    """Per-source byte-bigram entropy (textstats.char_bigram_entropy):
    encoding-damage radar — mojibake / base64 / binary spills shift
    byte-pair statistics harder than any word-level signal.  Entropy
    rounds 6 (both engines compute log2(N) − Σ c·log2 c / N but sum in
    different orders)."""
    import ray.data as rd

    from webval.textstats import char_bigram_entropy

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    t = ds_to_table(char_bigram_entropy(ds, "source", "text"))
    return _round_cols(t.sort_by([("source", "ascending")]),
                       {"entropy": 6})


SQL_BIGRAM_ENTROPY = """
WITH bg AS (SELECT source,
                   unnest([substr(text, i, 2)
                           for i in range(1, length(text))]) AS b
            FROM documents
            WHERE source IS NOT NULL AND text IS NOT NULL
              AND length(text) >= 2),
c AS (SELECT source, b, count(*) AS c FROM bg GROUP BY 1, 2),
tot AS (SELECT source, sum(c) AS n, sum(c * log2(c)) AS clog,
               count(*) AS nd
        FROM c GROUP BY 1)
SELECT source, CAST(n AS BIGINT) AS n_bigrams,
       CAST(nd AS BIGINT) AS n_distinct,
       round(log2(n) - clog / n, 6) AS entropy
FROM tot ORDER BY source
"""


def q_mw_drift(sf_dir: str):
    """Tie-corrected Mann-Whitney rank-sum drift test
    (drift.mann_whitney_u) of l_quantity between even and odd orderkeys
    — the nonparametric sibling of ks_drift/psi_drift that sees
    median/shape shifts.  l_quantity is integer-valued (1..50), so the
    per-value (side, bin) count exchange is exact, the rank sum is
    integer arithmetic, and U1 is bit-identical to SQL's windowed
    midrank computation (emitted unrounded); only z gets round(6)."""
    from webval.drift import mann_whitney_u

    ub, e, a = _two_side_counts(sf_dir, "lineitem", "l_orderkey",
                                "l_quantity", cast_bin=pa.int64())
    n1, n2, u1, z = mann_whitney_u(e, a)
    return _round_cols(pa.table({
        "n1": pa.array([n1], pa.int64()),
        "n2": pa.array([n2], pa.int64()),
        "u1": pa.array([u1], pa.float64()),
        "z": pa.array([z], pa.float64()),
    }), {"z": 6})


SQL_MW_DRIFT = """
WITH f AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                  CAST(l_orderkey % 2 AS INT) AS side
           FROM lineitem WHERE l_quantity IS NOT NULL),
c AS (SELECT v, count(*) FILTER (side = 0) AS c1,
             count(*) FILTER (side = 1) AS c2
      FROM f GROUP BY 1),
r AS (SELECT c1, c2, c1 + c2 AS cnt,
             sum(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS cum FROM c),
s AS (SELECT sum(c1) AS n1, sum(c2) AS n2,
             sum(c1 * (2 * cum + cnt + 1)) AS r1x2,
             sum(cnt * cnt * cnt - cnt) AS tie FROM r)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       r1x2 / 2.0 - n1 * (n1 + 1) / 2.0 AS u1,
       round((r1x2 / 2.0 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / sqrt(n1 * n2 / 12.0
                    * ((n1 + n2 + 1)
                       - tie / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z
FROM s
"""


def q_anova_f(sf_dir: str):
    """One-way ANOVA F of l_discount across returnflag groups
    (drift.anova_f): does the column differ across partitions beyond
    noise — computed from the SAME per-group (count, sum, sumsq)
    mergeable moments the schema profile collects, one combiner
    exchange, no second data pass.  SQL twin recomputes SSB/SSW from
    per-group avg/moments."""
    import ray.data as rd

    from webval.drift import anova_f
    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_discount"])

    def proj(t: pa.Table) -> pa.Table:
        v = t.column("l_discount").combine_chunks()
        m = pc.and_(pc.is_valid(t.column("l_returnflag").combine_chunks()),
                    pc.is_valid(v))
        t = t.filter(m)
        v = t.column("l_discount")
        return pa.table({"g": t.column("l_returnflag"), "v": v,
                         "v2": pc.multiply(v, v),
                         "one": pa.array(np.ones(len(t), np.int64))})

    mom = ds_to_table(grouped_agg(
        ds.map_batches(proj, batch_format="pyarrow"), ["g"],
        [("one", "sum"), ("v", "sum"), ("v2", "sum")],
        rename={"one_sum": "n", "v_sum": "s", "v2_sum": "ss"}))
    k, nt, f, eta = anova_f(mom.column("n").to_numpy(),
                            mom.column("s").to_numpy(),
                            mom.column("ss").to_numpy())
    return _round_cols(pa.table({
        "k": pa.array([k], pa.int64()),
        "n": pa.array([nt], pa.int64()),
        "f_stat": pa.array([f], pa.float64()),
        "eta_sq": pa.array([eta], pa.float64()),
    }), {"f_stat": 6, "eta_sq": 6})


SQL_ANOVA_F = """
WITH g AS (SELECT l_returnflag, count(*) AS n, sum(l_discount) AS s,
                  sum(l_discount * l_discount) AS ss
           FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1),
tot AS (SELECT sum(s) / sum(n) AS grand FROM g),
t AS (SELECT count(*) AS k, sum(n) AS nt,
             sum(n * (s / n - grand) * (s / n - grand)) AS ssb,
             sum(ss - s * s / n) AS ssw
      FROM g, tot)
SELECT CAST(k AS BIGINT) AS k, CAST(nt AS BIGINT) AS n,
       round((ssb / (k - 1)) / (ssw / (nt - k)), 6) AS f_stat,
       round(ssb / (ssb + ssw), 6) AS eta_sq
FROM t
"""


def q_hill_tail(sf_dir: str):
    """Hill tail-index of the per-user event-count distribution
    (rank.hill_tail_index, k = min(10, n-1)): the "how heavy is the
    head" skew audit that predicts hash-partition hot-spotting.
    Counts are exact ints on both engines; alpha rounds 6 (10-term ln
    sum)."""
    import ray.data as rd

    from webval.rank import hill_tail_index

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    k_eff, xk1, alpha = hill_tail_index(ds, "user_id", k=10)
    return _round_cols(pa.table({
        "k": pa.array([k_eff], pa.int64()),
        "x_k1": pa.array([xk1], pa.int64()),
        "alpha": pa.array([alpha], pa.float64()),
    }), {"alpha": 6})


SQL_HILL_TAIL = """
WITH c AS (SELECT user_id, count(*) AS cnt FROM events
           WHERE user_id IS NOT NULL GROUP BY 1),
kk AS (SELECT least(10, count(*) - 1) AS ke FROM c),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC) AS rn FROM c),
xk AS (SELECT cnt AS xkv FROM r, kk WHERE rn = ke + 1)
SELECT (SELECT ke FROM kk) AS k, CAST((SELECT xkv FROM xk) AS BIGINT) AS x_k1,
       round((SELECT ke FROM kk)
             / sum(ln(cnt / CAST((SELECT xkv FROM xk) AS DOUBLE))), 6)
           AS alpha
FROM r, kk WHERE rn <= ke
"""


def q_log_odds_terms(sf_dir: str):
    """Monroe "Fightin' Words" weighted log-odds term movers
    (textstats.weighted_log_odds): top-20 terms most enriched on
    either side of the doc_id-parity corpus split, Dirichlet-prior
    shrunk so rare terms don't dominate — the direction-aware "what
    vocabulary changed" audit.  Rank key is round(|z|, 6) with
    term-ascending ties so the cut is deterministic on both engines."""
    import ray.data as rd

    from webval.textstats import weighted_log_odds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_side(t: pa.Table) -> pa.Table:
        return t.append_column(
            "side", pc.cast(pc.bit_wise_and(
                t.column("doc_id").combine_chunks(),
                pa.scalar(1, pa.int64())), pa.int64()))

    t = ds_to_table(weighted_log_odds(
        ds.map_batches(add_side, batch_format="pyarrow"), "side", "text",
        prior_strength=100.0, min_count=10, top_k=20))
    t = t.set_column(t.column_names.index("term"), "term",
                     pc.cast(t.column("term"), pa.string()))
    return _round_cols(t, {"delta": 6, "z": 6})


SQL_LOG_ODDS_TERMS = """
WITH tok AS (SELECT CAST(doc_id % 2 AS INT) AS side,
                    unnest(list_filter(regexp_split_to_array(lower(text),
                                                             '[^a-z0-9]+'),
                                       x -> x <> '')) AS term
             FROM documents
             WHERE text IS NOT NULL AND doc_id IS NOT NULL),
c AS (SELECT term, count(*) FILTER (side = 0) AS y0,
             count(*) FILTER (side = 1) AS y1
      FROM tok GROUP BY 1),
tot AS (SELECT sum(y0) AS n0, sum(y1) AS n1,
               CAST(sum(y0 + y1) AS DOUBLE) AS nn FROM c),
sc AS (SELECT term, y0, y1,
              ln((y1 + 100.0 * (y0 + y1) / nn)
                 / (n1 + 100.0 - y1 - 100.0 * (y0 + y1) / nn))
            - ln((y0 + 100.0 * (y0 + y1) / nn)
                 / (n0 + 100.0 - y0 - 100.0 * (y0 + y1) / nn)) AS delta,
              1.0 / (y1 + 100.0 * (y0 + y1) / nn)
            + 1.0 / (y0 + 100.0 * (y0 + y1) / nn) AS var
      FROM c, tot WHERE y0 + y1 >= 10)
SELECT term, CAST(y0 AS BIGINT) AS c0, CAST(y1 AS BIGINT) AS c1,
       round(delta, 6) AS delta, round(delta / sqrt(var), 6) AS z
FROM sc ORDER BY round(abs(delta / sqrt(var)), 6) DESC, term LIMIT 20
"""


def q_welch_drift(sf_dir: str):
    """Welch unequal-variance t-test (drift.welch_t) of l_extendedprice
    between even and odd orderkeys — the parametric mean-shift drift
    test that, unlike anova_f's pooled SSW, stays honest when the two
    slices have different spreads.  Built from the same one-exchange
    (count, sum, sumsq) moments as anova_f; t and the Satterthwaite dof
    round 6."""
    import ray.data as rd

    from webval.drift import welch_t
    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])

    def proj(t: pa.Table) -> pa.Table:
        v = t.column("l_extendedprice").combine_chunks()
        m = pc.and_(pc.is_valid(t.column("l_orderkey").combine_chunks()),
                    pc.is_valid(v))
        t = t.filter(m)
        v = t.column("l_extendedprice")
        side = pc.cast(pc.bit_wise_and(
            t.column("l_orderkey").combine_chunks(),
            pa.scalar(1, pa.int64())), pa.int64())
        return pa.table({"side": side, "v": v,
                         "v2": pc.multiply(v, v),
                         "one": pa.array(np.ones(len(t), np.int64))})

    mom = ds_to_table(grouped_agg(
        ds.map_batches(proj, batch_format="pyarrow"), ["side"],
        [("one", "sum"), ("v", "sum"), ("v2", "sum")],
        rename={"one_sum": "n", "v_sum": "s", "v2_sum": "ss"}))
    mom = mom.sort_by("side")
    n0, n1, t_stat, dof = welch_t(mom.column("n").to_numpy(),
                                  mom.column("s").to_numpy(),
                                  mom.column("ss").to_numpy())
    return _round_cols(pa.table({
        "n0": pa.array([n0], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "t_stat": pa.array([t_stat], pa.float64()),
        "dof": pa.array([dof], pa.float64()),
    }), {"t_stat": 6, "dof": 6})


SQL_WELCH_DRIFT = """
WITH g AS (SELECT CAST(l_orderkey % 2 AS INT) AS side, count(*) AS n,
                  sum(l_extendedprice) AS s,
                  sum(l_extendedprice * l_extendedprice) AS ss
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_orderkey IS NOT NULL
           GROUP BY 1),
m AS (SELECT side, n, s / n AS mean,
             (ss - s * s / n) / (n - 1.0) / n AS se
      FROM g),
t AS (SELECT max(n) FILTER (side = 0) AS n0, max(n) FILTER (side = 1) AS n1,
             max(mean) FILTER (side = 1) - max(mean) FILTER (side = 0)
                 AS dm,
             max(se) FILTER (side = 0) AS se0,
             max(se) FILTER (side = 1) AS se1
      FROM m)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(dm / sqrt(se0 + se1), 6) AS t_stat,
       round((se0 + se1) * (se0 + se1)
             / (se0 * se0 / (n0 - 1.0) + se1 * se1 / (n1 - 1.0)), 6)
           AS dof
FROM t
"""


def q_fd_strength(sf_dir: str):
    """Approximate functional-dependency strength mining
    (relational.fd_strength, g3 measure): score candidate FDs over the
    part table — p_partkey→p_brand holds exactly (key lhs, strength
    1.0; also exercises the high-cardinality-lhs exchange path), while
    p_brand→p_type and p_type→p_brand are dirty — the "which columns
    are derivable/normalizable" profiling audit.  Counts exact on both
    engines; strength rounds 6."""
    import ray.data as rd

    from webval.relational import fd_strength

    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type"])
    out = fd_strength(ds, [("p_partkey", "p_brand"),
                           ("p_brand", "p_type"), ("p_type", "p_brand")])
    return _round_cols(out, {"strength": 6})


SQL_FD_STRENGTH = """
WITH s AS (
  SELECT 'p_partkey' AS lhs, 'p_brand' AS rhs,
         CAST(p_partkey AS VARCHAR) AS l, CAST(p_brand AS VARCHAR) AS r
  FROM part WHERE p_partkey IS NOT NULL AND p_brand IS NOT NULL
  UNION ALL
  SELECT 'p_brand', 'p_type', CAST(p_brand AS VARCHAR),
         CAST(p_type AS VARCHAR)
  FROM part WHERE p_brand IS NOT NULL AND p_type IS NOT NULL
  UNION ALL
  SELECT 'p_type', 'p_brand', CAST(p_type AS VARCHAR),
         CAST(p_brand AS VARCHAR)
  FROM part WHERE p_type IS NOT NULL AND p_brand IS NOT NULL),
c AS (SELECT lhs, rhs, l, r, count(*) AS cnt FROM s GROUP BY 1, 2, 3, 4),
m AS (SELECT lhs, rhs, l, max(cnt) AS mx, sum(cnt) AS tot
      FROM c GROUP BY 1, 2, 3)
SELECT lhs, rhs, CAST(sum(tot) AS BIGINT) AS n,
       CAST(sum(mx) AS BIGINT) AS keep,
       round(sum(mx) / CAST(sum(tot) AS DOUBLE), 6) AS strength
FROM m GROUP BY 1, 2
"""


def q_novelty_hosts(sf_dir: str):
    """Crawl discovery curve (windows.first_seen_counts): per UTC day,
    how many hosts are fetched for the first time — a stalling frontier
    shows a decaying curve, a new sitemap a spike.  Exact int counts on
    both engines (min is mergeable, so the exchange pre-combines)."""
    import ray.data as rd

    from webval.windows import first_seen_counts

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "warc_ts"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        st = pc.extract_regex(u, _HOST_RE)
        host = pc.struct_field(st, "host")
        keep = pc.is_valid(host)
        return pa.table({"host": host.filter(keep),
                         "warc_ts": t.column("warc_ts").filter(keep)})

    out = ds_to_table(first_seen_counts(
        ds.map_batches(proj, batch_format="pyarrow"), "host", "warc_ts"))
    return pa.table({
        "day": out.column("bucket_us").cast(pa.timestamp("us")),
        "new_hosts": out.column("new_keys")}).sort_by("day")


SQL_NOVELTY_HOSTS = f"""
WITH f AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1)
               AS host,
           min(date_trunc('day', warc_ts)) AS day
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
             AND warc_ts IS NOT NULL
           GROUP BY 1)
SELECT day, CAST(count(*) AS BIGINT) AS new_hosts
FROM f GROUP BY 1 ORDER BY 1
"""


def q_hits_links(sf_dir: str):
    """Kleinberg HITS over the synthetic link graph (graph.hits, 4
    iterations, L1-normalized): hubs point at good authorities,
    authorities are pointed at by good hubs — the link-farm lens
    PageRank's single score misses.  Twice-checked like pagerank: the
    distributed scores must match the exact in-memory power method
    (graph.hits_reference) to 1e-10 AND the driver hashes the top-10
    authorities against a DuckDB twin that unrolls the 4 iterations as
    chained CTEs."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webval.graph import hits, hits_reference

    _pages, links_p = ensure_synth(sf_dir)
    edges = rd.read_parquet(links_p)
    scores = ds_to_table(hits(edges, "src_url", "dst_url", n_iter=4))

    full = pq.read_table(links_p)
    nodes, want_a, want_h = hits_reference(
        full.column("src_url").to_numpy(zero_copy_only=False),
        full.column("dst_url").to_numpy(zero_copy_only=False), n_iter=4)
    got = scores.sort_by([("node", "ascending")])
    if not np.array_equal(
            got.column("node").to_numpy(zero_copy_only=False), nodes):
        raise AssertionError("hits node set != reference")
    da = np.abs(got.column("auth").to_numpy() - want_a).max()
    dh = np.abs(got.column("hub").to_numpy() - want_h).max()
    if max(da, dh) > 1e-10:
        raise AssertionError(f"hits diverged from reference by "
                             f"{max(da, dh)}")
    top = scores.sort_by([("auth", "descending"),
                          ("node", "ascending")]).slice(0, 10)
    return _round_cols(pa.table({
        "node": top.column("node"),
        "auth_e6": pc.multiply(top.column("auth"), 1e6),
        "hub_e6": pc.multiply(top.column("hub"), 1e6),
    }), {"auth_e6": 3, "hub_e6": 3})


def _sql_hits(n_iter: int = 4) -> str:
    """HITS unrolled as chained CTEs — per iteration one gather+L1
    normalize for authorities, one for hubs, reproducing graph.hits."""
    links = f"read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')"
    layers = [f"""
nodes AS (SELECT DISTINCT node FROM (
  SELECT src_url AS node FROM {links}
  UNION ALL SELECT dst_url FROM {links})),
h0 AS (SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS hub
       FROM nodes)"""]
    for k in range(1, n_iter + 1):
        p = k - 1
        layers.append(f"""
a{k} AS (SELECT n.node,
                coalesce(s.w, 0) / sum(coalesce(s.w, 0)) OVER () AS auth
         FROM nodes n
         LEFT JOIN (SELECT l.dst_url AS node, sum(h.hub) AS w
                    FROM {links} l JOIN h{p} h ON l.src_url = h.node
                    GROUP BY 1) s ON n.node = s.node),
h{k} AS (SELECT n.node,
                coalesce(s.w, 0) / sum(coalesce(s.w, 0)) OVER () AS hub
         FROM nodes n
         LEFT JOIN (SELECT l.src_url AS node, sum(a.auth) AS w
                    FROM {links} l JOIN a{k} a ON l.dst_url = a.node
                    GROUP BY 1) s ON n.node = s.node)""")
    return ("WITH " + ",".join(layers) + f"""
SELECT a{n_iter}.node, round(auth * 1e6, 3) AS auth_e6,
       round(hub * 1e6, 3) AS hub_e6
FROM a{n_iter} JOIN h{n_iter} USING (node)
ORDER BY auth DESC, a{n_iter}.node LIMIT 10
""")


SQL_HITS_LINKS = _sql_hits()


def q_embedding_clusters(sf_dir: str):
    """Embedding near-dup CLUSTER extraction: the LSH cosine pair
    pipeline (dedup.embedding_dup_pairs, threshold 0.4 — 59 true pairs
    on the fixture, n_planes=2 × n_tables=24 sized so per-pair miss
    probability ≈ 5e-6) feeds min-label connected components
    (graph.connected_components) — semantic dedup's "keep one per
    cluster" unit, the embedding sibling of entity_clusters.  The SQL
    twin chains the exact all-pairs cosine join into the recursive
    reachability CTE, so a recall miss breaks row count, not just
    values."""
    import ray.data as rd

    from webval.dedup import embedding_dup_pairs
    from webval.graph import connected_components

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_dup_pairs(ds, "vec_id", cosine_threshold=0.4,
                                n_planes=2, n_tables=24)
    comp = connected_components(pairs, "id_a", "id_b")
    t = ds_to_table(comp, empty_schema=pa.schema(
        [("id", pa.int64()), ("component", pa.int64())]))
    sizes = t.group_by("component").aggregate([("id", "count")])
    sz = dict(zip(sizes.column("component").to_pylist(),
                  sizes.column("id_count").to_pylist()))
    return pa.table({
        "vec_id": t.column("id"),
        "cluster": t.column("component"),
        "cluster_size": pa.array(
            [sz[c] for c in t.column("component").to_pylist()],
            pa.int64())}).sort_by([("cluster", "ascending"),
                                   ("vec_id", "ascending")])


SQL_EMBEDDING_CLUSTERS = """
WITH RECURSIVE
e0 AS (SELECT a.vec_id AS a, b.vec_id AS b
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
n AS (SELECT DISTINCT a AS node FROM e),
reach AS (SELECT node AS id, node AS r FROM n
          UNION
          SELECT e.b AS id, reach.r FROM reach JOIN e ON reach.id = e.a),
lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz FROM lab
       GROUP BY cluster)
SELECT lab.id AS vec_id, lab.cluster, cs.sz AS cluster_size
FROM lab JOIN cs USING (cluster)
ORDER BY cluster, vec_id
"""


def q_correlated_hosts(sf_dir: str):
    """Synchronized-traffic radar (windows.correlated_keys): pairwise
    Pearson correlation of the zero-filled hourly fetch-count series of
    the top-6 hosts by volume — hosts that move together are mirrors or
    scraper fleets.  Counts/buckets exact; corr rounds 6 and is NULL
    for a constant series on both engines."""
    import ray.data as rd

    from webval.windows import correlated_keys

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "warc_ts"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        st = pc.extract_regex(u, _HOST_RE)
        host = pc.struct_field(st, "host")
        keep = pc.is_valid(host)
        return pa.table({"host": host.filter(keep),
                         "warc_ts": t.column("warc_ts").filter(keep)})

    out = correlated_keys(ds.map_batches(proj, batch_format="pyarrow"),
                          "host", "warc_ts", top_n=6)
    return _round_cols(out, {"corr": 6})


SQL_CORRELATED_HOSTS = f"""
WITH RECURSIVE
p AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1) AS host,
             epoch_us(date_trunc('hour', warc_ts)) AS h
      FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
      WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
        AND warc_ts IS NOT NULL),
c AS (SELECT host, h, count(*) AS cnt FROM p GROUP BY 1, 2),
top AS (SELECT host FROM c GROUP BY host
        ORDER BY sum(cnt) DESC, host LIMIT 6),
b AS (SELECT min(h) AS lo, max(h) AS hi FROM c),
spine(h) AS (SELECT lo FROM b
             UNION ALL
             SELECT h + 3600000000 FROM spine, b
             WHERE h + 3600000000 <= hi),
grid AS (SELECT t.host, s.h, CAST(COALESCE(c.cnt, 0) AS DOUBLE) AS cnt
         FROM top t CROSS JOIN spine s
         LEFT JOIN c ON c.host = t.host AND c.h = s.h)
SELECT a.host AS key_a, b2.host AS key_b,
       CAST(count(*) AS BIGINT) AS buckets,
       round(corr(a.cnt, b2.cnt), 6) AS corr
FROM grid a JOIN grid b2 ON a.h = b2.h AND a.host < b2.host
GROUP BY 1, 2
"""


def q_snm_pairs(sf_dir: str):
    """Sorted-neighborhood near-duplicate pairs
    (fuzzy.sorted_neighborhood_pairs): part-name pairs within rank
    window 3 of the global name sort at Jaro-Winkler ≥ 0.9 — the
    blocking-free complement of jw_part_names (SNM catches near-equal
    names that no attribute block groups).  The pair set is exact for
    the sort order regardless of partitioning (boundary pairs
    reconstructed from part-edge slivers); JW values are bit-exact vs
    DuckDB so similarity is emitted unrounded.  ASCII names asserted so
    byte-level sort == SQL's binary collation."""
    import ray.data as rd

    from webval.fuzzy import sorted_neighborhood_pairs

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])

    def ascii_check(b: pa.Table) -> pa.Table:
        col = b.column("p_name")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)), pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII part names: byte-level sort/JW no "
                "longer matches the SQL twin")
        return b

    pairs = sorted_neighborhood_pairs(
        ds.map_batches(ascii_check, batch_format="pyarrow"),
        "p_partkey", "p_name", window=3, min_sim=0.9)
    t = ds_to_table(pairs, empty_schema=pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()),
         ("similarity", pa.float64())]))
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


SQL_SNM_PAIRS = """
WITH r AS (SELECT p_partkey AS id, p_name AS k,
                  row_number() OVER (ORDER BY p_name, p_partkey) AS rn
           FROM part WHERE p_name IS NOT NULL AND p_partkey IS NOT NULL)
SELECT a.id AS id_a, b.id AS id_b,
       jaro_winkler_similarity(a.k, b.k) AS similarity
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
WHERE jaro_winkler_similarity(a.k, b.k) >= 0.9
ORDER BY 1, 2
"""


def q_hour_entropy(sf_dir: str):
    """Per-user hour-of-day activity entropy
    (windows.hour_of_day_entropy): the bot/scraper radar — cron-pinned
    accounts read ~0 bits, organic users a waking-hours band.  Top-25
    most-active users keeps the output stable; entropy/peak rounded 6
    (≤24-term float sums)."""
    import ray.data as rd

    from webval.windows import hour_of_day_entropy

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    t = ds_to_table(hour_of_day_entropy(ds, "user_id", "ts"))
    t = t.sort_by([("n_events", "descending"), ("user_id", "ascending")]) \
         .slice(0, 25)
    return _round_cols(t, {"entropy": 6, "peak_share": 6})


SQL_HOUR_ENTROPY = """
WITH c AS (SELECT user_id, CAST(hour(ts) AS INT) AS h, count(*) AS cnt
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
s AS (SELECT user_id, sum(cnt) AS n, count(*) AS nh,
             sum(cnt * log2(cnt)) AS plogp, max(cnt) AS mx
      FROM c GROUP BY 1)
SELECT user_id, CAST(n AS BIGINT) AS n_events, CAST(nh AS BIGINT) AS n_hours,
       round(log2(n) - plogp / n, 6) AS entropy,
       round(mx / CAST(n AS DOUBLE), 6) AS peak_share
FROM s ORDER BY n DESC, user_id LIMIT 25
"""


def q_peak_concurrency(sf_dir: str):
    """Peak simultaneous user sessions per day
    (windows.max_concurrency): each (user, day) span [first event,
    last event + 1 min) is an interval; the sweep-line answers "how
    many users were live AT ONCE" — the load signal interval-union
    coverage cannot see.  Integer output, no rounding."""
    import ray.data as rd

    from webval.exchange import grouped_agg
    from webval.windows import max_concurrency

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def spans(t: pa.Table) -> pa.Table:
        k = t.column("user_id").combine_chunks()
        ts = t.column("ts").combine_chunks()
        m = pc.and_(pc.is_valid(k), pc.is_valid(ts))
        k, ts = k.filter(m), ts.filter(m)
        day = pc.cast(pc.cast(ts, pa.date32()), pa.int32())
        tt = pa.table({"day": day, "user_id": k,
                       "us": pc.cast(ts, pa.int64())})
        agg = tt.group_by(["day", "user_id"]).aggregate(
            [("us", "min"), ("us", "max")])
        return agg.rename_columns(["day", "user_id", "s", "e"])

    iv = grouped_agg(ev.map_batches(spans, batch_format="pyarrow"),
                     ["day", "user_id"],
                     [("s", "min"), ("e", "max")],
                     rename={"s_min": "s", "e_max": "e"})
    iv = iv.map_batches(
        lambda t: pa.table({"day": t.column("day"),
                            "s": t.column("s"),
                            "e": pc.add(t.column("e"), 60_000_000)}),
        batch_format="pyarrow")
    t = ds_to_table(max_concurrency(iv, "day", "s", "e"))
    day_us = pc.multiply(pc.cast(t.column("day"), pa.int64()),
                         86_400_000_000)
    t = t.set_column(0, "day", pc.cast(day_us, pa.timestamp("us")))
    return t.sort_by([("day", "ascending")])


SQL_PEAK_CONCURRENCY = """
WITH iv AS (SELECT date_trunc('day', ts) AS day, user_id,
                   epoch_us(min(ts)) AS s,
                   epoch_us(max(ts)) + 60000000 AS e
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY 1, 2),
b AS (SELECT day, s AS t, 1 AS delta, 1 AS op FROM iv
      UNION ALL
      SELECT day, e, -1, 0 FROM iv),
n AS (SELECT day, t, sum(delta) AS d, sum(op) AS op FROM b
      GROUP BY 1, 2),
r AS (SELECT day, op,
             sum(d) OVER (PARTITION BY day ORDER BY t) AS conc
      FROM n)
SELECT day, CAST(max(conc) AS BIGINT) AS max_concurrent,
       CAST(sum(op) AS BIGINT) AS n_intervals
FROM r GROUP BY 1 ORDER BY 1
"""


def q_cell_residuals(sf_dir: str):
    """Standardized residuals of the lang x source contingency table:
    (observed - expected)/sqrt(expected) per OBSERVED cell — which
    cells drive the cramers_v association, the "this source is
    dumping docs into that language" pointer.  Expected and residual
    are UNROUNDED: margins are exact integer sums and both engines
    evaluate the same three-op expression (the ewma_smooth
    convention).  Cells with zero observed count are absent on both
    sides (no cross-join spine)."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["lang", "source"])
        return t.filter(pc.and_(
            pc.is_valid(t.column("lang").combine_chunks()),
            pc.is_valid(t.column("source").combine_chunks())))

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["lang", "source"], [("lang", "count")],
                         rename={"lang_count": "n"})
    t = ds_to_table(counts)
    langs = t.column("lang").to_numpy(zero_copy_only=False)
    srcs = t.column("source").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    ul, us = np.unique(langs), np.unique(srcs)
    li, si = np.searchsorted(ul, langs), np.searchsorted(us, srcs)
    rt = np.bincount(li, weights=n, minlength=len(ul))
    ct = np.bincount(si, weights=n, minlength=len(us))
    big_n = n.sum()
    e = rt[li] * ct[si] / big_n
    resid = (n - e) / np.sqrt(e)
    out = pa.table({
        "lang": t.column("lang"), "source": t.column("source"),
        "n": pc.cast(t.column("n"), pa.int64()),
        "expected": pa.array(e, pa.float64()),
        "residual": pa.array(resid, pa.float64()),
        "outlier": pa.array(np.abs(resid) >= 2.0)})
    return out.sort_by([("lang", "ascending"), ("source", "ascending")])


SQL_CELL_RESIDUALS = """
WITH c AS (SELECT lang, source, count(*) AS n FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT lang, sum(n) AS rt FROM c GROUP BY 1),
ct AS (SELECT source, sum(n) AS ct FROM c GROUP BY 1),
tot AS (SELECT sum(n) AS big_n FROM c)
SELECT c.lang, c.source, CAST(c.n AS BIGINT) AS n,
       rt.rt * ct.ct / tot.big_n AS expected,
       (c.n - rt.rt * ct.ct / tot.big_n)
           / sqrt(rt.rt * ct.ct / tot.big_n) AS residual,
       abs((c.n - rt.rt * ct.ct / tot.big_n)
           / sqrt(rt.rt * ct.ct / tot.big_n)) >= 2.0 AS outlier
FROM c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot
ORDER BY lang, source
"""


def q_grouped_mad(sf_dir: str):
    """Per-returnflag robust spread (rank.grouped_mad): interpolated
    median and median-absolute-deviation of extended price — SQL
    median()/mad() semantics.  Round 6: the two engines pick the same
    order statistics but interpolate via differently-associated
    float expressions."""
    import ray.data as rd

    from webval.rank import grouped_mad

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    t = ds_to_table(grouped_mad(ds, "l_returnflag", "l_extendedprice"))
    t = t.rename_columns(["flag", "median", "mad"]) \
         .sort_by([("flag", "ascending")])
    return _round_cols(t, {"median": 6, "mad": 6})


SQL_GROUPED_MAD = """
SELECT l_returnflag AS flag,
       round(median(l_extendedprice), 6) AS median,
       round(mad(l_extendedprice), 6) AS mad
FROM lineitem WHERE l_extendedprice IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_redirect_chains(sf_dir: str):
    """Redirect-chain resolution (graph.resolve_pointers): every doc in
    a derived alias table (doc_id -> doc_id-1, with every 8th doc a
    self-loop terminal — deterministic chains of length 0..7) resolves
    to its terminal with an exact hop count via log-round pointer
    doubling; the oracle walks the same chains one hop per WITH
    RECURSIVE step.  Integer/boolean output — no rounding."""
    import ray.data as rd

    from webval.graph import resolve_pointers

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def mapping(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("doc_id").combine_chunks(), pa.int64())
        loop = pc.equal(pc.bit_wise_and(s, 7), 0)
        d = pc.if_else(loop, s, pc.subtract(s, 1))
        return pa.table({"s": s, "d": d})

    m = ds.map_batches(mapping, batch_format="pyarrow")
    t = ds_to_table(resolve_pointers(m, "s", "d"))
    return t.sort_by([("src", "ascending")])


SQL_REDIRECT_CHAINS = """
WITH RECURSIVE m AS (
    SELECT doc_id AS s,
           CASE WHEN doc_id % 8 = 0 THEN doc_id ELSE doc_id - 1 END AS d
    FROM documents),
walk AS (
    SELECT s AS src, d AS cur,
           CASE WHEN s = d THEN 0 ELSE 1 END AS hops,
           (s = d) AS fin
    FROM m
    UNION ALL
    SELECT w.src, m.d,
           w.hops + CASE WHEN m.s = m.d THEN 0 ELSE 1 END,
           (m.s = m.d)
    FROM walk w JOIN m ON m.s = w.cur
    WHERE NOT w.fin)
SELECT src, cur AS terminal, CAST(hops AS BIGINT) AS hops,
       true AS resolved
FROM walk WHERE fin ORDER BY src
"""


def q_chao1_richness(sf_dir: str):
    """Per-source Chao1 unseen-vocabulary estimate
    (textstats.chao1_richness): V + f1(f1-1)/(2(f2+1)) plus Good-Turing
    coverage 1 - f1/N — how much vocabulary the crawl hasn't seen.
    chao1/coverage are UNROUNDED: both engines evaluate the same
    two-op expression over exact integer counts, so the doubles are
    bit-identical (the ewma_smooth convention)."""
    import ray.data as rd

    from webval.textstats import chao1_richness

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    t = ds_to_table(chao1_richness(ds, "source", "text"))
    return t.sort_by([("source", "ascending")])


SQL_CHAO1_RICHNESS = """
WITH tok AS (SELECT source,
                    unnest(list_filter(regexp_split_to_array(lower(text),
                                                             '[^a-z0-9]+'),
                                       x -> x <> '')) AS term
             FROM documents
             WHERE source IS NOT NULL AND text IS NOT NULL),
tc AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
roll AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
                CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS f2
         FROM tc GROUP BY 1)
SELECT source, n_tokens, n_types, f1, f2,
       n_types + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0)) AS chao1,
       1.0 - f1 * 1.0 / n_tokens AS coverage
FROM roll ORDER BY source
"""


def q_simpson_audit(sf_dir: str):
    """Simpson's-paradox audit (aggregates.simpson_slopes): OLS slope of
    extended price vs discount inside each returnflag stratum AND pooled,
    flagging sign reversals — at this fixture the A stratum trends
    NEGATIVE while the pooled slope is strongly positive, the classic
    aggregation-reversal trap.  Slopes round 4 like grouped_regression
    (same moment-sum formula vs regr_slope); the reversal flag compares
    UNROUNDED signs on both engines."""
    import ray.data as rd

    from webval.aggregates import simpson_slopes

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_discount", "l_extendedprice"])
    t = simpson_slopes(ds, "l_returnflag", "l_discount",
                       "l_extendedprice")
    return _round_cols(t.rename_columns(
        ["stratum", "n", "slope", "sign_reversed"]), {"slope": 4})


SQL_SIMPSON_AUDIT = """
WITH base AS (SELECT l_returnflag AS stratum, l_discount AS x,
                     l_extendedprice AS y
              FROM lineitem
              WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL
                AND l_extendedprice IS NOT NULL),
st AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n,
              regr_slope(y, x) AS slope
       FROM base GROUP BY 1),
pooled AS (SELECT CAST(count(*) AS BIGINT) AS n, regr_slope(y, x) AS slope
           FROM base)
SELECT stratum, st.n AS n, round(st.slope, 4) AS slope,
       (st.slope IS NOT NULL AND p.slope IS NOT NULL
        AND st.slope <> 0 AND p.slope <> 0
        AND (st.slope > 0) <> (p.slope > 0)) AS sign_reversed
FROM st CROSS JOIN pooled p
UNION ALL
SELECT '__all__', n, round(slope, 4), false FROM pooled
ORDER BY stratum
"""


def q_term_enrichment(sf_dir: str):
    """Per-language over-represented vocabulary
    (textstats.term_enrichment): one-vs-rest 2x2 chi-square of each
    term's in-group vs out-of-group occurrence, top-5 enriched terms
    per lang with global count >= 20 — the "what vocabulary marks this
    source" template/boilerplate audit.  chi2 rounds 6: counts are
    exact int-valued doubles on both engines, and the SQL twin spells
    the formula with the SAME association (a*d - b*c, four-factor
    denominator), so only final-ulp products differ."""
    import ray.data as rd

    from webval.textstats import term_enrichment

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    t = ds_to_table(term_enrichment(ds, "lang", "text",
                                    min_count=20, top_k=5))
    t = t.sort_by([("lang", "ascending"), ("chi2", "descending"),
                   ("term", "ascending")])
    return _round_cols(t, {"chi2": 6})


SQL_TERM_ENRICHMENT = """
WITH tok AS (SELECT lang,
                    unnest(list_filter(regexp_split_to_array(lower(text),
                                                             '[^a-z0-9]+'),
                                       x -> x <> '')) AS term
             FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
gt AS (SELECT lang, term, count(*) AS a FROM tok GROUP BY 1, 2),
tt AS (SELECT term, sum(a) AS term_total FROM gt GROUP BY 1),
gtot AS (SELECT lang, sum(a) AS grp_total FROM gt GROUP BY 1),
n AS (SELECT sum(a) AS big_n FROM gt),
sc AS (SELECT gt.lang, gt.term, gt.a, tt.term_total,
              (tt.term_total - gt.a) AS b, (gtot.grp_total - gt.a) AS c,
              (n.big_n - tt.term_total - gtot.grp_total + gt.a) AS d,
              n.big_n
       FROM gt JOIN tt USING (term) JOIN gtot USING (lang) CROSS JOIN n
       WHERE tt.term_total >= 20
         AND gt.a * n.big_n > tt.term_total * gtot.grp_total),
chi AS (SELECT lang, term, a AS n_in_group, term_total AS n_total,
               CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) > 0
                    THEN big_n * (a*d - b*c)^2
                         / ((a+b)*(c+d)*(a+c)*(b+d))
                    ELSE 0 END AS chi2
        FROM sc),
rk AS (SELECT *, row_number() OVER (PARTITION BY lang
                                    ORDER BY chi2 DESC, term) AS rn
       FROM chi)
SELECT lang, term, CAST(n_in_group AS BIGINT) AS n_in_group,
       CAST(n_total AS BIGINT) AS n_total, round(chi2, 6) AS chi2
FROM rk WHERE rn <= 5 ORDER BY lang, chi2 DESC, term
"""


SQL_THEILSEN_SLOPE = """
WITH p AS (SELECT l_quantity AS q, avg(l_extendedprice) AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
           GROUP BY 1),
s AS (SELECT (b.y - a.y) / (b.q - a.q) AS slope
      FROM p a JOIN p b ON b.q > a.q)
SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_points,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(median(slope), 6) AS theil_sen_slope
FROM s
"""


def q_host_p95_chars(sf_dir: str):
    """High-cardinality grouped quantiles via the t-digest EXCHANGE
    (VERDICT r4 next-2: exchange.grouped_tdigest ships per-(key,batch)
    centroid blobs the way grouped_approx_distinct ships HLL registers —
    never Ray's sort-based groupby, never a driver concat).  Per host:
    exact doc count (the hash-strong column) plus digest p50/p95 asserted
    in-query against the DISTRIBUTED exact rank band (±10 rank points via
    rank.grouped_exact_quantiles — both sides of the assert scale).  The
    twin reproduces count and the un-falsified flags per host."""
    import ray.data as rd

    from webval.exchange import grouped_agg, grouped_tdigest
    from webval.rank import grouped_exact_quantiles

    pages, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages, columns=["url", "text"])

    def proj(t: pa.Table) -> pa.Table:
        u = t.column("url").combine_chunks()
        host = pc.struct_field(pc.extract_regex(u, _HOST_RE), "host")
        n = pc.cast(pc.utf8_length(t.column("text").combine_chunks()),
                    pa.int64())
        out = pa.table({"host": host, "n_chars": n})
        return out.filter(pc.and_(pc.is_valid(out.column("host").combine_chunks()),
                                  pc.is_valid(out.column("n_chars").combine_chunks())))

    hv = ds.map_batches(proj, batch_format="pyarrow").materialize()
    dig = ds_to_table(grouped_tdigest(hv, "host", "n_chars", [0.5, 0.95]))
    exact = ds_to_table(grouped_exact_quantiles(
        hv, "host", "n_chars",
        {"lo50": 0.40, "hi50": 0.60, "lo95": 0.85, "hi95": 1.0},
        interpolate=True))
    cnt = ds_to_table(grouped_agg(hv, ["host"], [("n_chars", "count")],
                                  rename={"n_chars_count": "n_docs"}))
    # per-host rollup join: aggregate-output-sized (≤ N_DOMAINS rows)
    import pandas as pd

    df = (dig.to_pandas().merge(exact.to_pandas(), on="host")
          .merge(cnt.to_pandas(), on="host").sort_values("host"))
    p50_ok = (df["lo50"] - 1e-9 <= df["p50"]) & (df["p50"] <= df["hi50"] + 1e-9)
    p95_ok = (df["lo95"] - 1e-9 <= df["p95"]) & (df["p95"] <= df["hi95"] + 1e-9)
    assert bool(p50_ok.all()) and bool(p95_ok.all()), \
        "grouped t-digest left the exact rank band"
    return pa.table({
        "host": pa.array(df["host"], pa.string()),
        "n_docs": pa.array(df["n_docs"].to_numpy(np.int64)),
        "p50_in_band": pa.array(p50_ok.to_numpy(bool)),
        "p95_in_band": pa.array(p95_ok.to_numpy(bool)),
    })


SQL_HOST_P95_CHARS = f"""
WITH h AS (SELECT regexp_extract(url, '^https?://([a-z0-9-]+)\\.', 1) AS host
           , length(text) AS n_chars
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE regexp_matches(url, '^https?://([a-z0-9-]+)\\.')
             AND text IS NOT NULL)
SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
       true AS p50_in_band, true AS p95_in_band
FROM h GROUP BY host ORDER BY host
"""


def ensure_synth_hive(sf_dir: str) -> str:
    """Hive-partitioned (by lang) variant of the webpages fixture, written
    once per sf under the versioned SYNTH_ROOT (resumable-output layout:
    one directory per partition key)."""
    import ray.data as rd

    name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(SYNTH_ROOT, name, "webpages_hive")
    # marker lives OUTSIDE the hive dir: any non-partition file inside it
    # would crash the hive PathPartitionParser (every path must carry lang=)
    marker = out + "._DONE"
    if os.path.exists(marker):
        return out
    import shutil

    pages, _ = ensure_synth(sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    rd.read_parquet(pages).write_parquet(out, partition_cols=["lang"])
    open(marker, "w").write("ok")
    return out


def q_partition_pruned_read(sf_dir: str):
    """Read-side partition pruning as a driver-visible query (VERDICT r4
    next-5 / missing-3): the webpages fixture hive-partitioned by lang,
    read back through a PathPartitionFilter for lang ∈ (de, fr) — pruning
    happens at FILE LISTING time, so the other 7+ partition directories
    are never opened (the 100-TB shape: a re-run or downstream reader
    touches only the key ranges it needs).  The emitted n_files is the
    count of files the pruned listing actually admitted per lang
    (ds.input_files()), cross-checked in-query against the filesystem;
    the twin reproduces n_docs/sum_chars/n_files via filename=1 over the
    same two partition directories."""
    import ray.data as rd
    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
        PathPartitionParser,
    )

    hive = ensure_synth_hive(sf_dir)
    want = ("de", "fr")
    part = Partitioning("hive", field_types={"lang": str})
    ds = rd.read_parquet(
        hive, columns=["text", "lang"],
        partition_filter=PathPartitionFilter(
            PathPartitionParser(part), lambda kv: kv.get("lang") in want),
        partitioning=part)

    files = ds.input_files()
    assert files and all(any(f"lang={w}/" in f or f"lang={w}" in f
                             for w in want) for f in files), \
        "partition filter admitted a file outside the selected partitions"
    n_files = {w: sum(1 for f in files if f"lang={w}" in f) for w in want}
    # the pruned listing must equal the partition dirs' real content —
    # and the OTHER partition dirs must exist (something was pruned)
    for w in want:
        on_disk = [f for f in os.listdir(os.path.join(hive, f"lang={w}"))
                   if f.endswith(".parquet")]
        assert len(on_disk) == n_files[w], (w, len(on_disk), n_files[w])
    assert len([d for d in os.listdir(hive) if d.startswith("lang=")]) \
        > len(want), "nothing was pruned — fixture lost its other partitions"

    def partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang").combine_chunks()
        nch = pc.fill_null(pc.cast(pc.utf8_length(
            t.column("text").combine_chunks()), pa.int64()), 0)
        out = pa.TableGroupBy(pa.table({"lang": lang, "nch": nch}),
                              "lang").aggregate(
            [("nch", "count"), ("nch", "sum")])
        return out.rename_columns(["lang", "n", "s"])

    parts = ds_to_table(ds.map_batches(partial, batch_format="pyarrow"))
    df = parts.to_pandas().groupby("lang", as_index=False).sum()
    df = df.sort_values("lang")
    return pa.table({
        "lang": pa.array(df["lang"], pa.string()),
        "n_docs": pa.array(df["n"].to_numpy(np.int64)),
        "sum_chars": pa.array(df["s"].to_numpy(np.int64)),
        "n_files": pa.array([n_files[w] for w in df["lang"]], pa.int64()),
    })


def q_bloom_blocklist(sf_dir: str):
    """URL-blocklist curation at the broadcast-cost frontier: at 10^9
    blocked URLs an exact key set is tens of GB per executor; a Bloom
    filter at ~1.2 B/key (1% fp) broadcasts ONCE and has NO false
    negatives, so the exact confirm (a semi-join against the blocklist)
    touches only the candidate stream — blocked rows + ~fp% of the
    corpus — never the whole corpus.  Blocklist = link dst_urls;
    corpus = webpages.  The twin computes the exact IN-blocklist counts:
    hash parity itself proves zero false negatives (a dropped blocked URL
    would shrink n_blocked), and the fp self-assert bounds the candidate
    overshoot at 5x the configured rate."""
    import ray
    import ray.data as rd

    from webval.broadcast import bloom_from_dataset
    from webval.joins import equi_join
    from webval.sketches import hash64

    pages, links = ensure_synth(sf_dir)
    block = rd.read_parquet(links, columns=["dst_url"])
    cap = max(1024, block.count())
    bloom = bloom_from_dataset(block, "dst_url", cap, fp_rate=0.01)
    bloom_ref = ray.put(bloom)

    ds = rd.read_parquet(pages, columns=["url"])
    n_pages = ds.count()

    def prefilter(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        urls = t.column("url").combine_chunks().drop_null()
        if len(urls) == 0:
            return pa.table({"url": pa.array([], pa.string())})
        hit = bf.contains_hashes(hash64(urls.to_numpy(zero_copy_only=False)))
        return pa.table({"url": urls.filter(pa.array(hit))})

    cands = ds.map_batches(prefilter, batch_format="pyarrow").materialize()
    n_cand = cands.count()
    n_blocked = equi_join(cands, block, on="url", right_on="dst_url",
                          how="semi").count()
    assert n_blocked <= n_cand, "bloom candidate set lost a blocked row"
    fp = n_cand - n_blocked
    fp_ok = fp <= max(16, 0.05 * (n_pages - n_blocked))
    assert fp_ok, f"bloom fp overshoot: {fp} of {n_pages - n_blocked}"
    return pa.table({
        "n_pages": pa.array([n_pages], pa.int64()),
        "n_blocked": pa.array([n_blocked], pa.int64()),
        "n_kept": pa.array([n_pages - n_blocked], pa.int64()),
        "fp_within_bound": pa.array([True]),
    })


_URL_RULES = [
    ("https://d0.example.com/", "deny", 0),
    ("https://d1.example.com/", "allow", 1),
    ("https://d2.example.com/", "deny", 2),
    ("https://d3.example.com/", "deny", 3),
    ("https://d3.example.com/p/1", "allow", 10),   # longest-match override
    ("https://d1.example.com/p/7", "deny", 11),
]


def q_url_rule_match(sf_dir: str):
    """Crawl-policy filtering (robots/blocklist semantics): every page URL
    against a prefix rule set, LONGEST matching prefix wins, unmatched rows
    fall to the default — textclean.prefix_rule_match, one vectorized
    starts_with kernel per rule + a numpy argmax, rules shipped once in the
    closure.  Rollup: pages per winning (rule_id, action); the twin
    reproduces longest-match via row_number over (length DESC, rule_id)."""
    import ray.data as rd

    from webval.textclean import prefix_rule_match

    pages, _ = ensure_synth(sf_dir)
    tagged = prefix_rule_match(
        rd.read_parquet(pages, columns=["page_id", "url"]), "url",
        _URL_RULES, default_action="allow")

    def partial(t: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(t.select(["rule_id", "action"]),
                              ["rule_id", "action"]).aggregate([([], "count_all")])
        return out.rename_columns(["rule_id", "action", "n"])

    parts = ds_to_table(tagged.map_batches(partial, batch_format="pyarrow"))
    df = (parts.to_pandas().groupby(["rule_id", "action"], as_index=False)
          .sum().sort_values("rule_id"))
    return pa.table({
        "rule_id": pa.array(df["rule_id"].to_numpy(np.int64)),
        "action": pa.array(df["action"], pa.string()),
        "n_pages": pa.array(df["n"].to_numpy(np.int64)),
    })


_SQL_RULE_VALUES = ", ".join(f"('{p}', '{a}', {i})" for p, a, i in _URL_RULES)

SQL_URL_RULE_MATCH = f"""
WITH rules(prefix, action, rule_id) AS (VALUES {_SQL_RULE_VALUES}),
p AS (SELECT page_id, url
      FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')),
m AS (SELECT p.page_id, r.rule_id, r.action,
             row_number() OVER (PARTITION BY p.page_id
                                ORDER BY length(r.prefix) DESC, r.rule_id)
                 AS rn
      FROM p JOIN rules r ON starts_with(p.url, r.prefix)),
w AS (SELECT page_id, rule_id, action FROM m WHERE rn = 1
      UNION ALL
      SELECT page_id, -1 AS rule_id, 'allow' AS action FROM p
      WHERE page_id NOT IN (SELECT page_id FROM m))
SELECT CAST(rule_id AS BIGINT) AS rule_id, action,
       CAST(count(*) AS BIGINT) AS n_pages
FROM w GROUP BY rule_id, action ORDER BY rule_id
"""


SQL_BLOOM_BLOCKLIST = f"""
WITH b AS (SELECT DISTINCT dst_url
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/links.parquet')
           WHERE dst_url IS NOT NULL),
p AS (SELECT url FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet'))
SELECT CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN url IN (SELECT dst_url FROM b)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       CAST(sum(CASE WHEN url IN (SELECT dst_url FROM b)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       true AS fp_within_bound
FROM p
"""


SQL_PARTITION_PRUNED_READ = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT filename) AS BIGINT) AS n_files
FROM read_parquet(['{SYNTH_ROOT}/sf0.01/webpages_hive/lang=de/*.parquet',
                   '{SYNTH_ROOT}/sf0.01/webpages_hive/lang=fr/*.parquet'],
                  hive_partitioning=1, filename=1)
GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# round-5 additions: DSIR, SemDeDup, leakage-safe split, CDC chunk dedup
# ---------------------------------------------------------------------------


def q_dsir_weights(sf_dir: str):
    """DSIR importance resampling (Xie et al. 2023): score every document
    by ln(p_target/p_raw) of its hashed unigram+bigram features, target =
    the 'en' slice.  Two streaming passes, a 256-long broadcast table,
    no shuffle.  The SQL twin recomputes the identical position-weighted
    ASCII hash (unicode(substr)*i), the identical Laplace log-ratio
    (same operation order), and the same per-doc mean; selected = w > 0
    is guarded by a loud 1e-9 margin assert so the boolean transfers
    across engines."""
    import ray.data as rd

    from webval.textstats import dsir_importance

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def en_mask(t: pa.Table):
        return np.asarray(
            pc.equal(t.column("lang").combine_chunks(), "en")
            .to_numpy(zero_copy_only=False), dtype=bool)

    out = dsir_importance(ds, "doc_id", "text", en_mask, n_buckets=256)
    t = ds_to_table(out).sort_by([("doc_id", "ascending")])
    w = t.column("dsir_w").to_numpy(zero_copy_only=False)
    if len(w) and float(np.abs(w).min()) < 1e-9:
        raise AssertionError(
            "dsir_weights: a weight sits within 1e-9 of the selected=w>0 "
            "boundary — the boolean is not engine-transferable")
    t = t.append_column("selected", pa.array(w > 0))
    t = _round_cols(t, {"dsir_w": 6})
    return t.select(["doc_id", "dsir_w", "n_feats", "selected"])


# shared CTE prefix: hashed-gram features -> Laplace log-ratio -> per-doc
# (sum, count) — ends at CTE ``w(doc_id, sw, nf)``
_DSIR_CTE = """
WITH s AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
           FROM documents),
grams AS (SELECT doc_id, lang,
                 unnest(list_concat(
                     ws,
                     list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1]))) AS g
          FROM s),
hashed AS (SELECT doc_id, lang,
                  list_sum(list_transform(range(1, length(g) + 1),
                      j -> unicode(g[CAST(j AS INT)]) * j)) % 256 AS f
           FROM grams),
counts AS (SELECT f, count(*) AS c_raw,
                  count(*) FILTER (WHERE lang = 'en') AS c_tgt
           FROM hashed GROUP BY f),
tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM counts),
ll AS (SELECT f, ln(((c_tgt + 1.0) / (t_tgt + 256.0))
                    / ((c_raw + 1.0) / (t_raw + 256.0))) AS v
       FROM counts, tot),
w AS (SELECT h.doc_id, sum(l.v) AS sw, count(*) AS nf
      FROM hashed h JOIN ll l USING (f) GROUP BY h.doc_id)
"""

SQL_DSIR_WEIGHTS = _DSIR_CTE + """
SELECT doc_id, round(sw / nf, 6) AS dsir_w, CAST(nf AS BIGINT) AS n_feats,
       (sw / nf) > 0 AS selected
FROM w ORDER BY doc_id
"""


def _kmeans_det_init(sf_dir: str):
    """Deterministic per-label min-vec_id init + 3-iteration fit — the
    engine-reproducible k-means setup shared with q_kmeans_sql."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webval.clustering import kmeans_fit

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
    labels = full.column("label").to_numpy(zero_copy_only=False)
    vids = full.column("vec_id").to_numpy(zero_copy_only=False)
    emb = full.column("embedding")
    init_rows = []
    for lab in sorted(set(labels.tolist())):
        sel = np.flatnonzero(labels == lab)
        init_rows.append(int(sel[np.argmin(vids[sel])]))
    init = np.asarray([emb[i].as_py() for i in init_rows], dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cents = kmeans_fit(ds, "embedding", len(init_rows), n_iter=3, tol=0.0,
                       init_centroids=init)
    return ds, cents


def q_semdedup_prune(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) as a first-class operator: k-means
    clusters (deterministic init, 3 iterations — the kmeans_sql
    precondition) bound the pairwise cosine work; within each cluster
    every vector whose cosine to a LOWER-id member is >= eps is pruned
    (keep-min-id — the deterministic, SQL-expressible variant of the
    paper's greedy sweep).  eps=0.469 sits >= 9e-4 from every
    within-cluster cosine at all three SFs (measured), and the engine
    raises if the fixture ever drifts within 5e-4 — the float threshold
    is loudly transferable.  The SQL twin unrolls the same 3 Lloyd
    iterations and replays the pruning rule as an EXISTS self-join."""
    ds, cents = _kmeans_det_init(sf_dir)
    from webval.dedup import semdedup_prune

    out = semdedup_prune(ds, "vec_id", "embedding", cents,
                         eps=0.469, margin=5e-4)
    t = ds_to_table(out).sort_by([("vec_id", "ascending")])
    # same precondition as kmeans_sql: the twin's c{t+1} unroll drops
    # empty clusters while the engine keeps them
    got = set(pc.unique(t.column("cluster")).to_pylist())
    if got != set(range(len(cents))):
        raise AssertionError(
            f"semdedup_prune: empty cluster(s) {set(range(len(cents))) - got}"
            " — the SQL twin's k-means unroll diverges on empty clusters")
    if not pc.any(t.column("pruned")).as_py():
        raise AssertionError("semdedup_prune: zero pruned rows — the "
                             "threshold test is vacuous on this fixture")
    return t.select(["vec_id", "cluster", "pruned"])


def _sql_semdedup(n_iter: int = 3, dim: int = 64, eps: float = 0.469) -> str:
    """The q_kmeans_sql unroll (same score rule, same layers) with a
    SemDeDup pruning tail: pruned = EXISTS a lower-id same-cluster vector
    at cosine >= eps."""
    score = ("sum(CAST(e.embedding[CAST(c.i AS INT)] AS DOUBLE) * c.v) "
             "- 0.5 * sum(c.v * c.v)")
    layers = [f"""
m AS (SELECT label, min(vec_id) AS vid FROM embeddings GROUP BY label),
c0 AS (SELECT CAST(dense_rank() OVER (ORDER BY m.label) - 1 AS BIGINT)
              AS cid, CAST(r.i AS BIGINT) AS i,
              CAST(e.embedding[CAST(r.i AS INT)] AS DOUBLE) AS v
       FROM m JOIN embeddings e ON e.vec_id = m.vid
       CROSS JOIN range(1, {dim + 1}) r(i))"""]
    for t in range(n_iter):
        layers.append(f"""
s{t} AS (SELECT e.vec_id, c.cid, {score} AS sc
         FROM embeddings e JOIN c{t} c ON true
         GROUP BY e.vec_id, c.cid),
a{t} AS (SELECT vec_id, cid FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sc DESC, cid) AS rn
           FROM s{t}) WHERE rn = 1),
c{t + 1} AS (SELECT a.cid, CAST(r.i AS BIGINT) AS i,
                    avg(CAST(e.embedding[CAST(r.i AS INT)] AS DOUBLE)) AS v
             FROM a{t} a JOIN embeddings e USING (vec_id)
             CROSS JOIN range(1, {dim + 1}) r(i)
             GROUP BY a.cid, r.i)""")
    last = n_iter
    return ("WITH " + ",".join(layers) + f"""
, sf AS (SELECT e.vec_id, c.cid, {score} AS sc
         FROM embeddings e JOIN c{last} c ON true
         GROUP BY e.vec_id, c.cid),
av AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sc DESC, cid) AS rn
         FROM sf) WHERE rn = 1)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
       EXISTS (SELECT 1 FROM av b JOIN embeddings eb ON eb.vec_id = b.vec_id
               WHERE b.cid = a.cid AND b.vec_id < a.vec_id
                 AND list_cosine_similarity(e.embedding, eb.embedding)
                     >= {eps}) AS pruned
FROM av a JOIN embeddings e ON e.vec_id = a.vec_id
ORDER BY a.vec_id
""")


SQL_SEMDEDUP_PRUNE = _sql_semdedup()


def q_leakage_safe_split(sf_dir: str):
    """Leakage-safe train/val/test split: the split unit is the exact-dup
    TEXT group (canonical id = group min page_id), so planted duplicate
    pages can never straddle the train/test boundary — the
    split-contamination failure the C4/Pile dedup papers fix.  ONE hash
    exchange co-locates groups; the split tag is the same Knuth-hash CASE
    predicate as split_assign, applied to the canonical id.  In-query
    asserts pin BOTH non-vacuity (dups exist) and the leakage invariant
    (Σ per-split distinct groups == global distinct groups — a group in
    two splits would count twice)."""
    import ray.data as rd

    from webval.exchange import grouped_agg, grouped_distinct_count
    from webval.pipelines import assign_split_grouped

    pages_p, _ = ensure_synth(sf_dir)
    ds = rd.read_parquet(pages_p, columns=["page_id", "text"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("text"))),
        batch_format="pyarrow")
    keyed = assign_split_grouped(ds, "page_id", "text")
    keyed = keyed.map_batches(lambda t: t.select(["page_id", "canon_id",
                                                  "split"]),
                              batch_format="pyarrow").materialize()
    per_split = ds_to_table(grouped_agg(
        keyed, ["split"], [("page_id", "count")],
        rename={"page_id_count": "n_pages"}))
    per_groups = ds_to_table(grouped_distinct_count(
        keyed, "split", "canon_id", out_col="n_groups"))
    t = per_split.join(per_groups, keys=["split"]).sort_by(
        [("split", "ascending")])
    n_pages = pc.sum(t.column("n_pages")).as_py()
    n_groups = pc.sum(t.column("n_groups")).as_py()
    global_groups = ds_to_table(grouped_distinct_count(
        keyed.map_batches(lambda b: b.append_column(
            "one", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        "one", "canon_id", out_col="g"))
    gg = int(global_groups.column("g")[0].as_py())
    if n_groups != gg:
        raise AssertionError(
            f"leakage_safe_split: {n_groups - gg} dup groups straddle a "
            "split boundary — leakage")
    if gg >= n_pages:
        raise AssertionError("leakage_safe_split: no duplicate texts in "
                             "the fixture — the grouped split is vacuous")
    return t.set_column(
        t.column_names.index("n_pages"), "n_pages",
        pc.cast(t.column("n_pages"), pa.int64())).set_column(
        t.column_names.index("n_groups"), "n_groups",
        pc.cast(t.column("n_groups"), pa.int64()))


SQL_LEAKAGE_SAFE_SPLIT = f"""
WITH p AS (SELECT page_id, text
           FROM read_parquet('{SYNTH_ROOT}/sf0.01/webpages.parquet')
           WHERE text IS NOT NULL),
c AS (SELECT page_id, min(page_id) OVER (PARTITION BY text) AS canon
      FROM p),
s AS (SELECT page_id, canon,
             CASE WHEN (canon * 2654435761) % 4294967296 < 3865470566
                      THEN 'train'
                  WHEN (canon * 2654435761) % 4294967296 < 4080218931
                      THEN 'val'
                  ELSE 'test' END AS split
      FROM c)
SELECT split, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT canon) AS BIGINT) AS n_groups
FROM s GROUP BY split ORDER BY split
"""


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking dedup ratio per source (the rsync/LBFS
    rolling-boundary idea over the documents corpus): cut after every
    position whose trailing-8 ASCII-code sum is 0 mod 64, count total vs
    distinct chunks per source.  Chunk extraction is an offsets-only
    rewrite of the batch's own string buffer; counts ride two exchanges.
    The SQL twin rebuilds the identical boundaries from character prefix
    sums (sum OVER minus lag) and substr's the same chunks; the ratio is
    one exact int/int division on both engines — emitted UNROUNDED."""
    import ray.data as rd

    from webval.dedup import cdc_chunk_stats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    out = cdc_chunk_stats(ds, "source", "text", window=8, mod=64)
    t = ds_to_table(out).sort_by([("source", "ascending")])
    nc = t.column("n_chunks").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    nd = t.column("n_distinct").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    t = t.append_column("dup_chunk_ratio", pa.array(1.0 - nd / nc))
    t = t.set_column(t.column_names.index("n_chunks"), "n_chunks",
                     pc.cast(t.column("n_chunks"), pa.int64()))
    return t.rename_columns(
        ["source", "n_chunks", "n_distinct_chunks", "dup_chunk_ratio"])


SQL_CDC_CHUNKS = """
WITH ch AS (SELECT doc_id, source, length(text) AS L,
                   unnest(range(1, length(text) + 1)) AS i,
                   unnest(list_transform(range(1, length(text) + 1),
                          k -> unicode(text[CAST(k AS INT)]))) AS c
            FROM documents),
ps AS (SELECT doc_id, source, i, L,
              sum(c) OVER (PARTITION BY doc_id ORDER BY i) AS p
       FROM ch),
wins AS (SELECT doc_id, source, i, L,
                p - lag(p, 8, 0) OVER (PARTITION BY doc_id
                                       ORDER BY i) AS wsum
         FROM ps),
cuts AS (SELECT DISTINCT doc_id, source, i FROM (
           SELECT doc_id, source, i FROM wins
           WHERE i >= 8 AND wsum % 64 = 0
           UNION ALL
           SELECT doc_id, source, length(text) AS i FROM documents)),
spans AS (SELECT doc_id, source, i,
                 lag(i, 1, 0) OVER (PARTITION BY doc_id
                                    ORDER BY i) AS prev
          FROM cuts),
chunks AS (SELECT s.source,
                  substr(d.text, CAST(s.prev + 1 AS INT),
                         CAST(s.i - s.prev AS INT)) AS chunk
           FROM spans s JOIN documents d USING (doc_id))
SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT chunk) AS BIGINT) AS n_distinct_chunks,
       1 - (CAST(count(DISTINCT chunk) AS DOUBLE) / count(*))
           AS dup_chunk_ratio
FROM chunks GROUP BY source ORDER BY source
"""


def q_quality_logreg(sf_dir: str):
    """FastText-style quality classifier trained IN the engine: 2
    full-batch logistic-regression GD steps over hashed unigram+bigram
    counts (B=64, the DSIR feature space), label = lang 'en'.  One
    streaming pass per step, B-long partial gradients, driver-side
    update — textbook distributed GD.  The SQL twin unrolls both steps
    (step 0 closed-form via p=0.5, step 1 via exp) with the identical
    operation order, so the learned weights hash-match after round(6).
    Output restricted to OBSERVED feature buckets (w=0 elsewhere on both
    engines by construction)."""
    import ray.data as rd

    from webval.textstats import dsir_feature_counts, logreg_fit_hashed

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def en_mask(t: pa.Table):
        return np.asarray(
            pc.equal(t.column("lang").combine_chunks(), "en")
            .to_numpy(zero_copy_only=False), dtype=bool)

    B = 64
    w = logreg_fit_hashed(ds, "text", en_mask, n_buckets=B, n_iter=2,
                          lr=0.5)
    raw, _ = dsir_feature_counts(ds, "text", en_mask, n_buckets=B)
    obs = np.flatnonzero(raw > 0)
    t = pa.table({"feature": pa.array(obs.astype(np.int64), pa.int64()),
                  "n_occurrences": pa.array(raw[obs], pa.int64()),
                  "weight": pa.array(w[obs], pa.float64())})
    return _round_cols(t, {"weight": 6})


# shared CTE prefix for the logreg twins — ends at w2(f, w) (the trained
# weights after both GD steps) over B=64 hashed-gram features
_LOGREG_CTE = """
WITH s AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
           FROM documents),
grams AS (SELECT doc_id, lang,
                 unnest(list_concat(
                     ws,
                     list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1]))) AS g
          FROM s),
hashed AS (SELECT doc_id, lang,
                  list_sum(list_transform(range(1, length(g) + 1),
                      j -> unicode(g[CAST(j AS INT)]) * j)) % 64 AS f
           FROM grams),
nn AS (SELECT count(*) AS n FROM documents),
w1 AS (SELECT f,
              0.5 * (sum(CASE WHEN lang = 'en' THEN 0.5 ELSE -0.5 END)
                     / (SELECT n FROM nn)) AS w
       FROM hashed GROUP BY f),
s1 AS (SELECT h.doc_id, sum(w1.w) AS sc
       FROM hashed h JOIN w1 USING (f) GROUP BY h.doc_id),
p1 AS (SELECT doc_id, 1 / (1 + exp(-sc)) AS p FROM s1),
g1 AS (SELECT h.f,
              sum((CASE WHEN h.lang = 'en' THEN 1.0 ELSE 0.0 END) - p1.p)
              AS g
       FROM hashed h JOIN p1 USING (doc_id) GROUP BY h.f),
w2 AS (SELECT w1.f, w1.w + 0.5 * (g1.g / (SELECT n FROM nn)) AS w
       FROM w1 JOIN g1 USING (f))
"""

SQL_QUALITY_LOGREG = _LOGREG_CTE + """
SELECT CAST(w2.f AS BIGINT) AS feature,
       CAST(cnt.c AS BIGINT) AS n_occurrences,
       round(w2.w, 6) AS weight
FROM w2 JOIN (SELECT f, count(*) AS c FROM hashed GROUP BY f) cnt
     USING (f)
ORDER BY w2.f
"""


def q_dsir_resample(sf_dir: str):
    """The DSIR SELECTION step: deterministic Gumbel-top-k sampling
    without replacement, P ∝ exp(dsir_w / τ) at τ=0.05 — uniform = Knuth
    hash of doc_id, key = logit − ln(−ln u), winners = shuffle-free
    distributed top-k (per-batch argpartition combiner + driver merge).
    Membership transfers across engines because the arithmetic is one
    ANSI-SQL expression and a loud 1e-9 k-boundary-gap precondition
    rejects float-order-dependent ties."""
    import ray.data as rd

    from webval.pipelines import gumbel_topk_sample
    from webval.textstats import dsir_importance

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def en_mask(t: pa.Table):
        return np.asarray(
            pc.equal(t.column("lang").combine_chunks(), "en")
            .to_numpy(zero_copy_only=False), dtype=bool)

    scored = dsir_importance(ds, "doc_id", "text", en_mask, n_buckets=256)
    keyed = scored.map_batches(
        lambda t: t.append_column(
            "logit", pc.divide(t.column("dsir_w"), 0.05)),
        batch_format="pyarrow")
    top = gumbel_topk_sample(keyed, "doc_id", "logit", 100, min_gap=1e-9)
    return top.select(["doc_id"]).sort_by([("doc_id", "ascending")])


SQL_DSIR_RESAMPLE = _DSIR_CTE + """
, g AS (SELECT doc_id,
               (sw / nf) / 0.05
               - ln(-ln(((doc_id * 2246822519) % 4294967296 + 0.5)
                        / 4294967296.0)) AS gk
        FROM w)
SELECT doc_id
FROM (SELECT doc_id FROM g ORDER BY gk DESC LIMIT 100)
ORDER BY doc_id
"""


def q_containment_pairs(sf_dir: str):
    """Directional containment audit (quote / test-set-contamination
    detection): the same distinct-8-gram machinery as overlap_dup_pairs,
    but each qualifying pair also reports WHICH side is contained —
    cont_a = |∩|/|A|, cont_b = |∩|/|B| (metric="containment").  A short
    doc quoted inside a long one shows cont_short ≈ 1 with cont_long
    small; the symmetric scores erase that direction."""
    import ray.data as rd

    from webval.dedup import ngram_all_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def assert_ascii(b: pa.Table) -> pa.Table:
        col = b.column("text")
        mism = pc.sum(pc.cast(pc.not_equal(
            pc.utf8_length(col), pc.binary_length(col)),
            pa.int64())).as_py()
        if mism:
            raise AssertionError(
                f"{mism} non-ASCII docs: byte-window shingles no longer "
                "match the SQL twin's character windows")
        return b

    ds = ds.map_batches(assert_ascii, batch_format="pyarrow")
    t = ds_to_table(
        ngram_all_pairs(ds, "doc_id", "text", window=8, threshold=0.5,
                        metric="containment", score_col="overlap"),
        empty_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                ("overlap", pa.float64()),
                                ("cont_a", pa.float64()),
                                ("cont_b", pa.float64())]))
    return _round_cols(t, {"overlap": 4, "cont_a": 4, "cont_b": 4})


SQL_CONTAINMENT_PAIRS = """
WITH pos AS (SELECT CAST(i AS INT) AS i FROM range(1, 8192) t(i)),
sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 8) AS g
  FROM documents, pos
  WHERE text IS NOT NULL AND length(text) >= 8 AND i <= length(text) - 7
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(i * 1.0 / least(sa.n, sb.n), 4) AS overlap,
       round(i * 1.0 / sa.n, 4) AS cont_a,
       round(i * 1.0 / sb.n, 4) AS cont_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / least(sa.n, sb.n) >= 0.5
"""


def q_logreg_scores(sf_dir: str):
    """Classifier INFERENCE at query level: train the 2-step hashed
    logreg (same recipe as quality_logreg), score EVERY doc in one
    broadcast pass — p = sigmoid(mean w[f] over its feature occurrences,
    the length-normalized logit; the raw sum saturates with doc size) —
    and report the per-lang document count and mean probability (the
    score-lift-by-slice view).  The documents fixture shares ONE
    vocabulary across langs (measured: per-lang means differ only at
    1e-4), so no ranking claim is made — the in-query assert pins that
    the probabilities are non-degenerate (all in (0,1), not all equal
    at 6 decimals).  No thresholds or histogram floors, so the twin
    needs no boundary-margin precondition — only the round(6)."""
    import ray

    import ray.data as rd

    from webval.textstats import _dsir_doc_features, logreg_fit_hashed

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def en_mask(t: pa.Table):
        return np.asarray(
            pc.equal(t.column("lang").combine_chunks(), "en")
            .to_numpy(zero_copy_only=False), dtype=bool)

    B = 64
    w = logreg_fit_hashed(ds, "text", en_mask, n_buckets=B, n_iter=2,
                          lr=0.5)
    w_ref = ray.put(w)

    def lang_partial(t: pa.Table) -> pa.Table:
        cur = ray.get(w_ref)
        feats, docs = _dsir_doc_features(t.column("text"), B)
        s = np.zeros(t.num_rows, np.float64)
        np.add.at(s, docs, cur[feats])
        nf = np.bincount(docs, minlength=t.num_rows)
        p = 1.0 / (1.0 + np.exp(-(s / nf)))
        tab = pa.table({"lang": t.column("lang"),
                        "p": pa.array(p, pa.float64())})
        agg = tab.group_by(["lang"]).aggregate([("p", "sum"),
                                                ("p", "count")])
        return agg.rename_columns(["lang", "p_sum", "n"])

    parts = ds.map_batches(lang_partial,
                           batch_format="pyarrow").materialize()
    sums: dict = {}
    ns: dict = {}
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for lg, psum, cnt in zip(b.column("lang").to_pylist(),
                                 b.column("p_sum").to_pylist(),
                                 b.column("n").to_pylist()):
            sums[lg] = sums.get(lg, 0.0) + psum
            ns[lg] = ns.get(lg, 0) + int(cnt)
    langs = sorted(ns)
    mean_p = {lg: sums[lg] / ns[lg] for lg in langs}
    vals = [round(v, 6) for v in mean_p.values()]
    if not all(0.0 < v < 1.0 for v in vals) or len(set(vals)) < 2:
        raise AssertionError(
            "logreg_scores: degenerate per-lang probabilities "
            f"{mean_p} — the inference pass lost its signal")
    t = pa.table({"lang": pa.array(langs, pa.string()),
                  "n_docs": pa.array([ns[lg] for lg in langs], pa.int64()),
                  "mean_p": pa.array([mean_p[lg] for lg in langs],
                                     pa.float64())})
    return _round_cols(t, {"mean_p": 6})


SQL_LOGREG_SCORES = _LOGREG_CTE + """
, s2 AS (SELECT h.doc_id, sum(w2.w) / count(*) AS sc
         FROM hashed h JOIN w2 USING (f) GROUP BY h.doc_id),
p2 AS (SELECT doc_id, 1 / (1 + exp(-sc)) AS p FROM s2)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(p.p) / count(*), 6) AS mean_p
FROM p2 p JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""


def q_selection_coverage(sf_dir: str):
    """Selection-quality EVALUATION: what fraction of the target slice's
    vocabulary does the DSIR-selected subset cover?  Selected = the same
    100-doc Gumbel-top-k as dsir_resample; target vocab = distinct
    tokens of 'en' docs.  One tokenizing pass tags each token occurrence
    with (in_target_doc, in_selected_doc), one exchange ORs the flags
    per distinct token, and the driver sums three block-local counters —
    nothing token-set-sized concentrates.  Coverage is one exact int/int
    division (emitted unrounded, same IEEE op both engines)."""
    import ray

    import ray.data as rd

    from webval.exchange import grouped_agg, sum_block_scalars
    from webval.pipelines import gumbel_topk_sample
    from webval.textstats import dsir_importance

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def en_mask(t: pa.Table):
        return np.asarray(
            pc.equal(t.column("lang").combine_chunks(), "en")
            .to_numpy(zero_copy_only=False), dtype=bool)

    scored = dsir_importance(ds, "doc_id", "text", en_mask, n_buckets=256)
    keyed = scored.map_batches(
        lambda t: t.append_column(
            "logit", pc.divide(t.column("dsir_w"), 0.05)),
        batch_format="pyarrow")
    top = gumbel_topk_sample(keyed, "doc_id", "logit", 100, min_gap=1e-9)
    sel_ref = ray.put(top.column("doc_id").combine_chunks())

    def token_flags(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_tok = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc_of = np.repeat(np.arange(t.num_rows), n_tok)
        is_en = en_mask(t)[doc_of]
        is_sel = np.asarray(
            pc.is_in(t.column("doc_id").combine_chunks(),
                     value_set=ray.get(sel_ref))
            .to_numpy(zero_copy_only=False), bool)[doc_of]
        tab = pa.table({"tok": toks.values,
                        "in_tgt": pa.array(is_en),
                        "in_sel": pa.array(is_sel)})
        # per-batch combiner: OR the flags per distinct token
        agg = tab.group_by(["tok"]).aggregate([("in_tgt", "max"),
                                               ("in_sel", "max")])
        return agg.rename_columns(["tok", "in_tgt", "in_sel"])

    flags = grouped_agg(
        ds.map_batches(token_flags, batch_format="pyarrow"),
        ["tok"], [("in_tgt", "max"), ("in_sel", "max")],
        rename={"in_tgt_max": "in_tgt", "in_sel_max": "in_sel"})

    def count_partial(t: pa.Table) -> pa.Table:
        tgt = t.column("in_tgt").to_numpy(zero_copy_only=False)
        sel = t.column("in_sel").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_tgt": pa.array([int(tgt.sum())], pa.int64()),
            "n_cov": pa.array([int((tgt & sel).sum())], pa.int64())})

    mat = flags.map_batches(count_partial,
                            batch_format="pyarrow").materialize()
    tot = sum_block_scalars(mat, ["n_tgt", "n_cov"])
    n_tgt, n_cov = tot["n_tgt"], tot["n_cov"]
    if not 0 < n_cov <= n_tgt:
        raise AssertionError(
            f"selection_coverage: degenerate counts {tot}")
    return pa.table({
        "n_target_vocab": pa.array([n_tgt], pa.int64()),
        "n_covered": pa.array([n_cov], pa.int64()),
        "coverage": pa.array([n_cov / n_tgt], pa.float64())})


SQL_SELECTION_COVERAGE = _DSIR_CTE + """
, g AS (SELECT doc_id,
               (sw / nf) / 0.05
               - ln(-ln(((doc_id * 2246822519) % 4294967296 + 0.5)
                        / 4294967296.0)) AS gk
        FROM w),
sel AS (SELECT doc_id FROM g ORDER BY gk DESC LIMIT 100),
tok AS (SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS tok
        FROM documents),
flags AS (SELECT tok,
                 max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS in_tgt,
                 max(CASE WHEN doc_id IN (SELECT doc_id FROM sel)
                          THEN 1 ELSE 0 END) AS in_sel
          FROM tok GROUP BY tok)
SELECT CAST(sum(in_tgt) AS BIGINT) AS n_target_vocab,
       CAST(sum(in_tgt * in_sel) AS BIGINT) AS n_covered,
       CAST(sum(in_tgt * in_sel) AS DOUBLE) / sum(in_tgt) AS coverage
FROM flags
"""


QUERIES = {
    "column_stats": (q_column_stats, SQL_COLUMN_STATS),
    "grouped_stats": (q_grouped_stats, SQL_GROUPED_STATS),
    "lang_freq": (q_lang_freq, SQL_LANG_FREQ),
    "null_rates": (q_null_rates, SQL_NULL_RATES),
    "range_violations": (q_range_violations, SQL_RANGE_VIOLATIONS),
    "domain_violations": (q_domain_violations, SQL_DOMAIN_VIOLATIONS),
    "regex_filter": (q_regex_filter, SQL_REGEX_FILTER),
    "unique_violations": (q_unique_violations, SQL_UNIQUE_VIOLATIONS),
    "referential_orphans": (q_referential_orphans, SQL_REFERENTIAL_ORPHANS),
    "links_orphans": (q_links_orphans, SQL_LINKS_ORPHANS),
    "webpage_url_violations": (q_webpage_url_violations, SQL_WEBPAGE_URL_VIOLATIONS),
    "webpage_dup_urls": (q_webpage_dup_urls, SQL_WEBPAGE_DUP_URLS),
    "exact_dup_groups": (q_exact_dup_groups, SQL_EXACT_DUP_GROUPS),
    "minhash_clusters": (q_minhash_clusters, SQL_MINHASH_CLUSTERS),
    "minhash_clusters_sketch": (q_minhash_clusters_sketch,
                                SQL_MINHASH_CLUSTERS_SKETCH),
    "top_langs": (q_top_langs, SQL_TOP_LANGS),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "token_totals": (q_token_totals, SQL_TOKEN_TOTALS),
    "doc_len_by_source": (q_doc_len_by_source, SQL_DOC_LEN_BY_SOURCE),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    # rows-only (sketches / model-backed / report-shaped)
    "quantiles_tdigest": (q_quantiles, SQL_QUANTILES_TDIGEST),
    "approx_distinct_hll": (q_approx_distinct, SQL_APPROX_DISTINCT),
    "schema_build": (q_schema_build, SQL_SCHEMA_BUILD),
    "contrast_drift": (q_contrast, SQL_CONTRAST_DRIFT),
    "langid": (q_langid, SQL_LANGID),
    "quality_scores": (q_quality, SQL_QUALITY),
    "extraction_parity": (q_extraction, SQL_EXTRACTION_PARITY),
    "simhash_pairs": (q_simhash_pairs, SQL_SIMHASH_PAIRS),
    "ngram_dup_pairs": (q_ngram_dup_pairs, SQL_NGRAM_DUP_PAIRS),
    "warc_read": (q_warc_read, SQL_WARC_READ),
    "heavy_hitter_langs": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "ivf_topk": (q_ivf_topk, SQL_ANN_TOPK),
    "curation_e2e": (q_curation_e2e, SQL_CURATION_E2E),
    "embedding_dups": (q_embedding_dups, SQL_EMBEDDING_DUPS),
    "media_features": (q_media_features, SQL_MEDIA_FEATURES),
    "grouped_quantiles": (q_grouped_quantiles, SQL_GROUPED_QUANTILES),
    "sampled_profile": (q_sampled_profile, SQL_SAMPLED_PROFILE),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "union_shards": (q_union_shards, SQL_UNION_SHARDS),
    "windowed_agg": (q_windowed_agg, SQL_WINDOWED_AGG),
    "normalize_types": (q_normalize_types, SQL_NORMALIZE_TYPES),
    "partition_nulls": (q_partition_nulls, SQL_PARTITION_NULLS),
    "ann_index_topk": (q_ann_index_topk, SQL_ANN_INDEX_TOPK),
    "pii_redaction": (q_pii_redaction, SQL_PII_REDACTION),
    "url_canonical": (q_url_canonical, SQL_URL_CANONICAL),
    "c4_quality": (q_c4_quality, SQL_C4_QUALITY),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "filtered_read": (q_filtered_read, SQL_FILTERED_READ),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "grouped_exact_quantiles": (q_grouped_exact_quantiles,
                                SQL_GROUPED_EXACT_QUANTILES),
    "grouped_cont_quantiles": (q_grouped_cont_quantiles,
                               SQL_GROUPED_CONT_QUANTILES),
    "top_docs_per_lang": (q_top_docs_per_lang, SQL_TOP_DOCS_PER_LANG),
    "revenue_by_region": (q_revenue_by_region, SQL_REVENUE_BY_REGION),
    "hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "kmeans_clusters": (q_kmeans_clusters, SQL_KMEANS_CLUSTERS),
    "pca_embeddings": (q_pca_embeddings, SQL_PCA_EMBEDDINGS),
    "orders_by_segment": (q_orders_by_segment, SQL_ORDERS_BY_SEGMENT),
    "rollup_lineitem": (q_rollup_lineitem, SQL_ROLLUP_LINEITEM),
    "pivot_chars_by_lang": (q_pivot_chars_by_lang, SQL_PIVOT_CHARS_BY_LANG),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "pagerank_links": (q_pagerank_links, SQL_PAGERANK_LINKS),
    "link_components": (q_link_components, SQL_LINK_COMPONENTS),
    "window_functions": (q_window_functions, SQL_WINDOW_FUNCTIONS),
    "cube_orders": (q_cube_orders, SQL_CUBE_ORDERS),
    "grouping_sets_orders": (q_grouping_sets, SQL_GROUPING_SETS),
    "intersect_custkeys": (q_intersect_custkeys, SQL_INTERSECT_CUSTKEYS),
    "corr_by_returnflag": (q_corr_by_returnflag, SQL_CORR_BY_RETURNFLAG),
    "boilerplate_removal": (q_boilerplate_removal, SQL_BOILERPLATE_REMOVAL),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "distinct_suppliers_by_flag": (q_distinct_suppliers_by_flag,
                                   SQL_DISTINCT_SUPPLIERS),
    "fixed_size_sample": (q_fixed_size_sample, SQL_FIXED_SIZE_SAMPLE),
    "doc_repetition": (q_doc_repetition, SQL_DOC_REPETITION),
    "chunk_text": (q_chunk_text, SQL_CHUNK_TEXT),
    "contamination": (q_contamination, SQL_CONTAMINATION),
    "curation_v2": (q_curation_v2, SQL_CURATION_V2),
    "except_orderkeys": (q_except_orderkeys, SQL_EXCEPT_ORDERKEYS),
    "lm_quality": (q_lm_quality, SQL_LM_QUALITY),
    "conditional_violations": (q_conditional_violations,
                               SQL_CONDITIONAL_VIOLATIONS),
    "iqr_outliers": (q_iqr_outliers, SQL_IQR_OUTLIERS),
    "check_pass_rates": (q_check_pass_rates, SQL_CHECK_PASS_RATES),
    "frequent_bigrams": (q_frequent_bigrams, SQL_FREQUENT_BIGRAMS),
    "lm_buckets": (q_lm_buckets, SQL_LM_BUCKETS),
    "dup_substrings": (q_dup_substrings, SQL_DUP_SUBSTRINGS),
    "media_dimensions": (q_media_dimensions, SQL_MEDIA_DIMENSIONS),
    "link_degrees": (q_link_degrees, SQL_LINK_DEGREES),
    "standardize": (q_standardize, SQL_STANDARDIZE),
    "dedup_keep_latest": (q_dedup_keep_latest, SQL_DEDUP_KEEP_LATEST),
    "embedding_centroids": (q_embedding_centroids, SQL_EMBEDDING_CENTROIDS),
    "funnel": (q_funnel, SQL_FUNNEL),
    "bm25_search": (q_bm25_search, SQL_BM25_SEARCH),
    "table_diff": (q_table_diff, SQL_TABLE_DIFF),
    "reconcile": (q_reconcile, SQL_RECONCILE),
    "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "unpivot_measures": (q_unpivot, SQL_UNPIVOT),
    "lang_entropy": (q_lang_entropy, SQL_LANG_ENTROPY),
    "grouped_approx_distinct": (q_grouped_approx_distinct,
                                SQL_GROUPED_APPROX_DISTINCT),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "kmeans_sql": (q_kmeans_sql, SQL_KMEANS_SQL),
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "semdedup_prune": (q_semdedup_prune, SQL_SEMDEDUP_PRUNE),
    "leakage_safe_split": (q_leakage_safe_split,
                           SQL_LEAKAGE_SAFE_SPLIT),
    "cdc_chunks": (q_cdc_chunks, SQL_CDC_CHUNKS),
    "quality_logreg": (q_quality_logreg, SQL_QUALITY_LOGREG),
    "logreg_scores": (q_logreg_scores, SQL_LOGREG_SCORES),
    "dsir_resample": (q_dsir_resample, SQL_DSIR_RESAMPLE),
    "selection_coverage": (q_selection_coverage,
                           SQL_SELECTION_COVERAGE),
    "containment_pairs": (q_containment_pairs,
                          SQL_CONTAINMENT_PAIRS),
    "fetch_gaps": (q_fetch_gaps, SQL_FETCH_GAPS),
    "normalize_unicode": (q_normalize_unicode, SQL_NORMALIZE_UNICODE),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "js_drift": (q_js_drift, SQL_JS_DRIFT),
    "cramers_v": (q_cramers_v, SQL_CRAMERS_V),
    "monotonic_violations": (q_monotonic_violations,
                             SQL_MONOTONIC_VIOLATIONS),
    "session_stats": (q_session_stats, SQL_SESSION_STATS),
    "freshness": (q_freshness, SQL_FRESHNESS),
    "histogram_fixed": (q_histogram_fixed, SQL_HISTOGRAM_FIXED),
    "jsonl_read": (q_jsonl_read, SQL_DOCS_BY_LANG),
    "csv_read": (q_csv_read, SQL_DOCS_BY_LANG),
    "corr_matrix": (q_corr_matrix, SQL_CORR_MATRIX),
    "mad_outliers": (q_mad_outliers, SQL_MAD_OUTLIERS),
    "hourly_complete": (q_hourly_complete, SQL_HOURLY_COMPLETE),
    "host_freq": (q_host_freq, SQL_HOST_FREQ),
    "mode_by_group": (q_mode_by_group, SQL_MODE_BY_GROUP),
    "retention": (q_retention, SQL_RETENTION),
    "vocab_drift": (q_vocab_drift, SQL_VOCAB_DRIFT),
    "rare_collapse": (q_rare_collapse, SQL_RARE_COLLAPSE),
    "hourly_anomalies": (q_hourly_anomalies, SQL_HOURLY_ANOMALIES),
    "dow_hour_profile": (q_dow_hour_profile, SQL_DOW_HOUR_PROFILE),
    "temperature_mix": (q_temperature_mix, SQL_TEMPERATURE_MIX),
    "degree_histogram": (q_degree_histogram, SQL_DEGREE_HISTOGRAM),
    "peak_fetch_rate": (q_peak_fetch_rate, SQL_PEAK_FETCH_RATE),
    "title_stats": (q_title_stats, SQL_TITLE_STATS),
    "rolling_active_users": (q_rolling_active_users,
                             SQL_ROLLING_ACTIVE_USERS),
    "split_assign": (q_split_assign, SQL_SPLIT_ASSIGN),
    "zipf_fit": (q_zipf_fit, SQL_ZIPF_FIT),
    "normalized_dup_groups": (q_normalized_dup_groups,
                              SQL_NORMALIZED_DUP_GROUPS),
    "ks_drift": (q_ks_drift, SQL_KS_DRIFT),
    "audio_stats": (q_audio_stats, SQL_AUDIO_STATS),
    "grouped_regression": (q_grouped_regression, SQL_GROUPED_REGRESSION),
    "weighted_avg": (q_weighted_avg, SQL_WEIGHTED_AVG),
    "triangles": (q_triangles, SQL_TRIANGLES),
    "geo_mean": (q_geo_mean, SQL_GEO_MEAN),
    "gini_hosts": (q_gini_hosts, SQL_GINI_HOSTS),
    "benford_digits": (q_benford_digits, SQL_BENFORD_DIGITS),
    "cusum_changepoint": (q_cusum_changepoint, SQL_CUSUM_CHANGEPOINT),
    "lag1_autocorr": (q_lag1_autocorr, SQL_LAG1_AUTOCORR),
    "mutual_info": (q_mutual_info, SQL_MUTUAL_INFO),
    "winsorized_stats": (q_winsorized_stats, SQL_WINSORIZED_STATS),
    "equidepth_hist": (q_equidepth_hist, SQL_EQUIDEPTH_HIST),
    "group_sample": (q_group_sample, SQL_GROUP_SAMPLE),
    "hll_setops": (q_hll_setops, SQL_HLL_SETOPS),
    "impute_mode": (q_impute_mode, SQL_IMPUTE_MODE),
    "transition_counts": (q_transition_counts, SQL_TRANSITION_COUNTS),
    "wasserstein_drift": (q_wasserstein_drift, SQL_WASSERSTEIN_DRIFT),
    "pmi_bigrams": (q_pmi_bigrams, SQL_PMI_BIGRAMS),
    "event_type_lift": (q_event_type_lift, SQL_EVENT_TYPE_LIFT),
    "dup_cluster_sizes": (q_dup_cluster_sizes, SQL_DUP_CLUSTER_SIZES),
    "quality_top_fraction": (q_quality_top_fraction,
                             SQL_QUALITY_TOP_FRACTION),
    "fd_multi_lang_hosts": (q_fd_multi_lang_hosts,
                            SQL_FD_MULTI_LANG_HOSTS),
    "category_codes": (q_category_codes, SQL_CATEGORY_CODES),
    "grouped_skew_kurt": (q_grouped_skew_kurt, SQL_GROUPED_SKEW_KURT),
    "interval_coverage": (q_interval_coverage, SQL_INTERVAL_COVERAGE),
    "fuzzy_part_names": (q_fuzzy_part_names, SQL_FUZZY_PART_NAMES),
    "full_outer_join": (q_full_outer_join, SQL_FULL_OUTER_JOIN),
    "orc_read": (q_orc_read, SQL_DOCS_BY_LANG),
    "ipc_read": (q_ipc_read, SQL_DOCS_BY_LANG),
    "dedup_weights": (q_dedup_weights, SQL_DEDUP_WEIGHTS),
    "pmi_collocations": (q_pmi_collocations, SQL_PMI_COLLOCATIONS),
    "benford_audit": (q_benford_audit, SQL_BENFORD_AUDIT),
    "json_key_profile": (q_json_key_profile, SQL_JSON_KEY_PROFILE),
    "mahalanobis_outliers": (q_mahalanobis_outliers,
                             SQL_MAHALANOBIS_OUTLIERS),
    "cluster_canonicals": (q_cluster_canonicals, SQL_CLUSTER_CANONICALS),
    "concat_packing": (q_concat_packing, SQL_CONCAT_PACKING),
    "path_prefix_rollup": (q_path_prefix_rollup, SQL_PATH_PREFIX_ROLLUP),
    "cocitation": (q_cocitation, SQL_COCITATION),
    "plan_shards": (q_plan_shards, SQL_PLAN_SHARDS),
    "shrunk_host_quality": (q_shrunk_host_quality,
                            SQL_SHRUNK_HOST_QUALITY),
    "blocklist_counts": (q_blocklist_counts, SQL_BLOCKLIST_COUNTS),
    "host_gini": (q_host_gini, SQL_HOST_GINI),
    "cusum_drift": (q_cusum_drift, SQL_CUSUM_DRIFT),
    "vocab_growth": (q_vocab_growth, SQL_VOCAB_GROWTH),
    "user_freshness": (q_user_freshness, SQL_USER_FRESHNESS),
    "key_candidates": (q_key_candidates, SQL_KEY_CANDIDATES),
    "format_inference": (q_format_inference, SQL_FORMAT_INFERENCE),
    "script_mix": (q_script_mix, SQL_SCRIPT_MIX),
    "ols_fit": (q_ols_fit, SQL_OLS_FIT),
    "rrf_hosts": (q_rrf_hosts, SQL_RRF_HOSTS),
    "rbo_stability": (q_rbo_stability, SQL_RBO_STABILITY),
    "peak_rate": (q_peak_rate, SQL_PEAK_RATE),
    "rebalance_sample": (q_rebalance_sample, SQL_REBALANCE_SAMPLE),
    "event_rules": (q_event_rules, SQL_EVENT_RULES),
    "ppr_hosts": (q_ppr_hosts, SQL_PPR_HOSTS),
    "tukey_outliers": (q_tukey_outliers, SQL_TUKEY_OUTLIERS),
    "blocking_quality": (q_blocking_quality, SQL_BLOCKING_QUALITY),
    "pythagorean_means": (q_pythagorean_means, SQL_PYTHAGOREAN_MEANS),
    "index_search": (q_index_search, SQL_BM25_SEARCH),
    "rolling_zscore": (q_rolling_zscore, SQL_ROLLING_ZSCORE),
    "winsorized_mean": (q_winsorized_mean, SQL_WINSORIZED_MEAN),
    "negative_edges": (q_negative_edges, SQL_NEGATIVE_EDGES),
    "cap_per_host": (q_cap_per_host, SQL_CAP_PER_HOST),
    "lang_vocab_cosine": (q_lang_vocab_cosine, SQL_LANG_VOCAB_COSINE),
    "daily_autocorr": (q_daily_autocorr, SQL_DAILY_AUTOCORR),
    "curation_funnel": (q_curation_funnel, SQL_CURATION_FUNNEL),
    "parquet_layout": (q_parquet_layout, SQL_PARQUET_LAYOUT),
    "split_balance": (q_split_balance, SQL_SPLIT_BALANCE),
    "value_patterns": (q_value_patterns, SQL_VALUE_PATTERNS),
    "join_size": (q_join_size, SQL_JOIN_SIZE),
    "fd_violations": (q_fd_violations, SQL_FD_VIOLATIONS),
    "sliced_drift": (q_sliced_drift, SQL_SLICED_DRIFT),
    "order_reconciliation": (q_order_reconciliation,
                             SQL_ORDER_RECONCILIATION),
    "revenue_by_segment": (q_revenue_by_segment,
                           SQL_REVENUE_BY_SEGMENT),
    "id_continuity": (q_id_continuity, SQL_ID_CONTINUITY),
    "truncation_audit": (q_truncation_audit, SQL_TRUNCATION_AUDIT),
    "null_blocks": (q_null_blocks, SQL_NULL_BLOCKS),
    "k_anonymity": (q_k_anonymity, SQL_K_ANONYMITY),
    "ewma_smooth": (q_ewma_smooth, SQL_EWMA_SMOOTH),
    "cms_host_freq": (q_cms_host_freq, SQL_CMS_HOST_FREQ),
    "reciprocity": (q_reciprocity, SQL_RECIPROCITY),
    "validity_intervals": (q_validity_intervals, SQL_VALIDITY_INTERVALS),
    "event_debounce": (q_event_debounce, SQL_EVENT_DEBOUNCE),
    "rank_auc": (q_rank_auc, SQL_RANK_AUC),
    "trimmed_mean": (q_trimmed_mean, SQL_TRIMMED_MEAN),
    "minmax_scale": (q_minmax_scale, SQL_MINMAX_SCALE),
    "readability": (q_readability, SQL_READABILITY),
    "dup_share_by_host": (q_dup_share_by_host, SQL_DUP_SHARE_BY_HOST),
    "assortativity": (q_assortativity, SQL_ASSORTATIVITY),
    "media_sniff": (q_media_sniff, SQL_MEDIA_SNIFF),
    "score_lift": (q_score_lift, SQL_SCORE_LIFT),
    "jw_part_names": (q_jw_part_names, SQL_JW_PART_NAMES),
    "budget_allocation": (q_budget_allocation, SQL_BUDGET_ALLOCATION),
    "bigram_lm_quality": (q_bigram_lm_quality, SQL_BIGRAM_LM_QUALITY),
    "interpolate_gaps": (q_interpolate_gaps, SQL_INTERPOLATE_GAPS),
    "overlap_dup_pairs": (q_overlap_dup_pairs, SQL_OVERLAP_DUP_PAIRS),
    "kappa_quality": (q_kappa_quality, SQL_KAPPA_QUALITY),
    "null_cooccurrence": (q_null_cooccurrence, SQL_NULL_COOCCURRENCE),
    "event_paths": (q_event_paths, SQL_EVENT_PATHS),
    "calibration_bins": (q_calibration_bins, SQL_CALIBRATION_BINS),
    "brier_ece": (q_brier_ece, SQL_BRIER_ECE),
    "survival_curve": (q_survival_curve, SQL_SURVIVAL_CURVE),
    "embedding_quantization": (q_embedding_quantization,
                               SQL_EMBEDDING_QUANTIZATION),
    "ttr_by_lang": (q_ttr_by_lang, SQL_TTR_BY_LANG),
    "burstiness_by_user": (q_burstiness_by_user, SQL_BURSTINESS_BY_USER),
    "markov_anomaly": (q_markov_anomaly, SQL_MARKOV_ANOMALY),
    "pareto_customers": (q_pareto_customers, SQL_PARETO_CUSTOMERS),
    "bh_drift": (q_bh_drift, SQL_BH_DRIFT),
    "entity_clusters": (q_entity_clusters, SQL_ENTITY_CLUSTERS),
    "rank_corr": (q_rank_corr, SQL_RANK_CORR),
    "theils_u": (q_theils_u, SQL_THEILS_U),
    "weighted_median": (q_weighted_median, SQL_WEIGHTED_MEDIAN),
    "kcore": (q_kcore, SQL_KCORE),
    "jl_projection": (q_jl_projection, SQL_JL_PROJECTION),
    "theilsen_slope": (q_theilsen_slope, SQL_THEILSEN_SLOPE),
    "host_p95_chars": (q_host_p95_chars, SQL_HOST_P95_CHARS),
    "partition_pruned_read": (q_partition_pruned_read, SQL_PARTITION_PRUNED_READ),
    "bloom_blocklist": (q_bloom_blocklist, SQL_BLOOM_BLOCKLIST),
    "url_rule_match": (q_url_rule_match, SQL_URL_RULE_MATCH),
    "term_enrichment": (q_term_enrichment, SQL_TERM_ENRICHMENT),
    "simpson_audit": (q_simpson_audit, SQL_SIMPSON_AUDIT),
    "chao1_richness": (q_chao1_richness, SQL_CHAO1_RICHNESS),
    "redirect_chains": (q_redirect_chains, SQL_REDIRECT_CHAINS),
    "grouped_mad": (q_grouped_mad, SQL_GROUPED_MAD),
    "activity_streaks": (q_activity_streaks, SQL_ACTIVITY_STREAKS),
    "daily_hindex": (q_daily_hindex, SQL_DAILY_HINDEX),
    "cell_residuals": (q_cell_residuals, SQL_CELL_RESIDUALS),
    "period_movers": (q_period_movers, SQL_PERIOD_MOVERS),
    "mw_drift": (q_mw_drift, SQL_MW_DRIFT),
    "anova_f": (q_anova_f, SQL_ANOVA_F),
    "hour_entropy": (q_hour_entropy, SQL_HOUR_ENTROPY),
    "snm_pairs": (q_snm_pairs, SQL_SNM_PAIRS),
    "hill_tail": (q_hill_tail, SQL_HILL_TAIL),
    "log_odds_terms": (q_log_odds_terms, SQL_LOG_ODDS_TERMS),
    "welch_drift": (q_welch_drift, SQL_WELCH_DRIFT),
    "fd_strength": (q_fd_strength, SQL_FD_STRENGTH),
    "correlated_hosts": (q_correlated_hosts, SQL_CORRELATED_HOSTS),
    "embedding_clusters": (q_embedding_clusters, SQL_EMBEDDING_CLUSTERS),
    "hits_links": (q_hits_links, SQL_HITS_LINKS),
    "novelty_hosts": (q_novelty_hosts, SQL_NOVELTY_HOSTS),
    "bigram_entropy": (q_bigram_entropy, SQL_BIGRAM_ENTROPY),
    "peak_concurrency": (q_peak_concurrency, SQL_PEAK_CONCURRENCY),
}
