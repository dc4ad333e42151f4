"""Local driver-mimic: run every __ray_entry__ query at a given sf and
compare against its oracle SQL via DuckDB — row count, sorted-column schema,
and order-insensitive value hash — the same gate the driver applies.

Usage: python tools/check_oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        return "empty"
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply(lambda r: "|".join(r), axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"ERROR  {name}: {type(ex).__name__}: {ex}")
            continue
        if name not in sqls:
            print(f"rows-only  {name}: rows={len(got)} cols={sorted(got.columns)}")
            continue
        # synth-backed oracle SQL embeds the driver's sf0.01 fixture path;
        # retarget it when checking another sf (ADVICE r1) — queries() has
        # already ensured the fixture for sf_dir exists
        from webval.queries import SYNTH_ROOT
        sfname = os.path.basename(os.path.normpath(sf_dir))
        sql = sqls[name].replace(f"{SYNTH_ROOT}/sf0.01",
                                 f"{SYNTH_ROOT}/{sfname}")
        # same retarget for twins that read testdata files directly
        # (e.g. parquet_metadata footer audits)
        sql = sql.replace("/root/testdata/sf0.01", sf_dir.rstrip("/"))
        want = con.execute(sql).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = value_hash(got) == value_hash(want) if ok_cols else False
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} hash_ok={ok_hash}")
        if status == "FAIL" and ok_cols:
            merged = None
            try:
                cols = sorted(got.columns)
                a = got[cols].astype(str).value_counts()
                b = want[cols].astype(str).value_counts()
                diff = a.subtract(b, fill_value=0)
                diff = diff[diff != 0]
                print("   value diff (got-want):")
                print(diff.head(6).to_string())
            except Exception:
                pass
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
