"""One-command driver-contract self-check: what the round driver will do,
in miniature — init Ray, import __ray_entry__, run entry(), spot-run a few
queries, and confirm every oracle key has a query.  Exits non-zero on any
failure.

Usage: python tools/driver_preflight.py [sf_dir] [query ...]
       (default sf_dir /root/testdata/sf0.001; default queries = a fixed
       spot-check spanning exchange / join / regex / sketch paths)
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray WORKER processes do not inherit the driver's sys.path — when this
# tool runs from outside the repo, workers must still import webval, so
# export PYTHONPATH before ray.init (workers inherit env vars)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)

SPOT = ["column_stats", "sessionize", "minhash_clusters", "host_freq",
        "retention", "cusum_changepoint"]


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or SPOT

    import pandas as pd

    import __ray_entry__ as e

    r = e.entry()
    df = r.to_pandas() if hasattr(r, "to_pandas") \
        and not isinstance(r, pd.DataFrame) else r
    assert len(df) > 0 and len(df.columns) > 0, "entry() empty"
    print(f"entry(): {len(df)} rows, cols {list(df.columns)}")

    qs, sqls = e.queries(), e.oracle_sql()
    bad = [k for k, s in sqls.items()
           if not isinstance(s, str) or not s.strip()]
    assert not bad, f"empty/non-string oracle SQL: {bad}"
    assert all(callable(f) for f in qs.values())
    print(f"queries: {len(qs)}  oracles: {len(sqls)}  "
          f"rows-only: {sorted(set(qs) - set(sqls))}")

    rc = 0
    for name in names:
        try:
            out = qs[name](sf_dir)
            if isinstance(out, pd.DataFrame):     # check FIRST — DataFrame
                n = len(out)                      # also has a .count method
            elif hasattr(out, "num_rows"):        # pyarrow Table
                n = out.num_rows
            else:                                 # ray Dataset
                n = out.count()
            print(f"OK  {name}: {n} rows")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            rc = 1
    ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
