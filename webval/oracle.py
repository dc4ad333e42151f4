"""Pure-Python/pandas "rdv-semantics oracle" (SURVEY.md §5.1).

Mirrors the reference's single-process exact algorithms — row-loop check,
exact stats build [rdv:Schema.build/check, UNVERIFIED — reference checkout
empty] — on small frames, so the Ray engine has a bit-exact target:
verdicts/violations must match EXACTLY; sketch stats (quantiles, distinct)
match within documented tolerance.  Never used in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from webval.schema import CheckSpec


def build_stats_oracle(df: pd.DataFrame) -> dict[str, dict]:
    """Exact per-column stats, rdv NumericStats/CategoricStats semantics:
    min/max/mean/std(ddof=0)/pinv + percentiles[0..100] for numerics,
    frequencies + pinv for strings."""
    out: dict[str, dict] = {}
    for col in df.columns:
        s = df[col]
        d: dict = {"count": len(s), "null_count": int(s.isna().sum())}
        d["pinv"] = d["null_count"] / len(s) if len(s) else 0.0
        if pd.api.types.is_numeric_dtype(s) or pd.api.types.is_datetime64_any_dtype(s):
            v = (s.astype("int64") if pd.api.types.is_datetime64_any_dtype(s)
                 else s).dropna().astype(float).to_numpy()
            if len(v):
                d.update(min=float(v.min()), max=float(v.max()),
                         mean=float(v.mean()), std=float(v.std(ddof=0)),
                         percentiles=[float(np.percentile(v, p)) for p in range(101)],
                         distinct=int(len(np.unique(v))))
        else:
            vc = s.dropna().value_counts()
            d["frequencies"] = {str(k): int(c) for k, c in vc.items()}
            d["distinct"] = int(len(vc))
        out[col] = d
    return out


def check_row_oracle(row: dict, checks: list[CheckSpec]) -> list[str]:
    """rdv Schema.check on one row → list of failed check names (the *-err
    tags).  Null semantics identical to checks.check_mask: nulls pass
    range/domain/regex, fail not_null."""
    failed = []
    for c in checks:
        v = row.get(c.column)
        is_null = v is None or (isinstance(v, float) and np.isnan(v))
        if c.kind == "not_null":
            if is_null:
                failed.append(c.name)
            continue
        if is_null:
            continue
        if c.kind == "range":
            if not (c.params["min"] <= v <= c.params["max"]):
                failed.append(c.name)
        elif c.kind == "domain":
            if v not in c.params["values"]:
                failed.append(c.name)
        elif c.kind == "regex":
            if not re.search(c.params["pattern"], v):
                failed.append(c.name)
    return failed


def check_frame_oracle(df: pd.DataFrame, checks: list[CheckSpec]) -> pd.DataFrame:
    """Row-loop over the frame → DataFrame[pass, failed_checks] aligned with
    the input — the exact-parity target for checks.check_dataset."""
    row_checks = [c for c in checks if c.kind in ("range", "domain", "regex", "not_null")]
    fails = [check_row_oracle(r, row_checks) for r in df.to_dict("records")]
    return pd.DataFrame({"pass": [not f for f in fails], "failed_checks": fails},
                        index=df.index)
