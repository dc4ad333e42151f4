"""rdv-style user-facing API facade.

Mirrors the reference's Schema lifecycle — ``Schema().build(data)`` →
``schema.check(data)`` → ``schema.contrast(other)`` with ``save``/``load``
[rdv:rdv/schema.py, UNVERIFIED — reference checkout empty, SURVEY.md §0] —
so a user of the reference can switch call-for-call, except the data
argument is a ``ray.data.Dataset`` (or anything ``ray.data.from_*`` accepts)
instead of an in-memory frame.
"""

from __future__ import annotations

from typing import Any

from webval.schema import CheckSpec, SchemaSpec


def _as_dataset(data: Any):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(data, rd.Dataset):
        return data
    if isinstance(data, pa.Table):
        return rd.from_arrow(data)
    if isinstance(data, pd.DataFrame):
        return rd.from_pandas(data)
    raise TypeError(f"cannot interpret {type(data)} as a Dataset")


class Schema:
    """Build → check → contrast lifecycle over Ray Datasets.

    >>> schema = Schema(name="webpages").build(ds)      # P1
    >>> result = schema.check(ds)                        # P2
    >>> result["violations"].write_parquet(out)
    >>> report = schema.contrast(other_schema)           # P3
    >>> schema.save("schema.json"); Schema.load("schema.json")
    """

    def __init__(self, name: str = "schema", spec: SchemaSpec | None = None):
        self.spec = spec or SchemaSpec(name=name)

    # -- lifecycle ---------------------------------------------------------
    @property
    def built(self) -> bool:
        return self.spec.built

    def build(self, data, kinds: dict[str, str] | None = None,
              pre_stages: list[dict] | None = None,
              **build_kwargs) -> "Schema":
        """Build profiles from data; ``pre_stages`` (ordered
        {"kind","params"} dicts, see stages.py) run first AND are recorded
        in the spec, so save→load→check replays the full pipeline —
        extraction included (rdv extractor to_jcr round-trip)."""
        from webval.pipelines import build_schema
        from webval.stages import apply_pre_stages

        ds = apply_pre_stages(_as_dataset(data), pre_stages)
        self.spec = build_schema(ds, kinds, name=self.spec.name,
                                 **build_kwargs)
        self.spec.pre_stages = list(pre_stages or [])
        return self

    def check(self, data, keep_cols: list[str] | None = None) -> dict:
        """Row-level checks → {"verdicts": Dataset, "violations": Dataset}.
        Replays the spec's recorded pre-stages (extraction, tagging,
        normalization) before evaluating checks."""
        if not self.built:
            raise RuntimeError("schema is not built (rdv: call build() first)")
        from webval.pipelines import check_pipeline
        from webval.stages import apply_pre_stages

        ds = apply_pre_stages(_as_dataset(data), self.spec.pre_stages)
        return check_pipeline(ds, self.spec, keep_cols=keep_cols)

    def check_tags(self, data, keep_cols: list[str] | None = None,
                   feature_cols: list[str] | None = None):
        """Verdicts in the reference's TAG-LIST shape — per-row
        list<struct{name,value,type,group}> (checks.to_tags)."""
        from webval.checks import to_tags

        res = self.check(data, keep_cols=keep_cols)
        return to_tags(res["verdicts"], feature_cols=feature_cols)

    def check_uniqueness(self, data, column: str):
        from webval.pipelines import uniqueness_violations

        return uniqueness_violations(_as_dataset(data), column)

    def check_referential(self, child, parent, child_key: str, parent_key: str,
                          **kwargs):
        from webval.pipelines import referential_orphans

        return referential_orphans(_as_dataset(child), _as_dataset(parent),
                                   child_key, parent_key, **kwargs)

    def contrast(self, other: "Schema | SchemaSpec", **kwargs) -> dict:
        if not self.built:
            raise RuntimeError("schema is not built")
        other_spec = other.spec if isinstance(other, Schema) else other
        from webval.pipelines import contrast

        return contrast(self.spec, other_spec, **kwargs)

    def partition_report(self, data, part_col: str = "part_id", **kwargs):
        from webval.pipelines import partition_report

        return partition_report(_as_dataset(data), self.spec, part_col, **kwargs)

    # -- check management (rdv: Schema holds Components; here CheckSpecs) --
    def add_check(self, name: str, column: str, kind: str,
                  params: dict | None = None) -> "Schema":
        self.spec.checks.append(CheckSpec(name, column, kind, params or {}))
        return self

    def remove_check(self, name: str) -> "Schema":
        self.spec.checks = [c for c in self.spec.checks if c.name != name]
        return self

    # -- persistence (rdv to_jcr/from_jcr) ---------------------------------
    def save(self, path: str) -> str:
        return self.spec.to_json(path)

    @classmethod
    def load(cls, path_or_json: str) -> "Schema":
        return cls(spec=SchemaSpec.from_json(path_or_json))
