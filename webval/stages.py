"""Serializable pre-stage specs — the rdv Extractor-config round-trip
(VERDICT r2 missing-2).

rdv serializes every Component's extractor (with its config) into the
schema jcr, so ``Schema.load(...)`` reconstructs the complete check
pipeline [rdv:rdv/extractors to_jcr/from_jcr, UNVERIFIED — reference
checkout empty, SURVEY.md §0].  The analog here: ``SchemaSpec.pre_stages``
is an ordered list of ``{"kind": str, "params": dict}`` JSON dicts; each
kind names a registered Dataset→Dataset factory (C1 extraction, C2 lang
tagging, B8 normalization).  ``Schema.build(..., pre_stages=...)`` applies
AND records them; ``Schema.check`` replays them from the loaded spec, so a
saved schema is a self-contained pipeline description.

§2-J extension surface: ``register_pre_stage`` adds new kinds the same way
``checks.register_check_kind`` adds predicates.
"""

from __future__ import annotations

import pyarrow as pa

PRE_STAGE_KINDS: dict = {}


def register_pre_stage(kind: str, apply_fn) -> None:
    """Plugin hook: apply_fn(ds: Dataset, params: dict) -> Dataset.

    ``params`` must stay JSON-serializable — it is stored verbatim in the
    schema file."""
    PRE_STAGE_KINDS[kind] = apply_fn


def apply_pre_stages(ds, stages: list[dict] | None):
    """Replay an ordered pre-stage list (as stored in SchemaSpec) onto a
    Dataset.  Unknown kinds fail loudly — a loaded schema must never
    silently skip part of its pipeline."""
    for st in stages or []:
        kind = st.get("kind")
        fn = PRE_STAGE_KINDS.get(kind)
        if fn is None:
            raise KeyError(
                f"unknown pre-stage kind {kind!r}; registered: "
                f"{sorted(PRE_STAGE_KINDS)} (register_pre_stage to extend)")
        ds = fn(ds, st.get("params") or {})
    return ds


def _pool_kwargs(params: dict) -> dict:
    """Actor-pool sizing shared by the stateful stages; stored as plain
    JSON (concurrency may be an int or a [min, max] pair)."""
    kw: dict = {"batch_size": params.get("batch_size", 1024),
                "num_cpus": params.get("num_cpus", 1)}
    conc = params.get("concurrency", [1, 8])
    kw["concurrency"] = tuple(conc) if isinstance(conc, (list, tuple)) else conc
    return kw


def _extract_text(ds, params: dict):
    from webval.extract import HtmlTextExtractor

    ctor = {k: params[k] for k in ("html_col", "out_col", "fast_path")
            if k in params}
    return ds.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                          fn_constructor_kwargs=ctor, **_pool_kwargs(params))


def _lang_tag(ds, params: dict):
    from webval.extract import LangTagger

    ctor = {k: params[k] for k in ("text_col", "out_col", "min_votes")
            if k in params}
    return ds.map_batches(LangTagger, batch_format="pyarrow",
                          fn_constructor_kwargs=ctor, **_pool_kwargs(params))


def _type_from_str(s: str) -> pa.DataType:
    """JSON type name → pyarrow type; parametric timestamps spelled
    "timestamp[us]" etc. (the names pa types print as)."""
    if s.startswith("timestamp["):
        inner = s[len("timestamp["):-1]
        if "," in inner:  # timestamp[us, tz=UTC]
            unit, tz = inner.split(",", 1)
            return pa.timestamp(unit.strip(), tz.split("=", 1)[1].strip())
        return pa.timestamp(inner)
    return pa.type_for_alias(s)


def _normalize(ds, params: dict):
    from webval.normalize import normalize_types

    casts = {name: _type_from_str(t) for name, t in params["casts"].items()}
    return normalize_types(ds, casts,
                           ts_format=params.get("ts_format"),
                           count_col=params.get("count_col",
                                                "__cast_errors__"),
                           batch_size=params.get("batch_size", 8192))


register_pre_stage("extract_text", _extract_text)   # C1
register_pre_stage("lang_tag", _lang_tag)           # C2
register_pre_stage("normalize", _normalize)         # B8
