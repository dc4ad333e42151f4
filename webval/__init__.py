"""webval — Ray-Data-native schema + constraint validation engine over
Common-Crawl-style web-page Parquet tables (blueprint: /root/repo/SURVEY.md).

Re-expresses the capabilities of raymon-ai/data-validation ("rdv":
Schema / Component / Extractor / Stats, build → check → contrast) as
streaming ray.data.Dataset pipelines over zero-copy Arrow batches, plus the
web-scale operators BASELINE.json adds (uniqueness with skew salting,
referential checks, drift, checkpoint manifests) and training-data-pipeline
extensions (dedup, similarity search, text analysis).
"""

from webval.api import Schema  # noqa: F401
from webval.schema import SchemaSpec, ColumnProfile, CheckSpec  # noqa: F401
from webval.sketches import (  # noqa: F401
    CountMinSketch,
    Moments,
    TDigest,
    HyperLogLog,
    CategoricalFreq,
    NumericHistogram,
    MisraGries,
)

__version__ = "0.1.0"

# lifecycle + operator entry points (lazily importable heavy deps live in
# the submodules; these names are the supported public surface)
__all__ = [
    "Schema", "SchemaSpec", "ColumnProfile", "CheckSpec",
    "Moments", "TDigest", "HyperLogLog", "CategoricalFreq", "NumericHistogram",
    "MisraGries", "CountMinSketch",
]
