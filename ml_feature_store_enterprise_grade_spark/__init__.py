"""PySpark-native feature-store / analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference feature-store platform
(OnlyAhad13/ML-Feature-Store-Enterprise-Grade, surveyed in SURVEY.md) as an
idiomatic PySpark engine: typed feature views over DataFrames,
point-in-time (as-of) retrieval, latest-snapshot materialization,
windowed streaming aggregation, declarative data-quality and drift
operators, plus LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).

Everything is DataFrame/SQL-first: logical plans are declared
declaratively and Catalyst/Tungsten pick the physical strategy.
Python UDFs are avoided in the hot path; Arrow-batched pandas UDFs
are the designated escape hatch for genuinely non-relational ops.
"""

__version__ = "0.1.0"


def __getattr__(name: str):
    """Lazy public API (avoids importing pyspark at package import):

    >>> from ml_feature_store_enterprise_grade_spark import FeatureStore, Entity, FeatureView
    >>> from ml_feature_store_enterprise_grade_spark import get_spark, asof_join, latest_snapshot
    """
    from importlib import import_module

    exports = {
        "FeatureStore": "store",
        "Entity": "store",
        "FeatureView": "store",
        "flatten_feature_names": "store",
        "get_spark": "session",
        "load_table": "catalog",
        "register_views": "catalog",
        "asof_join": "operators.asof",
        "latest_snapshot": "operators.asof",
        "ks_2samp": "operators.drift",
        "ks_2samp_keyed": "operators.drift",
    }
    if name in exports:
        return getattr(import_module(f".{exports[name]}", __name__), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
