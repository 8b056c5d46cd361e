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
