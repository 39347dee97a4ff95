"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``):
JVM-side, codegen'd, no Python, deterministic left-to-right double
accumulation — which makes results bit-reproducible across runs and
comparable (after rounding) with a DuckDB oracle.

For very hot paths a pandas_udf over numpy dot products is the
alternative; benchmarked at our scale the built-in HOFs are within
range and keep the plan fully visible to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine with a zero-norm guard: a zero embedding scores 0 against
    everything instead of NaN — Spark orders NaN above every double, so
    unguarded zero vectors would rank #1 in every similarity top-k."""
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))
