"""Operator library — re-exported modules for ergonomic imports:

    from data_rivers_spark.operators import transforms, relational, geo
    from data_rivers_spark.operators import dedup, similarity, textstats
"""

from data_rivers_spark.operators import (  # noqa: F401
    dedup,
    geo,
    geocode,
    multimodal,
    nested,
    relational,
    sampling,
    similarity,
    textstats,
    transforms,
    validation,
)

__all__ = [
    "dedup",
    "geo",
    "geocode",
    "multimodal",
    "nested",
    "relational",
    "sampling",
    "similarity",
    "textstats",
    "transforms",
    "validation",
]
