"""Query layer: JSON DSL → DataFrame plans over the bucketed index."""

from bayard_spark.query.engine import SearchEngine

__all__ = ["SearchEngine"]
