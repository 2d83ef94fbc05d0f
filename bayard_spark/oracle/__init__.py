"""Pure-Python reference engine for rank-identity testing."""

from bayard_spark.oracle.engine import OracleIndex

__all__ = ["OracleIndex"]
