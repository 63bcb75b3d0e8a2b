"""Single time-unit convention for every time-keyed operator.

House rule (ADVICE r3): numeric time columns are EPOCH MICROSECONDS
unless the caller says otherwise. sessions/rollup/rangejoin/asof all
funnel through :func:`ts_micros`, so a column moved between operators
can never pick up a silent 10^6 unit error. Timestamp(-NTZ) columns are
converted with ``unix_micros`` (exact integer arithmetic; a double
epoch at microsecond resolution is at the edge of the 52-bit mantissa).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_NUMERIC_UNIT_US = {"us": 1, "ms": 1_000, "s": 1_000_000}


def ts_micros(df: DataFrame, time_col: str, numeric_unit: str = "us") -> Column:
    """Integer epoch-microseconds for ``time_col``.

    Timestamp / TimestampNTZ columns use ``unix_micros`` (NTZ is
    wall-clock-preserving under the engine's pinned UTC session tz,
    matching DuckDB's ``epoch_us`` on naive timestamps). Numeric
    columns are interpreted per ``numeric_unit`` ∈ {"us", "ms", "s"} —
    default micros, the engine-wide convention.
    """
    if numeric_unit not in _NUMERIC_UNIT_US:
        raise ValueError(
            f"numeric_unit must be one of {sorted(_NUMERIC_UNIT_US)}, "
            f"got {numeric_unit!r}"
        )
    from pyspark.sql.types import TimestampNTZType, TimestampType

    c = F.col(time_col)
    dt = df.schema[time_col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.unix_micros(c.cast("timestamp"))
    if isinstance(dt, TimestampType):
        return F.unix_micros(c)
    mult = _NUMERIC_UNIT_US[numeric_unit]
    if mult == 1:
        return c.cast("bigint")
    # multiply in double then round-cast: sub-unit fractions (e.g.
    # 0.5 s) must land on exact micros
    return F.round(c.cast("double") * F.lit(mult)).cast("bigint")
