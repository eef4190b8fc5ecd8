"""String normalization from the reference domain (SURVEY.md §3 F2).

The reference normalizes SNCF station codes between 7-digit (no checksum)
and 8-digit (UIC, with trailing checksum digit) forms, and extracts the
train number from GTFS trip_ids — all zfill/substring/regex work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def numeric_id(s: Column, pattern: str = "([0-9]+)") -> Column:
    """First digit-run in a string, as a long (train-num-from-trip_id shape).

    NULL (not a job-aborting ANSI cast error) when the string holds no
    digits: ``regexp_extract`` returns ``''`` then, and under Spark 4's
    default ANSI mode ``CAST('' AS BIGINT)`` throws — one free-text
    trip_id in a real feed must not kill the whole materialization.
    DuckDB twin: ``TRY_CAST(regexp_extract(...) AS BIGINT)``.
    """
    return F.regexp_extract(s, pattern, 1).try_cast("long")


def normalize_station_id(code: Column, width: int = 8) -> Column:
    """Zero-pad a numeric code to ``width`` digits (UIC-style).

    Pads only — a code LONGER than ``width`` passes through unchanged:
    ``lpad`` alone would silently truncate it to the first ``width``
    chars, collapsing distinct codes into collisions. DuckDB twin:
    ``CASE WHEN length(s) >= w THEN s ELSE lpad(s, w, '0') END``.
    """
    s = code.cast("string")
    return F.when(F.length(s) >= width, s).otherwise(F.lpad(s, width, "0"))


def drop_checksum_digit(code8: Column) -> Column:
    """8-digit UIC code → 7-digit code (drop trailing checksum digit)."""
    return F.substring(code8, 1, 7)
