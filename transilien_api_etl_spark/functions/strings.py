"""String normalization from the reference domain (SURVEY.md §3 F2).

The reference normalizes SNCF station codes between 7-digit (no checksum)
and 8-digit (UIC, with trailing checksum digit) forms, and extracts the
train number from GTFS trip_ids — all zfill/substring/regex work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def numeric_id(s: Column, pattern: str = "([0-9]+)") -> Column:
    """First digit-run in a string, as a long (train-num-from-trip_id shape)."""
    return F.regexp_extract(s, pattern, 1).cast("long")


def normalize_station_id(code: Column, width: int = 8) -> Column:
    """Zero-pad a numeric code to ``width`` digits (UIC-style)."""
    return F.lpad(code.cast("string"), width, "0")


def drop_checksum_digit(code8: Column) -> Column:
    """8-digit UIC code → 7-digit code (drop trailing checksum digit)."""
    return F.substring(code8, 1, 7)
