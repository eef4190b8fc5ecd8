"""Date/time semantics from the reference domain (SURVEY.md §3 F1).

The reference's hairiest time logic, declaratively:

- **day of service**: passages before the cutoff hour (default 03:00) belong
  to the *previous* service day — GTFS models an operating day that runs
  past midnight. ``day_of_service(ts) = date_format(ts - cutoff, 'yyyyMMdd')``.
- **GTFS >24:00:00 clock times**: stop_times uses "25:10:00" to mean 01:10
  the next calendar day. We parse to seconds-past-service-midnight and add
  to the service date — exact integer µs arithmetic, no DST ambiguity
  (session TZ pinned UTC; localize at the edges only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def day_of_service(ts: Column, cutoff_hours: int = 3) -> Column:
    """'yyyyMMdd' service day: timestamps before cutoff roll back a day."""
    return F.date_format(ts - F.expr(f"INTERVAL {cutoff_hours} HOURS"), "yyyyMMdd")


def gtfs_clock_seconds(clock: Column) -> Column:
    """Seconds past service-day midnight from a GTFS 'HH:MM:SS' clock string.

    Hours may exceed 23 (up to ~28 in real feeds) — plain integer math, no
    timestamp parse, so '25:10:00' → 90600. Malformed clocks (missing
    colons, non-numeric fields) yield NULL instead of aborting the job:
    ``getItem`` on a short array raises INVALID_ARRAY_INDEX under Spark
    4's default ANSI mode, and one blank departure_time in a real feed
    must not kill the whole expansion. ``F.get`` is the NULL-tolerant
    accessor (and matches DuckDB, where out-of-range list indexing is
    NULL); ``try_cast`` covers non-numeric fields.
    """
    parts = F.split(clock, ":")
    return (
        F.get(parts, 0).try_cast("long") * 3600
        + F.get(parts, 1).try_cast("long") * 60
        + F.get(parts, 2).try_cast("long")
    )


def service_departure_ts(service_date: Column, clock: Column) -> Column:
    """Absolute departure timestamp = service date midnight + GTFS clock.

    Exact epoch-µs integer arithmetic (timestamp_micros/unix_micros) so the
    result is engine-portable (DuckDB twin: make_timestamp(epoch_us(d) + s*1e6)).
    """
    secs = gtfs_clock_seconds(clock)
    return F.timestamp_micros(F.unix_micros(service_date) + secs * 1_000_000)
