"""Geospatial column expressions — SURVEY.md §1 (stops.txt lat/lon) (M4).

The reference's GTFS ``stops.txt`` carries WGS84 coordinates; its
next-departures UI resolves "stations near me" with a great-circle
distance. Pure column expressions (JVM-side, codegen'd):

- ``haversine_km``      : great-circle distance between two (lat, lon)
  pairs in degrees, R = 6371.0088 km (IUGG mean Earth radius).
- ``nearest_k_stations``: per-probe top-k stations. The stops dimension
  is broadcast (a national GTFS feed is O(10⁴) rows — always dimension-
  sized), so the plan is a broadcast join + per-probe window rank, never
  a shuffle of the probe side. At planetary scale the same query keys
  both sides by a geohash-style grid cell (the banding trick of
  operators/joins.py banded_range_join, in 2-D) — noted, not needed for
  a GTFS feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km; inputs in decimal degrees."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def nearest_k_stations(
    probes: DataFrame,
    stops: DataFrame,
    k: int,
    *,
    probe_lat: str = "lat",
    probe_lon: str = "lon",
) -> DataFrame:
    """k nearest stops per DISTINCT probe: broadcast the stops dim, rank
    by haversine with stop_id tie-break (deterministic). Probes are
    deduplicated first — the rank window partitions by the probe columns,
    so duplicate probe rows would otherwise share one partition and split
    a single top-k between them; identical probes have identical answers,
    so callers needing multiplicity re-join on the probe columns."""
    overlap = set(probes.columns) & set(stops.columns)
    if overlap:
        raise ValueError(
            "nearest_k_stations: probe and stop frames share column names "
            f"{sorted(overlap)} — the crossJoin would make every haversine/"
            "tie-break reference ambiguous. Rename or project the probe "
            "side first (e.g. stops-as-probes: select stop_id AS probe_id, "
            "stop_lat AS lat, stop_lon AS lon)."
        )
    clash = {"dist_km", "_rk"} & (set(probes.columns) | set(stops.columns))
    if clash:
        raise ValueError(
            f"nearest_k_stations: input already has {sorted(clash)} — these "
            "are this function's output/internal columns; rename them first"
        )
    j = probes.distinct().crossJoin(F.broadcast(stops)).withColumn(
        "dist_km",
        haversine_km(
            F.col(probe_lat), F.col(probe_lon), F.col("stop_lat"), F.col("stop_lon")
        ),
    )
    w = Window.partitionBy(*probes.columns).orderBy(F.col("dist_km").asc(), F.col("stop_id").asc())
    return j.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")
