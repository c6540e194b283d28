"""Partitioned observation-feed source — op #1's scale form.

SURVEY.md §2A #1 maps the reference's driver-side HTTP fetch
(``fetchStocktonWeather.js:29-71``) to "at scale a DataSource V2-style
custom reader"; pyspark 4.x ships the Python ``pyspark.sql.datasource``
API, so this implements exactly that: ``spark.read.format
("observation_feed")`` plans ONE INPUT PARTITION PER (station, date-shard)
fetch window and executors fetch their shards concurrently — the fan-out
the reference's single-process loop cannot do. Each partition yields one
bronze row (the whole payload, struct-of-arrays — the same zone contract
``bronze_from_payload`` produces for a single driver-side payload), so
everything downstream (``bronze_to_observations`` pivot, enrichment,
zone writes) is shared between the one-payload and the fleet path.

Query-parameter semantics mirror the reference URL builder
(``fetchStocktonWeather.js:29-49``): latitude/longitude, an inclusive
date range, the five hourly variables, m/s wind units, and an explicit
timezone. Offline mode (``payload_dir``) reads fixture payload JSON files
named ``{lat}_{lon}_{start}_{end}.json`` instead of fetching — the tests'
and registry's deterministic path; the container has no network.

At 1000 executors: thousands of (station × window) shards spread across
the cluster, each a bounded payload (Open-Meteo caps ranges), no driver
bottleneck, and failures retry per-partition instead of per-run.
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Iterator, Sequence
from typing import Any

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from weather_database_system_spark.pipeline.schemas import (
    BRONZE_SCHEMA,
    HOURLY_VARS,
)

DEFAULT_SHARD_DAYS = 30


def shard_ranges(
    start_date: str, end_date: str, shard_days: int
) -> list[tuple[str, str]]:
    """Split an inclusive [start_date, end_date] into inclusive sub-ranges
    of at most ``shard_days`` days — the per-partition fetch windows."""
    if shard_days < 1:
        raise ValueError(f"shard_days must be >= 1, got {shard_days}")
    start = dt.date.fromisoformat(start_date)
    end = dt.date.fromisoformat(end_date)
    if end < start:
        raise ValueError(f"end_date {end_date} precedes start_date {start_date}")
    out = []
    cur = start
    while cur <= end:
        stop = min(cur + dt.timedelta(days=shard_days - 1), end)
        out.append((cur.isoformat(), stop.isoformat()))
        cur = stop + dt.timedelta(days=1)
    return out


class FeedShard(InputPartition):
    """One (station, date-range) fetch window. Pickled to executors."""

    def __init__(
        self,
        latitude: float,
        longitude: float,
        start_date: str,
        end_date: str,
        timezone: str,
        payload_dir: str | None,
        url: str | None,
        fetched_at: str,
    ):
        self.latitude = latitude
        self.longitude = longitude
        self.start_date = start_date
        self.end_date = end_date
        self.timezone = timezone
        self.payload_dir = payload_dir
        self.url = url
        self.fetched_at = fetched_at


class ObservationFeedReader(DataSourceReader):
    def __init__(self, options: dict[str, str]):
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        opts = self.options
        try:
            stations = json.loads(opts["stations"])
        except KeyError:
            raise ValueError(
                "observation_feed requires a 'stations' option: JSON list of "
                '{"latitude": .., "longitude": ..} objects'
            ) from None
        if not stations:
            raise ValueError("observation_feed: 'stations' must be non-empty")
        payload_dir = opts.get("payload_dir")
        url = opts.get("url")
        if not payload_dir and not url:
            raise ValueError(
                "observation_feed requires 'payload_dir' (offline fixtures) "
                "or 'url' (live endpoint)"
            )
        for req in ("start_date", "end_date"):
            if req not in opts:
                raise ValueError(
                    f"observation_feed requires a '{req}' option "
                    "(inclusive ISO date, e.g. '2024-01-01')"
                )
        fetched_at = opts.get("fetched_at") or dt.datetime.now(
            dt.timezone.utc
        ).replace(tzinfo=None).isoformat(timespec="milliseconds")
        shard_days = int(opts.get("shard_days", str(DEFAULT_SHARD_DAYS)))
        tz = opts.get("timezone", "America/Los_Angeles")
        return [
            FeedShard(
                latitude=float(st["latitude"]),
                longitude=float(st["longitude"]),
                start_date=s,
                end_date=e,
                timezone=tz,
                payload_dir=payload_dir,
                url=url,
                fetched_at=fetched_at,
            )
            for st in stations
            for s, e in shard_ranges(
                opts["start_date"], opts["end_date"], shard_days
            )
        ]

    def read(self, partition: FeedShard) -> Iterator[tuple]:
        payload = _load_shard_payload(partition)
        hourly = payload["hourly"]
        yield (
            dt.datetime.fromisoformat(partition.fetched_at),
            float(payload["latitude"]),
            float(payload["longitude"]),
            payload.get("timezone", partition.timezone),
            (
                list(hourly["time"]),
                *[
                    [None if x is None else float(x) for x in hourly[v]]
                    for v in HOURLY_VARS
                ],
            ),
        )


def _load_shard_payload(shard: FeedShard) -> dict[str, Any]:
    """Executor-side payload load: offline fixture file, else live GET with
    the reference's query params (fetchStocktonWeather.js:29-49)."""
    if shard.payload_dir:
        name = (
            f"{shard.latitude}_{shard.longitude}_"
            f"{shard.start_date}_{shard.end_date}.json"
        )
        with open(f"{shard.payload_dir}/{name}", encoding="utf-8") as fh:
            return json.load(fh)
    from weather_database_system_spark.pipeline.ingest import fetch_hourly_history

    return fetch_hourly_history(
        shard.latitude,
        shard.longitude,
        shard.start_date,
        shard.end_date,
        timezone=shard.timezone,
        url=shard.url,
    )


class ObservationFeedDataSource(DataSource):
    """``spark.read.format("observation_feed")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "observation_feed"

    def schema(self):
        return BRONZE_SCHEMA

    def reader(self, schema) -> ObservationFeedReader:
        return ObservationFeedReader(self.options)


# ---------------------------------------------------------------------------
# Offline fixtures — the deterministic payload generator tests and the
# registry query share. Closed-form values keyed on (station index s,
# global hour index g since start_date) so a DuckDB oracle can replay the
# whole feed from generate_series; NULL patterns exercise the op #3 fill
# policy (null default; 0 for precipitation/gusts) through the source.
# ---------------------------------------------------------------------------

def fixture_hourly_values(s: int, g: int) -> dict[str, Any]:
    """One synthetic observation for station s at global hour g."""
    return {
        "temperature_2m": None if (g + s) % 11 == 0 else s * 10 + g * 0.25,
        "relative_humidity_2m": 50.0 + ((g + s) % 20),
        "precipitation": None if (g + s) % 7 == 0 else g * 0.1,
        "wind_speed_10m": s + g * 0.05,
        "wind_gusts_10m": None if (g + s) % 5 == 0 else g * 0.07,
    }


def write_feed_fixtures(
    payload_dir: str,
    stations: list[dict[str, float]],
    start_date: str,
    end_date: str,
    shard_days: int = DEFAULT_SHARD_DAYS,
    timezone: str = "America/Los_Angeles",
) -> int:
    """Write one payload JSON per (station, shard) under ``payload_dir``
    with the names ``_load_shard_payload`` resolves. Returns shard count."""
    base = dt.date.fromisoformat(start_date)
    n = 0
    for s_idx, st in enumerate(stations):
        lat, lon = float(st["latitude"]), float(st["longitude"])
        for a, b in shard_ranges(start_date, end_date, shard_days):
            g0 = (dt.date.fromisoformat(a) - base).days * 24
            hours = ((dt.date.fromisoformat(b) - dt.date.fromisoformat(a)).days + 1) * 24
            series: dict[str, list] = {"time": []}
            for v in HOURLY_VARS:
                series[v] = []
            for i in range(hours):
                g = g0 + i
                ts = dt.datetime.combine(base, dt.time()) + dt.timedelta(hours=g)
                series["time"].append(ts.strftime("%Y-%m-%dT%H:%M"))
                vals = fixture_hourly_values(s_idx, g)
                for v in HOURLY_VARS:
                    series[v].append(vals[v])
            payload = {
                "latitude": lat,
                "longitude": lon,
                "timezone": timezone,
                "hourly": series,
            }
            with open(
                f"{payload_dir}/{lat}_{lon}_{a}_{b}.json", "w", encoding="utf-8"
            ) as fh:
                json.dump(payload, fh)
            n += 1
    return n
