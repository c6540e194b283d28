"""Deterministic Open-Meteo-shaped payload fixtures (FIXTURES.md §A1).

Seed-42 synthetic hourly history: multi-city, 3-month span, ~2% nulls in the
nullable measures — exercising the pivot, fill policy, enrichment, and the
multi-group monthly aggregate without any network access.
"""

from __future__ import annotations

import datetime as dt
import random

CITIES = (
    ("Stockton", "CA", 37.9575, -121.2925),
    ("Fresno", "CA", 36.7378, -119.7871),
    ("Reno", "NV", 39.5296, -119.8138),
)

START = dt.datetime(2024, 1, 1)
N_DAYS = 92  # spans Jan-Mar 2024 → 3 monthly groups per city


def make_payload(city_idx: int, n_days: int = N_DAYS) -> dict:
    """One API payload for one city: index-aligned hourly arrays with the
    documented null rates and value ranges."""
    city, state, lat, lon = CITIES[city_idx]
    rng = random.Random(42 + city_idx)
    times, temp, hum, precip, wind, gusts = [], [], [], [], [], []
    for day in range(n_days):
        for hour in range(24):
            ts = START + dt.timedelta(days=day, hours=hour)
            times.append(ts.strftime("%Y-%m-%dT%H:%M"))

            def maybe_null(v: float) -> float | None:
                return None if rng.random() < 0.02 else round(v, 2)

            base = 10 + 15 * (0.5 - abs(hour - 14) / 28) + rng.uniform(-5, 5)
            temp.append(maybe_null(base))
            hum.append(maybe_null(rng.uniform(0, 100)))
            precip.append(maybe_null(0.0 if rng.random() < 0.8 else rng.uniform(0, 30)))
            wind.append(maybe_null(rng.uniform(0, 25)))
            gusts.append(maybe_null(rng.uniform(0, 40)))
    return {
        "latitude": lat,
        "longitude": lon,
        "timezone": "America/Los_Angeles",
        "hourly": {
            "time": times,
            "temperature_2m": temp,
            "relative_humidity_2m": hum,
            "precipitation": precip,
            "wind_speed_10m": wind,
            "wind_gusts_10m": gusts,
        },
        "_city": city,
        "_state": state,
    }
