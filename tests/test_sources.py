"""File-format source/sink coverage (SURVEY §2B row 1): parquet is the
canonical store; JSON and CSV round-trip through explicit schemas (bronze
fidelity vs interchange). The reference only reaches data through DB client
libraries — file formats are engine-owned here."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE


def _events(spark):
    from weather_database_system_spark.sources.star import load_table

    return load_table(spark, SF_SMOKE, "events")


def test_parquet_roundtrip_preserves_schema_and_values(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "ev_parquet")
    ev.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.schema == ev.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_json_roundtrip_with_explicit_schema(spark, tmp_path):
    """JSON keeps bronze-zone fidelity for nested data; reading back with the
    writer's schema (not inference) must reproduce values exactly. Timestamps
    survive via ISO strings."""
    from pyspark.sql import functions as F

    ev = _events(spark).withColumn("props_parsed", F.from_json("props", "k int"))
    path = str(tmp_path / "ev_json")
    # default timestampFormat carries only millis — micros need an explicit
    # format on BOTH sides or the roundtrip silently truncates
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", fmt).json(path)
    back = spark.read.schema(ev.schema).option("timestampFormat", fmt).json(path)
    assert back.schema == ev.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    """ORC is the other columnar format Spark ships natively (the
    Hive-ecosystem interchange); schema and values must survive a
    write/read cycle exactly like parquet."""
    ev = _events(spark)
    path = str(tmp_path / "ev_orc")
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == ev.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_json_schema_inference_reads_nested(spark, tmp_path):
    """Inference (the Mongo-style dynamic-schema path, SURVEY §1.3) still
    lands usable nested structs."""
    from pyspark.sql import functions as F

    ev = _events(spark).select(
        "event_id", F.struct("user_id", "event_type").alias("who"), "value"
    )
    path = str(tmp_path / "ev_json_nested")
    ev.write.mode("overwrite").json(path)
    inferred = spark.read.json(path)
    assert set(inferred.columns) == {"event_id", "who", "value"}
    row = inferred.orderBy("event_id").first()
    assert row["who"]["event_type"] in {"click", "view", "purchase", "error", "signup"}


def test_csv_roundtrip_with_header_and_schema(spark, tmp_path):
    """CSV as the interchange format: header on, explicit schema + timestamp
    format on read; null round-trips via emptyValue-vs-nullValue defaults are
    the classic trap, so nulls are asserted explicitly."""
    from pyspark.sql import functions as F

    ev = _events(spark).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "user_id",
        "event_type",
        F.when(F.col("value") > 1.0, F.col("value")).alias("value_nullable"),
    )
    path = str(tmp_path / "ev_csv")
    ev.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(
        "event_id long, ts_str string, user_id long, event_type string, value_nullable double"
    ).option("header", True).csv(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))
    assert back.filter(F.col("value_nullable").isNull()).count() > 0


def test_binaryfile_source_ingests_payloads_with_metadata(spark, tmp_path):
    """binaryFile-source multimodal ingestion (paths-as-pointers): one row
    per file, payload bytes + derived metadata, and the decode plumbing
    (mapInPandas) runs unchanged over the binaryFile-sourced payloads."""
    import hashlib

    from weather_database_system_spark.operators.multimodal import (
        _fake_decode,
        decode_features,
        read_binary_dir,
    )

    files = {
        "a.png": b"\x89PNG fake image bytes",
        "b.jpg": b"\xff\xd8 fake jpeg payload",
        "c.wav": b"RIFF fake audio",
        "notes.txt": b"plain text payload",
    }
    for name, content in files.items():
        (tmp_path / name).write_bytes(content)

    mm = read_binary_dir(spark, str(tmp_path))
    rows = {os.path.basename(r.uri): r for r in mm.collect()}
    assert set(rows) == set(files)
    expected_mime = {
        "a.png": "image/png", "b.jpg": "image/jpeg",
        "c.wav": "audio/wav", "notes.txt": "text/plain",
    }
    for name, content in files.items():
        r = rows[name]
        assert bytes(r.payload) == content
        assert r.meta.mime == expected_mime[name]
        assert r.meta.n_bytes == len(content)
        assert r.meta.content_md5 == hashlib.md5(content).hexdigest()

    # decode plumbing reuse: doc_id contract is long, so key files by a hash
    with_ids = mm.selectExpr("xxhash64(uri) AS doc_id", "payload")
    feats = {r.doc_id: r for r in decode_features(with_ids).collect()}
    by_hash = {r.doc_id: bytes(r.payload) for r in with_ids.collect()}
    assert len(feats) == len(files)
    for doc_id, row in feats.items():
        expected = _fake_decode(by_hash[doc_id])
        assert row.n_bytes == expected["n_bytes"]
        assert row.byte_sum_mod == expected["byte_sum_mod"]


def test_binaryfile_metadata_listing_never_reads_content(spark, tmp_path):
    """The metadata-only listing must prune the ``content`` column out of
    the binaryFile scan — at 100 TB that's a directory stat, not a read."""
    from weather_database_system_spark.operators.multimodal import (
        binary_dir_metadata,
    )
    from weather_database_system_spark.plans import read_schema_columns

    (tmp_path / "x.png").write_bytes(b"payload bytes")
    (tmp_path / "y.mp4").write_bytes(b"more payload bytes")

    md = binary_dir_metadata(spark, str(tmp_path))
    for cols in read_schema_columns(md):
        assert "content" not in cols

    rows = {os.path.basename(r.uri): r for r in md.collect()}
    assert rows["x.png"].mime == "image/png"
    assert rows["y.mp4"].mime == "video/mp4"
    assert rows["x.png"].n_bytes == 13

    # glob filter pushes into the listing
    only_png = binary_dir_metadata(spark, str(tmp_path), glob="*.png")
    assert [os.path.basename(r.uri) for r in only_png.collect()] == ["x.png"]


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """partitionBy layout must produce partition-pruned scans: reading one
    event_type touches only that directory (PartitionFilters, not a full
    scan + filter)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.plans import formatted_plan

    ev = _events(spark)
    path = str(tmp_path / "ev_part")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    one = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = formatted_plan(one)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    expected = ev.filter(F.col("event_type") == "click").count()
    assert one.count() == expected


# ---------------------------------------------------------------------------
# observation_feed: the Python DataSource (op #1 scale form)
# ---------------------------------------------------------------------------

def test_feed_shard_ranges_split_inclusive_windows():
    from weather_database_system_spark.sources.observation_feed import shard_ranges

    assert shard_ranges("2024-01-01", "2024-01-04", 2) == [
        ("2024-01-01", "2024-01-02"),
        ("2024-01-03", "2024-01-04"),
    ]
    # uneven tail shard stays inclusive
    assert shard_ranges("2024-01-01", "2024-01-05", 2)[-1] == (
        "2024-01-05",
        "2024-01-05",
    )
    assert shard_ranges("2024-01-01", "2024-01-01", 30) == [
        ("2024-01-01", "2024-01-01")
    ]
    import pytest

    with pytest.raises(ValueError):
        shard_ranges("2024-01-02", "2024-01-01", 2)
    with pytest.raises(ValueError):
        shard_ranges("2024-01-01", "2024-01-02", 0)


def test_observation_feed_plans_one_partition_per_station_shard(spark, tmp_path):
    """The DataSource must fan out to exactly (stations × date shards)
    input partitions, each yielding one bronze row under the bronze
    schema contract — the scan parallelism op #1 needs at scale."""
    from weather_database_system_spark.pipeline.ingest import read_observation_feed
    from weather_database_system_spark.pipeline.schemas import BRONZE_SCHEMA
    from weather_database_system_spark.sources.observation_feed import (
        write_feed_fixtures,
    )

    stations = [
        {"latitude": 37.0, "longitude": -121.0},
        {"latitude": 38.5, "longitude": -122.25},
    ]
    n = write_feed_fixtures(str(tmp_path), stations, "2024-02-01", "2024-02-06", 2)
    assert n == 6  # 2 stations × 3 shards
    bronze = read_observation_feed(
        spark,
        stations,
        "2024-02-01",
        "2024-02-06",
        shard_days=2,
        payload_dir=str(tmp_path),
        fetched_at="2024-02-07T00:00:00",
    )
    assert bronze.schema == BRONZE_SCHEMA
    assert bronze.rdd.getNumPartitions() == 6
    rows = bronze.collect()
    assert len(rows) == 6
    for r in rows:
        assert len(r.hourly.time) == 48  # 2 days × 24 h per shard
        assert all(len(getattr(r.hourly, v)) == 48 for v in (
            "temperature_2m", "precipitation", "wind_gusts_10m"))
    assert {r.latitude for r in rows} == {37.0, 38.5}


def test_observation_feed_matches_single_payload_path(spark, tmp_path):
    """The fleet path and the reference-faithful single-payload path must
    produce identical silver observations from the same payload bytes —
    the zones are shared, only the scan parallelizes."""
    import json

    from weather_database_system_spark.pipeline.ingest import (
        bronze_from_payload,
        bronze_to_observations,
        read_observation_feed,
    )
    from weather_database_system_spark.sources.observation_feed import (
        write_feed_fixtures,
    )
    import datetime as dt

    stations = [{"latitude": 40.0, "longitude": -120.0}]
    write_feed_fixtures(str(tmp_path), stations, "2024-03-01", "2024-03-02", 1)
    feed_obs = bronze_to_observations(
        read_observation_feed(
            spark,
            stations,
            "2024-03-01",
            "2024-03-02",
            shard_days=1,
            payload_dir=str(tmp_path),
            fetched_at="2024-03-03T00:00:00",
        )
    )
    single = None
    for f in sorted(tmp_path.glob("*.json")):
        payload = json.loads(f.read_text())
        b = bronze_from_payload(
            spark, payload, dt.datetime(2024, 3, 3)
        )
        piv = bronze_to_observations(b)
        single = piv if single is None else single.unionByName(piv)
    key = lambda r: r["timestamp"]  # noqa: E731
    assert sorted(feed_obs.collect(), key=key) == sorted(
        single.collect(), key=key
    )


def test_observation_feed_live_url_mode_against_loopback_server(spark):
    """The feed's LIVE path: executors GET the payload from a (loopback
    stdlib) HTTP server with the reference's query params — covering
    fetch_hourly_history's executor-side use through the DataSource,
    which the offline fixture tests cannot. The server echoes the
    requested coordinates/range back in a deterministic payload, so each
    (station, shard) partition must land its own parameters."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from weather_database_system_spark.pipeline.ingest import read_observation_feed

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            qs = parse_qs(urlparse(self.path).query)
            lat, lon = float(qs["latitude"][0]), float(qs["longitude"][0])
            start = qs["start_date"][0]
            import datetime as dt

            days = (
                dt.date.fromisoformat(qs["end_date"][0])
                - dt.date.fromisoformat(start)
            ).days + 1
            hours = days * 24
            base = dt.datetime.fromisoformat(start + "T00:00")
            payload = {
                "latitude": lat,
                "longitude": lon,
                "timezone": qs["timezone"][0],
                "hourly": {
                    "time": [
                        (base + dt.timedelta(hours=h)).strftime("%Y-%m-%dT%H:%M")
                        for h in range(hours)
                    ],
                    "temperature_2m": [lat + h * 0.5 for h in range(hours)],
                    "relative_humidity_2m": [50.0] * hours,
                    "precipitation": [0.1] * hours,
                    "wind_speed_10m": [1.0] * hours,
                    "wind_gusts_10m": [2.0] * hours,
                },
            }
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        stations = [
            {"latitude": 37.0, "longitude": -121.0},
            {"latitude": 40.0, "longitude": -120.0},
        ]
        bronze = read_observation_feed(
            spark,
            stations,
            "2024-04-01",
            "2024-04-02",
            shard_days=1,
            url=f"http://127.0.0.1:{port}/v1/archive",
            fetched_at="2024-04-03T00:00:00",
        )
        rows = bronze.collect()
        assert len(rows) == 4  # 2 stations × 2 one-day shards
        assert bronze.rdd.getNumPartitions() == 4
        for r in rows:
            assert len(r.hourly.time) == 24
            # the server derives temperature from the requested latitude —
            # proves each partition sent its own station's params
            assert r.hourly.temperature_2m[0] == r.latitude
        assert {r.latitude for r in rows} == {37.0, 40.0}
    finally:
        srv.shutdown()
        srv.server_close()


def test_feed_shard_ranges_partition_any_range():
    """Property: for ANY (range length, shard size), the shards tile the
    inclusive date range exactly — disjoint, ordered, gapless, all within
    bounds — so no fetch window is lost or doubled at shard boundaries."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from weather_database_system_spark.sources.observation_feed import shard_ranges

    @settings(max_examples=80, deadline=None)
    @given(
        days=st.integers(min_value=1, max_value=60),
        shard=st.integers(min_value=1, max_value=20),
    )
    def prop(days, shard):
        start = dt.date(2024, 3, 1)
        end = start + dt.timedelta(days=days - 1)
        got = shard_ranges(start.isoformat(), end.isoformat(), shard)
        covered = []
        for a, b in got:
            da, db = dt.date.fromisoformat(a), dt.date.fromisoformat(b)
            assert start <= da <= db <= end
            assert (db - da).days + 1 <= shard
            cur = da
            while cur <= db:
                covered.append(cur)
                cur += dt.timedelta(days=1)
        assert covered == [start + dt.timedelta(days=i) for i in range(days)]

    prop()


def test_observation_feed_missing_date_options_raise_value_error():
    """A missing start_date/end_date must surface as the same descriptive
    ValueError the other required options get, not a raw KeyError from
    inside partition planning (ADVICE r6)."""
    import json

    import pytest

    from weather_database_system_spark.sources.observation_feed import (
        ObservationFeedReader,
    )

    base = {
        "stations": json.dumps([{"latitude": 37.0, "longitude": -121.0}]),
        "payload_dir": "/tmp/nowhere",
    }
    for missing in ("start_date", "end_date"):
        opts = dict(base)
        opts["start_date"] = "2024-01-01"
        opts["end_date"] = "2024-01-02"
        del opts[missing]
        with pytest.raises(ValueError, match=missing):
            ObservationFeedReader(opts).partitions()


def test_ingest_feed_rejects_multi_station_fleet(spark):
    """ingest_feed writes the single-location silver contract (no station
    column) — distinct station coordinates must be rejected up front, not
    silently mixed into one city's rows (ADVICE r6). Duplicated shards of
    the SAME coordinates stay legal."""
    import pytest

    from weather_database_system_spark.pipeline.ingest import ingest_feed

    with pytest.raises(ValueError, match="single-location silver contract"):
        ingest_feed(
            spark,
            [
                {"latitude": 37.0, "longitude": -121.0},
                {"latitude": 38.0, "longitude": -122.0},
            ],
            "2024-01-01",
            "2024-01-02",
            city="Stockton",
            state="California",
            payload_dir="/tmp/nowhere",
        )


def test_ingest_feed_stations_writes_station_keyed_silver(spark, tmp_path):
    """The multi-station fleet path (r7 verdict #6): ingest_feed_stations
    carries coordinates through the pivot into SILVER_STATION_SCHEMA,
    derives a deterministic station_id per row, never mixes stations in a
    (station_id, date) rollup, and the silver sink is physically
    partitioned by station_id so per-station reads prune at the listing."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from weather_database_system_spark.pipeline.ingest import (
        ingest_feed_stations,
    )
    from weather_database_system_spark.pipeline.schemas import (
        SILVER_STATION_SCHEMA,
    )
    from weather_database_system_spark.sources.observation_feed import (
        write_feed_fixtures,
    )

    stations = [
        {"latitude": 37.0, "longitude": -121.0},
        {"latitude": 40.0, "longitude": -120.0},
    ]
    fx = tmp_path / "payloads"
    fx.mkdir()
    write_feed_fixtures(str(fx), stations, "2024-02-01", "2024-02-02", 1)
    silver_path = str(tmp_path / "silver")
    silver = ingest_feed_stations(
        spark,
        stations,
        "2024-02-01",
        "2024-02-02",
        shard_days=1,
        payload_dir=str(fx),
        silver_path=silver_path,
        fetched_at=dt.datetime(2024, 2, 3),
    )
    # names+types pin the contract; produced nullability is advisory in
    # Spark (explode widens non-null array elements to nullable)
    assert [(f.name, f.dataType) for f in silver.schema] == [
        (f.name, f.dataType) for f in SILVER_STATION_SCHEMA
    ]
    rows = silver.collect()
    assert len(rows) == 2 * 2 * 24  # 2 stations × 2 days × 24 h
    assert {r.station_id for r in rows} == {
        "st_37.0000_-121.0000",
        "st_40.0000_-120.0000",
    }
    for r in rows:
        assert r.station_id == f"st_{r.latitude:.4f}_{r.longitude:.4f}"
        assert r.metadata.etl_batch_id == "etl-1706918400000"
    # (station, date) rollup keeps the fleet separated: every group is
    # exactly one station's 24 hours
    grp = (
        silver.groupBy("station_id", F.substring("timestamp", 1, 10))
        .count()
        .collect()
    )
    assert len(grp) == 4 and all(g["count"] == 24 for g in grp)
    # physical layout: one partition directory per station key
    dirs = {d for d in os.listdir(silver_path) if d.startswith("station_id=")}
    assert dirs == {
        "station_id=st_37.0000_-121.0000",
        "station_id=st_40.0000_-120.0000",
    }
    # read-back through the partitioned sink: pruning one station loses
    # no rows and sees only that station's coordinates
    back = spark.read.parquet(silver_path).filter(
        F.col("station_id") == "st_40.0000_-120.0000"
    )
    assert back.count() == 48
    assert back.select("latitude").distinct().collect()[0][0] == 40.0


def test_ingest_feed_stations_plans_no_exchange_before_sink(spark, tmp_path):
    """The r11 station-fleet rehearsal (tools/station_rehearsal.py)
    measured files/station == shards/station at every fleet size 8×→64× —
    a property that holds ONLY while no shuffle sits between the feed
    source and the partitionBy(station_id) sink: each (station, shard)
    source task then writes exactly its own partition directory. A
    repartition sneaking in would spread every station across every task
    (tasks × stations small files at fleet scale). Pin it in the plan:
    the silver DataFrame reaching the sink declares ZERO shuffle
    exchanges."""
    import datetime as dt

    from weather_database_system_spark.pipeline.ingest import (
        ingest_feed_stations,
    )
    from weather_database_system_spark.plans import shuffle_count
    from weather_database_system_spark.sources.observation_feed import (
        write_feed_fixtures,
    )

    stations = [
        {"latitude": 37.0, "longitude": -121.0},
        {"latitude": 40.0, "longitude": -120.0},
    ]
    fx = tmp_path / "payloads"
    fx.mkdir()
    write_feed_fixtures(str(fx), stations, "2024-02-01", "2024-02-02", 1)
    silver = ingest_feed_stations(
        spark,
        stations,
        "2024-02-01",
        "2024-02-02",
        shard_days=1,
        payload_dir=str(fx),
        fetched_at=dt.datetime(2024, 2, 3),
    )
    assert shuffle_count(silver) == 0


def test_station_id_derivation_is_engine_exact(spark, duck):
    """The station key must derive IDENTICALLY in Spark and DuckDB for any
    coordinate — including binary-midpoint ties like 37.03125, where raw
    %.4f diverges (Java format_string rounds HALF_UP, C printf half-even;
    measured '37.0313' vs '37.0312' before the pre-rounding fix). Checks
    adversarial midpoints plus random coordinates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from weather_database_system_spark.pipeline.ingest import station_id_col

    def both(coords):
        df = spark.createDataFrame(coords, "latitude double, longitude double")
        got_spark = [
            r.sid
            for r in df.select(station_id_col().alias("sid")).collect()
        ]
        got_duck = [
            duck.execute(
                "SELECT printf('st_%.4f_%.4f', floor(?::DOUBLE*1e4+0.5)/1e4, "
                "floor(?::DOUBLE*1e4+0.5)/1e4)",
                [lat, lon],
            ).fetchone()[0]
            for lat, lon in coords
        ]
        return got_spark, got_duck

    adversarial = [
        (37.03125, -121.03125),   # exact binary midpoints of 4-dp decimals
        (41.15625, -120.65625),
        (0.00005, -0.00005),
        (89.99995, 179.99995),
        (37.0, -121.0),
    ]
    s, d = both(adversarial)
    assert s == d, list(zip(adversarial, s, d))

    @settings(max_examples=30, deadline=None)
    @given(
        lat=st.floats(min_value=-90, max_value=90, allow_nan=False),
        lon=st.floats(min_value=-180, max_value=180, allow_nan=False),
    )
    def prop(lat, lon):
        s1, d1 = both([(lat, lon)])
        assert s1 == d1, (lat, lon, s1, d1)

    prop()


def test_cached_feed_fixtures_written_once_and_reused(spark):
    """The registry feed query's fixture payloads live at ONE deterministic
    cached path — repeated invocations must reuse it instead of leaking a
    fresh mkdtemp per run (ADVICE r6)."""
    import os

    from weather_database_system_spark.pipeline.ingest import (
        _cached_feed_fixtures,
        feed_daily_rollup,
    )

    d1 = _cached_feed_fixtures()
    mtimes = {
        f: os.path.getmtime(os.path.join(d1, f)) for f in os.listdir(d1)
    }
    assert mtimes, "fixture directory is empty"
    d2 = _cached_feed_fixtures()
    assert d2 == d1
    assert {
        f: os.path.getmtime(os.path.join(d1, f)) for f in os.listdir(d1)
    } == mtimes, "second call rewrote the cached fixtures"
    # the registry query runs off the cached dir end-to-end
    assert feed_daily_rollup(spark, "unused").count() > 0
