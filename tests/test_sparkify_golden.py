"""Golden end-to-end tests of the five reference derivations
(SURVEY.md §2.2) on synthetic Sparkify fixtures (FIXTURES.md Family A),
asserting the *intended* semantics: keep-first/keep-latest tie-breaks,
year==0 → NULL, D2-corrected AND empty-string filter, UTC timestamps,
ISO weekday, inner-join drops, and idempotent reruns (D4)."""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest

from dend_spark_data_lake_spark.plans.sparkify import run_sparkify_pipeline


def _ms(*args) -> int:
    return int(datetime(*args, tzinfo=timezone.utc).timestamp() * 1000)


def _utc(*args) -> datetime:
    return datetime(*args)


T1 = _ms(2018, 11, 15, 12, 30, 0)   # Thursday (ISO 4)
T2 = _ms(2018, 12, 1, 9, 0, 0)      # Saturday (ISO 6)
T6 = _ms(2018, 11, 15, 23, 59, 59)  # Thursday (ISO 4)

SONGS = [
    dict(song_id="S1", title="Alpha", artist_id="A1", year=2001, duration=100.5,
         artist_name="ArtX", artist_location="NY", artist_latitude=40.7,
         artist_longitude=-74.0),
    # duplicate song_id with lower artist_id → wins keep-first by (artist_id, song_id)
    dict(song_id="S1", title="Alpha Alt", artist_id="A0", year=1999, duration=100.5,
         artist_name="ArtZero", artist_location="LA", artist_latitude=None,
         artist_longitude=None),
    # year=0 sentinel → NULL; same artist A1 under a second name (ArtX < ArtX2 wins)
    dict(song_id="S2", title="Beta", artist_id="A1", year=0, duration=200.0,
         artist_name="ArtX2", artist_location="NY2", artist_latitude=41.0,
         artist_longitude=-73.0),
    dict(song_id="S3", title="Gamma", artist_id="A2", year=2010, duration=321.25,
         artist_name="ArtY", artist_location="SF", artist_latitude=None,
         artist_longitude=None),
]


def _log(artist, song, length, user, first, last, gender, level, page, session, ts,
         location="NYC", ua="ua1"):
    return dict(artist=artist, firstName=first, gender=gender, lastName=last,
                length=length, level=level, location=location, page=page,
                sessionId=session, song=song, ts=ts, userAgent=ua, userId=user)


LOGS = [
    _log("ArtZero", "Alpha Alt", 100.5, "10", "Ann", "Lee", "F", "free", "NextSong", 1, T1),
    # same user later, upgraded → keep-latest wins for users.level
    _log("ArtY", "Gamma", 321.25, "10", "Ann", "Lee", "F", "paid", "NextSong", 2, T2),
    # non-NextSong page → excluded everywhere
    _log("ArtY", "Gamma", 321.25, "11", "Bob", "Ray", "M", "free", "Home", 3, T2),
    # empty-string userId → D2-corrected AND filter drops it
    _log("ArtZero", "Alpha Alt", 100.5, "", "Eve", "Fox", "F", "free", "NextSong", 4, T1),
    # null length → dropna subset drops it
    _log("ArtZero", "Alpha Alt", None, "15", "Gil", "Oak", "M", "free", "NextSong", 5, T1),
    # no catalog match → survives cleaning, absent from songplays
    _log("Nobody", "Ghost", 1.0, "12", "Cat", "Dog", "F", "free", "NextSong", 6, T6),
    # same ts as row 1 (time table must dedup), different user
    _log("ArtZero", "Alpha Alt", 100.5, "13", "Dan", "Kim", "M", "paid", "NextSong", 7, T1),
]


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sparkify")
    song_path, log_path = base / "song_data.json", base / "log_data.json"
    song_path.write_text("\n".join(json.dumps(r) for r in SONGS))
    log_path.write_text("\n".join(json.dumps(r) for r in LOGS))
    out = base / "lake"
    run_sparkify_pipeline(spark, str(song_path), str(log_path), str(out))
    # D4: rerun must be idempotent (overwrite mode), and its outputs are what
    # we assert on — the first run's DataFrames hold stale file listings.
    return run_sparkify_pipeline(spark, str(song_path), str(log_path), str(out))


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_songs_golden(outputs):
    assert rows(outputs["songs"], "song_id", "title", "artist_id", "year", "duration") == sorted(
        [
            ("S1", "Alpha Alt", "A0", 1999, 100.5),
            ("S2", "Beta", "A1", None, 200.0),
            ("S3", "Gamma", "A2", 2010, 321.25),
        ]
    )


def test_artists_golden(outputs):
    assert rows(outputs["artists"], "artist_id", "name", "location", "latitude", "longitude") == sorted(
        [
            ("A0", "ArtZero", "LA", None, None),
            ("A1", "ArtX", "NY", 40.7, -74.0),
            ("A2", "ArtY", "SF", None, None),
        ]
    )


def test_users_golden(outputs):
    assert rows(outputs["users"], "user_id", "first_name", "last_name", "gender", "level") == sorted(
        [
            (10, "Ann", "Lee", "F", "paid"),  # latest record wins
            (12, "Cat", "Dog", "F", "free"),
            (13, "Dan", "Kim", "M", "paid"),
        ]
    )


def test_time_golden(outputs):
    def parts(ms, iso_wd):
        dt = datetime.fromtimestamp(ms / 1000, tz=timezone.utc).replace(tzinfo=None)
        return (dt, dt.hour, dt.day, dt.isocalendar()[1], dt.month, dt.year, iso_wd)

    assert rows(
        outputs["time"], "start_time", "hour", "day", "week", "month", "year", "weekday"
    ) == sorted([parts(T1, 4), parts(T2, 6), parts(T6, 4)])


def test_songplays_golden(outputs):
    def st(ms):
        return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).replace(tzinfo=None)

    got = rows(
        outputs["songplays"],
        "start_time", "user_id", "level", "artist_id", "session_id",
        "location", "user_agent", "year", "month",
    )
    assert got == sorted(
        [
            (st(T1), 10, "free", "A0", 1, "NYC", "ua1", 2018, 11),
            (st(T2), 10, "paid", "A2", 2, "NYC", "ua1", 2018, 12),
            (st(T1), 13, "paid", "A0", 7, "NYC", "ua1", 2018, 11),
        ]
    )
    # fidelity: song_id is NOT part of the songplays output (SURVEY.md §2.2)
    assert "song_id" not in outputs["songplays"].columns


def test_partition_layout(outputs, spark):
    # songs partitioned by (year, artist_id); songplays/time by (year, month)
    # → partition pruning works: reading one partition scans one directory.
    plan = outputs["songplays"].filter("year = 2018 AND month = 11")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "year" in plan
