"""The five reference derivations (SURVEY.md §2.2), rebuilt Spark-first.

Reproduces the *intended* semantics of ``/root/reference/etl_pipeline.py``
— the Sparkify star-schema ETL — correcting its latent defects
(SURVEY.md §2.4):

- D2: the empty-string filter ANDs the non-empty conditions
  (the reference ORs them at etl_pipeline.py:216-225, a near-no-op);
- D3: ``start_time`` is derived once on the cleaned log with
  ``timestamp_millis`` (the reference's local-TZ Python UDF at
  etl_pipeline.py:170 plus a scope bug that crashes songplays);
- D4: writes are ``overwrite`` (the reference's default mode crashes
  reruns);
- T3: weekday uses the ISO convention 1=Monday..7=Sunday (the reference's
  Spark-2 ``date_format(..,"u")`` pattern, which Spark 3+ rejects).

Explicit source schemas replace schema inference (a full-data pass at
100 TB; reference infers at etl_pipeline.py:110,238).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.cleaning import drop_empty_string_rows, drop_null_rows, sentinel_to_null
from ..operators.datetime_ops import epoch_millis_to_timestamp, iso_weekday
from ..operators.dedup import dedup_keep_first, dedup_keep_latest
from ..sources.io import read_json_lines, write_parquet

SONG_SCHEMA = T.StructType(
    [
        T.StructField("song_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("artist_id", T.StringType()),
        T.StructField("year", T.LongType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("artist_location", T.StringType()),
        T.StructField("artist_latitude", T.DoubleType()),
        T.StructField("artist_longitude", T.DoubleType()),
    ]
)

LOG_SCHEMA = T.StructType(
    [
        T.StructField("artist", T.StringType()),
        T.StructField("firstName", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("lastName", T.StringType()),
        T.StructField("length", T.DoubleType()),
        T.StructField("level", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("page", T.StringType()),
        T.StructField("sessionId", T.LongType()),
        T.StructField("song", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("userAgent", T.StringType()),
        T.StructField("userId", T.StringType()),
    ]
)

# The reference's 12-column dropna subset (etl_pipeline.py:198-214) and
# 8-column non-empty subset (etl_pipeline.py:216-225).
_DROPNA_SUBSET = (
    "artist", "firstName", "gender", "lastName", "length", "level",
    "page", "sessionId", "song", "ts", "userAgent", "userId",
)
_NONEMPTY_SUBSET = (
    "artist", "firstName", "gender", "lastName", "level", "song", "userAgent", "userId",
)


def get_songs_table(song_df: DataFrame) -> DataFrame:
    """songs(song_id, title, artist_id, year, duration): year==0 → NULL,
    keep-first per song_id ordered by (artist_id, song_id).
    Reference: etl_pipeline.py:30-65."""
    songs = song_df.select("song_id", "title", "artist_id", "year", "duration")
    songs = sentinel_to_null(songs, "year", 0)
    return dedup_keep_first(songs, ["song_id"], ["artist_id", "song_id"])


def get_artists_table(song_df: DataFrame) -> DataFrame:
    """artists(artist_id, name, location, latitude, longitude): keep-first
    per artist_id ordered by name. Reference: etl_pipeline.py:67-99."""
    artists = song_df.select(
        "artist_id",
        F.col("artist_name").alias("name"),
        F.col("artist_location").alias("location"),
        F.col("artist_latitude").alias("latitude"),
        F.col("artist_longitude").alias("longitude"),
    )
    return dedup_keep_first(artists, ["artist_id"], ["artist_id", "name"])


def clean_log_data(log_df: DataFrame) -> DataFrame:
    """Cleaned log: dropna over 12 columns, AND-of-non-empty over 8 string
    columns (defect-D2 corrected), page='NextSong', userId → long, and
    ``start_time`` derived once via timestamp_millis (defect-D3 corrected).
    Reference: etl_pipeline.py:192-229."""
    df = drop_null_rows(log_df, _DROPNA_SUBSET)
    df = drop_empty_string_rows(df, _NONEMPTY_SUBSET)
    df = df.filter(F.col("page") == "NextSong")
    df = df.withColumn("userId", F.col("userId").cast(T.LongType()))
    return df.withColumn("start_time", epoch_millis_to_timestamp("ts"))


def get_users_table(cleaned_log: DataFrame) -> DataFrame:
    """users(user_id, first_name, last_name, gender, level): latest record
    per user wins, so ``level`` is the user's current plan.
    Reference: etl_pipeline.py:120-154."""
    users = cleaned_log.select(
        F.col("userId").alias("user_id"),
        F.col("firstName").alias("first_name"),
        F.col("lastName").alias("last_name"),
        "gender",
        "level",
        "ts",
    )
    return dedup_keep_latest(users, ["user_id"], "ts").drop("ts")


def get_time_table(cleaned_log: DataFrame) -> DataFrame:
    """time(start_time, hour, day, week, month, year, weekday), distinct;
    weekday is ISO 1=Mon..7=Sun. Reference: etl_pipeline.py:156-190."""
    c = F.col("start_time")
    return cleaned_log.select(
        c.alias("start_time"),
        F.hour(c).alias("hour"),
        F.dayofmonth(c).alias("day"),
        F.weekofyear(c).alias("week"),
        F.month(c).alias("month"),
        F.year(c).alias("year"),
        iso_weekday(c).alias("weekday"),
    ).dropDuplicates()


def get_songplays_table(
    cleaned_log: DataFrame, songs: DataFrame, artists: DataFrame
) -> DataFrame:
    """songplays: log ⋈ (songs ⋈ artists) on (artist=name, song=title,
    length=duration) — the reference's 3-key equi-join including a
    float-equality key (etl_pipeline.py:259-285). ``song_id`` deliberately
    absent from the output (reference fidelity). Dimension side broadcast:
    the song catalog is small relative to the event log."""
    catalog = (
        songs.alias("s")
        .join(F.broadcast(artists.alias("a")), F.col("s.artist_id") == F.col("a.artist_id"))
        .select(
            F.col("s.song_id"),
            F.col("s.title"),
            F.col("s.duration"),
            F.col("s.artist_id"),
            F.col("a.name"),
        )
    )
    log = cleaned_log.alias("l")
    joined = F.broadcast(catalog.alias("c")).join(
        log,
        (F.col("l.artist") == F.col("c.name"))
        & (F.col("l.song") == F.col("c.title"))
        & (F.col("l.length") == F.col("c.duration")),
    )
    return joined.select(
        F.col("l.start_time").alias("start_time"),
        F.col("l.userId").alias("user_id"),
        F.col("l.level").alias("level"),
        F.col("c.artist_id").alias("artist_id"),
        F.col("l.sessionId").alias("session_id"),
        F.col("l.location").alias("location"),
        F.col("l.userAgent").alias("user_agent"),
        F.year("l.start_time").alias("year"),
        F.month("l.start_time").alias("month"),
    )


def run_sparkify_pipeline(
    spark: SparkSession, song_path: str, log_path: str, output_dir: str
) -> dict[str, DataFrame]:
    """End-to-end pipeline: JSON sources → 5 star-schema Parquet tables,
    partitioned per the reference layout (songs by (year, artist_id); time
    and songplays by (year, month)); idempotent overwrite writes."""
    out = output_dir.rstrip("/")
    song_df = read_json_lines(spark, song_path, SONG_SCHEMA)
    log_df = read_json_lines(spark, log_path, LOG_SCHEMA)

    songs = get_songs_table(song_df)
    artists = get_artists_table(song_df)
    write_parquet(songs, f"{out}/songs", partition_by=["year", "artist_id"])
    write_parquet(artists, f"{out}/artists")

    cleaned = clean_log_data(log_df)
    users = get_users_table(cleaned)
    time_table = get_time_table(cleaned)
    write_parquet(users, f"{out}/users")
    write_parquet(time_table, f"{out}/time", partition_by=["year", "month"])

    # Read-back with explicit schemas: an empty input slice writes a parquet
    # directory with no data files, and schema inference on it fails with
    # UNABLE_TO_INFER_SCHEMA — a legitimate state at scale, so never infer.
    def read_back(path: str, schema) -> DataFrame:
        return spark.read.schema(schema).parquet(path)

    songs_rt = read_back(f"{out}/songs", songs.schema)
    artists_rt = read_back(f"{out}/artists", artists.schema)
    songplays = get_songplays_table(cleaned, songs_rt, artists_rt)
    write_parquet(songplays, f"{out}/songplays", partition_by=["year", "month"])

    return {
        "songs": songs_rt,
        "artists": artists_rt,
        "users": read_back(f"{out}/users", users.schema),
        "time": read_back(f"{out}/time", time_table.schema),
        "songplays": read_back(f"{out}/songplays", songplays.schema),
    }
