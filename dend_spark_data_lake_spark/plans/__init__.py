from .sparkify import (  # noqa: F401
    LOG_SCHEMA,
    SONG_SCHEMA,
    clean_log_data,
    get_artists_table,
    get_songs_table,
    get_time_table,
    get_users_table,
    get_songplays_table,
    run_sparkify_pipeline,
)
