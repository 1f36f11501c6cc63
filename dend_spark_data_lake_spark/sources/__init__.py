from .io import (  # noqa: F401
    TESTDATA_TABLES,
    load_tables,
    read_json_lines,
    read_table,
    register_views,
    write_parquet,
)
