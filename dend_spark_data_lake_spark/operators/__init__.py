from .cleaning import drop_null_rows, drop_empty_string_rows, sentinel_to_null  # noqa: F401
from .dedup import dedup_keep_first, dedup_keep_latest, dedup_exact  # noqa: F401
from .joins import asof_join, bucketed_range_join, broadcast_dim_join  # noqa: F401
from .windows import per_group_top_k  # noqa: F401
from .datetime_ops import epoch_millis_to_timestamp, calendar_parts  # noqa: F401
