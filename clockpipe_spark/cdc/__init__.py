from clockpipe_spark.cdc.changelog import changelog_from_events, CHANGELOG_SQL  # noqa: F401
from clockpipe_spark.cdc.ops import (  # noqa: F401
    keep_last_by_key,
    replica_state,
    align_to_schema,
    apply_masks,
    route_counts,
)
