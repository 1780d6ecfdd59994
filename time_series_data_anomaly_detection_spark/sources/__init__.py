from .bucketing import (  # noqa: F401
    read_bucketed,
    write_bucketed,
)
from .loader import (  # noqa: F401
    events_as_series,
    load_labels_json,
    load_series_csv,
    with_row_index,
)
from .sinks import (  # noqa: F401
    read_metrics_tree,
    write_leaderboard,
    write_metrics,
    write_predictions,
)
