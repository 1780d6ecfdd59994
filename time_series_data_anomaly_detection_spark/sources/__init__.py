from .loader import (  # noqa: F401
    events_as_series,
    load_labels_json,
    load_series_csv,
    with_row_index,
)
