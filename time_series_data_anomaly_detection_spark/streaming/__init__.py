from .dedup import streaming_exact_dedup  # noqa: F401
from .detectors import (  # noqa: F401
    streaming_window_stats,
    streaming_rolling_flags,
    streaming_bocpd,
    streaming_user_sessions,
)
