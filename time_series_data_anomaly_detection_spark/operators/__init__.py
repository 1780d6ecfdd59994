from .rolling import rolling_stats, adaptive_threshold_flags  # noqa: F401
from .scaling import global_zscore, mad_scores, median_center  # noqa: F401
from .events import flags_to_events, persistence_filter  # noqa: F401
from .labeling import mark_anomaly_windows, top_value_labels  # noqa: F401
from .splits import fractional_split  # noqa: F401
from .evaluate import (  # noqa: F401
    pointwise_metrics,
    event_level_metrics,
    business_metrics,
)
from .sweep import threshold_sweep_pointwise  # noqa: F401
from .decompose import resample, classical_decompose  # noqa: F401
