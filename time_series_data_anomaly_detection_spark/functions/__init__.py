from .kalman import kalman_local_level, kalman_fixed, bsts_forecast  # noqa: F401
from .gp import gp_forecast, train_subsample  # noqa: F401
from .bocpd import bocpd_changepoints  # noqa: F401
from .ar import ar_forecast  # noqa: F401
from .stl import stl_decompose  # noqa: F401
from .lstm import lstm_forecast  # noqa: F401
