from .kalman import kalman_local_level, bsts_forecast  # noqa: F401
from .gp import gp_forecast  # noqa: F401
from .bocpd import bocpd_changepoints  # noqa: F401
from .ar import ar_forecast  # noqa: F401
from .stl import stl_decompose  # noqa: F401
