from .data import PosteriorData, PRIMARY_PARAMS, SECONDARY_PARAMS  # noqa: F401
from .vizconfig import VizConfig, load_vizconfig, save_vizconfig  # noqa: F401
from . import stats  # noqa: F401
