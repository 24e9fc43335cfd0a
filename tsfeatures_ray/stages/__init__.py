from .derive import derive_turn_metrics, stable_part  # noqa: F401
from .rollup import rollup, gapfill_rollup  # noqa: F401
from .pack import pack_series  # noqa: F401
from .features import FeatureKernels, features_over_packed  # noqa: F401
