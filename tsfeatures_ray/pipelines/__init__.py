from .analytics import pricing_summary, revenue_by_priority  # noqa: F401
from .flagship import (  # noqa: F401
    derived_pipeline,
    feature_pipeline,
    rollup_pipeline,
    tsfeatures,
    tsfeatures_wide,
)
from .r_bridge import tsfeatures_r, tsfeatures_r_wide  # noqa: F401
