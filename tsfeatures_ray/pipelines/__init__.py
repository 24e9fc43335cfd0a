from .flagship import (  # noqa: F401
    derived_pipeline,
    rollup_pipeline,
    feature_pipeline,
    tsfeatures,
    tsfeatures_wide,
)
