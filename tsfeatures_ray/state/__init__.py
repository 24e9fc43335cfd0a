from .lineage import Manifest, run_resumable_rollup  # noqa: F401
