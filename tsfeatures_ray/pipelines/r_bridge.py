"""R-bridge surface, signature-compatible with the reference
(reference tsfeatures_r.py:10-155): ``tsfeatures_r`` /
``tsfeatures_r_wide`` call the R ``tsfeatures`` package through rpy2
for cross-implementation validation.

rpy2 and R are NOT installed in this environment (the same failure mode
the reference has on a machine without them -- its module-level rpy2
import raises). This module soft-imports instead: importing it always
works, calling without rpy2 raises ImportError with guidance, and the
in-repo replacement for the validation role is the DuckDB oracle
harness (tools/check_contract.py, 37 exact-match queries) plus the
R-pinned golden values in tests/test_kernels_golden.py. With rpy2
present, the call builds the same R program the reference does (split
panel by unique_id -> ts objects at ``freq`` -> tsfeatures::tsfeatures,
hw_parameters renamed with the hw\\_ prefix, ARCH.LM/length renamed to
the python column names)."""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

_R_DEFAULT_FEATURES = [
    "length", "acf_features", "arch_stat", "crossing_points", "entropy",
    "flat_spots", "heterogeneity", "holt_parameters", "hurst",
    "hw_parameters", "lumpiness", "nonlinearity", "pacf_features",
    "stability", "stl_features", "unitroot_kpss", "unitroot_pp",
]

_RENAMER = {"ARCH.LM": "arch_lm", "length": "series_length"}

_R_PROGRAM = """
    function(df, freq, features, ...){
      suppressMessages(library(data.table))
      suppressMessages(library(tsfeatures))
      dt <- as.data.table(df)
      setkey(dt, unique_id)
      series_list <- split(dt, by = "unique_id", keep.by = FALSE)
      series_list <- lapply(series_list,
                            function(s) s[, ts(y, frequency = freq)])
      if ("hw_parameters" %in% features) {
        rest <- setdiff(features, "hw_parameters")
        hw <- suppressMessages(tsfeatures(series_list, "hw_parameters", ...))
        names(hw) <- paste0("hw_", names(hw))
        if (length(rest) > 0) {
          out <- cbind(suppressMessages(tsfeatures(series_list, rest, ...)), hw)
        } else {
          out <- hw
        }
      } else {
        out <- suppressMessages(tsfeatures(series_list, features, ...))
      }
      setDT(out)
      out[, unique_id := names(series_list)]
    }
"""


def _require_rpy2():
    try:
        import rpy2.robjects as robjects
        from rpy2.robjects import pandas2ri
    except ImportError as e:  # pragma: no cover - rpy2 absent here
        raise ImportError(
            "tsfeatures_r requires rpy2 and an R installation with the "
            "'tsfeatures' and 'data.table' packages (reference "
            "tsfeatures_r.py:7-8 imports rpy2 at module load and fails "
            "the same way). In this repo the cross-implementation "
            "validation role is filled by the DuckDB oracle harness "
            "(tools/check_contract.py) and the R-pinned golden-value "
            "tests (tests/test_kernels_golden.py)."
        ) from e
    return robjects, pandas2ri


def tsfeatures_r(
    ts: pd.DataFrame,
    freq: int,
    features: Sequence[str] = tuple(_R_DEFAULT_FEATURES),
    **kwargs,
) -> pd.DataFrame:
    """Reference-parity R bridge over a LONG panel (unique_id, ds, y).
    Requires rpy2 + R (see module docstring)."""
    robjects, pandas2ri = _require_rpy2()  # pragma: no cover
    pandas2ri.activate()
    try:
        feats = robjects.r(_R_PROGRAM)(ts, freq, list(features), **kwargs)
    finally:
        pandas2ri.deactivate()
    return feats.rename(columns=_RENAMER)


def tsfeatures_r_wide(
    ts: pd.DataFrame,
    features: Sequence[str] = tuple(_R_DEFAULT_FEATURES),
    **kwargs,
) -> pd.DataFrame:
    """Reference-parity R bridge over a WIDE panel (unique_id,
    seasonality, y=list) -- reference tsfeatures_r.py:83-155: melts to
    long per seasonality group and concatenates the per-frequency
    results. Requires rpy2 + R."""
    _require_rpy2()  # pragma: no cover -- fail fast before any work
    out = []
    for season, group in ts.groupby("seasonality"):
        rows = []
        for _, row in group.iterrows():
            for i, v in enumerate(row["y"]):
                rows.append((row["unique_id"], i, float(v)))
        long = pd.DataFrame(rows, columns=["unique_id", "ds", "y"])
        out.append(tsfeatures_r(long, int(season), features, **kwargs))
    return pd.concat(out, ignore_index=True)
