"""Pinned-output regression gates for the two optimizer-backed kernels
with the weakest external evidence (VERDICT r2 item 8): heterogeneity
(AR-by-AIC + GARCH(1,1) profile-likelihood MLE, kernels/het.py) and
hw_parameters (Holt-Winters SSE Nelder-Mead, kernels/ets.py).

The reference's own R<->Python diffs are large for these kernels
(reference README:95-141) and its Python deps (statsmodels/arch) are not
installable here, so conformance evidence is structural + dense-grid
SSE gates (test_kernels_optim_gates.py). What those gates cannot catch
is silent OPTIMIZER DRIFT -- a refactor that changes the converged
point while still satisfying the loose structural bounds. These pins
freeze the exact current outputs on the public golden series and a
seeded synthetic panel: any change to the optimizers flips this test,
forcing a deliberate re-pin with justification.

Pinned 2026-08-17 (round 3), DELIBERATELY re-pinned same day (round 4)
after two verified kernel changes:

- hw grid-seed fix: the old _hw_sse_grid used (1-a)*(l+b+s) in the level
  update while the NM objective used the standard (1-a)*(l+b); unifying
  on the standard recursion reseeds the NM, and the re-pinned hw fits
  have strictly LOWER SSE on these series (usacc 5.507 -> 5.402, synth
  3.499752 -> 3.499751; dense-grid gates still pass).
- GARCH NLL log: math.log -> np.log (required for bit-equality between
  the per-series and lane-batched execution paths; the two differ by
  1 ulp on ~25% of inputs), shifting garch_* in the last 1-2 digits.

Tolerance 1e-9 relative: the kernels are deterministic pure NumPy, so
anything beyond ULP noise is drift.
"""

from __future__ import annotations

import numpy as np
import pytest

PINS = {
    # series -> {feature: pinned value}; NaN = optimizer degrades
    # (WWWusage is nonseasonal: hw_* is NaN by contract, freq == 1)
    "www": {
        "arch_acf": 0.04617380627872344,
        "garch_acf": 0.04617344471517632,
        "arch_r2": 0.0547680173997489,
        "garch_r2": 0.0547680173997489,
        "hw_alpha": float("nan"),
        "hw_beta": float("nan"),
        "hw_gamma": float("nan"),
    },
    "usacc": {
        "arch_acf": 0.17346808112427817,
        "garch_acf": 0.17347773243338666,
        "arch_r2": 0.15428533479981044,
        "garch_r2": 0.1542853347998101,
        "hw_alpha": 0.5735303719981533,
        "hw_beta": 7.400165237746444e-05,
        "hw_gamma": 1.0293196274868633e-06,
    },
    "synth": {
        "arch_acf": 0.18258440772893414,
        "garch_acf": 0.1825816223021352,
        "arch_r2": 0.21587646022287532,
        "garch_r2": 0.2158764602228751,
        "hw_alpha": 0.9384482272838226,
        "hw_beta": 0.2613834605305555,
        "hw_gamma": 0.061548497506095805,
    },
}


def _series():
    from tsfeatures_ray.kernels.golden import USAccDeaths, WWWusage

    rng = np.random.RandomState(42)
    synth = 100 + np.cumsum(rng.randn(120)) + np.sin(np.arange(120) / 6) * 4
    return {
        "www": (np.asarray(WWWusage, float), 1),
        "usacc": (np.asarray(USAccDeaths, float), 12),
        "synth": (synth, 12),
    }


@pytest.mark.parametrize("name", list(PINS))
def test_heterogeneity_and_hw_pinned(name):
    from tsfeatures_ray.kernels import heterogeneity, hw_parameters
    from tsfeatures_ray.kernels._math import scalets

    x, freq = _series()[name]
    z = scalets(x)
    got = {**heterogeneity(z, freq), **hw_parameters(z, freq)}
    for feat, want in PINS[name].items():
        g = got[feat]
        if np.isnan(want):
            assert np.isnan(g), (name, feat, g)
        else:
            assert g == pytest.approx(want, rel=1e-9), (name, feat, g, want)
