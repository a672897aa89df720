"""multih-tpu: TPU-native multi-homography recovery (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of the reference C++ codebase
``danini/multi-h`` (SURVEY.md; BASELINE.json:5): given stereo point
correspondences, recover multiple homographies (scene planes) and a
per-correspondence plane label via hypothesize -> verify -> PEARL-style
alternating optimization — designed TPU-first, not translated.
"""

from multih_tpu.config import MultiHConfig, DEFAULT
from multih_tpu.models.mixed import (
    MixedFitResult,
    estimate_tau_mixed,
    fit_mixed,
    fit_mixed_adaptive,
    make_fit_mixed,
    make_fit_mixed_adaptive,
    make_fit_mixed_tau,
)
from multih_tpu.models.pipeline import (
    FitResult,
    estimate_tau,
    fit,
    fit_adaptive,
    make_fit,
    make_fit_adaptive,
    make_fit_seeded,
    make_fit_tau,
    pad_points,
)

__version__ = "0.1.0"

__all__ = [
    "MultiHConfig",
    "DEFAULT",
    "FitResult",
    "MixedFitResult",
    "estimate_tau",
    "estimate_tau_mixed",
    "fit",
    "fit_adaptive",
    "fit_mixed",
    "fit_mixed_adaptive",
    "make_fit_mixed",
    "make_fit_mixed_adaptive",
    "make_fit_mixed_tau",
    "make_fit",
    "make_fit_adaptive",
    "make_fit_seeded",
    "make_fit_tau",
    "pad_points",
    "__version__",
]
