"""Pure-function numeric ops (layer L0/L1 of the framework).

Everything here is shape-static, jit-safe and differentiable by construction —
no autograd tricks like the reference's ``interp1d.py:149-162`` backward-via-
``torch.autograd.grad`` hack are needed in JAX.
"""

from .resample import (
    hat_matrix,
    temporal_resample,
    linear_resize,
    inverse_cdf,
    interp1d,
)
from .gaussian import gaussian_alignment
from .reweight import reweight_aggregate
from .pools import (
    adaptive_avg_pool_spatial,
    adaptive_max_pool_spatial,
    spatial_replicate,
)
from .grid_pool import cdf_knots

__all__ = [
    "hat_matrix",
    "temporal_resample",
    "linear_resize",
    "inverse_cdf",
    "interp1d",
    "gaussian_alignment",
    "reweight_aggregate",
    "adaptive_avg_pool_spatial",
    "adaptive_max_pool_spatial",
    "spatial_replicate",
    "cdf_knots",
]
