"""coarse_fine_networks_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of kkahatapitiya/Coarse-Fine-Networks (CVPR 2021).

Re-designed TPU-first, NOT a port:

* channels-last ``(B, T, H, W, C)`` layouts everywhere (TPU conv efficiency),
* the reference's ``F.grid_sample`` / ``searchsorted``-autograd patterns become
  differentiable "hat-matrix" temporal resamples that run on the MXU
  (:mod:`~coarse_fine_networks_tpu.ops.resample`),
* the reference's O(B·C·T·T'·H·W) RewightLayer broadcast becomes a pair of
  einsum contractions (:mod:`~coarse_fine_networks_tpu.ops.reweight`),
* data parallelism via ``jax.sharding.Mesh`` + jit (XLA collectives over ICI)
  instead of ``nn.DataParallel``.

Public surface mirrors the reference's three entry points
(train_fine / extract_fineFEAT / train_coarse_fineFEAT); see
:mod:`coarse_fine_networks_tpu.cli`.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
