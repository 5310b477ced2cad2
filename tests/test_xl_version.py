"""X3D-XL configuration smoke test (different channel/blocks tables,
x3d_fine.py:388-400)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import FineNet


@pytest.mark.slow
def test_xl_fine_forward_shapes():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 4, 32, 32, 3), jnp.float32)
    m = FineNet(version="XL", n_classes=5, task="loc")
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, x, False))()
    out = jax.jit(lambda v, x: m.apply(v, x, False))(v, x)
    assert out.shape == (1, 4, 5)
    assert np.isfinite(np.asarray(out)).all()
    # XL widths (x3d_fine.py:391): stage-4 projection is 280 channels
    assert v["params"]["layer4"]["block0"]["conv3"]["kernel"].shape[-1] == 280
    # 15 blocks in stage 4 (x3d_fine.py:398)
    assert "block14" in v["params"]["layer4"]
