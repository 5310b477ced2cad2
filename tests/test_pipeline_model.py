"""Joint Coarse-Fine inference pipeline (single jitted program)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import CoarseFinePipeline


@pytest.mark.slow
def test_joint_inference_shapes_and_finiteness():
    rng = np.random.RandomState(0)
    b, t, tf, h = 1, 8, 12, 56
    clips = jnp.asarray(rng.rand(b, t, h, h, 3), jnp.float32)
    fine_clips = jnp.asarray(rng.rand(b, tf, h, h, 3), jnp.float32)
    meta = jnp.asarray([[0, t, 2 * t, 1]], jnp.int32)

    m = CoarseFinePipeline(n_classes=13)
    v = jax.jit(lambda: m.init({"params": jax.random.PRNGKey(0)}, clips,
                               fine_clips, meta))()
    probs = jax.jit(
        lambda v: m.apply(v, clips, fine_clips, meta, label_len=4 * t)
    )(v)
    assert probs.shape == (b, 4 * t, 13)
    p = np.asarray(probs)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
