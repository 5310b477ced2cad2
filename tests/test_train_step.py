"""Train/eval step tests: SGD parity vs torch, loss parity vs torch BCELoss,
a real optimisation step on a tiny FineNet, and data-parallel equivalence on
the 8-device CPU mesh."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.models import FineNet
from coarse_fine_networks_tpu.parallel import make_mesh, shard_batch
from coarse_fine_networks_tpu.parallel.mesh import replicate
from coarse_fine_networks_tpu.train import (
    TrainState,
    make_eval_step,
    make_train_step,
)
from coarse_fine_networks_tpu.train.losses import bce_loss, detection_loss
from coarse_fine_networks_tpu.train.optim import (
    MultiStepSchedule,
    fusion_lr_scale,
    sgd_init,
    sgd_update,
)


def test_sgd_matches_torch():
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(3)]

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([pt], lr=0.01, momentum=0.9, weight_decay=1e-5)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        opt.step()

    params = {"w": jnp.asarray(p0)}
    state = sgd_init(params)
    for g in grads:
        params, state = sgd_update(params, {"w": jnp.asarray(g)}, state,
                                   jnp.asarray(0.01))
    np.testing.assert_allclose(
        np.asarray(params["w"]), pt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_fusion_lr_scale_rule():
    assert fusion_lr_scale("['rw2']['at1']['kernel']") == 10.0
    assert fusion_lr_scale("['mix3']['conv_at']['bias']") == 10.0
    assert fusion_lr_scale("['layer1']['block0']['conv1']['kernel']") == 1.0


def test_detection_loss_matches_torch_bce():
    rng = np.random.RandomState(0)
    b, tl, c = 2, 10, 7
    logits = rng.randn(b, tl, c).astype(np.float32)
    labels = (rng.rand(b, c, tl) > 0.7).astype(np.float32)
    masks = np.ones((b, tl), np.float32)
    masks[1, -3:] = 0

    probs_j = jax.nn.sigmoid(jnp.asarray(logits)) * jnp.asarray(masks)[:, :, None]
    total, cls, loc = detection_loss(
        probs_j, jnp.asarray(labels.transpose(0, 2, 1)), jnp.asarray(masks)
    )

    probs_t = torch.sigmoid(torch.from_numpy(logits.transpose(0, 2, 1)))
    probs_t = probs_t * torch.from_numpy(masks).unsqueeze(1)
    lab_t = torch.from_numpy(labels)
    cls_ref = torch.nn.BCELoss(reduction="mean")(
        torch.max(probs_t, dim=2)[0], torch.max(lab_t, dim=2)[0]
    )
    loc_ref = torch.nn.BCELoss(reduction="sum")(probs_t, lab_t) / (
        torch.from_numpy(masks).sum() * c
    )
    np.testing.assert_allclose(float(cls), float(cls_ref), rtol=1e-4)
    np.testing.assert_allclose(float(loc), float(loc_ref), rtol=1e-4)
    np.testing.assert_allclose(
        float(total), float((cls_ref + loc_ref) / 2), rtol=1e-4
    )


def test_multistep_schedule():
    sched = MultiStepSchedule(0.01, milestones=[2, 4], warmup_steps=0)
    assert sched.lr(0) == pytest.approx(0.01)
    sched.epoch_step(); sched.epoch_step()
    assert sched.lr(100) == pytest.approx(0.001)
    sched.epoch_step(); sched.epoch_step()
    assert sched.lr(100) == pytest.approx(0.0001)
    warm = MultiStepSchedule(0.01, milestones=[], warmup_steps=10)
    assert warm.lr(5) == pytest.approx(0.01 * 6 / 10)
    assert warm.lr(0) == pytest.approx(0.01)  # warmup starts after step 1


def _tiny_batch(rng, b=4, t=8, h=56, tl=16, c=11):
    return {
        "clips": jnp.asarray(rng.randn(b, t, h, h, 3), jnp.float32),
        "labels": jnp.asarray((rng.rand(b, tl, c) > 0.8), jnp.float32),
        "masks": jnp.ones((b, tl), jnp.float32),
    }


@pytest.mark.slow
def test_train_step_optimises_tiny_fine():
    rng = np.random.RandomState(0)
    model = FineNet(version="M", n_classes=11, task="loc")
    batch = _tiny_batch(rng)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           batch["clips"], False)
    )()
    state = TrainState.create(variables)
    step = make_train_step(model, align_corners=True, donate=False)
    key = jax.random.PRNGKey(1)

    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, jnp.asarray(0.05), key)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 3
    # BN running stats moved
    sm = state.batch_stats["stem"]["bn1"]["split_mean"]
    assert float(jnp.abs(sm).max()) > 0

    # eval step runs and returns finite masked probs
    from coarse_fine_networks_tpu.train.steps import bn_aggregated
    ev = make_eval_step(model, align_corners=True)
    out = ev(bn_aggregated(state), batch)
    assert np.isfinite(float(out["loss"]))
    assert out["probs"].shape == batch["labels"].shape


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    """Sharded batch over the 8-device CPU mesh == single-device math (global
    BN + allreduced grads are the same program)."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    rng = np.random.RandomState(0)
    model = FineNet(version="M", n_classes=7, task="loc")
    batch = _tiny_batch(rng, b=8, t=4, h=28, tl=8, c=7)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           batch["clips"], False)
    )()
    key = jax.random.PRNGKey(7)
    step = make_train_step(model, donate=False)

    s1 = TrainState.create(variables)
    s1, m1 = step(s1, batch, jnp.asarray(0.01), key)

    mesh = make_mesh(8)
    s2 = TrainState.create(variables)
    s2 = replicate(s2, mesh)
    sb = shard_batch(batch, mesh)
    s2, m2 = step(s2, sb, jnp.asarray(0.01), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.device_get(s1.params["fc2"]["kernel"])
    l2 = jax.device_get(s2.params["fc2"]["kernel"])
    np.testing.assert_allclose(l1, l2, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_sequence_sharded_reweight_matches_single_device():
    """T_f-sharded fusion attention (partial sums + psum over the mesh)
    equals the dense single-device aggregation."""
    from coarse_fine_networks_tpu.ops import reweight_aggregate
    from coarse_fine_networks_tpu.parallel.sequence import (
        sequence_sharded_reweight,
        shard_time,
    )

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    b, tf, tc, h, c = 2, 32, 5, 7, 6  # tf divisible by 8
    feat = jnp.asarray(rng.rand(b, tf, h, h, c), jnp.float32)
    gate = jnp.asarray(rng.rand(b, tf, h, h), jnp.float32)
    align = jnp.asarray(rng.rand(b, tf, tc), jnp.float32)
    mask = jnp.asarray((rng.rand(b, tf) > 0.2), jnp.float32)

    ref = reweight_aggregate(feat, gate, align, mask)
    got = sequence_sharded_reweight(
        shard_time(feat, mesh), shard_time(gate, mesh),
        shard_time(align, mesh), shard_time(mask, mesh), mesh,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
