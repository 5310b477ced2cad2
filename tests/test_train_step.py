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


def test_bce_grad_finite_at_saturation():
    """Masked frames carry exactly-0 probs; the -100 log clamp must not NaN
    the backward (double-where pattern in losses.bce_loss)."""
    probs = jnp.asarray([0.0, 1.0, 0.5, 1e-45], jnp.float32)
    targets = jnp.asarray([1.0, 0.0, 1.0, 0.0], jnp.float32)
    val, grad = jax.value_and_grad(
        lambda p: jnp.sum(bce_loss(p, targets)))(probs)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    # forward still matches torch's clamped BCE
    pt = torch.nn.BCELoss(reduction="sum")(
        torch.tensor([0.0, 1.0, 0.5, 1e-45]),
        torch.tensor([1.0, 0.0, 1.0, 0.0]))
    np.testing.assert_allclose(float(val), float(pt), rtol=1e-5)


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


def test_warmup_scales_init_lr_across_milestone():
    """The reference's lr_warmup writes ``lr_scale * init_lr`` regardless of
    MultiStepLR decays (train_fine.py:258-263): warmup spanning a milestone
    must keep scaling init_lr, not the decayed LR."""
    sched = MultiStepSchedule(0.01, milestones=[1], warmup_steps=100)
    sched.epoch_step()  # decay fires while warmup is still running
    assert sched.lr(50) == pytest.approx(0.01 * 51 / 100)  # NOT 0.001 * ...
    assert sched.in_warmup(50)
    # after the window, the decayed LR applies
    assert not sched.in_warmup(100)
    assert sched.lr(100) == pytest.approx(0.001)
    # boundary semantics: warmup starts strictly after step 1
    assert not sched.in_warmup(0)
    assert not sched.in_warmup(1)
    assert sched.in_warmup(2)


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


class _TinyFusion(__import__("flax").linen.Module):
    """Minimal module with a fusion-named ('rw') param and BN stats, to test
    LR plumbing without the full CoarseNet."""

    @__import__("flax").linen.compact
    def __call__(self, x, train=True):
        import flax.linen as nn
        x = nn.Dense(8, name="rw_proj")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.Dense(5, name="head")(x)


def _tiny_fusion_setup(rng):
    model = _TinyFusion()
    batch = {
        "clips": jnp.asarray(rng.randn(4, 6, 3), jnp.float32),
        "labels": jnp.asarray((rng.rand(4, 6, 5) > 0.7), jnp.float32),
        "masks": jnp.ones((4, 6), jnp.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["clips"], True)
    return model, batch, TrainState.create(variables)


def test_fusion_lr_traced_override():
    """``lr_fusion`` overrides the static 10x multiplier — used to flatten
    the fusion group during warmup exactly like the reference's lr_warmup
    writes one LR into every param group (train_coarse_fineFEAT.py:296-300)."""
    rng = np.random.RandomState(0)
    model, batch, state = _tiny_fusion_setup(rng)
    key = jax.random.PRNGKey(1)
    step = make_train_step(model, fusion_lr_mult=10.0, donate=False)
    lr = jnp.asarray(0.1, jnp.float32)

    s_mult, _ = step(state, batch, lr, key)            # rw at 10x lr
    s_flat, _ = step(state, batch, lr, key, lr)        # rw flattened to lr

    p0 = np.asarray(state.params["rw_proj"]["kernel"])
    d_mult = np.asarray(s_mult.params["rw_proj"]["kernel"]) - p0
    d_flat = np.asarray(s_flat.params["rw_proj"]["kernel"]) - p0
    np.testing.assert_allclose(d_mult, 10.0 * d_flat, rtol=1e-3, atol=1e-8)
    # non-fusion params unaffected by the override
    np.testing.assert_allclose(
        np.asarray(s_mult.params["head"]["kernel"]),
        np.asarray(s_flat.params["head"]["kernel"]), rtol=1e-7)


def test_grad_clip_matches_torch_clip_grad_norm():
    """``grad_clip`` reproduces ``torch.nn.utils.clip_grad_norm_``: one
    global-L2 scale on the whole grad pytree, applied before momentum/wd.
    With a clip far above the gradient norm the step is unchanged; with a
    tiny clip the update direction is preserved and the first-step update
    magnitude scales by exactly ``clip / |g|`` (first step: buf = g, no wd
    interaction with the scaled grad beyond the shared formula)."""
    rng = np.random.RandomState(0)
    model, batch, state = _tiny_fusion_setup(rng)
    key = jax.random.PRNGKey(1)
    lr = jnp.asarray(0.1, jnp.float32)

    step_plain = make_train_step(model, donate=False, weight_decay=0.0)
    step_huge = make_train_step(model, donate=False, weight_decay=0.0,
                                grad_clip=1e9)
    clip = 1e-3
    step_tiny = make_train_step(model, donate=False, weight_decay=0.0,
                                grad_clip=clip)

    s_plain, _ = step_plain(state, batch, lr, key)
    s_huge, _ = step_huge(state, batch, lr, key)
    s_tiny, _ = step_tiny(state, batch, lr, key)

    for k in ("rw_proj", "head"):
        np.testing.assert_allclose(
            np.asarray(s_plain.params[k]["kernel"]),
            np.asarray(s_huge.params[k]["kernel"]), rtol=1e-6)

    # the tiny-clip update is the plain update scaled by clip/|g| globally
    gnorm = np.sqrt(sum(
        float(jnp.sum(jnp.square(
            (p0 - p1).astype(jnp.float32) / lr)))
        for p0, p1 in zip(jax.tree.leaves(state.params),
                          jax.tree.leaves(s_plain.params))))
    expect = clip / gnorm
    p0 = np.asarray(state.params["rw_proj"]["kernel"])
    d_plain = np.asarray(s_plain.params["rw_proj"]["kernel"]) - p0
    d_tiny = np.asarray(s_tiny.params["rw_proj"]["kernel"]) - p0
    # rtol is loose only because |g| is re-derived from f32 param deltas
    # (catastrophic cancellation at 1e-6-scale updates), not because the
    # clip math is approximate
    np.testing.assert_allclose(d_tiny, d_plain * expect, rtol=2e-2,
                               atol=1e-10)


def test_grad_accumulation_matches_manual_microbatches():
    """accum_steps=2 over two stacked micro-batches == manually summing the
    micro-grads of loss_i/accum with BN stats chained in order, then one SGD
    update (the reference's num_steps_per_update loop,
    train_fine.py:226-232)."""
    from coarse_fine_networks_tpu.train.steps import _forward_and_loss
    from coarse_fine_networks_tpu.train.optim import sgd_update as _sgd

    rng = np.random.RandomState(1)
    model, _, state = _tiny_fusion_setup(rng)
    key = jax.random.PRNGKey(2)

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        return {
            "clips": jnp.asarray(r.randn(2, 6, 3), jnp.float32),
            "labels": jnp.asarray((r.rand(2, 6, 5) > 0.7), jnp.float32),
            "masks": jnp.ones((2, 6), jnp.float32),
        }

    b0, b1 = mk_batch(10), mk_batch(11)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b0, b1)

    astep = make_train_step(model, donate=False, accum_steps=2)
    s_acc, m_acc = astep(state, stacked, jnp.asarray(0.05, jnp.float32), key)

    # manual: micro-grads with chained BN stats, same rng folding
    base = jax.random.fold_in(key, state.step)
    def loss(p, stats, mb, i):
        return _forward_and_loss(model, p, stats, mb,
                                 jax.random.fold_in(base, i), True, True,
                                 ["batch_stats"])
    (t0, (_, _, _, st1)), g0 = jax.value_and_grad(
        lambda p: loss(p, state.batch_stats, b0, 0), has_aux=True
    )(state.params)
    (t1, (_, _, _, st2)), g1 = jax.value_and_grad(
        lambda p: loss(p, st1, b1, 1), has_aux=True
    )(state.params)
    grads = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    params, _ = _sgd(state.params, grads, state.opt,
                     jnp.asarray(0.05, jnp.float32))

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s_acc.params, params)
    # BN stats chained through both micro-batches
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        s_acc.batch_stats, st2)
    np.testing.assert_allclose(
        float(m_acc["loss"]), (float(t0) + float(t1)) / 2.0, rtol=1e-5)
    assert int(s_acc.step) == 1  # one optimizer update, not two
    assert m_acc["probs"].shape[0] == 2  # leading micro axis


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
def test_data_parallel_step_matches_single_device_fold4():
    """The shipped TPU default — fold4 trunk + the five Pallas stencil
    kernels (run under the interpreter on CPU) — under batch sharding equals
    single-device math.  Exercises the kernels' custom_partitioning rules
    (ops/pallas/dw_fold.py): batch grid axis shards, wgrad tap sums psum.
    Matches the reference's parallelism surface (train_fine.py:123) x the
    depthwise convs (x3d_fine.py:89-97)."""
    assert jax.device_count() >= 8
    rng = np.random.RandomState(3)
    model = FineNet(version="M", n_classes=7, task="loc",
                    trunk_layout="fold4", dw_impl="interpret")
    batch = _tiny_batch(rng, b=8, t=4, h=32, tl=8, c=7)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           batch["clips"], False)
    )()
    key = jax.random.PRNGKey(9)
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
    # gradients (via updated params) match single-device math everywhere,
    # including through the stencil custom-calls' dx/wgrad kernels
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
        jax.device_get(s1.params), jax.device_get(s2.params))


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
