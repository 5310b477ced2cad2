"""N-step training-dynamics parity against the actual PyTorch reference.

Forward-pass parity (``test_reference_parity.py``) proves the converted
weights compute the same logits; this test proves the *training recipe*
matches: starting from identical (converted) init, run the reference's exact
fine-stream update — SGD momentum 0.9 / weight-decay 1e-5, BCE cls+loc loss,
BN running-stat updates (``train_fine.py:130-137,209-226``) — for N steps on
identical synthetic batches in torch-CPU and in our jitted train step, and
assert the per-step losses track within tolerance.  This converts the
"torch-exact SGD" claim into a test, and is the best available stand-in for
the released-checkpoint acceptance bar while the ``.pt`` blobs are stripped
from this mirror (VERDICT r04 #5).

Dropout is built at 0.0 on both sides (the only RNG the step consumes), so
the two trajectories are deterministic given the shared numpy batches.
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

REF_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF_DIR),
                       reason="reference tree not available"),
]

if os.path.isdir(REF_DIR) and REF_DIR not in sys.path:
    sys.path.insert(0, REF_DIR)

N_STEPS = 12
B, T, H, TL, C = 2, 8, 64, 32, 7
LR = 0.02


@pytest.fixture(autouse=True)
def _cpu_cuda_patch(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


def _torch_step(net, opt, x, labels, masks):
    """One reference train step (train_fine.py:197-226, num_steps_per_update
    = 1).  ``x``: (B,3,T,H,W); ``labels``: (B,C,TL); ``masks``: (B,TL)."""
    net.train(True)
    logits = net([x, None])                                   # B C T
    logits = F.interpolate(logits, TL, mode="linear", align_corners=True)
    probs = torch.sigmoid(logits) * masks.unsqueeze(1)
    cls_loss = F.binary_cross_entropy(
        torch.max(probs, dim=2)[0], torch.max(labels, dim=2)[0],
        reduction="mean")
    loc_loss = F.binary_cross_entropy(
        probs, labels, reduction="sum") / (torch.sum(masks) * labels.shape[1])
    loss = (cls_loss + loc_loss) / 2
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss.detach())


def test_fine_training_dynamics_parity():
    import x3d_fine  # reference, read-only

    from coarse_fine_networks_tpu.ckpt import (
        convert_torch_state_dict,
        merge_trees,
    )
    from coarse_fine_networks_tpu.models import FineNet
    from coarse_fine_networks_tpu.train import TrainState, make_train_step

    torch.manual_seed(7)
    ref = x3d_fine.generate_model(
        "M", n_classes=C, n_input_channels=3, task="loc", dropout=0.0,
        base_bn_splits=1, t_downsample=False,
    )
    opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=0.9,
                          weight_decay=1e-5)

    ours = FineNet(version="M", n_classes=C, task="loc", dropout_rate=0.0,
                   bn_splits=1)
    rng = np.random.RandomState(0)
    x0 = rng.rand(B, T, H, H, 3).astype(np.float32)
    variables = jax.jit(
        lambda: ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(x0), False))()
    converted = convert_torch_state_dict(ref.state_dict(), "fine")
    variables = {
        "params": merge_trees(jax.device_get(variables["params"]),
                              converted["params"]),
        "batch_stats": merge_trees(
            jax.device_get(variables["batch_stats"]),
            converted["batch_stats"]),
    }
    init_params = dict(
        (jax.tree_util.keystr(k), np.array(v)) for k, v in
        jax.tree_util.tree_flatten_with_path(variables["params"])[0])
    state = TrainState.create(variables)
    step = make_train_step(ours, align_corners=True, momentum=0.9,
                           weight_decay=1e-5, donate=False)
    key = jax.random.PRNGKey(0)

    losses_t, losses_j = [], []
    with jax.default_matmul_precision("highest"):
        for i in range(N_STEPS):
            x = rng.rand(B, T, H, H, 3).astype(np.float32)
            labels = (rng.rand(B, TL, C) > 0.7).astype(np.float32)
            masks = np.ones((B, TL), np.float32)

            losses_t.append(_torch_step(
                ref, opt,
                torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
                torch.from_numpy(labels.transpose(0, 2, 1)),
                torch.from_numpy(masks)))

            batch = {"clips": jnp.asarray(x), "labels": jnp.asarray(labels),
                     "masks": jnp.asarray(masks)}
            state, metrics = step(state, batch, jnp.asarray(LR), key)
            losses_j.append(float(metrics["loss"]))

    losses_t = np.asarray(losses_t)
    losses_j = np.asarray(losses_j)
    print("torch:", np.array2string(losses_t, precision=5))
    print("jax:  ", np.array2string(losses_j, precision=5))
    # identical init => step-0 loss is forward parity; later steps compound
    # optimizer/BN-update parity.  f32 CPU both sides, tolerance grows with
    # step count (divergence is chaotic amplification of rounding, not
    # bias).  Step 0 measured ~3e-4 apart: the train-mode loss runs through
    # BN *batch* statistics (different reduction order than torch) and a
    # sum-BCE over B*TL*C elements, so it is noisier than the 1e-4
    # eval-mode logits parity of test_reference_parity.py.
    np.testing.assert_allclose(losses_j[0], losses_t[0], atol=1e-3)
    np.testing.assert_allclose(losses_j[:4], losses_t[:4], atol=5e-3)
    np.testing.assert_allclose(losses_j, losses_t, atol=3e-2)
    # both learn: losses decrease in tandem
    assert losses_j[-1] < losses_j[0] and losses_t[-1] < losses_t[0]

    # end-state parameter agreement (relative, all leaves)
    conv_end = convert_torch_state_dict(ref.state_dict(), "fine")
    flat_ref = jax.tree_util.tree_flatten_with_path(conv_end["params"])[0]
    flat_ours = dict(
        (jax.tree_util.keystr(k), v) for k, v in
        jax.tree_util.tree_flatten_with_path(
            jax.device_get(state.params))[0])
    # Direction-level end-state agreement is NOT assertable at f32: torch's
    # own f32-vs-f64 gradient error reaches ~10% on near-zero-grad leaves,
    # and 12 chaotic steps decorrelate the small BN-bias updates entirely
    # (measured ||d||/||ref|| up to 1.6 on bn biases that start at 0 —
    # identical on both sides of a residual pair, i.e. reduction-order
    # noise, not a recipe difference).  What a recipe bug (wrong momentum,
    # wd, LR grouping, BN freeze) *does* change robustly is the UPDATE
    # MAGNITUDE per leaf — assert those match within 2x.
    rows = []
    for k, v in flat_ref:
        kk = jax.tree_util.keystr(k)
        if kk not in flat_ours or kk not in init_params:
            continue
        a0 = np.asarray(init_params[kk])
        ua = float(np.linalg.norm((np.asarray(v) - a0).ravel()))
        ub = float(np.linalg.norm(
            (np.asarray(flat_ours[kk]) - a0).ravel()))
        if ua < 1e-7 and ub < 1e-7:
            continue  # untrained leaf on both sides
        ratio = (ub + 1e-12) / (ua + 1e-12)
        rows.append((abs(np.log(ratio)), ratio, kk))
    assert rows, "no comparable leaves"
    rows.sort(reverse=True)
    print("worst update-magnitude ratios (jax/torch):")
    for r in rows[:5]:
        print(f"  {r[1]:.3f} {r[2]}")
    # per-leaf: loose (near-zero-grad SE biases measured up to ~1.9x from
    # chaos alone); aggregate median: tight — a recipe bug (momentum off,
    # loss rescaled, a frozen group) shifts the whole distribution, chaos
    # does not.
    assert rows[0][0] < np.log(3.0), rows[:5]
    med = float(np.median([r[0] for r in rows]))
    print(f"median |log update ratio| = {med:.4f}")
    assert med < np.log(1.2), med
