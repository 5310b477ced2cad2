"""Released-checkpoint parity — pre-wired acceptance harness.

The reference's released artifacts (``.MISSING_LARGE_BLOBS``) are stripped
from this mirror; the moment the ``.pt`` blobs appear (in
``$CFN_RELEASED_DIR``, default ``/root/reference/models``) these tests run
the BASELINE.json acceptance bar with zero new code:

  * ``fine_charades_039000_SAVE.pt``   → FineNet logits parity
    (load recipe of ``extract_fineFEAT.py:98-106``: 400-class model,
    ``replace_logits(157)``, dict-update partial merge);
  * ``coarse_fineFEAT_charades_019000_SAVE.pt`` → CoarseNet logits parity
    (``train_coarse_fineFEAT.py:120-123``);
  * ``x3d_multigrid_kinetics_fb_pretrained.pt`` → partial restore with the
    400→157 head swap through our driver load path
    (``train_fine.py:104-111``).

CLI one-liner once the blobs exist::

    python -m coarse_fine_networks_tpu.cli.convert_checkpoint \
        --input $CFN_RELEASED_DIR/fine_charades_039000_SAVE.pt \
        --model fine --output models/fine_charades_039000.ckpt

Random-weight versions of the same parity checks run unconditionally in
``test_reference_parity.py``.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")
BLOB_DIR = os.environ.get("CFN_RELEASED_DIR",
                          os.path.join(REF_DIR, "models"))

FINE_PT = os.path.join(BLOB_DIR, "fine_charades_039000_SAVE.pt")
COARSE_PT = os.path.join(BLOB_DIR, "coarse_fineFEAT_charades_019000_SAVE.pt")
KINETICS_PT = os.path.join(BLOB_DIR, "x3d_multigrid_kinetics_fb_pretrained.pt")

if os.path.isdir(REF_DIR) and REF_DIR not in sys.path:
    sys.path.insert(0, REF_DIR)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference tree not available")


def _need(path):
    return pytest.mark.skipif(
        not os.path.exists(path),
        reason=f"released blob not present: {path} (see .MISSING_LARGE_BLOBS)")


@pytest.fixture(autouse=True)
def _cpu_cuda_patch(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


def _load_into(ref_model, pt_path):
    """The reference's dict-update partial merge (extract_fineFEAT.py:103-106)."""
    ckpt = torch.load(pt_path, map_location="cpu")
    state = ref_model.state_dict()
    state.update(ckpt.get("model_state_dict", ckpt))
    ref_model.load_state_dict(state)


@_need(FINE_PT)
@pytest.mark.slow
def test_released_fine_logits_parity():
    import x3d_fine

    from coarse_fine_networks_tpu.ckpt import convert_torch_state_dict, merge_trees
    from coarse_fine_networks_tpu.models import FineNet

    ref = x3d_fine.generate_model("M", n_classes=400, n_input_channels=3,
                                  task="loc", dropout=0.5, base_bn_splits=1)
    ref.replace_logits(157)
    _load_into(ref, FINE_PT)
    ref.eval()

    torch.manual_seed(0)
    x = torch.randn(1, 3, 16, 224, 224)
    with torch.no_grad():
        ref_logits = ref([x, None]).numpy()

    ours = FineNet(version="M", n_classes=157, task="loc", bn_splits=1)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    variables = jax.jit(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, xj, False))()
    conv = convert_torch_state_dict(ref.state_dict(), "fine")
    variables = {
        "params": merge_trees(jax.device_get(variables["params"]),
                              conv["params"]),
        "batch_stats": merge_trees(jax.device_get(variables["batch_stats"]),
                                   conv["batch_stats"]),
    }
    with jax.default_matmul_precision("highest"):
        got = jax.jit(lambda v, x: ours.apply(v, x, False))(variables, xj)
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref_logits, rtol=1e-3, atol=1e-3)


@_need(COARSE_PT)
@pytest.mark.slow
def test_released_coarse_logits_parity():
    import x3d_coarse

    from coarse_fine_networks_tpu.ckpt import convert_torch_state_dict, merge_trees
    from coarse_fine_networks_tpu.models import CoarseNet

    feat_depth = {"layer1": 24, "layer2": 48, "layer3": 96, "layer4": 192,
                  "conv5": 432}
    ref = x3d_coarse.generate_model(
        "M", n_classes=400, n_input_channels=3, feat_depth=feat_depth,
        task="loc", dropout=0.5, base_bn_splits=1,
        learnedMixing=True, isMixing=True, t_pool="grid")
    ref.replace_logits(157)
    _load_into(ref, COARSE_PT)
    ref.eval()

    torch.manual_seed(1)
    b, t, tf = 1, 16, 64
    x = torch.randn(b, 3, t, 224, 224)
    feats_t = {k: torch.randn(b, c, tf, 7, 7) for k, c in feat_depth.items()}
    fmask = torch.ones(b, tf)
    meta = torch.tensor([[0, t, 2 * t, 1]])
    with torch.no_grad():
        ref_logits = ref([x, feats_t, fmask, 0, meta]).numpy()

    ours = CoarseNet(version="M", n_classes=157, task="loc", bn_splits=1,
                     t_pool="grid", learned_mixing=True, is_mixing=True)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    featsj = {k: jnp.asarray(v.numpy().transpose(0, 2, 3, 4, 1))
              for k, v in feats_t.items()}
    fmj = jnp.asarray(fmask.numpy())
    mj = jnp.asarray(meta.numpy())
    variables = jax.jit(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, xj, featsj,
                          fmj, mj, False))()
    conv = convert_torch_state_dict(ref.state_dict(), "coarse")
    variables = {
        "params": merge_trees(jax.device_get(variables["params"]),
                              conv["params"]),
        "batch_stats": merge_trees(jax.device_get(variables["batch_stats"]),
                                   conv["batch_stats"]),
    }
    with jax.default_matmul_precision("highest"):
        got = jax.jit(
            lambda v, x, f, m, me: ours.apply(v, x, f, m, me, False)
        )(variables, xj, featsj, fmj, mj)
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref_logits, rtol=1e-3, atol=1e-3)


@_need(KINETICS_PT)
def test_kinetics_pretrained_partial_restore():
    """The 400→157 transfer recipe through our driver load path
    (train_fine.py:104-111): backbone restored, head kept fresh."""
    from coarse_fine_networks_tpu.models import FineNet
    from coarse_fine_networks_tpu.train.common import load_pretrained

    ours = FineNet(version="M", n_classes=157, task="loc", bn_splits=1)
    x = jnp.zeros((1, 4, 3, 64, 64), jnp.float32).transpose(0, 1, 3, 4, 2)
    variables = jax.jit(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x, False))()
    fresh_head = np.asarray(variables["params"]["fc2"]["kernel"])
    fresh_stem = np.asarray(
        variables["params"]["stem"]["conv1_s"]["kernel"])
    loaded = load_pretrained(jax.device_get(variables), KINETICS_PT, "fine")
    # backbone moved to the pretrained weights, head kept (shape mismatch)
    assert not np.allclose(
        np.asarray(loaded["params"]["stem"]["conv1_s"]["kernel"]), fresh_stem)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["fc2"]["kernel"]), fresh_head)
