"""Round-trip: torch state_dict → flax → torch, bit-exact for the covered
module set (reference fine model)."""

import os
import sys

import numpy as np
import pytest
import torch

REF_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference unavailable")
if os.path.isdir(REF_DIR) and REF_DIR not in sys.path:
    sys.path.insert(0, REF_DIR)


@pytest.mark.slow
def test_fine_state_dict_roundtrip():
    import x3d_fine

    from coarse_fine_networks_tpu.ckpt import (
        convert_torch_state_dict,
        export_torch_state_dict,
    )

    torch.manual_seed(0)
    ref = x3d_fine.generate_model("M", n_classes=157, task="loc",
                                  base_bn_splits=1)
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    conv = convert_torch_state_dict(sd, "fine")
    back = export_torch_state_dict(conv["params"], conv["batch_stats"])

    missing = set(sd) - set(back)
    assert not missing, sorted(missing)[:10]
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)


@pytest.mark.slow
def test_convert_checkpoint_cli_roundtrip(tmp_path):
    import x3d_fine
    import torch

    from coarse_fine_networks_tpu.cli import convert_checkpoint
    from coarse_fine_networks_tpu.ckpt import load_checkpoint

    torch.manual_seed(0)
    ref = x3d_fine.generate_model("M", n_classes=7, task="loc",
                                  base_bn_splits=1)
    pt_in = str(tmp_path / "in.pt")
    torch.save({"model_state_dict": ref.state_dict()}, pt_in)

    native = str(tmp_path / "conv.ckpt")
    convert_checkpoint.main(["--input", pt_in, "--model", "fine",
                             "--output", native])
    raw = load_checkpoint(native)
    assert "params" in raw["variables"]

    pt_out = str(tmp_path / "out.pt")
    convert_checkpoint.main(["--input", native, "--model", "fine",
                             "--output", pt_out, "--to-torch"])
    sd2 = torch.load(pt_out)["model_state_dict"]
    sd1 = ref.state_dict()
    for k, v in sd1.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(sd2[k].numpy(), v.numpy(), rtol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_coarse_state_dict_roundtrip():
    import x3d_coarse
    import torch

    from coarse_fine_networks_tpu.ckpt import (
        convert_torch_state_dict,
        export_torch_state_dict,
    )

    torch.manual_seed(1)
    feat_depth = {"layer1": 24, "layer2": 48, "layer3": 96, "layer4": 192,
                  "conv5": 432}
    ref = x3d_coarse.generate_model(
        "M", n_classes=157, feat_depth=feat_depth, task="loc",
        base_bn_splits=1, learnedMixing=True, isMixing=True, t_pool="grid")
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    conv = convert_torch_state_dict(sd, "coarse")
    back = export_torch_state_dict(conv["params"], conv["batch_stats"])
    missing = set(sd) - set(back)
    assert not missing, sorted(missing)[:10]
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)


@pytest.mark.slow
def test_kinetics_transfer_load(tmp_path):
    """The Kinetics-400 → Charades-157 transfer recipe: load a 400-class
    torch checkpoint into a 157-class model; backbone restored, head kept
    fresh (train_fine.py:104-111)."""
    import x3d_fine
    import torch
    import jax
    import jax.numpy as jnp

    from coarse_fine_networks_tpu.models import FineNet
    from coarse_fine_networks_tpu.train.common import load_pretrained

    torch.manual_seed(3)
    ref = x3d_fine.generate_model("M", n_classes=400, task="loc",
                                  base_bn_splits=1)
    pt = str(tmp_path / "kinetics.pt")
    torch.save({"model_state_dict": ref.state_dict()}, pt)

    model = FineNet(version="M", n_classes=157, task="loc")
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, False))()
    fresh_head = np.asarray(variables["params"]["fc2"]["kernel"])

    loaded = load_pretrained(variables, pt, "fine")
    # backbone weights came from the torch checkpoint
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["stem"]["conv1_s"]["kernel"]),
        ref.state_dict()["conv1_s.weight"].numpy().transpose(2, 3, 4, 1, 0),
        rtol=1e-6)
    # 400-class head was skipped; fresh 157-class init kept
    assert loaded["params"]["fc2"]["kernel"].shape == (2048, 157)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["fc2"]["kernel"]), fresh_head)
