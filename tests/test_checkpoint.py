"""Checkpoint save/load round-trip, latest-selection, and partial merge."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from coarse_fine_networks_tpu.ckpt import (
    latest_checkpoint,
    load_checkpoint,
    merge_trees,
    save_checkpoint,
)


def test_roundtrip_and_latest(tmp_path):
    state = {
        "variables": {
            "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "batch_stats": {"bn": {"mean": np.zeros(3, np.float32)}},
        },
        "step": 7,
        "scheduler": {"epoch": 2},
    }
    p1 = save_checkpoint(str(tmp_path / "fine_charades_000007.ckpt"), state)
    state["step"] = 1000
    save_checkpoint(str(tmp_path / "fine_charades_001000.ckpt"), state)

    latest = latest_checkpoint(str(tmp_path), "fine_charades")
    assert latest.endswith("001000.ckpt")

    raw = load_checkpoint(p1)
    assert raw["step"] == 7
    np.testing.assert_array_equal(
        raw["variables"]["params"]["w"],
        state["variables"]["params"]["w"],
    )
    assert raw["scheduler"]["epoch"] == 2


def test_latest_ignores_other_prefixes(tmp_path):
    save_checkpoint(str(tmp_path / "coarse_fineFEAT_charades_000002.ckpt"),
                    {"step": 2})
    assert latest_checkpoint(str(tmp_path), "fine_charades") is None
    assert latest_checkpoint(str(tmp_path / "nope"), "fine") is None


def test_merge_trees_semantics():
    base = {"a": np.zeros((2, 2)), "b": {"c": np.ones(3)}}
    upd = {"a": np.full((2, 2), 5.0), "zzz_extra": np.ones(1)}
    out = merge_trees(base, upd)
    np.testing.assert_array_equal(out["a"], np.full((2, 2), 5.0))
    np.testing.assert_array_equal(out["b"]["c"], np.ones(3))  # untouched
    assert "zzz_extra" not in out

    with pytest.raises(ValueError):
        merge_trees(base, {"a": np.zeros((3, 3))})
    out2 = merge_trees(base, {"a": np.full((3, 3), 9.0)}, strict_shapes=False)
    np.testing.assert_array_equal(out2["a"], base["a"])  # kept fresh init


def test_orbax_backend_roundtrip(tmp_path):
    from coarse_fine_networks_tpu.ckpt import orbax_backend as ob

    if not ob.available():
        pytest.skip("orbax unavailable")
    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": 7,  # python scalars (orbax rejects numpy scalars)
    }
    d = str(tmp_path / "orbax_ck")
    ob.save_checkpoint(d, state)
    back = ob.load_checkpoint(d, state)
    np.testing.assert_array_equal(back["params"]["w"], state["params"]["w"])
    assert back["step"] == 7
