"""Multi-process data parallelism: 2 processes x 4 virtual CPU devices must
reproduce single-process 8-device math exactly (same global batch, same
program — per-host shards assembled with
``jax.make_array_from_process_local_data``).

This is the test that makes the multi-host claim in ``parallel/mesh.py`` a
capability rather than a comment: no host materialises the full batch, and
the loader's ``shard=(rank, world)`` slicing is verified to partition the
global batch exactly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.data.loader import PrefetchLoader
from coarse_fine_networks_tpu.parallel import make_mesh, shard_batch
from coarse_fine_networks_tpu.parallel.mesh import replicate
from coarse_fine_networks_tpu.train import TrainState, make_train_step

from _mp_dp_runner import T, H, make_global_batch, make_model

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_loader_shards_partition_global_batches():
    data = list(range(23))
    collate = lambda xs: xs  # noqa: E731
    full = PrefetchLoader(data, 4, collate, shuffle=True, num_workers=1,
                          seed=3, drop_last=True)
    parts = [
        PrefetchLoader(data, 4, collate, shuffle=True, num_workers=1,
                       seed=3, shard=(r, 2))
        for r in range(2)
    ]
    got_full = list(full)
    got_parts = [list(p) for p in parts]
    assert len(got_full) == len(got_parts[0]) == len(got_parts[1]) == 5
    for b_full, b0, b1 in zip(got_full, *got_parts):
        assert b0 + b1 == b_full  # concat in rank order == global batch


def test_loader_shard_validation():
    with pytest.raises(ValueError):
        PrefetchLoader([1, 2, 3], 3, list, shard=(0, 2))
    with pytest.raises(ValueError):
        PrefetchLoader([1, 2, 3], 2, list, shard=(2, 2))


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    """Spawn 2 real processes (jax.distributed + gloo CPU collectives); the
    final params and loss must match the single-process 8-device run."""
    port = _free_port()
    out = tmp_path / "proc0.npz"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_mp_dp_runner.py"),
             str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    got = np.load(out)

    # single-process reference on this process's 8 virtual devices
    batch = {k: jnp.asarray(v) for k, v in make_global_batch().items()}
    model = make_model()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, T, H, H, 3), jnp.float32), False))()
    mesh = make_mesh(8)
    state = replicate(TrainState.create(variables), mesh)
    step = make_train_step(model, donate=False)
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        state, metrics = step(state, shard_batch(batch, mesh),
                              jnp.asarray(0.01), key)

    assert int(got["step"]) == int(jax.device_get(state.step)) == 2
    np.testing.assert_allclose(float(got["loss"]), float(metrics["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        got["kernel"],
        np.asarray(jax.device_get(state.params["fc2"]["kernel"])),
        rtol=1e-4, atol=1e-6)
    # global BN statistics: the 2-process batch stats must equal the
    # single-process ones (cross-process pmean, not per-host stats)
    np.testing.assert_allclose(
        got["bn_mean"],
        np.asarray(jax.device_get(state.batch_stats["bn"]["split_mean"])),
        rtol=1e-4, atol=1e-6)

    # multi-host-safe checkpointing: exactly one writer (process 0), and
    # BOTH hosts resume the same step/params from the shared save_dir
    # (ckpt/checkpoint.py single-writer contract, train/common.py gate)
    p0 = np.load(str(out) + ".proc0.npz")
    p1 = np.load(str(out) + ".proc1.npz")
    assert int(p0["wrote"]) == 1 and int(p1["wrote"]) == 0
    assert int(p0["resumed_step"]) == int(p1["resumed_step"]) == 2
    np.testing.assert_allclose(p0["resumed_kernel"], got["kernel"],
                               rtol=1e-6)
    np.testing.assert_allclose(p1["resumed_kernel"], got["kernel"],
                               rtol=1e-6)
    ckpts = os.listdir(str(out) + ".ckpts")
    assert ckpts == ["mp_000002.ckpt"], ckpts
