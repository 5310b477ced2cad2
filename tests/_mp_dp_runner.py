"""Subprocess body for the multi-process data-parallel equivalence test.

Each process owns 4 virtual CPU devices (8 global over 2 processes), draws
only its *local* shard of the global batch, assembles the global array with
``jax.make_array_from_process_local_data`` (via ``shard_batch``), and runs
two train steps.  Process 0 writes the resulting params/loss for the parent
test to compare against single-process math.

The model is a miniature of the Fine stream (conv + SubBatchNorm + per-frame
head) — small enough to compile in seconds on a 1-core CI box while still
exercising the two cross-process reductions that matter: gradient all-reduce
and global batch-norm statistics.

Usage: python _mp_dp_runner.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys

import numpy as np

B, T, H, TL, C = 8, 4, 16, 8, 7


def make_model():
    import jax.numpy as jnp
    from flax import linen as nn

    from coarse_fine_networks_tpu.models.layers import SubBatchNorm

    class TinyLocNet(nn.Module):
        n_classes: int = C

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(8, (1, 3, 3), strides=(1, 2, 2), use_bias=False,
                        name="conv")(x)
            x = SubBatchNorm(8, 1, name="bn")(x, train)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(2, 3))  # (B, T, 8)
            x = nn.Dense(self.n_classes, name="fc2")(x)
            return x

    return TinyLocNet()


def make_global_batch():
    rng = np.random.RandomState(0)
    return {
        "clips": rng.rand(B, T, H, H, 3).astype(np.float32),
        "labels": (rng.rand(B, TL, C) > 0.8).astype(np.float32),
        "masks": np.ones((B, TL), np.float32),
    }


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import jax.numpy as jnp

    from coarse_fine_networks_tpu.parallel import make_mesh, shard_batch
    from coarse_fine_networks_tpu.parallel.mesh import replicate
    from coarse_fine_networks_tpu.train import TrainState, make_train_step

    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    full = make_global_batch()
    bs_local = B // nproc
    local = {k: v[pid * bs_local : (pid + 1) * bs_local]
             for k, v in full.items()}

    model = make_model()
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, T, H, H, 3), jnp.float32), False))()
    mesh = make_mesh()
    state = replicate(TrainState.create(variables), mesh)
    step = make_train_step(model, donate=False)
    key = jax.random.PRNGKey(7)

    for _ in range(2):
        sb = shard_batch(local, mesh)
        state, metrics = step(state, sb, jnp.asarray(0.01), key)

    loss = float(metrics["loss"])
    kernel = np.asarray(jax.device_get(state.params["fc2"]["kernel"]))
    bn_mean = np.asarray(
        jax.device_get(state.batch_stats["bn"]["split_mean"]))

    # -- multi-host-safe checkpointing: exactly ONE writer, clean resume on
    # every host (shared save_dir; ckpt/checkpoint.py single-writer contract)
    from coarse_fine_networks_tpu.train.common import (
        maybe_resume,
        save_train_state,
    )
    from coarse_fine_networks_tpu.train.config import DriverConfig
    from coarse_fine_networks_tpu.train.optim import MultiStepSchedule
    from coarse_fine_networks_tpu.train import TrainState as TS

    from jax.experimental import multihost_utils

    ckpt_dir = out_path + ".ckpts"
    cfg = DriverConfig(anno="", root="", save_dir=ckpt_dir, resume=True)
    sched = MultiStepSchedule(0.01, (5,))
    wrote = save_train_state(cfg, "mp", state, sched)
    # barrier so both hosts see the file before resuming
    multihost_utils.sync_global_devices("ckpt_written")
    fresh = replicate(TS.create(variables), mesh)
    resumed = maybe_resume(cfg, "mp", fresh, MultiStepSchedule(0.01, (5,)))
    resumed_step = int(jax.device_get(resumed.step))
    resumed_kernel = np.asarray(jax.device_get(
        resumed.params["fc2"]["kernel"]))

    if pid == 0:
        np.savez(out_path, loss=loss, kernel=kernel, bn_mean=bn_mean,
                 step=int(jax.device_get(state.step)))
    np.savez(f"{out_path}.proc{pid}", wrote=int(wrote is not None),
             resumed_step=resumed_step, resumed_kernel=resumed_kernel)
    jax.distributed.shutdown()
    print(f"proc {pid} done loss={loss:.6f}")


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
