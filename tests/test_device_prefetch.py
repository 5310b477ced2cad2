"""DevicePrefetcher (input/compute overlap) + shard_batch passthrough."""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from coarse_fine_networks_tpu.data.device_prefetch import DevicePrefetcher


def test_prefetcher_order_and_values():
    src = list(range(20))
    out = list(DevicePrefetcher(src, lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in src]


def test_prefetcher_overlaps_consumer_work():
    """put_fn for batch N+1 runs while the consumer is busy with batch N."""
    events = []
    lock = threading.Lock()

    def put(x):
        with lock:
            events.append(("put", x))
        return x

    it = iter(DevicePrefetcher(range(4), put, depth=2))
    first = next(it)
    time.sleep(0.2)  # consumer "step" — producer should have run ahead
    with lock:
        staged = [e for e in events if e[0] == "put"]
    assert first == 0
    assert len(staged) >= 3, staged  # 0 consumed + >=2 staged ahead
    assert list(it) == [1, 2, 3]


def test_prefetcher_propagates_put_errors():
    def put(x):
        if x == 2:
            raise ValueError("boom")
        return x

    it = iter(DevicePrefetcher(range(5), put, depth=2))
    got = [next(it), next(it)]
    assert got == [0, 1]
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetcher_propagates_source_errors():
    def src():
        yield 1
        raise RuntimeError("source died")

    it = iter(DevicePrefetcher(src(), lambda x: x, depth=2))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="source died"):
        next(it)


def test_shard_batch_passthrough_for_committed_arrays():
    """Arrays already committed to the target sharding (the s2d producer's
    output) must pass through shard_batch untouched (VERDICT r04 #7)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coarse_fine_networks_tpu.parallel import make_mesh, shard_batch

    n = min(8, jax.device_count())
    mesh = make_mesh(n)
    sh = NamedSharding(mesh, P("data"))
    a = jax.device_put(jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4), sh)
    b = np.ones((n, 3), np.float32)
    out = shard_batch({"a": a, "b": b}, mesh)
    assert out["a"] is a
    assert out["b"].sharding == sh
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(a))


def test_producer_sharded_s2d_survives_shard_batch():
    """device_normalize_s2d(mesh=...) output is already data-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coarse_fine_networks_tpu.data.transforms import device_normalize_s2d
    from coarse_fine_networks_tpu.parallel import make_mesh, shard_batch

    n = min(8, jax.device_count())
    mesh = make_mesh(n)
    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (n, 4, 8, 8, 3)), jnp.uint8)
    clips = device_normalize_s2d(u8, np.zeros(n, bool),
                                 np.ones((n, 4), np.float32), mesh=mesh)
    assert clips.shape == (n, 4, 4, 4, 12)
    assert clips.sharding == NamedSharding(mesh, P("data"))
    out = shard_batch({"clips": clips}, mesh)
    assert out["clips"] is clips
