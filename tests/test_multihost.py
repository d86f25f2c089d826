"""Multi-host helpers (single-process semantics on the virtual CPU mesh)."""
import jax
import numpy as np

from plade_tpu.dist import mesh as mesh_mod
from plade_tpu.dist import multihost


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert multihost.initialize() is False


def test_local_batch_to_global_single_process(rng):
    from plade_tpu.core.types import pad_cloud
    devices = jax.devices("cpu")
    mesh = mesh_mod.make_mesh(4, intra=1, devices=devices[:4])
    B, N = 4, 256
    clouds = [pad_cloud(rng.normal(size=(100, 3)).astype(np.float32),
                        np.ones((100, 3), np.float32), N) for _ in range(B)]
    batch = mesh_mod.stack_clouds(clouds)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    gt, gs, gk = multihost.local_batch_to_global(mesh, batch, batch, keys)
    assert gt.points.shape == (B, N, 3)
    assert gk.shape == keys.shape
    np.testing.assert_allclose(np.asarray(gt.points),
                               np.asarray(batch.points))
