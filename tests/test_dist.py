"""Driver-entry + mesh-sharded batch execution smoke tests (8-dev CPU mesh)."""
import sys

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.transform.shape == (4, 4)


@pytest.mark.parametrize("n", [8])
def test_dryrun_multichip(n):
    if len(jax.devices("cpu")) < n:
        pytest.skip("needs forced host device count")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(n)  # asserts success.all() internally


def test_intra2_matches_intra1():
    """Intra-pair point sharding (intra=2) must not change results vs an
    unsharded pairs-only mesh (intra=1): GSPMD-inserted collectives are
    semantics-preserving for every masked reduction in the pipeline."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    from plade_tpu.core.config import PladeConfig
    from plade_tpu.dist import mesh as dist_mesh

    cfg = PladeConfig(**g.TINY)
    cpu = jax.devices("cpu")
    if len(cpu) < 4:
        pytest.skip("needs forced host device count")
    pairs = [g._tiny_pair(i) for i in range(2)]
    tgt_b = dist_mesh.stack_clouds([p[0] for p in pairs])
    src_b = dist_mesh.stack_clouds([p[1] for p in pairs])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    mesh1 = dist_mesh.make_mesh(2, intra=1, devices=cpu[:2])
    mesh2 = dist_mesh.make_mesh(4, intra=2, devices=cpu[:4])
    r1 = dist_mesh.register_batch(tgt_b, src_b, keys, cfg, mesh1)
    r2 = dist_mesh.register_batch(tgt_b, src_b, keys, cfg, mesh2)
    assert np.asarray(r1.success).all()
    assert np.asarray(r2.success).all()
    np.testing.assert_allclose(np.asarray(r1.transform),
                               np.asarray(r2.transform), atol=1e-4)


def test_register_batch_matches_single(monkeypatch):
    """Sharded batch result == unsharded single-pair result (same seeds)."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    from plade_tpu.core.config import PladeConfig
    from plade_tpu.dist import mesh as dist_mesh
    from plade_tpu.pipeline import register_pair_device

    cfg = PladeConfig(**g.TINY)
    cpu = jax.devices("cpu")
    mesh = dist_mesh.make_mesh(4, intra=1, devices=cpu[:4])
    pairs = [g._tiny_pair(i) for i in range(4)]
    tgt_b = dist_mesh.stack_clouds([p[0] for p in pairs])
    src_b = dist_mesh.stack_clouds([p[1] for p in pairs])
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    batched = dist_mesh.register_batch(tgt_b, src_b, keys, cfg, mesh)

    single_fn = register_pair_device(cfg, g.N_POINTS)
    for i in range(4):
        single = single_fn(pairs[i][0], pairs[i][1], keys[i])
        np.testing.assert_allclose(np.asarray(single.transform),
                                   np.asarray(batched.transform)[i],
                                   atol=1e-5)
