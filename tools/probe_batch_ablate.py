"""Config-ablation timing of the FULL fused step at B=8 (one chip).

Attribution for the batched tail: each variant disables/shrinks one stage;
the delta vs default is that stage's batched cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_batch_ablate.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from plade_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.io.ply import read_ply
from plade_tpu.io.synthetic import make_scan_sequence
from plade_tpu.pipeline import _pad_size, build_register_device_fn

SAMPLE = "/root/reference/sample_data"
B = 8


def main():
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn_ = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    pairs = [(pad_cloud(tp, tn, pad), pad_cloud(sp_, sn_, pad))]
    for b in range(1, B):
        srng = np.random.default_rng(1000 + b)
        scans, _ = make_scan_sequence(
            srng, n_scans=2, n_points=min(pad, 100000), overlap_radius=3.4,
            step=2.0, n_rooms=3, n_per_plane=9000, noise=0.02, size=4.0,
            extra_planes=3, normal_noise_deg=3.0, max_angle=1.0,
            max_trans=0.6)
        pairs.append((pad_cloud(scans[0][0], scans[0][1], pad),
                      pad_cloud(scans[1][0], scans[1][1], pad)))
    tgt_b = jax.tree.map(lambda *x: jnp.stack(x), *[p[0] for p in pairs])
    src_b = jax.tree.map(lambda *x: jnp.stack(x), *[p[1] for p in pairs])

    base_seed = int.from_bytes(os.urandom(4), "little") % (1 << 20)
    variants = [
        ("default", {}),
        ("no_rescore", dict(rescore_top_k=0)),
        ("rescore_icp1", dict(rescore_icp_iters=1)),
        ("no_pen", dict(enable_penetration_filter=False)),
        ("exact_k16", dict(overlap_exact_k=16)),
        ("icp_sub1", dict(rescore_icp_subsample=1)),
    ]
    for name, repl in variants:
        cfg = dataclasses.replace(PladeConfig(), **repl)
        vfn = jax.jit(jax.vmap(build_register_device_fn(cfg, pad)))
        r = vfn(tgt_b, src_b, jax.random.split(jax.random.PRNGKey(0), B))
        float(np.asarray(r.transform).sum())
        t0 = time.perf_counter()
        runs = 3
        for i in range(runs):
            r = vfn(tgt_b, src_b, jax.random.split(
                jax.random.PRNGKey(base_seed + i), B))
            float(np.asarray(r.transform).sum())
        dt = (time.perf_counter() - t0) / runs / B
        ok = int(np.asarray(r.success).sum())
        print(f"{name:18s} {dt * 1e3:7.1f} ms/pair  success {ok}/{B}",
              flush=True)


if __name__ == "__main__":
    main()
