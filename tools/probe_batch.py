"""Attribute batched (vmapped, one-chip) cost: extraction vs the rest.

For B in the sweep: time the FULL vmapped device step and the vmapped
extraction stage alone on B DISTINCT pairs (same pair set as bench.py).
The difference is the prepare+register tail.  All runs hard-synced via a
scalar contraction readback; keys fresh per call (runtime memoizer).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_batch.py
"""
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
from plade_tpu.extract import ransac
from plade_tpu.pipeline import _pad_size, build_register_device_fn

SAMPLE = "/root/reference/sample_data"


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn_ = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    pairs = [(pad_cloud(tp, tn, pad), pad_cloud(sp_, sn_, pad))]
    for b in range(1, 8):
        srng = np.random.default_rng(1000 + b)
        scans, _ = make_scan_sequence(
            srng, n_scans=2, n_points=min(pad, 100000), overlap_radius=3.4,
            step=2.0, n_rooms=3, n_per_plane=9000, noise=0.02, size=4.0,
            extra_planes=3, normal_noise_deg=3.0, max_angle=1.0,
            max_trans=0.6)
        pairs.append((pad_cloud(scans[0][0], scans[0][1], pad),
                      pad_cloud(scans[1][0], scans[1][1], pad)))

    step = build_register_device_fn(cfg, pad, with_stats=True)
    extract = ransac.build_extract_fn(cfg, pad, max_extract=64)
    floor = jnp.int32(cfg.ransac_min_allowed_support)

    def one_extract(tgt, src, key):
        k1, k2 = jax.random.split(key)
        both, stats = jax.vmap(
            lambda p, n, c, k: extract(p, n, c, k, floor))(
            jnp.stack([tgt.points, src.points]),
            jnp.stack([tgt.normals, src.normals]),
            jnp.stack([tgt.count, src.count]),
            jnp.stack([k1, k2]))
        return (jnp.sum(both.coeffs).astype(jnp.float32)
                + jnp.sum(both.sizes).astype(jnp.float32)), stats.rounds

    def one_full(tgt, src, key):
        res, stats = step(tgt, src, key)
        return (jnp.sum(res.transform).astype(jnp.float32)
                + jnp.sum(res.score)), stats.rounds

    base = int.from_bytes(os.urandom(4), "little") % (1 << 20)
    for B in (1, 2, 4, 8):
        tgt_b = jax.tree.map(lambda *x: jnp.stack(x),
                             *[p[0] for p in pairs[:B]])
        src_b = jax.tree.map(lambda *x: jnp.stack(x),
                             *[p[1] for p in pairs[:B]])
        for label, fn in (("extract", one_extract), ("full", one_full)):
            vf = jax.jit(lambda t, s, k, fn=fn:
                         jax.vmap(fn)(t, s, k))
            out, rounds = vf(tgt_b, src_b,
                             jax.random.split(jax.random.PRNGKey(0), B))
            float(jnp.sum(out))
            t0 = time.perf_counter()
            runs = 3
            for i in range(runs):
                out, rounds = vf(tgt_b, src_b, jax.random.split(
                    jax.random.PRNGKey(base + B * 100 + i), B))
                float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / runs
            r = np.asarray(rounds).reshape(B, -1)
            print(f"B={B} {label:8s} {dt * 1e3:8.1f} ms total "
                  f"{dt / B * 1e3:7.1f} ms/pair  rounds={r.max(1).tolist()}",
                  flush=True)


if __name__ == "__main__":
    main()
