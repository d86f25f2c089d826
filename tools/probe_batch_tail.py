"""Attribute the vmapped tail: spacing / prepare / register at B=1 vs 8.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_batch_tail.py
"""
import math
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
from plade_tpu.knn.bruteforce import average_spacing
from plade_tpu.pipeline import (_pad_size, _prepare_cloud_impl,
                                _register_pair_impl)

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

    extract = ransac.build_extract_fn(cfg, pad, max_extract=64)
    floor = jnp.int32(cfg.ransac_min_allowed_support)

    def stage_planes(tgt, src, key):
        k1, k2 = jax.random.split(key)
        both, _ = jax.vmap(lambda p, n, c, k: extract(p, n, c, k, floor))(
            jnp.stack([tgt.points, src.points]),
            jnp.stack([tgt.normals, src.normals]),
            jnp.stack([tgt.count, src.count]),
            jnp.stack([k1, k2]))
        return (ransac.select_planes_device(
                    jax.tree.map(lambda x: x[0], both), cfg),
                ransac.select_planes_device(
                    jax.tree.map(lambda x: x[1], both), cfg))

    def stage_spacing(src, eps):
        return average_spacing(src.points + eps, src.mask, cfg.spacing_k,
                               cfg.spacing_samples)

    def stage_prepare(tgt, src, tgt_planes, src_planes, spc):
        dsd = cfg.downsample_factor * spc
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), tgt, src)
        planes2 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                               tgt_planes, src_planes)
        preps = jax.vmap(lambda c, p: _prepare_cloud_impl(c, p, dsd, cfg))(
            stacked, planes2)
        return (jax.tree.map(lambda x: x[0], preps),
                jax.tree.map(lambda x: x[1], preps))

    def stage_register(tgt_prep, src_prep, spc):
        dsd = cfg.downsample_factor * spc
        lt = cfg.length_factor * spc
        scale = lt / math.cos(math.pi / 2 - cfg.angle_threshold)
        return _register_pair_impl(tgt_prep, src_prep, (scale, lt, dsd), cfg)

    base = int.from_bytes(os.urandom(4), "little") % (1 << 20)
    for B in (1, 8):
        tgt_b = jax.tree.map(lambda *x: jnp.stack(x),
                             *[p[0] for p in pairs[:B]])
        src_b = jax.tree.map(lambda *x: jnp.stack(x),
                             *[p[1] for p in pairs[:B]])

        # fixed planes for the tail stages (one extraction, reused)
        vplanes = jax.jit(jax.vmap(stage_planes))
        tp_b, sp_b = vplanes(tgt_b, src_b,
                             jax.random.split(jax.random.PRNGKey(0), B))
        jax.tree.map(lambda x: np.asarray(x), (tp_b, sp_b))

        def timed(label, make_fn, n=3):
            f = jax.jit(make_fn)
            out = f(jnp.float32(0.0))
            float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32)
                  if hasattr(jax.tree.leaves(out)[0], 'dtype')
                  else jax.tree.leaves(out)[0])
            np.asarray(jax.tree.leaves(out)[0])
            t0 = time.perf_counter()
            for i in range(n):
                out = f(jnp.float32((base + i + 1) * 1e-9))
                np.asarray(jax.tree.leaves(out)[0])
            print(f"B={B} {label:12s} {(time.perf_counter()-t0)/n*1e3:8.1f}"
                  f" ms total", flush=True)
            return out

        spc_b = timed("spacing", lambda eps: jax.vmap(
            lambda s, e: stage_spacing(s, e))(
            src_b, jnp.full((B,), 1.0, jnp.float32) * eps))
        preps = timed("prepare", lambda eps: jax.vmap(stage_prepare)(
            tgt_b, src_b, tp_b, sp_b, spc_b + eps))
        timed("register", lambda eps: jax.vmap(stage_register)(
            preps[0], preps[1], spc_b + eps))


if __name__ == "__main__":
    main()
