"""Attribute the full device registration step's cost (scalar-contracted
cumulative jit bisection — see probe_prepare2.py for why raw pytree
fetches cannot be trusted for timing on this runtime)."""
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
from plade_tpu.extract import ransac
from plade_tpu.knn.bruteforce import average_spacing
from plade_tpu.pipeline import (_pad_size, _prepare_cloud_impl,
                                _register_pair_impl)

SAMPLE = "/root/reference/sample_data"


def timed(label, fn, n=3):
    f = jax.jit(fn)
    float(f(jnp.float32(0.0), jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    for i in range(n):
        float(f(jnp.float32((i + 1) * 1e-9), jax.random.PRNGKey(100 + i)))
    print(f"{label:<30s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms",
          flush=True)


def tsum(*trees):
    tot = jnp.float32(0.0)
    for t in trees:
        for leaf in jax.tree.leaves(t):
            if jnp.issubdtype(leaf.dtype, jnp.number):
                tot = tot + jnp.sum(leaf).astype(jnp.float32)
    return tot


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn_ = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tgt = pad_cloud(tp, tn, pad)
    src = pad_cloud(sp_, sn_, pad)
    extract = ransac.build_extract_fn(cfg, pad, max_extract=64)
    floor = jnp.int32(cfg.ransac_min_allowed_support)

    def stage_extract(eps, key):
        k1, k2 = jax.random.split(key)
        both = jax.vmap(lambda p, n, c, k: extract(p, n, c, k, floor)[0])(
            jnp.stack([tgt.points + eps, src.points]),
            jnp.stack([tgt.normals, src.normals]),
            jnp.stack([tgt.count, src.count]),
            jnp.stack([k1, k2]))
        return both

    def p1(eps, key):
        return tsum(stage_extract(eps, key))

    def stage_prep(eps, key):
        both = stage_extract(eps, key)
        tgt_planes = ransac.select_planes_device(
            jax.tree.map(lambda x: x[0], both), cfg)
        src_planes = ransac.select_planes_device(
            jax.tree.map(lambda x: x[1], both), cfg)
        sp = average_spacing(src.points, src.mask, cfg.spacing_k,
                             cfg.spacing_samples)
        dsd = cfg.downsample_factor * sp
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), tgt, src)
        planes2 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                               tgt_planes, src_planes)
        preps = jax.vmap(lambda c, p: _prepare_cloud_impl(c, p, dsd, cfg))(
            stacked, planes2)
        return preps, sp

    def p2(eps, key):
        preps, sp = stage_prep(eps, key)
        return tsum(preps) + sp

    def p3(eps, key):
        preps, sp = stage_prep(eps, key)
        tgt_prep = jax.tree.map(lambda x: x[0], preps)
        src_prep = jax.tree.map(lambda x: x[1], preps)
        lt = cfg.length_factor * sp
        scale = lt / math.cos(math.pi / 2 - cfg.angle_threshold)
        dsd = cfg.downsample_factor * sp
        res = _register_pair_impl(tgt_prep, src_prep, (scale, lt, dsd), cfg)
        return tsum(res)

    timed("1 extract both (lockstep)", p1)
    timed("2 + select/spacing/prepare", p2)
    timed("3 + register (full step)", p3)


if __name__ == "__main__":
    main()
