"""Decompose the fused device-step cost on the sample pair.

Inputs are varied per timed call — the axon runtime memoizes identical
(executable, inputs) executions, so repeated same-input timing reads back
cached results and measures only the tunnel round-trip.
"""
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
                                _register_pair_impl, register_pair_device)

SAMPLE = "/root/reference/sample_data"


def _sync(out):
    """Hard-sync: block_until_ready can return before the remote axon
    execution finishes; a host readback of one leaf cannot."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)
    return out


def timed(label, fn, n=3):
    """fn(i) -> output; i varies per call to defeat execution memoization."""
    out = _sync(fn(0))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = _sync(fn(i))
    print(f"{label:<30s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms")
    return out


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tgt = pad_cloud(tp, tn, pad)
    src = pad_cloud(sp_, sn, pad)

    full = register_pair_device(cfg, pad)
    timed("FULL device step",
          lambda i: full(tgt, src, jax.random.PRNGKey(i)))

    extract = ransac.build_extract_fn(cfg, pad, max_extract=64)

    @jax.jit
    def stage_extract(tgt, src, key):
        k1, k2 = jax.random.split(key)
        floor = jnp.int32(cfg.ransac_min_allowed_support)
        tp_ = ransac.select_planes_device(
            extract(tgt.points, tgt.normals, tgt.count, k1, floor)[0], cfg)
        sp2 = ransac.select_planes_device(
            extract(src.points, src.normals, src.count, k2, floor)[0], cfg)
        return tp_, sp2

    tgt_planes, src_planes = timed(
        "extract+select x2",
        lambda i: stage_extract(tgt, src, jax.random.PRNGKey(i)))

    @jax.jit
    def stage_spacing(src, eps):
        return average_spacing(src.points + eps, src.mask, cfg.spacing_k,
                               cfg.spacing_samples)

    spc = timed("spacing",
                lambda i: stage_spacing(src, jnp.float32(i) * 1e-7))

    @jax.jit
    def stage_prepare(tgt, src, tgt_planes, src_planes, spc):
        dsd = cfg.downsample_factor * spc
        return (_prepare_cloud_impl(tgt, tgt_planes, dsd, cfg),
                _prepare_cloud_impl(src, src_planes, dsd, cfg))

    tgt_prep, src_prep = timed(
        "prepare x2",
        lambda i: stage_prepare(tgt, src, tgt_planes, src_planes,
                                spc + jnp.float32(i) * 1e-9))

    @jax.jit
    def stage_register(tgt_prep, src_prep, spc):
        dsd = cfg.downsample_factor * spc
        lt = cfg.length_factor * spc
        scale = lt / math.cos(math.pi / 2 - cfg.angle_threshold)
        return _register_pair_impl(tgt_prep, src_prep, (scale, lt, dsd), cfg)

    timed("register",
          lambda i: stage_register(tgt_prep, src_prep,
                                   spc + jnp.float32(i) * 1e-9))


if __name__ == "__main__":
    main()
