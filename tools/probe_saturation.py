"""Probe the descriptor-match saturation on the flagship polyhedron pair:
distribution of TRUE radius-hit counts per query row vs the per-query cap,
and the end-to-end effect of raising the cap.

The reference search is unbounded-k (util.cpp:115); match_saturated counts
rows that kept fewer hits than exist (match/matching.py).  This tool answers
VERDICT r4 weak-#4: is the cap dropping matches that change the argmax?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_saturation.py
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plade_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp

from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.descriptors.pairlines import pair_descriptors
from plade_tpu.extract import ransac
from plade_tpu.knn.bruteforce import average_spacing
from plade_tpu.match import matching
from plade_tpu.pipeline import _pad_size, prepare_cloud

SAMPLE = "/root/reference/sample_data"


def main():
    from plade_tpu.io.ply import read_ply
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    sp_, sn = read_ply(os.path.join(SAMPLE, "polyhedron_source.ply"))
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    tc = pad_cloud(tp, tn, pad)
    sc = pad_cloud(sp_, sn, pad)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tgt_planes = ransac.auto_extract(tc.points, tc.normals, tc.count, k1,
                                     cfg, pad)
    src_planes = ransac.auto_extract(sc.points, sc.normals, sc.count, k2,
                                     cfg, pad)
    spacing = float(average_spacing(sc.points, sc.mask, cfg.spacing_k,
                                    cfg.spacing_samples))
    dp = cfg.derived(spacing)
    dsd = jnp.float32(dp.down_sample_distance)
    tgt = prepare_cloud(tc, tgt_planes, dsd, cfg)
    src = prepare_cloud(sc, src_planes, dsd, cfg)

    cos10 = math.cos(cfg.line_pair_min_angle)
    scale = jnp.float32(dp.scale)

    @jax.jit
    def descs(tgt, src):
        td = pair_descriptors(tgt.lines, tgt.planes.coeffs[:, :3], scale,
                              cfg.max_target_pairs, ordered=True,
                              min_angle_cos=cos10, pad_value=-1e6)
        sd = pair_descriptors(src.lines, src.planes.coeffs[:, :3], scale,
                              cfg.max_query_pairs, ordered=False,
                              min_angle_cos=cos10, pad_value=1e6)
        return td, sd

    td, sd = descs(tgt, src)
    print(f"target descs={int(td.count)} query descs={int(sd.count)}")

    # TRUE radius-hit histogram (exact, blocked on host-side jnp)
    @jax.jit
    def true_hits(sd, td):
        r2 = jnp.float32(cfg.descriptor_match_radius ** 2)
        qq = jnp.sum(sd.desc * sd.desc, -1, keepdims=True)
        tt = jnp.sum(td.desc * td.desc, -1)
        d2 = qq - 2.0 * jnp.dot(sd.desc, td.desc.T,
                                precision=jax.lax.Precision.HIGHEST) \
            + tt[None, :]
        return jnp.sum((d2 <= r2).astype(jnp.int32), axis=1)

    nh = np.asarray(true_hits(sd, td))
    Q = int(sd.count)
    nh = nh[:Q]
    print(f"true hits/row: max={nh.max()} p99={np.percentile(nh, 99):.0f} "
          f"p95={np.percentile(nh, 95):.0f} mean={nh.mean():.1f} "
          f"total={nh.sum()}")
    for cap in (64, 128, 256, 512):
        print(f"  rows over cap {cap}: {(nh > cap).sum()} "
              f"(dropped hits {np.maximum(nh - cap, 0).sum()})")

    # measured cost + saturation of match_descriptors at each cap
    for cap in (64, 128, 256, 512):
        f = jax.jit(lambda sdx, tdx: matching.match_descriptors(
            sdx, tdx, cfg.descriptor_match_radius, cfg.max_matches,
            per_query=cap))
        m = f(sd, td)
        print(f"  cap {cap}: kept={int(np.minimum(int(m.count), cfg.max_matches))} "
              f"saturated_rows={int(m.saturated)}", end="")
        t0 = time.perf_counter()
        for i in range(5):
            m = f(sd._replace(desc=sd.desc + jnp.float32(1e-9 * (i + 1))),
                  td)
            int(m.count)
        print(f"  {1e3 * (time.perf_counter() - t0) / 5:.1f} ms/call")


if __name__ == "__main__":
    main()
