"""Per-round dynamics of the greedy extraction loop on the sample cloud.

Runs round_body one round at a time from the host (jitted stepper) and
prints, per round: accepted lanes, live/dormant pool, drawn counter,
support level, pending/exhaustion state — to localize where the ~34
sequential rounds go.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_rounds.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plade_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.io.ply import read_ply
from plade_tpu.extract import ransac
from plade_tpu.pipeline import _pad_size

SAMPLE = "/root/reference/sample_data"


def main():
    cfg = PladeConfig()
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    pad = _pad_size(tp.shape[0])
    cloud = pad_cloud(tp, tn, pad)

    # rebuild the internals of build_extract_fn for a manual loop
    num_points = pad
    max_extract = 64
    fn = ransac.build_extract_fn(cfg, num_points, max_extract)
    # reach the round stepper through a tiny shim: run extract() with
    # ransac_max_rounds=1..k is wasteful; instead replicate init and call
    # the closure's round_body via a jitted wrapper built the same way.
    # Simplest faithful approach: temporarily monkeypatch while_loop to a
    # python loop that records state.
    records = []
    orig_while = jax.lax.while_loop

    def spy_while(cond, body, init):
        jb = jax.jit(body)
        state = init
        n = 0
        while bool(np.asarray(jax.device_get(cond(state)))) and n < 200:
            state = jb(state)
            s = jax.device_get(state)
            records.append(dict(
                rounds=int(s.rounds), planes=int(s.num_planes),
                minsup=int(s.min_support), drawn=float(s.drawn),
                trials=int(s.trials), streak=int(s.exh_streak),
                pool_live=int(np.sum(np.asarray(s.pool_valid)
                                     & ~np.asarray(s.pool_dormant))),
                pool_dorm=int(np.sum(np.asarray(s.pool_dormant))),
                bans=int(s.ban_count),
                assigned=int(np.sum(np.asarray(s.assigned))),
            ))
            n += 1
        return state

    jax.lax.while_loop = spy_while
    try:
        planes, stats = fn(cloud.points, cloud.normals, cloud.count,
                           jax.random.PRNGKey(0),
                           cfg.ransac_min_allowed_support)
        np.asarray(planes.count)
    finally:
        jax.lax.while_loop = orig_while

    prev_planes = 0
    for r in records:
        acc = r["planes"] - prev_planes
        prev_planes = r["planes"]
        print(f"r{r['rounds']:3d} planes={r['planes']:2d} (+{acc}) "
              f"minsup={r['minsup']:5d} drawn={r['drawn']:9.1f} "
              f"trials={r['trials']} streak={r['streak']} "
              f"live={r['pool_live']:2d} dorm={r['pool_dorm']:2d} "
              f"bans={r['bans']:3d} assigned={r['assigned']:6d}")
    print(f"total rounds {len(records)}, planes {int(planes.count)}")


if __name__ == "__main__":
    sys.exit(main())
