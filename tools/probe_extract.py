"""Probe extraction round counts / timing vs config on the sample pair."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import jax

from plade_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.io.ply import read_ply
from plade_tpu.extract import ransac
from plade_tpu.pipeline import _pad_size

SAMPLE = "/root/reference/sample_data"


def run(cfg, label, cloud, n=3):
    extractor = ransac.make_extractor(cfg, cloud.points.shape[0],
                                      max_extract=64)
    planes, stats = extractor(cloud.points, cloud.normals, cloud.count,
                              jax.random.PRNGKey(0),
                              cfg.ransac_min_allowed_support)
    np.asarray(planes.count)  # sync
    t0 = time.perf_counter()
    for i in range(n):
        p, s = extractor(cloud.points, cloud.normals, cloud.count,
                         jax.random.PRNGKey(1000 + i),
                         cfg.ransac_min_allowed_support)
        np.asarray(p.count)
        np.asarray(s.rounds)
    dt = (time.perf_counter() - t0) / n
    sel = ransac.select_planes(planes, cfg)
    print(f"{label:<34s} {dt*1e3:8.1f} ms  rounds={int(stats.rounds):4d} "
          f"planes={int(planes.count):3d} sel={int(sel.count):3d} "
          f"trials={int(stats.trials)} minsup={int(stats.min_support)}",
          flush=True)
    return dt


def main():
    tp, tn = read_ply(os.path.join(SAMPLE, "polyhedron_target.ply"))
    pad = _pad_size(tp.shape[0])
    tgt = pad_cloud(tp, tn, pad)
    base = PladeConfig()
    run(base, "base flat S=1024 A=2 chk=8", tgt)
    for repl in (
        dict(ransac_flat_support=False),
        dict(ransac_candidates_per_round=2048),
        dict(ransac_candidates_per_round=2048, ransac_exact_lanes=4),
        dict(ransac_candidates_per_round=2048, ransac_exact_lanes=4,
             ransac_check_lanes=12),
        dict(ransac_candidates_per_round=4096, ransac_exact_lanes=4),
        dict(ransac_candidates_per_round=4096, ransac_exact_lanes=6,
             ransac_check_lanes=12),
    ):
        cfg = dataclasses.replace(base, **repl)
        run(cfg, ",".join(f"{k.split('_')[-1]}={v}" for k, v in repl.items()),
            tgt)


if __name__ == "__main__":
    main()
