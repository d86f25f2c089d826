"""Scaling measurement -> SCALING.md  (VERDICT r3 next-#5).

Three sections, standing in for the unavailable multi-chip hardware
(BASELINE.json configs ask for pairs/s at 1 chip / 1 host / >= 2 hosts;
only one real chip is reachable here):

1. virtual 8-CPU mesh, tiny config: pairs/s vs pairs-axis size 1/2/4/8 —
   the GSPMD pairs-data-parallel scaling shape (run in a subprocess with
   JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=8)
2. one real TPU chip: batched B sweep 1/8/16/32 on DISTINCT pairs
3. two-process jax.distributed over localhost DCN (tests/multihost_worker
   path): wall-clock of the sharded step forming a real process group

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/run_scaling.py
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "SCALING.md")

VIRTUAL_SNIPPET = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from plade_tpu.core.config import PladeConfig
from plade_tpu.core.types import pad_cloud
from plade_tpu.dist import mesh as mesh_mod
from plade_tpu.io.synthetic import make_room, random_rigid, transform_cloud

cfg = PladeConfig(
    ransac_candidates_per_round=64, ransac_init_min_support=2000,
    ransac_min_allowed_support=200, min_planes=6, max_planes=12,
    spacing_samples=2000, max_ds_points=4096, max_plane_points=1024,
    max_lines=128, max_query_pairs=2048, max_target_pairs=4096,
    max_matches=8192, max_pose_clusters=512, max_candidate_results=64,
    max_penetration_tests=1024, rescore_top_k=4)
rng = np.random.default_rng(0)
PAD = 16384
pairs = []
for i in range(8):
    pts, nrm, _ = make_room(rng, n_per_plane=1500, noise=0.002,
                            extra_planes=4)
    R, t = random_rigid(rng, max_angle=0.8, max_trans=0.4)
    sp, sn = transform_cloud(pts, nrm, R.T, -R.T @ t)
    pairs.append((pad_cloud(pts, nrm, PAD), pad_cloud(sp, sn, PAD)))
rows = []
for P in (1, 2, 4, 8):
    mesh = mesh_mod.make_mesh(P, intra=1, devices=jax.devices("cpu")[:P])
    tgt_b = jax.tree.map(lambda *x: jnp.stack(x), *[p[0] for p in pairs[:P]])
    src_b = jax.tree.map(lambda *x: jnp.stack(x), *[p[1] for p in pairs[:P]])
    keys = jax.random.split(jax.random.PRNGKey(0), P)
    r = mesh_mod.register_batch(tgt_b, src_b, keys, cfg, mesh)
    np.asarray(r.transform)
    t0 = time.perf_counter(); runs = 2
    for i in range(runs):
        keys = jax.random.split(jax.random.PRNGKey(100 + i), P)
        r = mesh_mod.register_batch(tgt_b, src_b, keys, cfg, mesh)
        np.asarray(r.transform)
    dt = (time.perf_counter() - t0) / runs
    ok = bool(np.asarray(r.success).all())
    rows.append(dict(P=P, wall_s=dt, pairs_per_s=P / dt, all_success=ok))
    print("VROW " + json.dumps(rows[-1]), flush=True)
"""


def run_virtual():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    p = subprocess.run([sys.executable, "-c", VIRTUAL_SNIPPET],
                       capture_output=True, text=True, env=env, timeout=2400)
    rows = [json.loads(l[5:]) for l in p.stdout.splitlines()
            if l.startswith("VROW ")]
    if p.returncode != 0 or not rows:
        print(p.stdout[-2000:], p.stderr[-2000:])
        raise RuntimeError("virtual-mesh sweep failed")
    return rows


def run_tpu_sweep():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from plade_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from plade_tpu.core.config import PladeConfig
    from plade_tpu.core.types import pad_cloud
    from plade_tpu.io.ply import read_ply
    from plade_tpu.io.synthetic import make_scan_sequence
    from plade_tpu.pipeline import build_register_device_fn, _pad_size

    cfg = PladeConfig()
    tp, tn = read_ply("/root/reference/sample_data/polyhedron_target.ply")
    sp_, sn_ = read_ply("/root/reference/sample_data/polyhedron_source.ply")
    pad = _pad_size(max(tp.shape[0], sp_.shape[0]))
    pairs = [(pad_cloud(tp, tn, pad), pad_cloud(sp_, sn_, pad))]
    for b in range(1, 32):
        srng = np.random.default_rng(5000 + b)
        scans, _ = make_scan_sequence(
            srng, n_scans=2, n_points=min(pad, 100000), overlap_radius=3.4,
            step=2.0, n_rooms=3, n_per_plane=9000, noise=0.02, size=4.0,
            extra_planes=3, normal_noise_deg=3.0, max_angle=1.0,
            max_trans=0.6)
        pairs.append((pad_cloud(scans[0][0], scans[0][1], pad),
                      pad_cloud(scans[1][0], scans[1][1], pad)))
    base = int.from_bytes(os.urandom(4), "little") % (1 << 20)
    rows = []
    for B in (1, 8, 16, 32):
        try:
            vfn = jax.jit(jax.vmap(build_register_device_fn(cfg, pad)))
            tgt_b = jax.tree.map(lambda *x: jnp.stack(x),
                                 *[p[0] for p in pairs[:B]])
            src_b = jax.tree.map(lambda *x: jnp.stack(x),
                                 *[p[1] for p in pairs[:B]])
            r = vfn(tgt_b, src_b, jax.random.split(jax.random.PRNGKey(0), B))
            float(np.asarray(r.transform).sum())
            runs = 3
            t0 = time.perf_counter()
            nok = 0
            for i in range(runs):
                r = vfn(tgt_b, src_b, jax.random.split(
                    jax.random.PRNGKey(base + B * 100 + i), B))
                float(np.asarray(r.transform).sum())
                nok += int(np.asarray(r.success).sum())
            dt = (time.perf_counter() - t0) / (runs * B)
            rows.append(dict(B=B, s_per_pair=dt, pairs_per_s=1.0 / dt,
                             success=f"{nok}/{runs * B}"))
            print(f"B={B:3d}: {dt:.3f} s/pair {1/dt:.3f} pairs/s "
                  f"success {nok}/{runs*B}", flush=True)
        except Exception as e:  # HBM limit on the single 16G chip
            msg = "OOM" if "RESOURCE_EXHAUSTED" in str(e) or \
                "memory" in str(e).lower() else f"error: {e!r}"[:60]
            rows.append(dict(B=B, s_per_pair=None, pairs_per_s=None,
                             success=msg))
            print(f"B={B:3d}: {msg}", flush=True)
    return rows


def run_two_process():
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = REPO
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    dt = time.perf_counter() - t0
    ok = all(p.returncode == 0 for p in procs) and all(
        f"WORKER_OK pid={i}" in o for i, o in enumerate(outs))
    warm = None
    for o in outs:
        for line in o.splitlines():
            if line.startswith("WORKER_TIMING pid=0"):
                warm = float(line.split("warm_s_per_pair=")[1].split()[0])
    return dict(wall_s=dt, ok=ok, warm_s_per_pair=warm)


def main():
    print("[scaling] virtual 8-CPU mesh sweep...", flush=True)
    vrows = run_virtual()
    print("[scaling] real-chip B sweep...", flush=True)
    trows = run_tpu_sweep()
    print("[scaling] 2-process DCN path...", flush=True)
    two = run_two_process()

    with open(OUT, "w") as f:
        f.write("# SCALING — pairs-axis and batch scaling measurements\n\n")
        f.write(
            "Multi-chip hardware is not reachable from this image (one\n"
            "real TPU chip via a tunnel), so the three measured proxies\n"
            "for BASELINE.json's 1-chip / 1-host / >=2-hosts configs are:\n"
            "the virtual 8-CPU GSPMD mesh (pairs-axis data parallelism,\n"
            "the sharding that would ride ICI on a pod), the real-chip\n"
            "batch sweep (B distinct pairs vmapped through one chip), and\n"
            "the real 2-process jax.distributed group over localhost DCN.\n\n")
        f.write("## Virtual 8-CPU mesh: pairs-axis sweep (tiny config) — "
                "a CORRECTNESS/COMPILE check, not a scaling claim\n\n"
                "All 8 virtual devices share one host's physical cores, "
                "so the speedup column measures core-sharing, not chips; "
                "treat any speedup > 1x as \"the GSPMD program "
                "parallelizes\", nothing more.\n\n")
        f.write("| pairs axis | wall s/batch | pairs/s | all success |\n"
                "|---|---|---|---|\n")
        base_pps = vrows[0]["pairs_per_s"]
        for r in vrows:
            f.write(f"| {r['P']} | {r['wall_s']:.2f} | "
                    f"{r['pairs_per_s']:.3f} ({r['pairs_per_s']/base_pps:.2f}"
                    f"x) | {r['all_success']} |\n")
        f.write("\nCPU devices share one host's cores, so perfect linear\n"
                "scaling is not expected here; the point is that the\n"
                "sharded program compiles and the pairs axis parallelizes\n"
                "with zero cross-pair communication (the speedup column\n"
                "times core-sharing).  On real chips each pairs-axis slot\n"
                "owns a full chip.\n")
        f.write("\n## One real TPU chip: batched B sweep (distinct pairs, "
                "hard-synced)\n\n")
        f.write("| B | s/pair | pairs/s | success |\n|---|---|---|---|\n")
        for r in trows:
            if r["s_per_pair"] is None:
                f.write(f"| {r['B']} | - | - | {r['success']} |\n")
            else:
                f.write(f"| {r['B']} | {r['s_per_pair']:.3f} | "
                        f"{r['pairs_per_s']:.3f} | {r['success']} |\n")
        f.write("\nBatching is near-flat on one chip with a mild rising\n"
                "slope: extraction amortizes (lockstep rounds), but the\n"
                "tail's sort/gather/VPU stages are throughput-bound on\n"
                "fixed-rate units, and the batched while_loops run to the\n"
                "slowest lane's round count (PROFILE.md attribution).\n"
                "B=32 fits HBM since round 5's smaller cluster buffers.\n"
                "Production scaling is the pairs axis over a MESH (each\n"
                "pairs-slot owns a chip and its own sequential depth),\n"
                "which the virtual sweep above exercises end-to-end.\n")
        f.write("\n## Two-process jax.distributed (localhost DCN)\n\n")
        f.write("| measure | value |\n|---|---|\n")
        f.write(f"| cold: group formation + first sharded step + compile "
                f"| {two['wall_s']:.1f} s wall |\n")
        if two.get("warm_s_per_pair") is not None:
            f.write(f"| warm steady state (3 sharded steps, fresh keys) | "
                    f"**{two['warm_s_per_pair']:.3f} s/pair** "
                    f"({1.0 / two['warm_s_per_pair']:.2f} pairs/s over the "
                    "4-pair global batch, tiny config) |\n")
        f.write(f"| all pairs succeeded | {two['ok']} |\n")
        f.write("\ntests/multihost_worker.py: a real jax.distributed "
                "process group over localhost DCN, 2 virtual CPU devices "
                "per process, (pairs=4, intra=1) global mesh; each process "
                "feeds only its addressable shard "
                "(multihost.local_batch_to_global).  CPU-device caveat of "
                "the virtual sweep applies to absolute numbers; the row "
                "demonstrates warm steady-state multi-process throughput "
                "accounting, not chip speed.\n")
        f.write("\nGenerated by `tools/run_scaling.py`.\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
