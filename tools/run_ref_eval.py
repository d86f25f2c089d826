"""Run the REFERENCE binary over the synthetic RESSO-equivalent scenes.

Turns "recall parity" into a measured comparison (VERDICT r2 next-#5): the
same scene directories `tools/run_eval.py` evaluates the TPU pipeline on are
fed, pair by pair, to the reference binary built in place from
`/root/reference/code/PLADE` via the mini-PCL shim (tools/refbaseline/,
binary at .ref_build/PLADE — see tools/refbaseline/README.md).  Results are
appended to EVAL.md as the reference columns.

Reference CLI (code/PLADE/main.cpp:80-99): `PLADE target.ply source.ply
result.txt` writes "transformation:\n" + a 4x4 matrix on success, exit 0;
identity + exit 1 on failure.

Usage:  python tools/run_ref_eval.py  [--timeout 600]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from run_eval import SCENES, SIZE, N_POINTS  # single source of scene truth
from plade_tpu.io import resso
from plade_tpu.io.synthetic import make_scan_sequence, write_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, ".ref_build", "PLADE")
BASE = "/tmp/plade_synth_resso"
OUT = os.path.join(REPO, "REF_EVAL.json")


def ensure_scene(name, seed, n_scans, noise, nn_deg, radius, step):
    d = os.path.join(BASE, name)
    if not (os.path.isdir(d)
            and len([f for f in os.listdir(d) if f.endswith(".ply")])
            == n_scans):
        rng = np.random.default_rng(seed)
        scans, poses = make_scan_sequence(
            rng, n_scans=n_scans, n_points=N_POINTS, overlap_radius=radius,
            step=step, n_rooms=max(3, n_scans // 2), n_per_plane=9000,
            noise=noise * SIZE, size=SIZE, extra_planes=3,
            normal_noise_deg=nn_deg, max_angle=1.0, max_trans=0.6)
        write_scene(d, scans, poses)
    return d


def parse_result(path):
    """Extract the 4x4 matrix following 'transformation:' (identity rows
    after the failure banner parse the same way)."""
    if not os.path.isfile(path):
        return None
    rows = []
    with open(path) as f:
        grab = False
        for line in f:
            if "transformation" in line or "identity matrix" in line:
                grab = True
                continue
            if grab:
                parts = line.split()
                try:
                    vals = [float(p) for p in parts]
                except ValueError:
                    continue
                if len(vals) == 4:
                    rows.append(vals)
                if len(rows) == 4:
                    break
    return np.asarray(rows) if len(rows) == 4 else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=600.0,
                    help="per-pair wall-clock cap (s)")
    args = ap.parse_args()
    if not os.path.isfile(BIN):
        print(f"reference binary missing: {BIN} — build per "
              "tools/refbaseline/README.md", file=sys.stderr)
        return 2

    report = {}
    for name, seed, n_scans, noise, nn_deg, radius, step in SCENES:
        d = ensure_scene(name, seed, n_scans, noise, nn_deg, radius, step)
        scene = resso.load_scene(d)
        pairs = resso.consecutive_pairs(scene)
        hits, errs, times, fails, timeouts = 0, [], [], 0, 0
        for i, j in pairs:
            res_file = os.path.join(d, f"ref_result_{i}_{j}.txt")
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    [BIN, scene.scan_files[i], scene.scan_files[j], res_file],
                    capture_output=True, timeout=args.timeout)
                rc = proc.returncode
            except subprocess.TimeoutExpired:
                rc, timeouts = -1, timeouts + 1
            dt = time.perf_counter() - t0
            times.append(dt)
            T = parse_result(res_file)
            ok = rc == 0 and T is not None
            if not ok:
                fails += 1
                T = np.eye(4)
            G = scene.pair_ground_truth(i, j)
            rot = resso.rotation_error_deg(G[:3, :3], T[:3, :3])
            trans = float(np.linalg.norm(T[:3, 3] - G[:3, 3]))
            hit = rot < 5.0 and trans < 0.5
            hits += hit
            errs.append(trans)
            print(f"[ref] {name} {i}->{j}: rc={rc} rot={rot:.2f} "
                  f"trans={trans:.3f} hit={hit} ({dt:.1f}s)", flush=True)
        report[name] = {
            "pairs": len(pairs), "recall": hits / len(pairs),
            "rmse_trans": float(np.sqrt(np.mean(np.square(errs)))),
            "s_per_pair": float(np.median(times)),
            "failures": fails, "timeouts": timeouts,
        }
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[ref] {name}: recall={report[name]['recall']:.3f} "
              f"median {report[name]['s_per_pair']:.1f}s/pair", flush=True)

    total = sum(r["pairs"] for r in report.values())
    rec = sum(r["pairs"] * r["recall"] for r in report.values()) / total
    print(f"[ref] OVERALL recall={rec:.3f} over {total} pairs -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
