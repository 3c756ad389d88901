#!/usr/bin/env python
"""Multi-seed VDP parity study with a rank-sum significance test.

The round-2/3 parity tables compare 3 seeds a side — too few to separate a
genuine training-dynamics deficit from the reference's own 2.3x run-to-run
MSE spread (torch-CPU reductions are nondeterministic and `dsvgp.py` draws
from unseeded numpy RNGs, so even a fixed seed does not fix its trajectory).
This script runs BOTH implementations over a larger matched seed list at the
parity config (reference script defaults, rk4 on the same dense grid,
reference RFF scaling, identical data) and reports per-side distributions of
final test LL/MSE plus a Mann-Whitney U test — the statistical version of
RESULTS.md's "the distributions straddle each other" claim.

The two sides run in separate processes (torch CPU vs JAX TPU); each side
loops its seeds inside ONE process so XLA compiles once.

    python scripts/parity_seed_study.py --side ours --seeds 121,13,7,42,3,99,5,17
    python scripts/parity_seed_study.py --side ref  --seeds 121,13,7,42,3,99,5,17
    python scripts/parity_seed_study.py --side report
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SEEDS = "121,13,7,42,3,99,5,17"
OURS_OUT = "/tmp/parity_study_ours.json"
REF_OUT = "/tmp/parity_study_ref.json"


def run_side(side: str, seeds, num_iter: int, out: str):
    from parity_vdp import run_ours, run_reference
    results = {}
    if os.path.exists(out):   # resume: keep seeds a previous run completed
        prev = json.load(open(out))
        if prev.get("num_iter") == num_iter and prev.get("side") == side:
            results = prev["results"]
            print(f"resuming: {len(results)} seeds already done", flush=True)
    for seed in seeds:
        if str(seed) in results:
            continue
        t0 = time.time()
        print(f"=== {side} seed {seed} ===", flush=True)
        if side == "ours":
            m = run_ours(num_iter, seed=seed)
        else:
            m = run_reference(num_iter, seed=seed)
        m["wall_seconds"] = time.time() - t0
        results[str(seed)] = m
        print(json.dumps({k: round(v, 4) for k, v in m.items()}), flush=True)
        with open(out, "w") as f:   # checkpoint after every seed
            json.dump({"side": side, "num_iter": num_iter,
                       "results": results}, f, indent=2)
    print(f"wrote {out}", flush=True)


def _mannwhitney(a, b):
    """Two-sided Mann-Whitney U (normal approximation, tie-corrected)."""
    import numpy as np
    from scipy import stats
    u = stats.mannwhitneyu(a, b, alternative="two-sided")
    return float(u.statistic), float(u.pvalue)


def report(ours_path: str, ref_path: str):
    import numpy as np
    with open(ours_path) as f:
        ours = json.load(f)["results"]
    with open(ref_path) as f:
        ref = json.load(f)["results"]
    seeds = sorted(set(ours) & set(ref), key=int)
    print(f"matched seeds ({len(seeds)}): {', '.join(seeds)}\n")
    hdr = f"{'seed':>6} {'ref LL':>9} {'ours LL':>9} {'ref MSE':>9} {'ours MSE':>9}"
    print(hdr)
    for s in seeds:
        r, o = ref[s], ours[s]
        print(f"{s:>6} {r['test_ll']:>9.3f} {o['test_ll']:>9.3f} "
              f"{r['test_mse']:>9.3f} {o['test_mse']:>9.3f}")
    summary = {}
    for metric in ("test_ll", "test_mse", "train_ll", "train_mse"):
        rv = np.array([ref[s][metric] for s in seeds])
        ov = np.array([ours[s][metric] for s in seeds])
        u, p = _mannwhitney(rv, ov)
        summary[metric] = {
            "ref_mean": float(rv.mean()), "ref_std": float(rv.std(ddof=1)),
            "ours_mean": float(ov.mean()), "ours_std": float(ov.std(ddof=1)),
            "mean_delta": float(ov.mean() - rv.mean()),
            "mannwhitney_p": p, "n": len(seeds)}
        print(f"\n{metric}: ref {rv.mean():.4f}±{rv.std(ddof=1):.4f} "
              f"ours {ov.mean():.4f}±{ov.std(ddof=1):.4f} "
              f"(delta {ov.mean() - rv.mean():+.4f}, MW p={p:.3f})")
    out = {"seeds": seeds, "summary": summary,
           "ref": {s: ref[s] for s in seeds},
           "ours": {s: ours[s] for s in seeds}}
    with open("/tmp/parity_study_report.json", "w") as f:
        json.dump(out, f, indent=2)
    print("\nwrote /tmp/parity_study_report.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=("ours", "ref", "report"), required=True)
    ap.add_argument("--seeds", type=str, default=DEFAULT_SEEDS)
    ap.add_argument("--num_iter", type=int, default=5000)
    ap.add_argument("--ours_out", type=str, default=OURS_OUT)
    ap.add_argument("--ref_out", type=str, default=REF_OUT)
    a = ap.parse_args()
    if a.side == "report":
        report(a.ours_out, a.ref_out)
        return
    seeds = [int(s) for s in a.seeds.split(",") if s]
    out = a.ours_out if a.side == "ours" else a.ref_out
    run_side(a.side, seeds, a.num_iter, out)


if __name__ == "__main__":
    main()
