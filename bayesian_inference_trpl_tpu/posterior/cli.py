"""Command-line posterior analysis.

Headless replacement for the reference's Tk marginalization GUI
(reference: Visualization/marginalization_visual.py): load a BAYRAN result,
apply a viz config, and emit corner plot, covariance heatmap, and a stats
report.

Usage:
    python -m bayesian_inference_trpl_tpu.posterior.cli RESULT_DIR \
        [--config config.txt] [--out-prefix out/posterior] [--bins 96]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .data import PosteriorData
from .plotting import corner_plot, covariance_heatmap
from .vizconfig import VizConfig, load_vizconfig


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("result", help="BAYRAN output dir or *_BAYRAN_*.npy path")
    ap.add_argument("--config", help="viz config file (reference config.txt format)")
    ap.add_argument("--out-prefix", default="posterior")
    ap.add_argument("--bins", type=int, default=96)
    ap.add_argument("--thickness", type=float, default=None)
    ap.add_argument("--num-observations", type=int, default=None)
    ap.add_argument("--params", nargs="*", help="parameters to analyze")
    ap.add_argument("--scatter-top-n", type=int, default=0)
    ap.add_argument("--t-factor", default="auto",
                    help="likelihood temperature: 'auto' (default; the "
                         "reference GUI's max-uncertainty search, median "
                         "over analyzed parameters — utils.py:172-183), "
                         "'points' (per-point temperature ~1, the r3 "
                         "heuristic), or a float (direct temperature, "
                         "P = normalize(LL / t))")
    args = ap.parse_args(argv)

    viz = load_vizconfig(args.config) if args.config else VizConfig()
    thickness = args.thickness if args.thickness is not None else viz.thickness
    num_obs = (args.num_observations if args.num_observations is not None
               else viz.num_observations)

    data = PosteriorData.load(args.result, thickness=thickness,
                              num_observations=num_obs)
    data.compute_secondary()
    if viz.ranges:
        data.exclude_limits({p: r for p, r in viz.ranges.items() if p in data.X})

    params = args.params or viz.enabled_params() or [
        p for p in ("p0", "B", "Sf", "Sb", "tau_n", "tau_p") if p in data.X]
    params = [p for p in params if p in data.X]

    t_mu = None
    if args.t_factor == "auto":
        # Max-uncertainty temperature (reference utils.py:172-183), with
        # an ESS >= 100 floor on top (this repo's addition — see
        # PosteriorData.temperature_for_ess) so the committed summaries
        # average enough samples to mean anything.
        t_mu = data.auto_temperature(params)
        temperature = max(t_mu, data.temperature_for_ess(100.0))
        data.normalize_temperature(temperature)
    elif args.t_factor == "points":
        data.normalize()
        temperature = None
    else:
        temperature = float(args.t_factor)
        data.normalize_temperature(temperature)
    ess = data.ess()
    if ess < 100:
        print(f"WARNING: effective sample size {ess:.1f} < 100 — the "
              f"weights are (near-)degenerate; posterior summaries "
              f"describe only the top sample(s).  Raise the temperature "
              f"(--t-factor) or score more samples.")

    os.makedirs(os.path.dirname(args.out_prefix) or ".", exist_ok=True)
    corner_plot(data, params, do_log=viz.do_log, marks=viz.marks,
                bins=args.bins, top_n_scatter=args.scatter_top_n,
                out_file=f"{args.out_prefix}_corner.png")
    covariance_heatmap(data, params, out_file=f"{args.out_prefix}_cov.png")

    report = {
        "num_samples": int(len(data.LL)),
        "ess": round(ess, 2),
        "temperature": (None if temperature is None
                        else float(temperature)),
        "temperature_max_uncertainty": (None if t_mu is None
                                        else float(t_mu)),
        "stats": {p: {"mean": float(m), "std": float(s)}
                  for p, (m, s, _) in data.stats_summary().items() if p in params},
        "credible_95": {p: [float(a), float(b)]
                        for p, (a, b) in data.credible_intervals().items()
                        if p in params},
    }
    with open(f"{args.out_prefix}_stats.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
