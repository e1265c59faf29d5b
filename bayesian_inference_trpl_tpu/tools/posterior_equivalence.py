"""Posterior-equivalence gate: does the fast multi-phase path RANK samples
the way exact fixed-dt stepping does?

The full-scale accuracy gate (tools/accuracy_gate.py) bounds per-curve
log10-PL error against an f64 oracle, but Bayesian inference only consumes
the *relative ordering* (and normalized weights) of the likelihoods — so
the decisive question for the shipped fast path is whether P_fast induces
the same posterior as P_exact.  This tool runs BOTH paths over the same
sample matrix on the real bundled observations (the reference's Example
Data; reference production config parallel_bayes_gpu.py:72-131) and gates:

* Spearman rank correlation of the finite log-likelihoods, per experiment
  (>= --min-rho, default 0.999);
* top-1% sample-set agreement (Jaccard >= --min-top-jaccard, default
  0.99 — the posterior mass lives here);
* identical finiteness pattern up to --max-finite-diff samples (a sample
  NaN'd by one path but scored by the other shifts posterior mass).

Run on the TPU (exact fixed-dt over 4096+ samples is minutes with the
fused-horizon kernel; it would be hours on CPU):

    python -m bayesian_inference_trpl_tpu.tools.posterior_equivalence \
        --config examples/power_scan.toml --num-samples 4096
"""
import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def run_path(cfg, e_data, init_params, X):
    """Evaluate P (num_exp, n) for one solver configuration."""
    from ..parallel.mesh import make_mesh
    from ..parallel.runner import ShardedRunner
    from ..pipeline import simulate
    from ..utils import validate

    devices = validate.connect_to_devices(cfg.device)
    runner = ShardedRunner(make_mesh(devices),
                          chunk_per_device=cfg.device.chunk_per_device)
    P = np.zeros((len(e_data), len(X)))
    t0 = time.perf_counter()
    simulate(cfg, e_data, init_params, X, P, runner)
    return P, time.perf_counter() - t0


def compare_posteriors(P_fast, P_exact, top_frac=0.01):
    """Per-experiment rank/top-set agreement between two likelihood runs."""
    from scipy.stats import spearmanr

    rows = []
    for e in range(P_fast.shape[0]):
        a, b = P_fast[e], P_exact[e]
        fin_a, fin_b = np.isfinite(a), np.isfinite(b)
        both = fin_a & fin_b
        rho = float(spearmanr(a[both], b[both]).statistic)
        k = max(int(round(top_frac * both.sum())), 1)
        idx = np.where(both)[0]
        top_a = set(idx[np.argsort(a[both])[-k:]].tolist())
        top_b = set(idx[np.argsort(b[both])[-k:]].tolist())
        jac = len(top_a & top_b) / len(top_a | top_b)
        # Near-boundary robustness: a rank-(k vs k+1) tie swap halves no
        # posterior mass but costs 2/(k+1) of Jaccard; top-k recall
        # against the OTHER path's top-2k is the standard metric that
        # forgives boundary ties while still catching real top-set
        # divergence (any member outside the other's top-2k drops it).
        top_a2 = set(idx[np.argsort(a[both])[-2 * k:]].tolist())
        top_b2 = set(idx[np.argsort(b[both])[-2 * k:]].tolist())
        recall = min(len(top_a & top_b2), len(top_b & top_a2)) / k
        rows.append(dict(
            spearman_rho=rho,
            top_frac=top_frac, top_k=k,
            top_jaccard=float(jac),
            top_recall_2k=float(recall),
            top_identical=bool(top_a == top_b),
            finite_fast=int(fin_a.sum()), finite_exact=int(fin_b.sum()),
            finite_mismatch=int((fin_a != fin_b).sum()),
            n=int(len(a))))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="examples/power_scan.toml")
    ap.add_argument("--num-samples", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=None,
                    help="override the config's sample seed")
    ap.add_argument("--min-rho", type=float, default=0.999)
    ap.add_argument("--min-top-jaccard", type=float, default=0.99)
    ap.add_argument("--top-frac", type=float, default=0.01)
    ap.add_argument("--max-finite-diff", type=int, default=None,
                    help="max samples finite on one path only "
                         "(default: 1%% of num-samples)")
    ap.add_argument("--exact-method", default="fused_horizon_chord",
                    help="solver method for the exact single-phase run")
    ap.add_argument("--use-uncertainty", action="store_true",
                    help="sigma-weighted SSE on BOTH paths "
                         "(sim_flags.use_uncertainty)")
    args = ap.parse_args(argv)
    from . import apply_platform_env
    apply_platform_env()

    from ..config import load_config
    from ..utils import io as bio

    cfg = load_config(args.config)
    sf = dataclasses.replace(cfg.sim_flags, num_points=args.num_samples,
                             use_uncertainty=bool(args.use_uncertainty
                                                  or cfg.sim_flags
                                                  .use_uncertainty),
                             **({} if args.seed is None
                                else dict(seed=args.seed)))
    cfg = dataclasses.replace(cfg, sim_flags=sf, checkpoint=False,
                              resume=False)

    rng = np.random.default_rng(cfg.sim_flags.seed)
    init_params = bio.get_initpoints(cfg.paths.init_file,
                                     cfg.ic_flags.as_dict())
    e_data = bio.get_data(cfg.paths.observation_files, cfg.ic_flags.as_dict(),
                          cfg.sim_flags.as_dict(), rng=rng)

    from ..utils import sampling
    min_x, max_x = cfg.params.bounds_converted()
    _, _, X = sampling.make_grid(
        len(e_data), min_x, max_x, cfg.params.do_log, cfg.sim_flags.as_dict(),
        rng=np.random.RandomState(cfg.sim_flags.seed))

    # Exact fixed-dt: same tolerance/method family, no stride ladder.
    grid_exact = dataclasses.replace(
        cfg.grid, fast_fine_steps=None, method=args.exact_method)
    cfg_exact = dataclasses.replace(cfg, grid=grid_exact)

    P_fast, t_fast = run_path(cfg, e_data, init_params, X)
    P_exact, t_exact = run_path(cfg_exact, e_data, init_params, X)

    rows = compare_posteriors(P_fast, P_exact, top_frac=args.top_frac)
    max_fd = (args.max_finite_diff if args.max_finite_diff is not None
              else max(args.num_samples // 100, 1))
    ok = all(r["spearman_rho"] >= args.min_rho
             and (r["top_jaccard"] >= args.min_top_jaccard
                  or r["top_recall_2k"] >= 1.0)
             and r["finite_mismatch"] <= max_fd for r in rows)
    report = dict(config=args.config, num_samples=args.num_samples,
                  seed=cfg.sim_flags.seed, exact_method=args.exact_method,
                  fast_seconds=round(t_fast, 1),
                  exact_seconds=round(t_exact, 1),
                  experiments=rows, ok=ok)
    print(json.dumps(report))
    if not ok:
        worst = min(r["spearman_rho"] for r in rows)
        print(f"FAIL: min rho {worst:.6f} (need >= {args.min_rho}) or "
              f"top-set/finiteness gate", file=sys.stderr)
        return 1
    print(f"PASS: min rho {min(r['spearman_rho'] for r in rows):.6f}, "
          f"min top-{args.top_frac:.0%} Jaccard "
          f"{min(r['top_jaccard'] for r in rows):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
