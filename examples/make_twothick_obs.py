"""Generate matching observations for the bundled Twothick excitation data.

The reference ships ``Twothick_Excitations.csv`` (6 excitation profiles;
BASELINE.json config #5 "two-thickness scan") but no observation file for
it, so this script synthesizes one: each excitation curve is simulated at
its per-curve absorber thickness (curves 0-2 at 311 nm, curves 3-5 at
622 nm — the reference's thicknesses-list mechanism, bayeslib.py:109-119)
from a known ground-truth parameter set, and the resulting TRPL decays are
written in the reference observation CSV format (t, PL, sigma rows per
curve, END sentinel).  ``examples/twothick.toml`` then runs mixed-thickness
inference against it, and the posterior should recover the truth.

Usage:  python examples/make_twothick_obs.py [out_csv]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bayesian_inference_trpl_tpu import physics                 # noqa: E402
from bayesian_inference_trpl_tpu.models import SimParams, pvsim  # noqa: E402
from bayesian_inference_trpl_tpu.utils.io import get_initpoints  # noqa: E402

EXC = "/root/reference/Example Data/Twothick_Excitations.csv"
THICKNESSES = [311.0, 311.0, 311.0, 622.0, 622.0, 622.0]
TIME, T, L = 2000.0, 80000, 128
# Ground truth (user units: cm-based, like the reference parameter box).
TRUE = [1e8, 3e15, 20.0, 20.0, 4.8e-11, 10.0, 10.0, 4.4e-29, 4.4e-29,
        511.0, 871.0, 0.1]


def main(out_csv="examples/data/twothick_obs.csv"):
    profiles = get_initpoints(EXC, {})
    assert len(profiles) == len(THICKNESSES)
    mat = np.asarray(TRUE)[None, :] * physics.UNIT_CONVERSIONS[:12]
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w") as f:
        for dn, thick in zip(profiles, THICKNESSES):
            sim = SimParams(length=thick, time=TIME, L=L, T=T, pl_stride=1,
                            tol_exp=7, max_iters=100,
                            predictor="linear", step_tol=1e-6)
            res = pvsim(mat, sim, dn, init_mode="points")
            pl = np.asarray(res.pl)[0]          # [photons nm^-2 ns^-1]
            assert np.asarray(res.converged).all()
            for ti, pi in zip(sim.pl_times, pl):
                # Reference units: 1e-23-scaled PL, sigma column unused.
                f.write(f"{ti},{pi / 1e-23:.10e},1e13\n")
            print(f"curve at {thick} nm: PL(0)={pl[0]:.3e}, "
                  f"PL(end)={pl[-1]:.3e}")
        f.write("END,,\n")
    print("wrote", out_csv)


if __name__ == "__main__":
    main(*sys.argv[1:])
