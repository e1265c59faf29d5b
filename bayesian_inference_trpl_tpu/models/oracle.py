"""Independent CPU oracle: method-of-lines integration of the *dimensional*
drift-diffusion-decay equations with scipy ``solve_ivp`` (BDF).

This is the framework's accuracy gate, mirroring the role of the reference's
CPU fallback and scipy test oracle (pvSim_fallback.py:18-117,
Testing/PV_tester2.py:13-47): a formulation that shares no discretization
code with the TPU solver — dimensional units, explicit flux assembly,
adaptive implicit integration — so agreement is meaningful.
"""
from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp

from .. import physics


def dydt(t, y, L, dx, n0, p0, DN, DP, B, Sf, Sb, CN, CP, tauN, tauP, lam_nm):
    """RHS of the dimensional carrier system; y = [N(L), P(L), E(L+1)].

    Units: N, P [nm^-3]; E [V/nm]; fluxes [nm^-2 ns^-1].
    DN = mu_n kB T (diffusivity, nm^2/ns); drift mobility recovered via
    mu = D / kB T.  dE/dt couples through lambda = lambda0 / eps [nm]:
    q_C / (eps eps0) = kB T lambda (both sides of the parity test use this
    identity; cf pvSim_fallback.py:58 and pvSimPCR.py's Lambda scaling).
    """
    N = y[:L]
    P = y[L:2 * L]
    E = y[2 * L:]

    NP = N * P - n0 * p0
    Sft = Sf * NP[0] / (N[0] + P[0])
    Sbt = Sb * NP[-1] / (N[-1] + P[-1])

    Jn = np.empty(L + 1)
    Jp = np.empty(L + 1)
    Jn[0], Jn[L] = Sft, -Sbt
    Jp[0], Jp[L] = -Sft, Sbt

    N_edge = 0.5 * (N[:-1] + N[1:])
    P_edge = 0.5 * (P[:-1] + P[1:])
    # J_n = mu_n N q E + D_n dN/dx ;  J_p = mu_p P q E - D_p dP/dx
    Jn[1:-1] = DN * (N_edge * E[1:-1] / physics.KB_T + (N[1:] - N[:-1]) / dx)
    Jp[1:-1] = DP * (P_edge * E[1:-1] / physics.KB_T - (P[1:] - P[:-1]) / dx)

    recomb = (B + 1.0 / (tauN * P + tauP * N) + (CN * N + CP * P)) * NP

    dN = (Jn[1:] - Jn[:-1]) / dx - recomb
    dP = -(Jp[1:] - Jp[:-1]) / dx - recomb
    # dE/dt = -(Jn + Jp) q_C / (eps eps0) = -(Jn + Jp) kB T lambda  [V nm^-1 ns^-1]
    dE = -(Jn + Jp) * physics.KB_T * lam_nm
    return np.concatenate([dN, dP, dE])


def solve_oracle(mat_par, length, time, L, num_pl, init_dn,
                 rtol=1e-8, atol=1e-12, max_step=1.0):
    """Integrate one parameter set; returns times, N(t), P(t), E(t), PL(t).

    Args:
      mat_par: 12 (V, nm, ns)-unit parameters [n0..lambda] (lambda in nm).
      init_dn: (L,) initial excess density [nm^-3].
      num_pl: number of PL samples (including t=0) on a uniform grid.

    PL uses the rectangle rule B * sum(NP - n0 p0) * dx, matching the
    production solver's observable (pvSimPCR.py:276-281, :393); the
    reference's CPU fallback uses Simpson instead (pvSim_fallback.py:112) —
    an O(dx^2) difference far below the parity tolerance.
    """
    n0, p0, DN, DP, B, Sf, Sb, CN, CP, tauN, tauP, lam_nm = [float(v) for v in mat_par]
    dx = length / L
    y0 = np.concatenate([init_dn + n0, init_dn + p0, np.zeros(L + 1)])
    t_eval = np.linspace(0.0, time, num_pl)
    sol = solve_ivp(
        dydt, (0.0, time), y0, t_eval=t_eval, method="BDF",
        args=(L, dx, n0, p0, DN, DP, B, Sf, Sb, CN, CP, tauN, tauP, lam_nm),
        rtol=rtol, atol=atol, max_step=max_step)
    if not sol.success:
        raise RuntimeError(f"oracle integration failed: {sol.message}")
    N = sol.y[:L]
    P = sol.y[L:2 * L]
    E = sol.y[2 * L:]
    pl = B * np.sum(N * P - n0 * p0, axis=0) * dx
    return sol.t, N, P, E, pl


def solve_oracle_batch(mat_par, length, time, L, num_pl, init_dn, **kw):
    """Loop `solve_oracle` over a (batch, 12) parameter matrix; returns PL (batch, num_pl)."""
    mat_par = np.atleast_2d(np.asarray(mat_par))
    out = np.empty((len(mat_par), num_pl))
    for i, mp in enumerate(mat_par):
        out[i] = solve_oracle(mp, length, time, L, num_pl, init_dn, **kw)[4]
    return out
