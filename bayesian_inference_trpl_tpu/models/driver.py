"""Host-level solver driver: unit handling, initialization modes, and
re-dimensionalization around :func:`solver.solve`.

Mirrors the role of the reference's ``pvSim`` host function
(reference: pvSimPCR.py:309-401) without any of its GPU launch machinery:
there are no H2D/D2H copies to manage — one jitted call covers the whole
batch and time horizon.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import physics
from .solver import FusedObs, SolveResult, SolverConfig, solve


@dataclass(frozen=True)
class SimParams:
    """Space/time grid configuration (reference simPar contract,
    parallel_bayes_gpu.py:72-81)."""
    length: float          # film thickness [nm]
    time: float            # final delay time [ns]
    L: int = 128           # spatial points
    T: int = 80000         # time steps
    pl_stride: int = 1     # plT: PL recording interval
    tol_exp: float = 7.0   # convergence tolerance exponent (TOL = 10^-tol_exp)
    max_iters: int = 10000
    method: str = "coupled_newton"
    predictor: str = "previous"   # "previous" (reference) | "linear" (1 Newton
    #                               iter/step on smooth stretches; same fixed point)
    step_tol: float = 0.0         # state-settled acceptance (f32 floor); 0 = off
    fast_fine_steps: Optional[int] = None   # fast-solver switch point
    fast_coarse_stride: int = 16            # base stride of the ladder (r3-tuned)
    fast_max_stride: int = 64               # stride cap (8 -> 16 -> ... cap)
    fast_steps_per_phase: int = 512         # coarse steps per ladder rung

    @property
    def dx(self) -> float:
        return self.length / self.L

    @property
    def dt(self) -> float:
        return self.time / self.T

    @property
    def num_pl(self) -> int:
        return self.T // self.pl_stride + 1

    @property
    def pl_times(self) -> np.ndarray:
        return np.linspace(0.0, self.time, self.num_pl)

    def solver_config(self, record_state_stride=None) -> SolverConfig:
        return SolverConfig(
            num_steps=self.T, pl_stride=self.pl_stride,
            tol=10.0 ** (-self.tol_exp), max_iters=self.max_iters,
            record_state_stride=record_state_stride, method=self.method,
            predictor=self.predictor,
            step_tol=self.step_tol if self.step_tol > 0 else None)

    @property
    def fast_phases(self):
        """Phase schedule ((stride, num_fine_steps), ...) for the
        multi-phase fast solver (models/twophase.py), or None when the
        horizon is too short to coarsen (single-phase reference stepping)."""
        if self.fast_fine_steps is None:
            return None
        from .twophase import geometric_schedule
        sched = geometric_schedule(
            self.T, int(self.fast_fine_steps),
            base_stride=int(self.fast_coarse_stride),
            coarse_steps_per_phase=int(self.fast_steps_per_phase),
            max_stride=int(self.fast_max_stride))
        return sched if len(sched) > 1 else None


def initial_excess_density(sim: SimParams, ini_par, init_mode: str,
                           dtype=jnp.float64) -> jax.Array:
    """Nondimensional initial excess carrier density dN (L,) per cell.

    init_mode (reference: pvSimPCR.py:347-358):
      * "exp":    ini_par = (a, l); dN(x) = a exp(-x / l), nodes at (i+1/2) dx.
      * "points": ini_par = per-node densities [nm^-3], length L.
    (For full-state restarts use ``init_mode="continue"`` on :func:`pvsim`,
    which takes (N, P, E) instead of an excess density.)
    """
    dx = sim.dx
    if init_mode == "exp":
        a, l = ini_par
        x = (np.arange(sim.L) + 0.5) * dx
        dn = a * np.exp(-x / l) * dx ** 3
    elif init_mode == "points":
        dn = np.asarray(ini_par, dtype=float)
        if dn.shape[-1] != sim.L:
            raise ValueError(f"init profile length {dn.shape[-1]} != L={sim.L}")
        dn = dn * dx ** 3
    else:
        raise ValueError(f"unknown init_mode {init_mode!r}")
    return jnp.asarray(dn, dtype=dtype)


@partial(jax.jit, static_argnames=("cfg", "record_pl", "has_obs"))
def _solve_jit(mat_nd, dn, cfg, obs, record_pl, has_obs):
    n0 = mat_nd[:, 0:1] + dn[None, :]
    p0 = mat_nd[:, 1:2] + dn[None, :]
    e0 = jnp.zeros_like(n0)
    return solve(mat_nd, n0, p0, e0, cfg, obs=obs if has_obs else None,
                 record_pl=record_pl)


@partial(jax.jit, static_argnames=("cfg", "record_pl", "has_obs"))
def _solve_state_jit(mat_nd, n0, p0, e0, cfg, obs, record_pl, has_obs):
    return solve(mat_nd, n0, p0, e0, cfg, obs=obs if has_obs else None,
                 record_pl=record_pl)


def nondim_state(n, p, e, sim: SimParams):
    """Inverse of :func:`redim_state`: physical (N [nm^-3], P [nm^-3],
    E [V/nm]) -> nondimensional solver state."""
    dx = sim.dx
    return n * dx ** 3, p * dx ** 3, e * dx / physics.KB_T


def pvsim(mat_par, sim: SimParams, ini_par, init_mode: str = "points",
          dtype=None, obs: Optional[FusedObs] = None,
          record_pl: bool = True, record_state_stride=None) -> SolveResult:
    """Run a batch of TRPL simulations from (V, nm, ns)-unit parameters.

    Args:
      mat_par: (batch, 12) parameters [n0..lambda] in (V, nm, ns) units
        (mag_offset column excluded, as in the GPU path: bayeslib.py:144).
      ini_par: initial condition per ``init_mode``.  For
        ``init_mode="continue"`` (full-state restart; the mode the reference
        declares but leaves unimplemented, pvSimPCR.py:357), ini_par is a
        tuple (N, P, E) of per-sample (batch, L) arrays in *physical* units
        exactly as returned by :func:`redim_state` — the natural API for
        segmented long-horizon runs.
      obs: optional fused observations; ``obs.values`` must be in log10 of
        physical PL units and on the simulation PL time grid.

    Returns a SolveResult whose ``pl`` is re-dimensionalized to
    [photons nm^-2 ns^-1] (reference: pvSimPCR.py:393 divides by dx^2 dt).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mat_nd = physics.nondimensionalize(np.asarray(mat_par), sim.dx, sim.dt)
    mat_nd = jnp.asarray(mat_nd, dtype=dtype)
    cfg = sim.solver_config(record_state_stride)
    if init_mode == "continue":
        n0, p0, e0 = nondim_state(*(jnp.asarray(a, dtype) for a in ini_par),
                                  sim)
        res = _solve_state_jit(mat_nd, n0, p0, e0, cfg, obs, record_pl,
                               obs is not None)
    else:
        dn = initial_excess_density(sim, ini_par, init_mode, dtype=dtype)
        res = _solve_jit(mat_nd, dn, cfg, obs, record_pl, obs is not None)
    if res.pl is not None:
        res = res._replace(pl=res.pl / (sim.dx ** 2 * sim.dt))
    return res


def pl_log_scale(sim: SimParams) -> float:
    """log10 factor converting nondimensional PL to physical units."""
    return float(-np.log10(sim.dx ** 2 * sim.dt))


def redim_state(res: SolveResult, sim: SimParams):
    """Convert final state to physical units: N, P [nm^-3], E [V/nm].

    The solver's nondimensional field is E' = q E dx / kB T, so the physical
    field is E' kB T / dx (the reference's own test pipeline divides by dx
    only, keeping the kB T factor implicit on both sides; Testing/PV_tester2.py:131).
    """
    dx = sim.dx
    n = res.n / dx ** 3
    p = res.p / dx ** 3
    e = res.e * physics.KB_T / dx
    return n, p, e
