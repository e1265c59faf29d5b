"""Standalone verification instruments.

The debugging toolchain the reference ships in Testing/ — a Cartesian
parameter-sweep generator (pvSetup.py:9-90), an independent-integrator
runner (PV_tester2.py), a per-field relative-norm comparator
(compare.py:22-59), and a solver-vs-oracle overlay viewer
(pvPlt_interface.py:19-179) — rebuilt as headless CLIs over one npz file
format:

  sweep file:  mat_par (batch, 12) in (V, nm, ns) units, grid scalars,
               initial condition;
  result file: the sweep inputs plus snapshot times, N/P/E state
               snapshots (batch, n_snap, L) and the full PL trace.

Pipeline: ``python -m bayesian_inference_trpl_tpu.tools.sweep`` ->
``...tools.run_sweep --backend solver|oracle`` -> ``...tools.compare`` /
``...tools.overlay``.
"""


def apply_platform_env():
    """Honor JAX_PLATFORMS even when a site hook already imported jax and
    pinned a default platform (the env var alone cannot switch backends
    after import; jax.config.update can, until the backend initializes)."""
    import os
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
