"""Persistent XLA compilation cache — ON BY DEFAULT since round 5.

Production multiphase programs take ~70-80 s to compile on the axon
remote-compile backend (measured r5: the shipped 4-phase chunk program
costs trace 26 s + lower 14 s + compile 77 s cold).  With this cache a
fresh process re-compiling the identical program pays **2.0 s** instead
of 76.5 s (measured r5 on the production chunk program) — the round-4
note claiming the cache "does not populate for large production
programs" on this backend was re-tested and is WRONG: the cache writes
a ~17 MB entry for the full Pallas multiphase program and hits it from
fresh processes.

Layering: this cache removes the *compile* leg of a cold start; the
*trace+lower* leg (~40 s) is removed separately by the serialized
program cache (utils/program_cache.py), which stores the lowered
StableHLO via jax.export and re-dispatches through a normal jit (so
async dispatch and the runner's double-buffering survive — unlike the
r4 executable cache, whose deserialized Compiled objects dispatched
synchronously and were measured 7x slower end-to-end).

Default directory: $XDG_CACHE_HOME/bayesian-inference-trpl/xla (or
~/.cache/...).  Override with TRPL_COMPILE_CACHE=<dir>; disable with
TRPL_COMPILE_CACHE=0.  Called from the CLIs and from ShardedRunner
construction (idempotent; never overrides a cache dir the embedding
application already configured).

Known cosmetic noise: XLA:CPU AOT cache loads can log a
"machine feature +prefer-no-gather is not supported on the host"
warning even for entries written on the SAME machine —
prefer-no-gather/-scatter are XLA tuning pseudo-features, not CPU
capabilities, and the loaded programs execute correctly (verified
bitwise in __graft_entry__.dryrun_multichip across cache reloads).
"""
from __future__ import annotations

import os


def default_cache_root() -> str:
    xdg = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return os.path.join(xdg, "bayesian-inference-trpl")


def enable_compile_cache(min_compile_secs: float = 0.05) -> str | None:
    # min_compile_secs 0.05, not the jax default 1.0: on the axon tunnel
    # even trivial one-op programs cost ~0.4 s of remote compile, and a
    # fresh process dispatches a few hundred of them (measured r5: 130 s
    # of a 135 s warm-cache cold start was exactly these sub-threshold
    # compiles).  Entries are ~25 KB; caching them all is cheap.
    d = os.environ.get("TRPL_COMPILE_CACHE", "")
    if d == "0":
        return None
    if not d:
        d = os.path.join(default_cache_root(), "xla")
    import jax
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir   # already configured
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return d
