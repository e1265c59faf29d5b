"""Persistent XLA compilation cache for entry points (OPT-IN).

Production multiphase programs take minutes to compile; on a normal
PJRT backend the JAX persistent cache makes repeat runs skip
compilation.  Opt in with TRPL_COMPILE_CACHE=<dir>.  Left off by
default: the axon remote-compile tunnel used in this environment does
not populate the cache for the large production programs (verified
empirically — cache dir stays empty and runs see no speedup), so the
default avoids promising a benefit the backend cannot deliver.

Called from the CLIs (run.py, bench.py), not at library import
(libraries stay side-effect free).
"""
from __future__ import annotations

import os


def enable_compile_cache(min_compile_secs: float = 2.0) -> str | None:
    d = os.environ.get("TRPL_COMPILE_CACHE", "")
    if not d or d == "0":
        return None
    import jax
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return d
