"""Multi-process (multi-host / multi-slice) execution support.

The reference scales out with independent SLURM array tasks — one process
per GPU, no communication, and per-task result strides that are never
merged (bayeslib.py:231; SURVEY.md section 2.4).  The TPU-native
equivalent is a single SPMD program over ALL hosts' devices: pure data
parallelism over ICI within a slice and DCN across slices, with

  * ``jax.distributed.initialize`` wiring the processes together,
  * a global 1-D sample mesh over ``jax.devices()`` (all processes),
  * chunk inputs built with ``jax.make_array_from_callback`` from the
    host-global sample matrix (every process draws the identical X from
    the same seed, so each host serves exactly its addressable shards
    with zero cross-host data movement), and
  * one ``process_allgather`` of the tiny (num_exp, chunk) likelihood
    block per chunk so every host owns the merged (X, P) — fixing the
    reference's unmerged-stride gap.

Usage: either call :func:`initialize` explicitly, or set the standard
environment variables (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
``JAX_PROCESS_ID``) and run the normal CLI on every host —
``bayes()`` calls :func:`maybe_initialize_from_env` on startup.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, **kwargs) -> None:
    """Wire this process into the global JAX runtime
    (``jax.distributed.initialize``).  Must run before first device use."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    logger.info("distributed: process %d/%d via %s; %d global devices",
                process_id, num_processes, coordinator_address,
                len(jax.devices()))


_env_initialized = False


def maybe_initialize_from_env() -> bool:
    """Initialize from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID when set (the SLURM-array replacement: point every host
    at the same coordinator).  Returns True when distributed mode is on.
    Idempotent: a second ``bayes()`` call in the same process (config
    sweeps, retries) must not re-run ``jax.distributed.initialize``,
    which raises once the runtime is wired."""
    global _env_initialized
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    if _env_initialized:
        return True
    initialize(addr, int(os.environ["JAX_NUM_PROCESSES"]),
               int(os.environ["JAX_PROCESS_ID"]))
    _env_initialized = True
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, exports, logging)."""
    return process_index() == 0


def make_global_array(arr, sharding, dtype=None):
    """Build a (possibly multi-host) global array from a HOST-GLOBAL
    array: every process passes the same full ``arr`` and serves only the
    shards addressable on its devices.  Single-process: plain device_put —
    inputs that are already device arrays (e.g. a jnp excitation profile)
    stay on device instead of round-tripping through numpy."""
    import jax
    import numpy as np
    if jax.process_count() == 1:
        if dtype is not None and getattr(arr, "dtype", None) != np.dtype(dtype):
            if isinstance(arr, jax.Array):
                import jax.numpy as jnp
                arr = jnp.asarray(arr, dtype)
            else:
                arr = np.asarray(arr, dtype)
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr, dtype)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def broadcast_from_primary(tree):
    """Broadcast a pytree of host arrays from process 0 to all processes
    (used for checkpoint-resume state, which only the primary reads — the
    chunk loops of every process must agree on the resume point or the
    per-chunk allgather desyncs).  Single-process: identity."""
    import jax
    if jax.process_count() == 1:
        return tree
    import numpy as np
    from jax.experimental import multihost_utils
    out = multihost_utils.broadcast_one_to_all(tree)
    # The broadcast returns read-only numpy views of device arrays; the
    # consumers (e.g. the resumed P accumulator, runner.harvest's "+=")
    # need writable host arrays — copy on the way out.
    return jax.tree_util.tree_map(np.array, out)


def allgather_to_host(x):
    """Gather a sample-sharded device array to a host-global numpy array on
    EVERY process (the merge step the reference's SLURM strides lacked).
    Single-process: plain device transfer."""
    import jax
    import numpy as np
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
