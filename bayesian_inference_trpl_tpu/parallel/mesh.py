"""Device mesh and sharding helpers.

The workload is embarrassingly parallel over parameter samples, so the
parallelism model is pure data parallelism over a 1-D ``samples`` mesh axis:
inputs are sharded on the sample (batch) axis, the solver runs SPMD with
zero collectives in the hot loop, and results are gathered once at export.
This subsumes the reference's one-process-per-GPU SLURM-stride scheme
(reference: bayeslib.py:131, :231) and fixes its missing cross-task merge.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SAMPLE_AXIS = "samples"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the sample axis (defaults to all local devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SAMPLE_AXIS,))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (sample) axis."""
    return NamedSharding(mesh, P(SAMPLE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
