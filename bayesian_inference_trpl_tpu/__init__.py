"""TPU-native Bayesian inference framework for TRPL decay curves.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
HagesLab/Bayesian-Inference-TRPL: batched implicit drift-diffusion-decay
simulation of time-resolved photoluminescence, fused log-likelihood
evaluation over sampled material-parameter spaces, sample-axis data
parallelism over TPU meshes, and posterior post-processing.
"""
__version__ = "0.1.0"

from . import physics  # noqa: F401
