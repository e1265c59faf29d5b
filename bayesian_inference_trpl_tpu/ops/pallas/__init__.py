"""Pallas TPU kernels — native-kernel equivalents of the reference's
``@cuda.jit`` inventory (SURVEY.md section 2: tEvol/iterate/pcreduce/norm2,
pvSimPCR.py:14-306), built as fused VMEM-resident kernels rather than
translations of the CUDA thread code."""
from .newton_kernel import pallas_newton_step  # noqa: F401
