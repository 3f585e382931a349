"""aadff_tpu — TPU-native aberration-aware depth-from-focus framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
singer-yang/Aberration-Aware-Depth-from-Focus: differentiable ray tracing of
real multi-element lenses, PSF surrogate networks, aberrated focal-stack
rendering, and depth-from-focus model training — built for TPU hardware
(MXU-friendly kernels, pjit/mesh data parallelism, functional pytree state).
"""

__version__ = "0.1.0"
