"""Hot-path ops: functional kernels (jnp reference implementations + Pallas versions).

This layer replaces the reference's external CUDA dependencies (SURVEY.md §2.3):
tiny-cuda-nn hashgrid/MLP, nerfacc transmittance/accumulation, gsplat rasterizers.
Every op has a pure-jnp reference implementation (used for tests and as the XLA
fallback) and, where profiling justifies it, a Pallas TPU kernel with custom VJP.
"""
