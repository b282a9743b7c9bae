"""Core data structures and math (pure jnp, CPU-runnable).

TPU-first counterpart of the reference's layer-1 core (nerfstudio/cameras/rays.py,
nerfstudio/utils/{poses,math,tensor_dataclass}.py): pytrees-of-arrays instead of
TensorDataclass subclasses, pure functions, static shapes.
"""

from neurad_tpu.core.structs import (  # noqa: F401
    Frustums,
    GaussiansStd,
    RayBundle,
    RaySamples,
    tree_cat,
    tree_getitem,
    tree_reshape,
    tree_size,
)
