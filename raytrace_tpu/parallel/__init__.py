"""Multi-chip parallelism: sharding the ray wavefront over a device mesh.

The reference is single-GPU (SURVEY.md §2.3); scaling here is TPU-native:
a 2-D `jax.sharding.Mesh` with a pixel-tile axis ("px", data-parallel rows
of the image) and a sample axis ("sp", samples-per-pixel split with a psum
over ICI).  Scene arrays are replicated — they are broadcast once per scene
— and the accumulation image is sharded by rows.
"""

from .multichip import MultiChipRenderer, make_mesh, sharded_batch_fn

__all__ = ["MultiChipRenderer", "make_mesh", "sharded_batch_fn"]
