"""Device kernels (jax.numpy / Pallas): everything that runs per-ray on TPU.

These modules replace the reference's GLSL device library
(shaders/src/common.glsl, ray_gen.glsl, perlin.glsl) with vectorized,
jit-compatible functions over flat ray wavefronts.
"""
