"""Render engine: jit'd wavefront batch step + progressive accumulation.

The TPU-native replacement for the reference's RenderEngine + Scene
(raytracer/src/render_engine.rs, scene.rs): a scene compiles once to device
arrays; each progressive sample batch is one jit'd call that generates the
full pixel x sample wavefront, bounces it to completion with
`lax.while_loop`, and folds the result into the running-mean accumulation
image in HBM.
"""

from .arrays import SceneArrays, SceneStatic, upload_scene
from .renderer import Renderer

__all__ = ["SceneArrays", "SceneStatic", "upload_scene", "Renderer"]
