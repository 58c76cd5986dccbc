"""Earth item-mode cost split: kernel vs deferred-texel factor.

  EARTH_ABLATE=nofactor EARTH_SCENE=earth.json python tools_dev/probe_earth.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from raytrace_tpu.engine import Renderer
    from raytrace_tpu.models import compile_scene
    from raytrace_tpu.options import KernelOptions
    from raytrace_tpu.scene_file import SceneFile
    from raytrace_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    scene = os.environ.get("EARTH_SCENE", "earth.json")
    ablate = os.environ.get("EARTH_ABLATE", "")
    k = int(os.environ.get("EARTH_K", "0"))

    opts = KernelOptions(ablate=ablate)
    sf = SceneFile.load_json(f"/root/reference/assets/{scene}")
    if k <= 0:
        k = sf.render.sample_batches
    sf.render.sample_batches = max(sf.render.sample_batches, 2 * k)
    w = int(os.environ.get("EARTH_W", "512"))
    cs = compile_scene(sf, width=w,
                       height=int(w / (sf.render.aspect_ratio or 1.0)))

    r = Renderer(cs, kernel_options=opts)

    def render_k(n):
        done = 0
        while done < n:
            step = min(r.chunk_size(), n - done)
            r.render_batches(step)
            done += step
        jax.block_until_ready(r.accum)

    t0 = time.time()
    render_k(k)
    t_cold = time.time() - t0
    rays0 = r.stats.rays_traced
    t0 = time.time()
    render_k(k)
    dt = time.time() - t0
    rays = r.stats.rays_traced - rays0
    spp = r.static.sqrt_spp ** 2
    n_samp = r.static.width * r.static.height * spp * k
    img = r.image()
    print(f"{scene} ablate={ablate!r} k={k}: cold {t_cold:.2f}s steady {dt:.3f}s"
          f" | {rays/dt/1e6:.2f} Mrays/s | {n_samp/dt/1e6:.2f} Msamples/s"
          f" | rays/samp {rays/n_samp:.2f} | mean {np.asarray(img).mean():.6f}",
          flush=True)


if __name__ == "__main__":
    main()
