"""Does Mosaic lower arctan2 / arccos?  (needed for in-kernel sphere UV)"""
import functools
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    x = x_ref[:]
    u = (jnp.arctan2(x, -x + 0.3) / (2.0 * np.pi)) % 1.0
    v = jnp.arccos(jnp.clip(x * 0.5, -1.0, 1.0)) / np.pi
    o_ref[:] = u + v


def main():
    x = jnp.linspace(-1.0, 1.0, 8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)
    ref = ((jnp.arctan2(x, -x + 0.3) / (2.0 * np.pi)) % 1.0
           + jnp.arccos(jnp.clip(x * 0.5, -1.0, 1.0)) / np.pi)
    err = float(jnp.max(jnp.abs(out - ref)))
    bit = int(jnp.sum(out != ref))
    print(f"mosaic arctan2+arccos OK; max abs err vs XLA {err:.3e}, "
          f"differing elems {bit}/{out.size}")


if __name__ == "__main__":
    main()
