"""Tiny-shape compile harness for pmajor_probe: prints the full Mosaic error."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

import tools.pmajor_probe as pp

P = pp.OWN
p_pad = P
nb = 1
slab = jnp.zeros((8, p_pad + pp.VCAP), jnp.float32)
dma_lo = jnp.zeros((nb,), jnp.int32)
ws = jnp.zeros((nb * pp.CPB * 3,), jnp.int32)
mode = sys.argv[1] if len(sys.argv) > 1 else "a"
try:
    pp.run(slab, dma_lo, ws, jnp.float32(0.001), 384, mode, p_pad)
    print("COMPILE OK")
except Exception as e:
    s = str(e)
    i = s.find("Mosaic")
    print("ERR:", s[i : i + 1500] if i >= 0 else s[-1500:])
