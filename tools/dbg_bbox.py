"""Scratch: bracket the TPU worker fault on the bbox render by chunk size.
Usage: python tools/dbg_bbox.py <chunk_pixels> [W H]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import fast_ray_tracer_tpu as frt
from fast_ray_tracer_tpu.render.render import render_scene
from fast_ray_tracer_tpu.scene.model import replace
from fast_ray_tracer_tpu.utils import enable_compile_cache

enable_compile_cache()

chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
W = int(sys.argv[2]) if len(sys.argv) > 2 else 600
H = int(sys.argv[3]) if len(sys.argv) > 3 else 240

sc = frt.load_scene(".baseline/golden/bbox_tiny.yml")
sc.camera = replace(sc.camera, width=W, height=H)
t0 = time.time()
try:
    canvas = render_scene(sc, dtype=jnp.float32, chunk_pixels=chunk,
                          progress=True)
    wall = time.time() - t0
    print(f"{W}x{H} chunk={chunk} OK {wall:.1f}s px/s={W*H/wall:.1f} "
          f"vs_ref={W*H/wall/(9000/23.0):.2f}", flush=True)
except Exception as e:
    print(f"{W}x{H} chunk={chunk} FAILED after {time.time()-t0:.1f}s: "
          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
