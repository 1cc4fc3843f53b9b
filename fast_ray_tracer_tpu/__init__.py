"""fast_ray_tracer_tpu — a TPU-native differentiable Whitted ray tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU ray tracer (gbordelon/fast_ray_tracer): recursive Whitted integration with
reflection/refraction, photon-mapped global illumination, CMJ-sampled area
lights and soft shadows, depth-of-field cameras with shaped apertures,
MTL-style materials with 8 texture-map slots, procedural patterns and UV
texture maps, all analytic primitives (sphere/plane/cube/cylinder/cone/
toroid/triangles), OBJ meshes, CSG, and 16-bit PPM/PNG output.

Architecture (nothing is a port — see SURVEY.md §7):
  * scenes compile to flat SoA tensors (SceneIR), not pointer graphs
  * per-ray recursion becomes batched, statically-unrolled bounce passes
  * pthread row-parallelism becomes pixel sharding over a jax device Mesh
  * drand48 becomes keyed, stateless jax.random / CMJ sampling
  * the photon-map kd-tree becomes a sorted uniform-grid differentiable gather
"""

__version__ = "0.1.0"

from fast_ray_tracer_tpu.scene.yaml_loader import load_scene  # noqa: F401
from fast_ray_tracer_tpu.render.render import render_scene    # noqa: F401
