"""Command-line renderer: the one-command replacement for the reference's
``yaml_parser.py scene.yml > main.c && make && ./ray_tracer`` pipeline
(reference README.md:5-14).

    python -m fast_ray_tracer_tpu scene.yml [-o /tmp/out] [options]

Like the generated main() (yaml_parser/yaml_parser.py:179-226) this loads
the YAML scene, runs the photon pass when configured, renders, and writes
BOTH a 16-bit binary PPM and a 48-bit PNG next to the output stem (the
stem defaults to the scene's ``output.file`` config entry).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m fast_ray_tracer_tpu",
        description="TPU-native ray tracer — render a reference-schema "
                    "YAML scene to 16-bit PPM + PNG.")
    ap.add_argument("scene", help="YAML scene file (reference schema, "
                    "incl. define/extend)")
    ap.add_argument("-o", "--output", default=None,
                    help="output path stem (default: the scene config's "
                    "output.file); .ppm and .png are appended")
    ap.add_argument("--width", type=int, default=None,
                    help="override camera width")
    ap.add_argument("--height", type=int, default=None,
                    help="override camera height")
    ap.add_argument("--dtype", choices=("f32", "f64"), default=None,
                    help="compute dtype (default: f64 on cpu for bitwise "
                    "reference parity, f32 on tpu)")
    ap.add_argument("--chunk", type=int, default=8192,
                    help="pixels per device dispatch (default 8192)")
    ap.add_argument("--seed", type=int, default=0,
                    help="PRNG seed for stochastic scenes (jitter, DoF, "
                    "photons); replaces the reference's global drand48")
    ap.add_argument("--checkpoint", default=None,
                    help="snapshot path: resumable render progress "
                    "(a killed render restarts where it stopped)")
    ap.add_argument("--platform", choices=("cpu", "tpu"), default=None,
                    help="force the jax backend (default: the platform "
                    "jax selects; site plugins may override JAX_PLATFORMS, "
                    "so prefer this flag)")
    ap.add_argument("--quiet", action="store_true",
                    help="suppress per-chunk progress")
    ap.add_argument("--ppm-only", action="store_true")
    ap.add_argument("--png-only", action="store_true")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="emit a per-phase JSON report to stdout and a "
                    "jax.profiler trace (xprof/tensorboard) into DIR")
    args = ap.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp

    # Site plugins (e.g. the axon TPU tunnel) may force jax_platforms at
    # sitecustomize time, overriding the JAX_PLATFORMS env var; re-apply
    # the user's choice after import.
    platform = args.platform or os.environ.get("JAX_PLATFORMS_CLI")
    if platform:
        jax.config.update("jax_platforms", platform)

    from fast_ray_tracer_tpu import load_scene, render_scene
    from fast_ray_tracer_tpu.io.ppm import write_png, write_ppm
    from fast_ray_tracer_tpu.scene.model import replace

    scene = load_scene(args.scene)
    if scene.camera is None:
        print("error: scene has no camera", file=sys.stderr)
        return 2
    if args.width or args.height:
        scene.camera = replace(
            scene.camera,
            width=args.width or scene.camera.width,
            height=args.height or scene.camera.height)

    if args.dtype is None:
        dtype = jnp.float32 if jax.default_backend() != "cpu" \
            else jnp.float64
    else:
        dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    needs_rng = (scene.camera.aperture.jitter
                 or any(li.jitter for li in scene.lights)
                 or scene.config.photon_count > 0)
    key = jax.random.PRNGKey(args.seed) if needs_rng else None

    from fast_ray_tracer_tpu.utils import (
        PhaseTimer, enable_compile_cache, rays_per_second, trace_context,
    )
    enable_compile_cache()
    timer = PhaseTimer()

    out = args.output or scene.config.output_file
    t0 = time.time()
    with timer.phase("render", scene=args.scene), \
            trace_context(args.profile):
        canvas = render_scene(scene, dtype=dtype, chunk_pixels=args.chunk,
                              key=key, progress=not args.quiet,
                              checkpoint_path=args.checkpoint,
                              timer=timer)
    wall = time.time() - t0
    W, H = scene.camera.width, scene.camera.height
    if not args.quiet:
        cam = scene.camera
        print(f"rendered {W}x{H} in {wall:.2f}s "
              f"({W * H / max(wall, 1e-9):,.0f} px/s, "
              f"{rays_per_second(W * H, cam.usteps * cam.vsteps, 2, wall):,.0f} "
              f"rays/s lower-bound) on {jax.default_backend()}")
    if args.profile:
        timer.report()
        if not args.quiet:
            print(f"profiler trace in {args.profile}")
    if not args.png_only:
        write_ppm(canvas, out)
        if not args.quiet:
            print(f"wrote {out}.ppm")
    if not args.ppm_only:
        write_png(canvas, out)
        if not args.quiet:
            print(f"wrote {out}.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
