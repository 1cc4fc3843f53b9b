"""Branch-free closed-form quartic solver (for the toroid).

Same algebra as the Graphics Gems solver the reference uses
(src/libs/quartic/Roots3And4.c, Jochen Schwarze; EQN_EPS=1e-9): depressed
quartic, resolvent cubic, two quadratics — including its exact special
cases (r==0 -> cubic + zero root; u/v negativity -> no roots; the
q-sign-dependent quadratic coefficients). Reformulated with jnp.where masks
instead of early returns so it vectorizes over ray batches; invalid roots
come back as +inf.

float32 loses the resolvent cubic on grazing rays, so the toroid intersector
upcasts to float64 for the solve (the toroid is the coldest primitive; the
f64 emulation cost is negligible at scene scale).
"""

from __future__ import annotations

import jax.numpy as jnp

from fast_ray_tracer_tpu.constants import QUARTIC_EPS


def _iszero(x):
    return jnp.abs(x) < QUARTIC_EPS


def solve_quadratic(c0, c1):
    """x^2 + c1 x + c0 = 0 -> (r1, r2), +inf where absent.

    Matches SolveQuadric (Roots3And4.c): D==0 -> one root, D<0 -> none.
    """
    inf = jnp.inf
    p = 0.5 * c1
    q = c0
    D = p * p - q
    sq = jnp.sqrt(jnp.maximum(D, 0.0))
    dz = _iszero(D)
    r1 = jnp.where(dz, -p, jnp.where(D > 0.0, sq - p, inf))
    r2 = jnp.where(~dz & (D > 0.0), -sq - p, inf)
    return r1, r2


def cubic_roots(c0, c1, c2, c3):
    """SolveCubic: returns (..., 3) roots with +inf where absent; slot 0 is
    the root the C code places first (s[0])."""
    inf = jnp.inf
    A = c2 / c3
    B = c1 / c3
    C = c0 / c3
    sq_A = A * A
    p = (1.0 / 3.0) * (-(1.0 / 3.0) * sq_A + B)
    q = 0.5 * ((2.0 / 27.0) * A * sq_A - (1.0 / 3.0) * A * B + C)
    cb_p = p * p * p
    D = q * q + cb_p
    sub = (1.0 / 3.0) * A

    dz = _iszero(D)
    qz = _iszero(q)

    # D ~ 0
    u0 = jnp.cbrt(-q)
    x0_dz = jnp.where(qz, 0.0, 2.0 * u0)
    x1_dz = jnp.where(qz, inf, -u0)

    # D < 0: three real roots
    phi = (1.0 / 3.0) * jnp.arccos(
        jnp.clip(-q / jnp.sqrt(jnp.maximum(-cb_p, 1e-300)), -1.0, 1.0))
    t = 2.0 * jnp.sqrt(jnp.maximum(-p, 0.0))
    x0_tri = t * jnp.cos(phi)
    x1_tri = -t * jnp.cos(phi + jnp.pi / 3.0)
    x2_tri = -t * jnp.cos(phi - jnp.pi / 3.0)

    # D > 0: one real root
    sqrt_D = jnp.sqrt(jnp.maximum(D, 0.0))
    x0_one = jnp.cbrt(sqrt_D - q) - jnp.cbrt(sqrt_D + q)

    three = ~dz & (D < 0.0)
    one = ~dz & (D > 0.0)
    x0 = jnp.where(dz, x0_dz, jnp.where(three, x0_tri, x0_one))
    x1 = jnp.where(dz, x1_dz, jnp.where(three, x1_tri, inf))
    x2 = jnp.where(three, x2_tri, inf)

    roots = jnp.stack([x0, x1, x2], axis=-1)
    return jnp.where(jnp.isfinite(roots), roots - sub[..., None], roots)


def solve_quartic(c0, c1, c2, c3, c4):
    """SolveQuartic: (..., 4) roots, +inf where absent (order unspecified)."""
    inf = jnp.inf
    A = c3 / c4
    B = c2 / c4
    C = c1 / c4
    D = c0 / c4

    sq_A = A * A
    p = -0.375 * sq_A + B
    q = 0.125 * sq_A * A - 0.5 * A * B + C
    r = (-3.0 / 256.0) * sq_A * sq_A + 0.0625 * sq_A * B - 0.25 * A * C + D
    sub = 0.25 * A

    # --- r == 0: y (y^3 + p y + q) = 0 ---
    cub = cubic_roots(q, p, jnp.zeros_like(p), jnp.ones_like(p))
    rz = jnp.concatenate([cub, jnp.zeros_like(p)[..., None]], axis=-1)

    # --- general: resolvent cubic, take s[0] ---
    z = cubic_roots(0.5 * r * p - 0.125 * q * q, -r, -0.5 * p,
                    jnp.ones_like(p))[..., 0]
    u = z * z - r
    v = 2.0 * z - p
    u_ok = _iszero(u) | (u > 0.0)
    v_ok = _iszero(v) | (v > 0.0)
    su = jnp.where(_iszero(u), 0.0, jnp.sqrt(jnp.maximum(u, 0.0)))
    sv = jnp.where(_iszero(v), 0.0, jnp.sqrt(jnp.maximum(v, 0.0)))
    c1a = jnp.where(q < 0.0, -sv, sv)
    g1a, g1b = solve_quadratic(z - su, c1a)
    g2a, g2b = solve_quadratic(z + su, -c1a)
    ok = u_ok & v_ok
    gen = jnp.stack([
        jnp.where(ok, g1a, inf), jnp.where(ok, g1b, inf),
        jnp.where(ok, g2a, inf), jnp.where(ok, g2b, inf),
    ], axis=-1)

    roots = jnp.where(_iszero(r)[..., None], rz, gen)
    return jnp.where(jnp.isfinite(roots), roots - sub[..., None], roots)
