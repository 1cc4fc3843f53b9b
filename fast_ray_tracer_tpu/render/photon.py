"""Photon-mapped global illumination, TPU-native.

The reference traces photons one at a time through a recursive Russian-
roulette walk into Jensen kd-tree photon maps, then answers render-time
irradiance queries with a recursive kd kNN search
(src/renderer/photon_tracer.c, src/libs/photon_map/pm.c). Here:

  * photon tracing is a *wavefront*: a whole batch advances one bounce per
    step with keyed PRNG for emission/RR (replacing global drand48/rand);
    each photon picks ONE RR branch so the batch never branches
  * the kd-tree is replaced by a uniform grid over photon positions
    (cell edge = search radius): a query gathers the 27 neighboring cells
    (fixed per-cell budget) and top-k's the candidate distances — dense,
    sortable, and differentiable w.r.t. photon powers
  * the cone-filtered estimate reproduces pm_irradiance_estimate exactly:
    weight 1 - d/(k*max_dist), normalization 1/((1-2/(3k))*pi*r^2) with
    r^2 = the kth-nearest distance^2 when more than k candidates lie in
    range else max_dist^2, >= 8 photons required, photons arriving from
    behind `eyev` rejected (the reference passes eyev as the normal —
    quirk preserved; pm.c:91-156)

Storage-rule parity (photon_tracer.c:113-183): the caustic map stores only
after >= 1 specular bounce, the global map only after >= 1 diffuse bounce
(never the first diffuse hit); stored power is Kd * incident power; RR
branch thresholds are the channel-mean diffuse/specular/transmission
reflectances; specular/refracted continuations divide power by the mean
reflectance (reference quirk, not standard RR normalization).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fast_ray_tracer_tpu import colors as colorlib
from fast_ray_tracer_tpu.scene import ir as IR
from fast_ray_tracer_tpu.scene.ir import SceneIR


CAUSTIC, GLOBAL = 0, 1


# ---------------------------------------------------------------------------
# emission
# ---------------------------------------------------------------------------

def _frame_batch(n):
    """create_coordinate_system (sampler.c:66-85), batched over (R,3)."""
    use_x = jnp.abs(n[:, 0]) > jnp.abs(n[:, 1])
    za = jnp.stack([n[:, 2], jnp.zeros_like(n[:, 0]), -n[:, 0]], -1)
    za = za / jnp.sqrt((n[:, 0] ** 2 + n[:, 2] ** 2)
                       .clip(1e-30))[:, None]
    zb = jnp.stack([jnp.zeros_like(n[:, 0]), -n[:, 2], n[:, 1]], -1)
    zb = zb / jnp.sqrt((n[:, 1] ** 2 + n[:, 2] ** 2)
                       .clip(1e-30))[:, None]
    nt = -jnp.where(use_x[:, None], za, zb)
    nb = jnp.cross(n, nt)
    return nt, nb


def cosine_hemisphere(key, normals):
    """cosine_weighted_sample_hemisphere (sampler.c:39-64) around per-ray
    normals; also returns r1 (final_gather scales by it, renderer.c:662)."""
    R = normals.shape[0]
    r = jax.random.uniform(key, (R, 2), normals.dtype)
    return _cosine_hemisphere_from_uniforms(r, normals)


def _cosine_hemisphere_from_uniforms(r, normals):
    r1, r2 = r[:, 0], r[:, 1]
    rad = jnp.sqrt(r2)
    theta = 2.0 * jnp.pi * r1
    sx = rad * jnp.cos(theta)
    sz = rad * jnp.sin(theta)
    sy = jnp.sqrt(jnp.maximum(0.0, 1.0 - r2))
    nt, nb = _frame_batch(normals)
    d = sx[:, None] * nb + sy[:, None] * normals + sz[:, None] * nt
    d = d / jnp.sqrt(jnp.sum(d * d, -1, keepdims=True).clip(1e-30))
    return d, r1


def emit_photons(ir: SceneIR, li: int, key, n: int, dtype):
    """light->emit_photon for a batch (light.c:14-97)."""
    typ = ir.meta.light_info[li][0]
    k1, k2 = jax.random.split(key)
    if typ == IR.LIGHT_POINT:
        # uniform sphere direction (rejection-sampled ball, normalized)
        v = jax.random.normal(k1, (n, 3), dtype)
        d = v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True).clip(1e-30))
        o = jnp.broadcast_to(ir.light_pos[li][None], (n, 3))
        return o, d
    if typ == IR.LIGHT_AREA:
        usteps = ir.meta.light_info[li][1]
        vsteps = ir.meta.light_info[li][2]
        r = jax.random.uniform(k1, (n, 2), dtype)
        # stored uvec/vvec are per-step; full edge = step * steps
        o = (ir.light_pos[li][None]
             + (r[:, 0] * usteps)[:, None] * ir.light_uvec[li][None]
             + (r[:, 1] * vsteps)[:, None] * ir.light_vvec[li][None])
        nvec = jnp.cross(ir.light_uvec[li], ir.light_vvec[li])
        nvec = nvec / jnp.sqrt(jnp.sum(nvec * nvec).clip(1e-30))
        d, _ = cosine_hemisphere(k2, jnp.broadcast_to(nvec[None], (n, 3)))
        return o, d
    if typ in (IR.LIGHT_CIRCLE, IR.LIGHT_HEMISPHERE):
        if typ == IR.LIGHT_CIRCLE:
            S = ir.meta.light_info[li][4]
            idx = jax.random.randint(k1, (n,), 0, S)
            o = ir.light_points[li, idx]
        else:
            o = jnp.broadcast_to(ir.light_pos[li][None], (n, 3))
        nvec = ir.light_normal[li]
        d, _ = cosine_hemisphere(k2, jnp.broadcast_to(nvec[None], (n, 3)))
        return o, d
    raise ValueError(f"unsupported light type {typ}")


# ---------------------------------------------------------------------------
# photon tracing wavefront
# ---------------------------------------------------------------------------

# provenance event codes (chain factors for the live power recompute):
# bit 2 (+4) marks "the traced value came from a pattern sample, not the
# material table" — the recompute then uses the recorded sample with no
# gradient (a pattern REPLACES the table entry, prepare_computations
# slot_color), instead of the live table value.
EV_NONE, EV_KD, EV_SPEC, EV_TRANS = 0, 1, 2, 3
EV_MAPPED = 4


def _slot_mapped(ir: SceneIR, mat, slot):
    """(R,) bool: this lane's material samples a pattern for `slot`
    (None when no scene material patterns that slot — static)."""
    meta = ir.meta
    if not meta.any_patterns or slot not in meta.pattern_slots:
        return None
    return ir.mat_map[mat, slot] >= 0


def photon_bounce_wave(ir: SceneIR, rt, map_type: int, orig, dirs, power,
                       key):
    """Trace one photon batch through gi_path_length bounces.

    Returns stacked per-level (pos, stored_power, inc_dir, store_mask,
    chain_mat, chain_code, chain_samp) with leading dim L*n.

    The chain arrays are the PROVENANCE of each stored power: slot s<t
    holds the RR branch event at bounce s (EV_KD: *Kd, EV_SPEC: /mean
    refl, EV_TRANS: /mean Tf — photon_tracer.c:157-181 semantics), slot
    t holds the store-hit Kd factor. live_photon_powers() replays the
    chain against the LIVE material/light tables so d(stored power)/
    d(mat_Kd, mat_refl, mat_Tf, light_intensity) exists — the photon
    *structure* (positions, directions, storage decisions, RR draws)
    stays frozen at its traced values, which is exactly the
    discrete/continuous split of the wavefront design.
    chain_samp is None unless some material patterns Kd or refl."""
    from fast_ray_tracer_tpu.render.integrator import (
        prepare_computations, refract_active, refract_direction,
    )
    cfg = rt.cfg
    n = orig.shape[0]
    dtype = orig.dtype
    L = cfg.gi_path_length
    alive = jnp.ones((n,), bool)
    had_d = jnp.zeros((n,), bool)
    had_s = jnp.zeros((n,), bool)
    track_samp = bool(ir.meta.any_patterns
                      and (IR.SLOT_KD in ir.meta.pattern_slots
                           or IR.SLOT_REFL in ir.meta.pattern_slots))
    ch_mat = jnp.zeros((n, L), jnp.int32)
    ch_code = jnp.zeros((n, L), jnp.int32)
    ch_samp = jnp.zeros((n, L, 3), dtype) if track_samp else None
    outs = []
    for step in range(L):
        kkey = jax.random.fold_in(key, step)
        comps = prepare_computations(ir, rt, orig, dirs,
                                     shadow_filter=True)
        alive = alive & comps.valid \
            & jnp.any(power > 0.0, axis=-1)       # dead/shadow photons stop
        kd = comps.over_Kd
        stored_power = kd * power
        diffuse_ok = jnp.any(kd > 0.0, axis=-1)
        if map_type == CAUSTIC:
            store = alive & diffuse_ok & had_s
        else:
            store = alive & diffuse_ok & had_d
        mat32 = comps.mat.astype(jnp.int32)
        kd_mapped = _slot_mapped(ir, comps.mat, IR.SLOT_KD)
        store_code = jnp.int32(EV_KD) if kd_mapped is None else \
            jnp.where(kd_mapped, EV_KD + EV_MAPPED, EV_KD)
        out_samp = None if ch_samp is None else ch_samp.at[:, step].set(kd)
        outs.append((comps.p, stored_power, dirs, store,
                     ch_mat.at[:, step].set(mat32),
                     ch_code.at[:, step].set(store_code),
                     out_samp))
        if step == L - 1:
            break

        # russian roulette (photon_tracer.c:157-181): one uniform draws
        # the branch; caustic pass never bounces diffusely
        avg_d = jnp.mean(kd, axis=-1)
        avg_s = jnp.mean(comps.over_refl, axis=-1)
        avg_t = jnp.mean(comps.tf, axis=-1)
        if map_type == CAUSTIC:
            avg_d = jnp.zeros_like(avg_d)
        r = jax.random.uniform(jax.random.fold_in(kkey, 1), (n,), dtype)
        total = avg_d + avg_s + avg_t
        x = r * total
        go_d = x < avg_d
        go_s = ~go_d & (x < avg_d + avg_s)
        go_t = ~go_d & ~go_s & (x < total)
        # branch validity (reflect_photon_specular/refract_photon guards)
        go_s = go_s & comps.refl_flag
        go_t = go_t & (jnp.abs(comps.tr) >= 1e-5) \
            & refract_active(comps)

        d_diff, _ = cosine_hemisphere(jax.random.fold_in(kkey, 2),
                                      comps.normalv)
        d_refr = refract_direction(comps)
        new_dir = jnp.where(go_d[:, None], d_diff,
                            jnp.where(go_s[:, None], comps.reflectv,
                                      d_refr))
        new_orig = jnp.where(go_t[:, None], comps.under_point,
                             comps.over_point)
        safe = lambda a: jnp.where(a > 0, a, 1.0)
        new_power = jnp.where(
            go_d[:, None], stored_power,
            jnp.where(go_s[:, None], power / safe(avg_s)[:, None],
                      power / safe(avg_t)[:, None]))
        # record the branch event in the running chain
        refl_mapped = _slot_mapped(ir, comps.mat, IR.SLOT_REFL)
        code_d = store_code
        code_s = jnp.int32(EV_SPEC) if refl_mapped is None else \
            jnp.where(refl_mapped, EV_SPEC + EV_MAPPED, EV_SPEC)
        branch_code = jnp.where(
            go_d, code_d,
            jnp.where(go_s, code_s,
                      jnp.where(go_t, EV_TRANS, EV_NONE)))
        ch_mat = ch_mat.at[:, step].set(mat32)
        ch_code = ch_code.at[:, step].set(branch_code)
        if ch_samp is not None:
            ch_samp = ch_samp.at[:, step].set(
                jnp.where(go_d[:, None], kd,
                          jnp.where(go_s[:, None], comps.over_refl, 0.0)))
        had_d = had_d | (alive & go_d)
        had_s = had_s | (alive & (go_s | go_t))
        alive = alive & (go_d | go_s | go_t)
        power = new_power
        # park dead photons outside the scene
        orig = jnp.where(alive[:, None], new_orig, 1e30)
        dirs = jnp.where(alive[:, None], new_dir, 1.0)

    pos = jnp.concatenate([o[0] for o in outs])
    pw = jnp.concatenate([o[1] for o in outs])
    dr = jnp.concatenate([o[2] for o in outs])
    st = jnp.concatenate([o[3] for o in outs])
    cm = jnp.concatenate([o[4] for o in outs])
    cc = jnp.concatenate([o[5] for o in outs])
    cs = None if not track_samp else jnp.concatenate([o[6] for o in outs])
    return pos, pw, dr, st, cm, cc, cs


P_PACK = 14      # photons per packed gather row (9*14 = 126 of 128 cols)
_ROW_W = 128     # TPU gathers run at a fixed ~0.33G rows/s regardless of
                 # row width up to 128 floats (measured on v5e), so one
                 # 128-wide row delivering 14 complete photon records
                 # costs the same as gathering one xyz triple


class PhotonMap(NamedTuple):
    """Grid-bucketed photon storage (device) + static grid geometry.

    Layout is built for TPU gather economics: photons are cell-sorted
    and PACKED 14-per-row into a (rows, 128) table — row r holds
    [x*14 | y*14 | z*14 | px*14 | py*14 | pz*14 | dx*14 | dy*14 | dz*14]
    so one row gather yields 14 complete (pos, power, inc_dir) records.

    Two exact query layouts; the build picks whichever gives the
    NARROWER per-query candidate table (the bisection passes sweep its
    full width, so width IS the query cost):

      * flat (`flat_rows` > 0): every cell's photons packed with no cap;
        a query walks its 27 neighbor extents as ONE flat gather of at
        most `flat_rows` rows (= the map's worst 3x3x3-neighborhood row
        sum, so nothing is ever truncated),
      * capped (`flat_rows` == 0): cells capped at the 99th-percentile
        count (`cap_rows` rows each), surplus spilled to the dense
        `ovf_*` arrays folded against every query with broadcast
        arithmetic — pathological hot cells stop inflating the budget.

    Either way nothing is hidden from queries."""
    packed: jnp.ndarray      # (rows, 128) cell-sorted packed records
    row_start: jnp.ndarray   # (n_cells+1,) i32 CSR offsets in ROW units
    cap_rows: int            # per-cell row budget = ceil(cap0 / P_PACK)
    ovf_pos: jnp.ndarray     # (N_ovf,3) spill photons (dense fold)
    ovf_power: jnp.ndarray
    ovf_dir: jnp.ndarray
    grid_origin: Tuple[float, float, float]
    cell_size: float
    dims: Tuple[int, int, int]
    n: int
    flat_rows: int = 0       # per-query flat row budget (0 = capped)
    # --- differentiable stored power (optional provenance block) ------
    # with_live_power() replays prov_* against the LIVE ir tables and
    # re-packs the power columns on device, so d(irradiance)/d(mat_Kd,
    # mat_refl, mat_Tf, light_intensity) flows through the map while
    # photon positions/directions/structure stay frozen (stop-gradient
    # by construction: they are host-built numpy constants).
    prov_light: Optional[jnp.ndarray] = None  # (N,) i32 emitting light
    prov_mat: Optional[jnp.ndarray] = None    # (N,L) i32 event material
    prov_code: Optional[jnp.ndarray] = None   # (N,L) i32 EV_* codes
    prov_samp: Optional[jnp.ndarray] = None   # (N,L,3) pattern samples
    slot_photon: Optional[jnp.ndarray] = None  # (rows,P) i32 -> photon
                                               # index; N = dead lane
    ovf_photon: Optional[jnp.ndarray] = None   # (N_ovf_pad,) i32
    power_div: float = 1.0                     # photon_count (divisor —
                                               # division, not reciprocal
                                               # multiply, so the live
                                               # recompute reproduces the
                                               # host 1/num scaling
                                               # bit-for-bit)


def _neighborhood_row_max(rc3: np.ndarray) -> int:
    """Max over cells of the 3x3x3-neighborhood row-count sum (the flat
    layout's exact per-query gather budget)."""
    p = np.pad(rc3, 1)
    d0, d1, d2 = rc3.shape
    acc = np.zeros(rc3.shape, np.int64)
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                acc += p[ox:ox + d0, oy:oy + d1, oz:oz + d2]
    return int(acc.max()) if acc.size else 0


def build_photon_map(pos: np.ndarray, power: np.ndarray, dirs: np.ndarray,
                     radius: float, dtype,
                     layout: Optional[str] = None,
                     prov: Optional[dict] = None,
                     power_div: float = 1.0) -> Optional[PhotonMap]:
    """Host-side grid build: cell edge = search radius so a query touches
    exactly the 27 neighboring cells. Exact coverage either way (hides 0
    photons); `layout` forces "flat" / "capped" (tests), default picks
    the narrower per-query candidate table — flat for typical maps
    (~3-6x narrower than capped+overflow on the Cornell global map,
    and the bisection passes sweep the table's full width), capped when
    a pathological hot neighborhood would blow the flat budget."""
    n = len(pos)
    if n == 0:
        return None
    origin = pos.min(axis=0) - 1e-6
    extent = pos.max(axis=0) - origin + 1e-6
    dims = np.maximum(1, np.ceil(extent / radius).astype(np.int64) + 1)
    cell = np.minimum(np.floor((pos - origin) / radius).astype(np.int64),
                      dims - 1)
    cid = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    order = np.argsort(cid, kind="stable")
    pos, power, dirs, cid = pos[order], power[order], dirs[order], cid[order]
    if prov is not None:
        prov = {k: (None if v is None else np.asarray(v)[order])
                for k, v in prov.items()}
    n_cells = int(dims[0] * dims[1] * dims[2])
    counts = np.bincount(cid, minlength=n_cells)
    start = np.zeros(n_cells + 1, np.int64)
    np.cumsum(counts, out=start[1:])

    occ = counts[counts > 0]
    cap99 = int(min(int(counts.max()),
                    max(P_PACK, int(np.ceil(np.percentile(occ, 99))))))
    flat_budget = _neighborhood_row_max(
        (-(-counts // P_PACK)).reshape(tuple(int(d) for d in dims)))
    flat_width = flat_budget * P_PACK
    capped_width = (27 * int((-(-np.minimum(counts, cap99) // P_PACK)).max())
                    * P_PACK + int((counts - np.minimum(counts, cap99)).sum()))
    if layout == "flat":
        use_flat = True
    elif layout == "capped":
        use_flat = False
    else:
        use_flat = flat_width <= capped_width

    cap0 = int(counts.max()) if use_flat else cap99
    within = np.arange(n) - start[cid]            # rank inside own cell
    main = within < cap0
    n_ovf = int((~main).sum())

    counts0 = np.minimum(counts, cap0)
    row_counts = -(-counts0 // P_PACK)
    row_start = np.zeros(n_cells + 1, np.int64)
    np.cumsum(row_counts, out=row_start[1:])
    total_rows = int(row_start[-1])
    cap_rows = int(row_counts.max()) if n_cells else 0

    packed = np.zeros((max(total_rows, 1), _ROW_W), np.float64)
    packed[:, 0:3 * P_PACK] = 1e30                # dead lanes: d2 -> huge
    w_main = within[main]
    row_of = row_start[cid[main]] + w_main // P_PACK
    lane = w_main % P_PACK
    fields = (pos[main, 0], pos[main, 1], pos[main, 2],
              power[main, 0], power[main, 1], power[main, 2],
              dirs[main, 0], dirs[main, 1], dirs[main, 2])
    for fi, vals in enumerate(fields):
        packed[row_of, fi * P_PACK + lane] = vals

    n_pad = max(8, -(-n_ovf // 8) * 8)
    ovf_pos = np.full((n_pad, 3), 1e30)
    ovf_pow = np.zeros((n_pad, 3))
    ovf_dir = np.zeros((n_pad, 3))
    if n_ovf:
        ovf_pos[:n_ovf] = pos[~main]
        ovf_pow[:n_ovf] = power[~main]
        ovf_dir[:n_ovf] = dirs[~main]

    prov_fields = {}
    if prov is not None:
        idx_all = np.arange(n)
        slot_photon = np.full((max(total_rows, 1), P_PACK), n, np.int32)
        slot_photon[row_of, lane] = idx_all[main]
        ovf_photon = np.full((n_pad,), n, np.int32)
        ovf_photon[:n_ovf] = idx_all[~main]
        prov_fields = dict(
            prov_light=jnp.asarray(prov["light"], jnp.int32),
            prov_mat=jnp.asarray(prov["mat"], jnp.int32),
            prov_code=jnp.asarray(prov["code"], jnp.int32),
            prov_samp=(None if prov.get("samp") is None
                       else jnp.asarray(prov["samp"], dtype)),
            slot_photon=jnp.asarray(slot_photon, jnp.int32),
            ovf_photon=jnp.asarray(ovf_photon, jnp.int32),
            power_div=float(power_div),
        )

    if use_flat:
        print(f"photon grid: {n} photons, flat layout "
              f"({flat_budget}-row query budget = worst neighborhood; "
              "exact — hides 0 photons)", flush=True)
    else:
        print(f"photon grid: {n} photons, cap {cap0}/cell "
              f"({cap_rows} packed rows) + {n_ovf} dense-overflow "
              "(exact — hides 0 photons)", flush=True)
    return PhotonMap(
        packed=jnp.asarray(packed, dtype),
        row_start=jnp.asarray(row_start, jnp.int32),
        cap_rows=cap_rows,
        flat_rows=flat_budget if use_flat else 0,
        ovf_pos=jnp.asarray(ovf_pos, dtype),
        ovf_power=jnp.asarray(ovf_pow, dtype),
        ovf_dir=jnp.asarray(ovf_dir, dtype),
        grid_origin=tuple(float(x) for x in origin),
        cell_size=float(radius), dims=tuple(int(x) for x in dims),
        n=n, **prov_fields)


def live_photon_powers(pm: PhotonMap, ir: SceneIR):
    """Replay each stored photon's provenance chain against the LIVE
    material/light tables -> (N,3) stored powers, differentiable w.r.t.
    ir.light_intensity / mat_Kd / mat_refl / mat_Tf.

    Mirrors the traced power chain exactly (photon_bounce_wave): power
    starts at the emitting light's intensity, each EV_KD event multiplies
    by the hit Kd, EV_SPEC divides by the channel-mean reflectance,
    EV_TRANS by the channel-mean Tf (reference RR normalization quirks,
    photon_tracer.c:157-181), and the final chain slot is the store-hit
    Kd. EV_MAPPED events use the recorded pattern sample (stop-gradient:
    a pattern REPLACES the table value, so the true derivative w.r.t. the
    table entry is zero)."""
    dtype = ir.light_intensity.dtype
    L = pm.prov_mat.shape[1]
    pw = ir.light_intensity[pm.prov_light].astype(dtype)
    safe = lambda a: jnp.where(a > 0, a, 1.0)
    for step in range(L):
        mat = pm.prov_mat[:, step]
        code = pm.prov_code[:, step]
        base = code % EV_MAPPED
        mapped = code >= EV_MAPPED
        kd = ir.mat_Kd[mat]
        refl = ir.mat_refl[mat]
        if pm.prov_samp is not None:
            samp = pm.prov_samp[:, step]
            kd = jnp.where(mapped[:, None], samp, kd)
            refl = jnp.where(mapped[:, None], samp, refl)
        inv_s = (1.0 / safe(jnp.mean(refl, axis=-1)))[:, None]
        inv_t = (1.0 / safe(jnp.mean(ir.mat_Tf[mat], axis=-1)))[:, None]
        f = jnp.where((base == EV_KD)[:, None], kd,
                      jnp.where((base == EV_SPEC)[:, None], inv_s,
                                jnp.where((base == EV_TRANS)[:, None],
                                          inv_t, 1.0)))
        pw = pw * f
    return pw / jnp.asarray(pm.power_div, dtype)


def with_live_power(pm: Optional[PhotonMap], ir: SceneIR):
    """PhotonMap whose power columns are a live function of `ir` (see
    live_photon_powers): the packed rows and the overflow block get their
    power fields re-gathered from the recomputed (N,3) table through the
    build-time placement indices. Everything else (positions, directions,
    grid geometry, dead lanes) keeps the host-built constants. Returns
    `pm` unchanged when it carries no provenance."""
    if pm is None or pm.prov_mat is None:
        return pm
    P = P_PACK
    pw = live_photon_powers(pm, ir).astype(pm.packed.dtype)
    pad = jnp.concatenate([pw, jnp.zeros((1, 3), pw.dtype)])
    cols = pad[pm.slot_photon]                       # (rows, P, 3)
    power_cols = jnp.concatenate(
        [cols[..., 0], cols[..., 1], cols[..., 2]], axis=-1)
    packed = jnp.concatenate(
        [pm.packed[:, :3 * P], power_cols, pm.packed[:, 6 * P:]], axis=-1)
    return pm._replace(packed=packed,
                       ovf_power=pad[pm.ovf_photon].astype(
                           pm.ovf_power.dtype))


_BATCH_LADDER = (16384, 65536, 262144, 1048576)


def trace_photons(ir: SceneIR, rt, key, dtype,
                  caustic: bool, global_: bool, batch: int = None):
    """trace_photons (photon_tracer.c:202-257): apportion photons among
    lights by CIE-Lab lightness of their intensity, trace until EACH
    light's own target count is *stored* (per-light accounting, like the
    reference's per-light `j` loop — a light that stalls out leaves its
    deficit unfilled instead of skewing the next light's share), scale
    powers by 1/photon_count.

    Tracing stays ON DEVICE end to end: each emission batch is traced,
    its stores compacted (device-side nonzero) and appended into a
    preallocated device buffer at a dynamic offset; the host reads ONE
    scalar (the running store count) per batch to decide loop exit, and
    the full buffer transfers once per map for the grid build. Batch
    sizes ADAPT: the first (small) batch measures the scene's store
    rate, then subsequent batches are sized from the remaining deficit
    so low-yield scenes (e.g. a light outside the box, or a caustic map
    fed by a small specular object) need a handful of big dispatches
    instead of hundreds of small ones through the TPU tunnel."""
    cfg = rt.cfg
    num_photons = cfg.photon_count
    L_vals = [float(np.asarray(colorlib.rgb_to_lab(
        np.asarray(ir.light_intensity[li], np.float64)))[0])
        for li in range(ir.meta.n_lights)]
    total_l = sum(L_vals) or 1.0
    targets = [int(num_photons * l / total_l) for l in L_vals]
    total_target = sum(targets)
    if batch:
        ladder = (batch,)
    elif jax.default_backend() == "cpu":
        # host-CPU runs (tests, golden parity) keep batches small: a
        # 1M-photon bounce over a clustered mesh is minutes of 2-core
        # f64 work; the big rungs exist for the TPU
        ladder = _BATCH_LADDER[:2]
    elif ir.meta.use_clusters:
        # keep clustered-mesh folds under the no-lax.map budget
        # (ops/intersect._mesh_gather_reduce)
        ladder = tuple(b for b in _BATCH_LADDER if b <= 65536)
    else:
        # TPU, analytic scene: ONE batch size for the whole pass, sized
        # so the typical store rate covers the target in a single
        # dispatch — every distinct batch shape is a separate compile
        # through the remote tunnel, and the per-batch host sync costs a
        # ~26 ms round trip; the bounce itself is cheap at this scale
        ladder = (min(_BATCH_LADDER[-1],
                      max(131072, -(-3 * total_target // 65536) * 65536)),)

    def append_stores(vals, st, bufs, count, limit):
        """Compact this batch's stores and write them at [count, ...),
        truncating exactly at `limit` (the reference stops a light's
        tracing loop the moment its target count is stored)."""
        rank = jnp.cumsum(st.astype(jnp.int32)) - 1
        dst = count + rank
        ok = st & (dst < limit)
        # mode='drop' discards writes from masked lanes (dst set to buffer
        # size for them) — no host round-trip, no dynamic shapes
        dst = jnp.where(ok, dst, bufs[0].shape[0])
        bufs = tuple(b.at[dst].set(v, mode="drop")
                     for b, v in zip(bufs, vals))
        new_count = jnp.minimum(count + jnp.sum(st.astype(jnp.int32)),
                                limit)
        return bufs, new_count

    def pick_batch(deficit, rate):
        """Smallest ladder rung expected to cover the deficit (with
        margin) at the measured stores-per-emitted-photon rate."""
        if rate <= 0:
            return ladder[-1]
        need = deficit / rate * 1.3
        for b in ladder:
            if b >= need:
                return b
        return ladder[-1]

    fused = {}

    def fused_step(map_type, li, b):
        """ONE compiled program per (map, light, batch size): emission +
        the full bounce wavefront + store compaction/append. The host
        syncs exactly one scalar per dispatch (the running count)."""
        kk = (map_type, li, b)
        if kk not in fused:
            def f(k, bufs, count, limit, _m=map_type, _li=li, _b=b):
                o, d = emit_photons(ir, _li, k, _b, dtype)
                power = jnp.broadcast_to(
                    ir.light_intensity[_li][None], (_b, 3)).astype(dtype)
                pos, pw, dr, st, cm, cc, cs = photon_bounce_wave(
                    ir, rt, _m, o, d, power, jax.random.fold_in(k, 1))
                vals = [pos, pw, dr, cm, cc,
                        jnp.full(st.shape, _li, jnp.int32)]
                if track_samp:
                    vals.append(cs)
                return append_stores(tuple(vals), st, bufs, count, limit)
            fused[kk] = jax.jit(f)
        return fused[kk]

    L = cfg.gi_path_length
    track_samp = bool(ir.meta.any_patterns
                      and (IR.SLOT_KD in ir.meta.pattern_slots
                           or IR.SLOT_REFL in ir.meta.pattern_slots))
    maps = {}
    for map_type, enabled in ((CAUSTIC, caustic), (GLOBAL, global_)):
        if not enabled:
            maps[map_type] = None
            continue
        if map_type == CAUSTIC and not (ir.meta.has_reflective
                                        or ir.meta.has_refractive):
            # the caustic map stores only after a specular bounce
            # (photon_tracer.c:139-143); a scene with no reflective and
            # no transmissive material can never take one — skip the
            # stall loop (16 full dead traces) outright
            maps[map_type] = None
            continue
        bufs = [jnp.zeros((total_target, 3), dtype),
                jnp.zeros((total_target, 3), dtype),
                jnp.zeros((total_target, 3), dtype),
                jnp.zeros((total_target, L), jnp.int32),
                jnp.zeros((total_target, L), jnp.int32),
                jnp.zeros((total_target,), jnp.int32)]
        if track_samp:
            bufs.append(jnp.zeros((total_target, L, 3), dtype))
        bufs = tuple(bufs)
        count = jnp.int32(0)
        it = 0
        for li in range(ir.meta.n_lights):
            base = int(count)
            limit = base + targets[li]       # this light's own share
            stalls = 0
            got = base
            emitted = 0
            b = ladder[0]
            while got < limit:
                k = jax.random.fold_in(key, 7919 * map_type + 31 * li + it)
                it += 1
                bufs, count = fused_step(map_type, li, b)(
                    k, bufs, count, jnp.int32(limit))
                emitted += b
                new_got = int(count)        # one scalar sync per batch
                stalls = stalls + 1 if new_got == got else 0
                got = new_got
                if stalls > 16:
                    break       # scene stores nothing (no diffuse surfaces)
                b = pick_batch(limit - got, (got - base) / emitted)
        n_stored = int(count)
        if n_stored:
            pos = np.asarray(bufs[0][:n_stored])
            pw = np.asarray(bufs[1][:n_stored]) / float(num_photons)
            dr = np.asarray(bufs[2][:n_stored])
            prov = {"light": np.asarray(bufs[5][:n_stored]),
                    "mat": np.asarray(bufs[3][:n_stored]),
                    "code": np.asarray(bufs[4][:n_stored]),
                    "samp": (np.asarray(bufs[6][:n_stored])
                             if track_samp else None)}
            maps[map_type] = build_photon_map(
                pos, pw, dr, cfg.irradiance_estimate_radius, dtype,
                prov=prov, power_div=float(num_photons))
        else:
            maps[map_type] = None
    return maps


# ---------------------------------------------------------------------------
# irradiance estimate (render-time query)
# ---------------------------------------------------------------------------

def _query_block(pm: "PhotonMap") -> int:
    """Queries per lax.map block: bound the cached candidate distance
    table (3.75% of device memory — 600 MB on a 16 GB chip; 150 MB on
    host CPU; override FRT_PM_QUERY_BUDGET, bytes) regardless of the
    map's density — too small a block serializes the gather batch into
    dozens of lax.map steps."""
    from fast_ray_tracer_tpu.utils import memory_budget
    if pm.flat_rows:
        m = max(1, pm.flat_rows * P_PACK)
    else:
        m = max(1, 27 * pm.cap_rows * P_PACK + pm.ovf_pos.shape[0])
    budget = memory_budget(0.0375, 150e6, "FRT_PM_QUERY_BUDGET",
                           device_default=600e6)
    return int(min(16384, max(1024, budget / 4 / m)))


def irradiance_estimate(pm: PhotonMap, points, eyev, num: int,
                        max_dist: float, cone_k: float):
    """pm_irradiance_estimate (pm.c:91-156) batched: returns (irrad (R,3),
    found (R,)). Large query batches run as a lax.map over fixed-size
    blocks so peak memory is O(BLOCK * candidates) regardless of R or
    the map's density (coverage is exact — see build_photon_map)."""
    R = points.shape[0]
    B = _query_block(pm)
    if R > B:
        pad = (-R) % B
        if pad:
            far = jnp.full((pad, 3), 1e30, points.dtype)
            points = jnp.concatenate([points, far])
            eyev = jnp.concatenate([eyev, jnp.ones((pad, 3), eyev.dtype)])
        nb = points.shape[0] // B
        irr, found = jax.lax.map(
            lambda ab: _irradiance_block(pm, ab[0], ab[1], num, max_dist,
                                         cone_k),
            (points.reshape(nb, B, 3), eyev.reshape(nb, B, 3)))
        return irr.reshape(-1, 3)[:R], found.reshape(-1)[:R]
    return _irradiance_block(pm, points, eyev, num, max_dist, cone_k)


def _neighbor_rows(pm: PhotonMap, points):
    """Per query: packed-row CSR start/extent of the 27 neighbor cells.
    Returns (starts (R,27), ends (R,27)) in ROW units — out-of-grid
    cells read row 0 with an empty extent."""
    dims = pm.dims
    dtype = points.dtype
    org = jnp.asarray(pm.grid_origin, dtype)
    cell = jnp.floor((points - org) / pm.cell_size).astype(jnp.int32)
    cell = jnp.clip(cell, 0, jnp.asarray(dims, jnp.int32) - 1)
    offs = jnp.asarray([(ox, oy, oz) for ox in (-1, 0, 1)
                        for oy in (-1, 0, 1) for oz in (-1, 0, 1)],
                       jnp.int32)                      # (27,3)
    c = cell[:, None, :] + offs[None]                  # (R,27,3)
    inb = jnp.all((c >= 0) & (c < jnp.asarray(dims, jnp.int32)[None, None]),
                  axis=-1)
    cidx = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
    cidx = jnp.where(inb, cidx, 0)
    s = pm.row_start[cidx]
    e = jnp.where(inb, pm.row_start[cidx + 1], s)
    return s, e


def _irradiance_block(pm: PhotonMap, points, eyev, num: int,
                      max_dist: float, cone_k: float):
    """Sort-free exact estimate, built around two measured TPU limits:
    random gathers run at a fixed ~0.33G ROWS/s regardless of row width
    (so candidates arrive 14-photons-per-128-float-row — see PhotonMap),
    and variadic sorts are far slower than dense compare/sum passes (so
    the kth-nearest selection uses bisection counting, not top_k):

      1. a gather pass caches the candidate distance table — flat
         layout: one compacted walk of the 27 neighbor extents, at most
         `flat_rows` rows (R, flat_rows*14); capped layout: cap_rows
         rows per neighbor cell (R, 27*cap_rows*14 + N_ovf) with spill
         photons folded densely (broadcast, no gather),
      2. the kth-nearest distance (the reference heap's r^2 when full,
         pm.c:198-207) comes from BISECTION on the cached distances —
         count(d2 <= mid) passes, enough iterations to pin the exact
         float (~30 f32 / ~60 f64): the kth distance is the smallest v
         with count(d2 <= v) >= num; every pass sweeps the table's FULL
         width, which is why the build picks the narrower layout,
      3. one more gather pass re-reads the rows and accumulates the
         cone-filtered weighted sum over selected candidates (d2 <= r^2,
         photons from behind `eyev` rejected — the reference passes eyev
         as the normal; quirk preserved), plus the dense overflow term
         (capped layout only).
    """
    R = points.shape[0]
    dtype = points.dtype
    P = P_PACK
    md2 = jnp.asarray(max_dist * max_dist, dtype)
    s, e = _neighbor_rows(pm, points)                  # (R,27)
    n_rows_tot = pm.packed.shape[0]

    # row-group sources: callables () -> (rec (R,K,128), ok (R,K));
    # pass 1 and pass 3 gather the identical groups
    if pm.flat_rows:
        T = pm.flat_rows
        lens = (e - s).astype(jnp.int32)
        cum = jnp.cumsum(lens, axis=1)                 # (R,27)
        total = cum[:, -1]
        jj = jnp.arange(T, dtype=jnp.int32)
        # flat slot j holds row s[c_j] + (j - slot-start of cell c_j);
        # equivalently ridx[j] = j + shift[c_j] with shift = s - slot
        # start. c_j is a step function of j, so shift[c_j] unrolls to
        # shift[0] + sum of per-cell deltas gated by j >= cell's slot
        # start — pure compare/sum vector ops (a take_along_axis here
        # costs 2 element gathers per slot, ~3x slower per row than the
        # packed-row gathers this pass exists to feed)
        sc0 = jnp.concatenate(
            [jnp.zeros((R, 1), jnp.int32), cum[:, :-1]], 1)   # (R,27)
        shift = s.astype(jnp.int32) - sc0
        ridx = jnp.broadcast_to(jj[None], (R, T)) + shift[:, 0:1]
        for c in range(1, 27):
            ridx = ridx + ((shift[:, c:c + 1] - shift[:, c - 1:c])
                           * (jj[None] >= sc0[:, c:c + 1]))
        rok = jj[None] < total[:, None]
        ridx = jnp.where(rok, jnp.clip(ridx, 0, n_rows_tot - 1), 0)
        G = 8                                          # rows per group
        bounds = [(g, min(g + G, T)) for g in range(0, T, G)]
        sources = [(lambda g0=g0, g1=g1:
                    (pm.packed[ridx[:, g0:g1]], rok[:, g0:g1]))
                   for g0, g1 in bounds]
    else:
        CR = pm.cap_rows
        ar = jnp.arange(max(CR, 1), dtype=jnp.int32)

        def rows_of(j):
            idx = s[:, j, None] + ar[None]             # (R,CR)
            ok = idx < e[:, j, None]
            rec = pm.packed[jnp.clip(idx, 0, n_rows_tot - 1)]
            return rec, ok

        sources = [(lambda j=j: rows_of(j)) for j in range(27)]

    def rec_d2(rec, ok):
        x = rec[..., 0 * P:1 * P]
        y = rec[..., 1 * P:2 * P]
        z = rec[..., 2 * P:3 * P]
        d2 = ((x - points[:, None, 0:1]) ** 2
              + (y - points[:, None, 1:2]) ** 2
              + (z - points[:, None, 2:3]) ** 2)      # (R,K,P)
        d2 = jnp.where(ok[..., None] & (d2 < md2), d2, jnp.inf)
        return d2.reshape(R, -1)                       # (R,K*P)

    # pass 1: cached candidate distances; inf = dead lane / out of range
    d2_cols = [rec_d2(*src()) for src in sources]
    widths = [c.shape[1] for c in d2_cols]
    if not pm.flat_rows:
        # dense overflow fold: spill photons from over-dense cells
        # anywhere in the grid — broadcast arithmetic, the distance
        # test filters
        d2_ovf = ((pm.ovf_pos[None, :, 0] - points[:, 0:1]) ** 2
                  + (pm.ovf_pos[None, :, 1] - points[:, 1:2]) ** 2
                  + (pm.ovf_pos[None, :, 2] - points[:, 2:3]) ** 2)
        d2_cols.append(jnp.where(d2_ovf < md2, d2_ovf, jnp.inf))
    d2_all = jnp.concatenate(d2_cols, axis=-1)
    del d2_cols
    n_in_range = jnp.sum(jnp.isfinite(d2_all), axis=-1, dtype=jnp.int32)
    # the reference's `found` is the heap population: capped at `num`
    # (pm.c:198-207) — the 10*num/found amplification never drops below 10
    found = jnp.minimum(n_in_range, num)

    # pass 2: kth-nearest d2 by bisection (exact to the working dtype)
    iters = 60 if dtype == jnp.float64 else 30
    lo = jnp.zeros((R,), dtype)
    hi = jnp.full((R,), md2, dtype)

    def bis(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(d2_all <= mid[:, None], axis=-1, dtype=jnp.int32)
        ge = cnt >= num
        return (jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)), None

    (lo, hi), _ = jax.lax.scan(bis, (lo, hi), None, length=iters)
    r2 = jnp.where(n_in_range >= num, hi, md2)

    # pass 3: cone-filtered weighted sum over selected candidates
    irr = jnp.zeros((R, 3), dtype)
    inv_kd = 1.0 / (cone_k * max_dist)

    def weighted(d2, pw_xyz, dir_xyz):
        """d2 (R,M); pw/dir each a 3-tuple of (R,M) -> (R,3) partial."""
        sel = d2 <= r2[:, None]                        # inf never selected
        front = (dir_xyz[0] * eyev[:, 0:1] + dir_xyz[1] * eyev[:, 1:2]
                 + dir_xyz[2] * eyev[:, 2:3]) < 0.0
        # unselected lanes route through sqrt(1), not sqrt(0): sqrt'(0)
        # is inf and the outer where's 0-cotangent times inf poisons the
        # whole backward with NaN (d2 carries gradient via the query
        # points' geometry chain). Masked forward values are unchanged.
        w = 1.0 - jnp.sqrt(jnp.maximum(jnp.where(sel, d2, 1.0), 0.0)) \
            * inv_kd
        wm = jnp.where(sel & front, w, 0.0)
        return jnp.stack([jnp.sum(wm * pw_xyz[0], -1),
                          jnp.sum(wm * pw_xyz[1], -1),
                          jnp.sum(wm * pw_xyz[2], -1)], -1)

    off = 0
    for src, w in zip(sources, widths):
        rec, ok = src()
        d2 = jax.lax.dynamic_slice_in_dim(d2_all, off, w, axis=1)
        off += w
        pw = tuple(rec[..., (3 + i) * P:(4 + i) * P].reshape(R, -1)
                   for i in range(3))
        dr = tuple(rec[..., (6 + i) * P:(7 + i) * P].reshape(R, -1)
                   for i in range(3))
        irr = irr + weighted(d2, pw, dr)
    if not pm.flat_rows:
        d2o = jax.lax.dynamic_slice_in_dim(
            d2_all, off, pm.ovf_pos.shape[0], axis=1)
        irr = irr + weighted(
            d2o, tuple(pm.ovf_power[None, :, i] for i in range(3)),
            tuple(pm.ovf_dir[None, :, i] for i in range(3)))

    norm = 1.0 / ((1.0 - 2.0 / (3.0 * cone_k)) * jnp.pi * r2)
    irr = irr * norm[:, None]
    irr = jnp.where((found >= 8)[:, None], irr, 0.0)
    return irr, found


# ---------------------------------------------------------------------------
# render-time GI terms
# ---------------------------------------------------------------------------

def lighting_gi(ir: SceneIR, rt, pm: PhotonMap, comps, cfg):
    """renderer.c:862-892: global-map visualization / gather-ray radiance.
    In visualize mode the raw scaled estimate is returned (renderer.c:880)."""
    est, found = irradiance_estimate(
        pm, comps.over_point, comps.eyev, cfg.irradiance_estimate_num,
        cfg.irradiance_estimate_radius, cfg.irradiance_estimate_cone_filter_k)
    scale = jnp.where(found > 0,
                      10.0 * cfg.irradiance_estimate_num
                      / jnp.maximum(found, 1).astype(est.dtype), 0.0)
    est = est * scale[:, None]
    if cfg.visualize_photon_map:
        return est
    ndote = jnp.sum(comps.eyev * comps.normalv, -1)
    return comps.over_Kd * est * ndote[:, None]


def lighting_caustics(ir: SceneIR, rt, pm: PhotonMap, comps, cfg):
    """renderer.c:829-860: cone-filtered caustic estimate * 100/n."""
    est, found = irradiance_estimate(
        pm, comps.over_point, comps.eyev, cfg.irradiance_estimate_num,
        cfg.irradiance_estimate_radius, cfg.irradiance_estimate_cone_filter_k)
    scale = jnp.where(found > 0,
                      100.0 / jnp.maximum(found, 1).astype(est.dtype), 0.0)
    est = est * scale[:, None]
    ndote = jnp.sum(comps.eyev * comps.normalv, -1)
    caustic = comps.over_Kd * est * ndote[:, None]
    return jnp.where(jnp.any(comps.over_Kd > 0.0, -1)[:, None], caustic,
                     0.0)


def color_at_gi(ir: SceneIR, rt, pm_global: PhotonMap, orig, dirs, cfg):
    """renderer.c:319-345,626-653: one-bounce gather radiance = pi *
    lighting_gi at the gather hit (no recursion)."""
    from fast_ray_tracer_tpu.render.integrator import prepare_computations
    comps = prepare_computations(ir, rt, orig, dirs)
    c = jnp.pi * lighting_gi(ir, rt, pm_global, comps, cfg)
    gate = comps.valid & jnp.any(comps.over_Kd > 0.0, -1)
    return jnp.where(gate[:, None], c, 0.0)


def final_gather(ir: SceneIR, rt, pm_global: PhotonMap, comps, key, cfg):
    """renderer.c:647-687: gi_usteps x gi_vsteps cosine-weighted hemisphere
    rays, each scaled by its first random coordinate (the reference's
    'scale by theta' quirk), averaged with pdf_inv = 2*pi, times Kd.

    All R*S gather rays go through ONE wavefront intersection+estimate
    pass (the reference loops the S samples serially per shading point,
    renderer.c:665-679; one big batch is the TPU-native shape — same
    arithmetic per ray, S-fold fewer passes)."""
    R = comps.p.shape[0]
    dtype = comps.p.dtype
    S = cfg.gi_usteps * cfg.gi_vsteps
    # per-sample keys match the serial fold_in sequence; rays are grouped
    # sample-major so each (R,) sub-batch s keeps its own key stream
    normals = jnp.broadcast_to(comps.normalv[None], (S, R, 3)).reshape(-1, 3)
    keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(jnp.arange(S))
    r = jax.vmap(lambda k: jax.random.uniform(k, (R, 2), dtype))(keys)
    d, r1 = _cosine_hemisphere_from_uniforms(r.reshape(-1, 2), normals)
    orig = jnp.broadcast_to(comps.over_point[None], (S, R, 3)).reshape(-1, 3)
    c = color_at_gi(ir, rt, pm_global, orig, d, cfg)
    total = jnp.sum((c * r1[:, None]).reshape(S, R, 3), axis=0)
    total = total * (2.0 * jnp.pi / S)
    return total * comps.over_Kd


def make_gi_hook(pmaps, cfg, live_power: bool = False):
    """The RenderStatics.gi_hook consumed by shade_direct (integrator.py):
    returns the ambient-channel GI addition per shading point (clamp
    applied there). render.py attaches it via rt._replace after the
    photon pass — the ConfigDesc itself is never mutated.

    live_power=True re-derives the stored photon powers from the live
    `ir` inside the traced program (with_live_power), so pixel gradients
    flow through the photon map to mat_Kd/mat_refl/mat_Tf and
    light_intensity — the mode the GI train step and the fwd+bwd bench
    use. Forward rendering keeps the host-packed constants (byte-stable,
    zero per-chunk recompute)."""
    pm_caustic = pmaps.get(CAUSTIC)
    pm_global = pmaps.get(GLOBAL)

    def hook(ir, rt, comps, key):
        R = comps.p.shape[0]
        pmg, pmc = pm_global, pm_caustic
        if live_power:
            pmg = with_live_power(pmg, ir)
            pmc = with_live_power(pmc, ir)
        add = jnp.zeros((R, 3), comps.p.dtype)
        gate = jnp.any(comps.over_Kd > 0.0, -1)
        if cfg.visualize_photon_map and pmg is not None:
            add = add + lighting_gi(ir, rt, pmg, comps, cfg)
        if cfg.include_final_gather and pmg is not None:
            k = key if key is not None else jax.random.PRNGKey(0)
            add = add + final_gather(ir, rt, pmg, comps,
                                     jax.random.fold_in(k, 99), cfg)
        if cfg.include_caustics and pmc is not None:
            add = add + lighting_caustics(ir, rt, pmc, comps, cfg)
        return jnp.where(gate[:, None], add, 0.0)

    return hook
