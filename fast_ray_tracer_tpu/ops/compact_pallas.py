"""Pallas stream-compaction kernels for the bucketed wavefront (TPU).

The device-side bucket compaction in render/integrator.trace_bucketed is
built, at the XLA level, from `jnp.nonzero(act, size=B)` plus two row
gathers. The per-op profile on the flagship scene put that machinery at
~88 of 115 ms/frame: XLA lowers nonzero's index build to a scatter-add
that serializes (~0.3 GB/s), and the compaction/expansion row gathers run
at the fixed ~0.33G-rows/s random-gather rate even though their indices
are MONOTONE (cumsum positions — each active lane moves to the next free
slot, order preserved).

These kernels exploit the monotone structure directly:

 * `compact_rows(src, act, B, fill_row)` — gather the active rows of
   `src` (N, C) into the first count slots of a (B, C) output, remaining
   rows = `fill_row`. Equivalent to
   `vstack([src, fill])[nonzero(act, size=B, fill_value=N)]`.
 * `expand_rows(child, act)` — the transpose: route child row
   `cumsum(act)-1` back to each active lane of an (N, C) output
   (inactive lanes 0). Equivalent to
   `where(act[:,None], child[clip(cumsum(act)-1, 0, B-1)], 0)`.

Both process 1024 lanes per sequential grid step as eight 128-lane rows:
a per-row lane cumsum (log-shift), a 7-round vectorized binary search
for the j-th active lane, and per-component-slab lane gathers (Mosaic's
`dynamic_gather` handles 128-lane index vectors per sublane). Cross-row/
step stitching runs through a VMEM staging tile at the running global
offset (SMEM carry persists across the sequential TPU grid); completed
output tiles stream to/from HBM through an async-DMA ring. Data moves in
a lane-major (n128, C, 128) layout — the XLA-side transposes in/out are
dense copies at bandwidth, not gathers.

Differentiation: the pair are exact transposes of each other, so
`compact_rows` VJP = `expand_rows` of the cotangent and vice versa
(fill rows receive/emit zero cotangent) — registered via jax.custom_vjp.

Gate: FRT_COMPACT_PALLAS = auto (default: on for the TPU backend, f32) |
0 (off) | 1 / interpret (interpreter mode off-TPU — CPU parity tests).
"""

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 1024                 # lanes per grid step (8 sublane rows x 128)
_ROWS = TB // 128
_NFLUSH = 4               # output-DMA ring depth (compact kernel)

_mode_override = None     # set via override_mode(); beats env + backend


@contextlib.contextmanager
def override_mode(mode):
    """Force the kernel mode for code traced inside the context: "off"
    disables, "interpret"/"tpu" force that lowering. Used by the sharded
    render path when the mesh's devices are not the default backend (the
    axon TPU plugin keeps default_backend()=="tpu" even for CPU meshes)."""
    global _mode_override
    prev = _mode_override
    _mode_override = mode
    try:
        yield
    finally:
        _mode_override = prev


def _mode():
    if _mode_override is not None:
        return None if _mode_override in ("off", "0") else _mode_override
    v = os.environ.get("FRT_COMPACT_PALLAS", "auto")
    if v == "0":
        return None
    if jax.default_backend() == "tpu":
        return "tpu"
    if v in ("1", "interpret"):
        return "interpret"
    return None


def enabled(dtype) -> bool:
    return _mode() is not None and jnp.dtype(dtype) == jnp.float32


# ---------------------------------------------------------------------------
# in-kernel helpers (f32 lane vectors, shapes (rows, 128))
# ---------------------------------------------------------------------------

def _lane_iota(rows):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)


def _cumsum_lanes(a):
    """Per-row inclusive cumsum along 128 lanes via log-shift (f32)."""
    lane = _lane_iota(a.shape[0])
    s = a
    for k in (1, 2, 4, 8, 16, 32, 64):
        s = s + jnp.where(lane >= k, pltpu.roll(s, k, axis=1), 0.0)
    return s


def _nth_active(s):
    """Per row: index of the j-th active lane (j = lane), i.e. the first
    i with s[i] >= j+1, via a 7-round vectorized binary search. Rows with
    fewer than j+1 active lanes return garbage <= 127 (mask downstream)."""
    rows = s.shape[0]
    target = (_lane_iota(rows) + 1).astype(s.dtype)
    lo = jnp.zeros((rows, 128), jnp.int32)
    for k in (64, 32, 16, 8, 4, 2, 1):
        probe = lo + (k - 1)
        v = jnp.take_along_axis(s, probe, axis=1)
        lo = jnp.where(v < target, lo + k, lo)
    return lo


def _gather_lanes(x, idx):
    """x (S, 128), idx (rows, 128): per-sublane lane gather (idx
    broadcast across sublanes when rows == 1)."""
    if idx.shape[0] != x.shape[0]:
        idx = jnp.broadcast_to(idx, (x.shape[0], 128))
    return jnp.take_along_axis(x, idx, axis=1)


# ---------------------------------------------------------------------------
# compact kernel
# ---------------------------------------------------------------------------

def _compact_kernel(act_ref, src_ref, out_in, out_hbm, carry, stage, fbuf,
                    sems, *, nc, btiles):
    """Grid step: 8 rows of 128 lanes -> staged output tiles.

    carry: SMEM (2,) i32 [global_count, flush_count]
    stage: VMEM (nc, 256) f32 — partial output tile + wrap
    fbuf:  VMEM (_NFLUSH, nc, 128) — DMA ring
    sems:  DMA sems (_NFLUSH,)
    """
    del out_in                                       # aliased with out_hbm
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        carry[0] = 0
        carry[1] = 0
        stage[:, :] = jnp.zeros((nc, 256), jnp.float32)

    a = act_ref[0]                                   # (8,128) f32
    s = _cumsum_lanes(a)
    nth = _nth_active(s)                             # (8,128) i32
    # gather all component slabs at once: (8*nc, 128) source rows,
    # row-group r (nc slabs) uses row r's nth-index vector
    src = src_ref[0].reshape(_ROWS * nc, 128)
    idx_full = jnp.broadcast_to(
        nth[:, None, :], (_ROWS, nc, 128)).reshape(_ROWS * nc, 128)
    g_all = jnp.take_along_axis(src, idx_full, axis=1)
    lane1 = _lane_iota(1)
    cnts = jnp.max(s, axis=1, keepdims=True).astype(jnp.int32)   # (8,1)

    def flush():
        """DMA stage[:, :128] to output tile total//128; shift wrap in."""
        fc = carry[1]
        slot = jax.lax.rem(fc, jnp.int32(_NFLUSH))

        @pl.when(fc >= _NFLUSH)
        def _():
            # free the ring slot (wait uses sem + size only)
            pltpu.make_async_copy(fbuf.at[slot], out_hbm.at[0],
                                  sems.at[slot]).wait()
        fbuf[slot] = stage[:, :128]
        tile = jnp.minimum(carry[0] // 128, btiles - 1)
        pltpu.make_async_copy(fbuf.at[slot], out_hbm.at[tile],
                              sems.at[slot]).start()
        carry[1] = fc + 1
        stage[:, :128] = stage[:, 128:]
        stage[:, 128:] = jnp.zeros((nc, 128), jnp.float32)

    for r in range(_ROWS):
        cnt = cnts[r, 0]
        total = carry[0]
        off = jax.lax.rem(total, jnp.int32(128))
        # rotate row r's compacted lanes to start at stage offset `off`:
        # rotated[j] = compacted[(j - off) mod 128]
        jrel = jax.lax.rem(lane1 - off + jnp.int32(128), jnp.int32(128))
        gsel = _gather_lanes(g_all[r * nc:(r + 1) * nc], jrel)
        valid = jrel < cnt
        in_a = valid & (lane1 >= off)
        in_b = valid & (lane1 < off)
        stage[:, :128] = jnp.where(in_a, gsel, stage[:, :128])
        stage[:, 128:] = jnp.where(in_b, gsel, stage[:, 128:])

        @pl.when(off + cnt >= 128)
        def _():
            flush()
        carry[0] = total + cnt

    @pl.when(step == nsteps - 1)
    def _():
        flush()          # final partial tile (real prefix + zero tail)
        fc = carry[1]
        for d in range(_NFLUSH):
            @pl.when(fc - 1 - d >= 0)
            def _(d=d):
                slot = jax.lax.rem(fc - jnp.int32(1 + d), jnp.int32(_NFLUSH))
                pltpu.make_async_copy(fbuf.at[slot], out_hbm.at[0],
                                      sems.at[slot]).wait()


def _compact_call(src_t, act_t, btiles, nc):
    nb = act_t.shape[0]
    kern = functools.partial(_compact_kernel, nc=nc, btiles=btiles)
    out0 = jnp.zeros((btiles, nc, 128), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, nc, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((btiles, nc, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((nc, 256), jnp.float32),
            pltpu.VMEM((_NFLUSH, nc, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_NFLUSH,)),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_mode() == "interpret",
    )(act_t, src_t, out0)


# ---------------------------------------------------------------------------
# expand kernel
# ---------------------------------------------------------------------------

_CTILES = _ROWS + 1       # child tiles covering one step's span


def _expand_kernel(act_ref, child_hbm, out_ref, carry, cbuf, sems,
                   *, nc, btiles):
    """Grid step: out[i] = act[i] ? child[pos[i]] : 0 for 1024 lanes.

    carry: SMEM (1,) i32 — global count before this step
    cbuf:  VMEM (2, _CTILES, nc, 128) — double-buffered child tiles
    sems:  DMA sems (2,)
    """
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    tmax = btiles - _CTILES

    a = act_ref[0]
    s = _cumsum_lanes(a)
    cnts = jnp.max(s, axis=1, keepdims=True).astype(jnp.int32)   # (8,1)

    @pl.when(step == 0)
    def _():
        carry[0] = 0
        pltpu.make_async_copy(child_hbm.at[pl.ds(0, _CTILES)], cbuf.at[0],
                              sems.at[0]).start()

    total0 = carry[0]
    t0 = jnp.minimum(total0 // 128, tmax)
    buf = jax.lax.rem(step, jnp.int32(2))
    pltpu.make_async_copy(child_hbm.at[pl.ds(t0, _CTILES)], cbuf.at[buf],
                          sems.at[buf]).wait()

    # prefetch the next step's span while this one computes
    total_next = total0 + jnp.sum(cnts)
    carry[0] = total_next

    @pl.when(step + 1 < nsteps)
    def _():
        t0n = jnp.minimum(total_next // 128, tmax)
        pltpu.make_async_copy(child_hbm.at[pl.ds(t0n, _CTILES)],
                              cbuf.at[1 - buf], sems.at[1 - buf]).start()

    rbase = total0 - t0 * 128                        # offset into cbuf
    for r in range(_ROWS):
        # child index for each lane of row r, relative to cbuf[buf];
        # a row's active span covers at most 2 adjacent child tiles
        local = rbase + s[r:r + 1].astype(jnp.int32) - 1
        act_r = a[r:r + 1] > 0
        q = local // 128
        lane_sel = jnp.clip(jax.lax.rem(local, jnp.int32(128)), 0, 127)
        qmin = jnp.min(jnp.where(act_r, q, _CTILES - 1))
        qmin = jnp.clip(qmin, 0, _CTILES - 2)
        g0 = _gather_lanes(cbuf[buf, qmin], lane_sel)
        g1 = _gather_lanes(cbuf[buf, qmin + 1], lane_sel)
        use0 = (q == qmin) & act_r
        use1 = (q > qmin) & act_r
        out_ref[0, r] = jnp.where(use0, g0, jnp.where(use1, g1, 0.0))
        rbase = rbase + cnts[r, 0]


def _expand_call(child_t, act_t, nc):
    nb = act_t.shape[0]
    btiles = child_t.shape[0]
    kern = functools.partial(_expand_kernel, nc=nc, btiles=btiles)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, _ROWS, nc, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, _ROWS, nc, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((2, _CTILES, nc, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_mode() == "interpret",
    )(act_t, child_t)


# ---------------------------------------------------------------------------
# XLA-side layout shims + custom VJPs
# ---------------------------------------------------------------------------

def _to_lanes(x, n128):
    """(N, C) -> (n128, C, 128) lane-major (rows padded with zeros)."""
    n, c = x.shape
    pad = n128 * 128 - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, c), x.dtype)])
    return x.reshape(n128, 128, c).transpose(0, 2, 1)


def _act_tiles(act, nb):
    n = act.shape[0]
    pad = nb * TB - n
    a = act.astype(jnp.float32)
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,), jnp.float32)])
    return a.reshape(nb, _ROWS, 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def compact_rows(src, act, B, fill_row):
    """Active rows of src (N, C) compacted to the front of a (B, C)
    output; rows past the active count become `fill_row` (static tuple).
    Matches vstack([src, fill])[jnp.nonzero(act, size=B, fill_value=N)]
    whenever count <= B (beyond B both paths produce overflow garbage
    that callers detect via the bucket-overflow flag and re-render)."""
    return _compact_fwd_impl(src, act, B, fill_row)


def _compact_fwd_impl(src, act, B, fill_row):
    n, c = src.shape
    nb = -(-n // TB)
    btiles = -(-B // 128) + 1          # headroom for the final flush tile
    src_t = _to_lanes(src, nb * _ROWS).reshape(nb, _ROWS, c, 128)
    act_t = _act_tiles(act, nb)
    out_t = _compact_call(src_t, act_t, btiles, c)
    out = out_t.transpose(0, 2, 1).reshape(-1, c)[:B]
    # the kernel zero-fills past the count; apply the caller's fill row
    # with a dense select (no gathers)
    count = jnp.sum(act, dtype=jnp.int32)
    rowid = jnp.arange(B, dtype=jnp.int32)
    fr = jnp.asarray(fill_row, src.dtype)
    return jnp.where((rowid >= count)[:, None], fr[None], out)


def _compact_fwd(src, act, B, fill_row):
    return _compact_fwd_impl(src, act, B, fill_row), (act,)


def _compact_bwd(B, fill_row, res, g):
    (act,) = res
    return expand_rows(g, act), None


compact_rows.defvjp(_compact_fwd, _compact_bwd)


@jax.custom_vjp
def expand_rows(child, act):
    """(N, C): act[i] ? child[cumsum(act)[i]-1] : 0 — the transpose of
    compact_rows. child rows beyond the active count are never selected."""
    return _expand_fwd_impl(child, act)


def _expand_fwd_impl(child, act):
    b, c = child.shape
    n = act.shape[0]
    nb = -(-n // TB)
    # child tile headroom so every pl.ds(t0, _CTILES) stays in bounds
    btiles = -(-b // 128) + _CTILES
    child_t = _to_lanes(child, btiles)
    act_t = _act_tiles(act, nb)
    out_t = _expand_call(child_t, act_t, c)
    return out_t.transpose(0, 1, 3, 2).reshape(-1, c)[:n]


def _expand_fwd(child, act):
    return _expand_fwd_impl(child, act), (act, child.shape[0])


def _expand_bwd(res, g):
    act, b = res
    zero = (0.0,) * g.shape[1]
    return compact_rows(g, act, b, zero), None


expand_rows.defvjp(_expand_fwd, _expand_bwd)
