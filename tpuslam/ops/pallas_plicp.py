"""Pallas TPU kernel: fused PL-ICP correspondence search.

One PL-ICP iteration's correspondence stage (reference semantics: CSM
``find_correspondences`` + ``kill_outliers_double``, surfaced through
lesson3/src/plicp_odometry.cc:58-186) costs ~8 XLA passes over the
``[B, B']`` distance matrix in ``match/plicp.py``: the broadcast d2, row
min/argmin, two lane-rolled neighbor reduces, the one-hot builds, the
doubles column-min, and two ``[B, B'] @ [B', 2]`` selection matmuls.
Each pass round-trips HBM; fusion breaks across the reduces.

This kernel runs the whole stage with every intermediate resident in
VMEM (a 512x512 f32 matrix is 1 MB) and emits only the ``[B]``-shaped
results the Gauss-Newton update needs:

    q1, q2  — the two reference line points (selected exactly, via
              masked VPU reduces — no MXU rounding on coordinates)
    d1      — squared distance to the nearest reference point
    ok      — correspondence valid & (d1 < max_d2) & doubles-kept

Batching: Mosaic requires the last two block dims to be (8, 128)-aligned,
so the batch axis cannot be a per-program (1, B) block.  Instead pairs
pack 8 per program ([N/8, 8, B] blocks, static inner unroll) and a
``custom_vmap`` rule routes ``jax.vmap`` (e.g. ``plicp_batch``) into the
packed kernel instead of pallas' default axis-prepend batching.

Numerics contract: same operations as the XLA path —
- distances use the same cancellation-free broadcast subtraction; the
  compiler may fuse ``dx*dx + dy*dy`` into an FMA differently than the
  XLA chain, so d1 can differ by one ulp (and a correspondence can flip
  only between EXACTLY equidistant candidates),
- argmin tie-breaking picks the lowest index (iota-min),
- the closer scan-neighbor of j1 joins the line, with edge fallback,
- ``remove_doubles`` keeps only the closest source per reference point
  (same ``<= best + 1e-12`` tolerance).

The alpha test (``do_alpha_test``, default off) reorders the gating, so
``plicp`` only takes this kernel when that knob is off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

from tpuslam.ops.mxu_interp import round_up as _round_up

BIG = 1e9
PACK = 8  # pairs per program (sublane-aligned batch packing)


def _corr_kernel(
    n_ref: int, bp: int, np_: int, remove_doubles: bool, line: bool
):
    def kernel(md2_ref, curx_r, cury_r, refx_r, refy_r, sv_r, rv_r,
               q1x_r, q1y_r, q2x_r, q2y_r, d1_r, ok_r):
        lane = jax.lax.broadcasted_iota(jnp.int32, (bp, np_), 1)

        # fori_loop (NOT a static unroll) over the packed pairs: Mosaic
        # stack-allocates each unrolled iteration's [bp, np_] intermediates
        # SEPARATELY, so an 8x unroll at 1081 beams (1152-padded) piled
        # ~35 MB of scoped VMEM against the 16 MB limit and failed to
        # compile — found by verify_tpu.py at the production beam count.
        # A loop body compiles once and reuses one set of buffers.
        def body(k, carry):
            cx = curx_r[0, pl.ds(k, 1), :].reshape(bp, 1)
            cy = cury_r[0, pl.ds(k, 1), :].reshape(bp, 1)
            rx = refx_r[0, pl.ds(k, 1), :].reshape(1, np_)
            ry = refy_r[0, pl.ds(k, 1), :].reshape(1, np_)
            svb = sv_r[0, pl.ds(k, 1), :].reshape(bp, 1) > 0
            rvb = rv_r[0, pl.ds(k, 1), :].reshape(1, np_) > 0

            dx = cx - rx
            dy = cy - ry
            d2 = dx * dx + dy * dy
            d2 = jnp.where(rvb & svb, d2, BIG)

            d1 = jnp.min(d2, axis=1, keepdims=True)  # [bp, 1]
            j1 = jnp.min(
                jnp.where(d2 == d1, lane, np_), axis=1, keepdims=True
            )  # lowest-index argmin (jnp.argmin tie rule)

            oh1 = lane == j1  # [bp, np_]
            # exact coordinate selection: masked VPU reduces (no MXU)
            q1x = jnp.sum(jnp.where(oh1, rx, 0.0), axis=1, keepdims=True)
            q1y = jnp.sum(jnp.where(oh1, ry, 0.0), axis=1, keepdims=True)
            if line:
                # neighbor distances WITHOUT the two full lane-rolled d2
                # copies (each another [bp, np_] f32 buffer): select the
                # j1±1 neighbor's coordinates/validity through one-hots
                # and recompute its distance directly — the identical
                # dx*dx + dy*dy expression on the identical operands, so
                # the value matches the d2 entry bit-for-bit.
                ohp = lane == j1 + 1
                ohm = lane == j1 - 1
                rxp = jnp.sum(jnp.where(ohp, rx, 0.0), axis=1, keepdims=True)
                ryp = jnp.sum(jnp.where(ohp, ry, 0.0), axis=1, keepdims=True)
                rxm = jnp.sum(jnp.where(ohm, rx, 0.0), axis=1, keepdims=True)
                rym = jnp.sum(jnp.where(ohm, ry, 0.0), axis=1, keepdims=True)
                vp = jnp.sum(
                    jnp.where(ohp & rvb, 1, 0), axis=1, keepdims=True
                ) > 0
                vm = jnp.sum(
                    jnp.where(ohm & rvb, 1, 0), axis=1, keepdims=True
                ) > 0
                dxp = cx - rxp
                dyp = cy - ryp
                d_r = jnp.where(vp & svb, dxp * dxp + dyp * dyp, BIG)
                dxm = cx - rxm
                dym = cy - rym
                d_l = jnp.where(vm & svb, dxm * dxm + dym * dym, BIG)
                d_r = jnp.where(j1 == n_ref - 1, BIG, d_r)
                d_l = jnp.where(j1 == 0, BIG, d_l)
                right = d_r < d_l
                q2x = jnp.where(right, rxp, rxm)
                q2y = jnp.where(right, ryp, rym)
                d2nd = jnp.minimum(d_r, d_l)
                ok = (d1 < BIG) & (d2nd < BIG) & (d1 < md2_ref[0])
            else:
                # nearest-only mode (point-to-point ICP): no line neighbor
                q2x, q2y = q1x, q1y
                ok = (d1 < BIG) & (d1 < md2_ref[0])

            if remove_doubles:
                # closest source per reference point (column min over rows)
                dmat = jnp.where(oh1 & ok, d2, BIG)  # d2[i, j1_i] == d1_i
                best_per_ref = jnp.min(dmat, axis=0, keepdims=True)
                my_best = jnp.sum(
                    jnp.where(oh1, best_per_ref, 0.0), axis=1, keepdims=True
                )
                ok = ok & (d1 <= my_best + 1e-12)

            q1x_r[0, pl.ds(k, 1), :] = q1x.reshape(1, bp)
            q1y_r[0, pl.ds(k, 1), :] = q1y.reshape(1, bp)
            q2x_r[0, pl.ds(k, 1), :] = q2x.reshape(1, bp)
            q2y_r[0, pl.ds(k, 1), :] = q2y.reshape(1, bp)
            d1_r[0, pl.ds(k, 1), :] = d1.reshape(1, bp)
            ok_r[0, pl.ds(k, 1), :] = ok.reshape(1, bp).astype(jnp.int32)
            return carry

        jax.lax.fori_loop(0, PACK, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("remove_doubles", "line"))
def _corr_batched(cur, src_valid, ref, ref_valid, max_d2, remove_doubles,
                  line=True):
    """Packed batched kernel: cur [N, B, 2], ref [N, B', 2] → per-pair
    (q1, q2, d1, ok), all [N, ...]."""
    n, b = cur.shape[0], cur.shape[1]
    n_ref = ref.shape[1]
    bp = _round_up(b, 128)
    np_ = _round_up(n_ref, 128)
    n8 = _round_up(n, PACK)
    g = n8 // PACK

    def pack(vals, width, dtype):
        out = jnp.zeros((n8, width), dtype)
        out = out.at[:n, : vals.shape[1]].set(vals.astype(dtype))
        return out.reshape(g, PACK, width)

    curx = pack(cur[:, :, 0], bp, jnp.float32)
    cury = pack(cur[:, :, 1], bp, jnp.float32)
    refx = pack(ref[:, :, 0], np_, jnp.float32)
    refy = pack(ref[:, :, 1], np_, jnp.float32)
    sv = pack(src_valid, bp, jnp.int32)
    rv = pack(ref_valid, np_, jnp.int32)
    md2 = jnp.asarray(max_d2, jnp.float32).reshape(1)

    bspec = lambda w: pl.BlockSpec(  # noqa: E731
        (1, PACK, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _corr_kernel(n_ref, bp, np_, remove_doubles, line),
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  bspec(bp), bspec(bp), bspec(np_), bspec(np_),
                  bspec(bp), bspec(np_)],
        out_specs=[bspec(bp)] * 6,
        out_shape=[jax.ShapeDtypeStruct((g, PACK, bp), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((g, PACK, bp), jnp.int32)],
        interpret=jax.default_backend() == "cpu",
    )(md2, curx, cury, refx, refy, sv, rv)
    q1x, q1y, q2x, q2y, d1, ok = (o.reshape(n8, bp)[:n, :b] for o in out)
    q1 = jnp.stack([q1x, q1y], axis=-1)
    q2 = jnp.stack([q2x, q2y], axis=-1)
    return q1, q2, d1, ok > 0


@functools.lru_cache(maxsize=None)
def _corr_fn(remove_doubles: bool, line: bool = True):
    @jax.custom_batching.custom_vmap
    def f(cur, src_valid, ref, ref_valid, max_d2):
        q1, q2, d1, ok = _corr_batched(
            cur[None], src_valid[None], ref[None], ref_valid[None],
            max_d2, remove_doubles, line,
        )
        return q1[0], q2[0], d1[0], ok[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, cur, sv, ref, rv, max_d2):  # noqa: ARG001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        cur_b = bcast(cur, in_batched[0])
        sv_b = bcast(sv, in_batched[1])
        ref_b = bcast(ref, in_batched[2])
        rv_b = bcast(rv, in_batched[3])
        if in_batched[4]:
            raise NotImplementedError(
                "per-pair max_d2 under vmap is not supported by the packed "
                "kernel; pass a shared scalar cutoff"
            )
        md2 = max_d2  # scalar cutoff
        outs = _corr_batched(cur_b, sv_b, ref_b, rv_b, md2,
                             remove_doubles, line)
        return outs, (True, True, True, True)

    return f


def corr_vmem_fits(b: int, n_ref: int,
                   budget_bytes: int = 15 * 1024 * 1024) -> bool:
    """True if the kernel's per-iteration working set fits scoped VMEM.

    The dominant live buffers inside one fori_loop iteration are the
    [bp, np_] f32 distance matrix plus one masked-select temporary of the
    same shape (~2x); measured on v5e: 1152-padded compiles (~10.6 MB by
    this rule), 1536-padded fails at 19.6 M against the 16 M scoped
    limit.  Callers fall back to the XLA chain above the budget."""
    bp = _round_up(b, 128)
    np_ = _round_up(n_ref, 128)
    return 2 * bp * np_ * 4 <= budget_bytes


def correspondences_pallas(
    cur: Array,  # [B, 2] transformed source points
    src_valid: Array,  # [B] bool
    ref: Array,  # [B', 2] reference points
    ref_valid: Array,  # [B'] bool
    max_d2: Array,  # [] squared correspondence cutoff
    remove_doubles: bool,
):
    """Fused correspondence search; returns (q1, q2, d1, ok).

    vmap-compatible: batching routes into the packed kernel (module doc)."""
    return _corr_fn(bool(remove_doubles))(
        cur, src_valid, ref, ref_valid, jnp.asarray(max_d2, jnp.float32)
    )


def nearest_pallas(
    cur: Array,  # [B, 2] transformed source points
    src_valid: Array,  # [B] bool
    dst: Array,  # [B', 2] target points
    dst_valid: Array,  # [B'] bool
    max_d2: Array,  # [] squared correspondence cutoff
):
    """Nearest-only mode for point-to-point ICP: (matched, d1, ok).

    Fuses the ICP iteration's d2 + argmin + one-hot select chain
    (match/icp.py nearest_neighbors + the matched-point matmul) into the
    same VMEM-resident kernel; vmap routes into the packed batch."""
    q1, _, d1, ok = _corr_fn(False, line=False)(
        cur, src_valid, dst, dst_valid, jnp.asarray(max_d2, jnp.float32)
    )
    return q1, d1, ok
