"""Pallas TPU kernel: FindValidPoints visibility walk, scans in lanes.

The reference's FindValidPoints (Mapper.cpp:758-817) is a strictly
sequential trailing-anchor walk over a scan's beams: advance the anchor to
the next point >= 0.1 m away, and each advance ("decision") emits a
side-of-line verdict that validates every point since the previous
decision.  The XLA formulations in match/correlative.py are exact but pay
the TPU while-loop tax: the two B-step ``lax.scan``s cost ~1.5-3 us per
step in dispatch/loop overhead even though each step is ~10 vector ops —
3.5 ms for a 128-scan loop chain whose actual compute is ~25 us.

This kernel runs the identical walk INSIDE one Mosaic program with the
chain dimension in lanes: points stored as [B, S] columns (one scan per
lane), anchors as [1, S] vregs, so each of the B sequential steps is a
handful of VPU ops with no per-step dispatch.  The forward walk records
the decision/verdict rows to VMEM scratch; the backward pass (each point
is validated by the first decision strictly after it) is a second
in-kernel reverse loop.  Every comparison evaluates the same f32
expressions on the same operands in the same order as the lax.scan
version, so the masks are bit-identical (fuzz-pinned by
tests/test_correlative.py and on hardware by verify_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.ops.mxu_interp import round_up as _round_up

Array = jax.Array

_MIN_SQ = 0.01  # points closer than 0.1 m never advance the anchor
_LANES = 128


@functools.partial(jax.jit, static_argnames=())
def _fvp_pallas_jit(px: Array, py: Array, pv: Array, vp: Array) -> Array:
    """Walk all S lanes: px/py/pv [B, S] f32 (S multiple of 128), vp [2].

    Returns [B, S] f32 0/1: point validated by its following decision
    (before the ``& valid`` the caller applies)."""
    b, s = px.shape

    def kernel(vp_ref, px_ref, py_ref, pv_ref, out_ref, dec_ref, keep_ref):
        vpx = vp_ref[0]
        vpy = vp_ref[1]

        def fwd(i, st):
            ax, ay, anch = st
            x = px_ref[pl.ds(i, 1), :]
            y = py_ref[pl.ds(i, 1), :]
            v = pv_ref[pl.ds(i, 1), :]
            # the reference's delta = first - p; decide iff far AND valid
            dx = ax - x
            dy = ay - y
            vb = v != 0.0
            anchb = anch != 0.0
            decide = (dx * dx + dy * dy > _MIN_SQ) & anchb & vb
            # side-of-line verdict vs the CURRENT anchor — the exact f32
            # expression order of the lax.scan body (a, b, c, then
            # x*a + y*b + c)
            a = vpy - ay
            bb = ax - vpx
            c = ay * vpx - ax * vpy
            keep = x * a + y * bb + c >= 0.0
            dec_ref[pl.ds(i, 1), :] = decide.astype(jnp.float32)
            keep_ref[pl.ds(i, 1), :] = keep.astype(jnp.float32)
            # the anchor advances on a decision; before the first valid
            # point it SEEDS on that point without deciding (the scan
            # version's pts[argmax(valid)] seed)
            take = decide | ((~anchb) & vb)
            ax = jnp.where(take, x, ax)
            ay = jnp.where(take, y, ay)
            anch = jnp.maximum(anch, v)
            return ax, ay, anch

        zero = jnp.zeros((1, s), jnp.float32)
        jax.lax.fori_loop(0, b, fwd, (zero, zero, zero))

        # backward: point i inherits the verdict of the first decision
        # strictly after i (the scan version's reverse pass)
        def bwd(j, carry):
            i = b - 1 - j
            out_ref[pl.ds(i, 1), :] = carry
            d = dec_ref[pl.ds(i, 1), :]
            k = keep_ref[pl.ds(i, 1), :]
            return jnp.where(d != 0.0, k, carry)

        jax.lax.fori_loop(0, b, bwd, jnp.zeros((1, s), jnp.float32))

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
            pltpu.VMEM((b, s), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(vp, px, py, pv)


def find_valid_points_batch(
    pts: Array,  # [S, B, 2] world points, one scan per row
    valid: Array,  # [S, B]
    viewpoint: Array,  # [2]
) -> Array:
    """Mask [S, B]: FindValidPoints for S scans in one kernel call.

    Bit-identical to ``vmap(find_valid_points)`` (either formulation);
    ~25 us for a 128-scan 1081-beam loop chain vs 3.5 ms for the vmapped
    serial scan.  Lanes beyond S are padding (pv = 0 -> never anchored ->
    all-false) and are sliced off.
    """
    s, b = pts.shape[0], pts.shape[1]
    sp = _round_up(max(s, 1), _LANES)
    pad = ((0, sp - s), (0, 0))
    px = jnp.pad(pts[..., 0], pad).T  # [B, Sp]
    py = jnp.pad(pts[..., 1], pad).T
    pv = jnp.pad(valid.astype(jnp.float32), pad).T
    out = _fvp_pallas_jit(px, py, pv, viewpoint.astype(jnp.float32))
    return (out.T[:s] != 0.0) & valid


def vmem_fits_fvp(s: int, b: int, budget_bytes: int = 14 * 1024 * 1024) -> bool:
    """Whether the 3 input + 1 output + 2 scratch [B, Sp] f32 planes fit."""
    sp = _round_up(max(s, 1), _LANES)
    return 6 * b * sp * 4 <= budget_bytes
