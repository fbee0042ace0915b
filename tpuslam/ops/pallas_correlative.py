"""Pallas TPU kernel: correlative response surfaces from a VMEM grid.

The karto correlative matcher's response computation is
``patches[a, dy, dx] = sum_p grid[ay_ap + dy, ax_ap + dx]`` — for every
candidate angle a, the summed S x S neighborhoods of that angle's rotated
scan points (reference semantics: GetResponse over the candidate lattice,
Mapper.cpp:309-523/819-856).  The XLA formulations all hit a wall on TPU:

- per-point ``dynamic_slice`` gathers cost ~1.2 us EACH (latency-bound:
  4.9 ms for 21 angles x 180 points at the sequential operating point),
- one big flat ``take`` is ~2x worse,
- ``lax.conv`` with the grid as kernel wins standalone (2.1 ms) but
  collapses 18x inside the karto ``lax.scan`` batch program,
- FFT cross-correlation only wins at 15 m loop windows.

This kernel keeps the WHOLE correlation grid resident in VMEM and walks
the points with on-chip dynamic slices — no HBM latency per point.  Each
point's patch is extracted from its tile-aligned containing window by
two dynamic circular shifts (pltpu.roll) that move it to the window's
top-left corner — pure VPU element movement (an earlier one-hot MXU
matmul formulation measured ~25% slower end-to-end).  Grid values are
quantized multiples of 0.01 (the smear kernel, Mapper.h:1058-1090), so
the grid is stored as exact small integers (x100, <= 100) in bf16
(integers <= 256 are exact in bf16) and accumulated in f32: every patch
sum is an exact integer < 2^24, bit-identical to the FFT/conv paths and
within one f32 ulp of the patch path.  bf16 storage halves both the
VMEM footprint (the reference's default 0.01 m sequential spec needs
~13.4 MB of the v5e's ~16 MB) and the per-point load bandwidth.

Masking contract (matches the patch path): callers send dropped points
(invalid beams, patches that leave the grid) to the zero landing strip at
rows [G, G+S) by setting ay=G, ax=0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.ops.mxu_interp import round_up as _round_up

Array = jax.Array

# bf16 VMEM tile is (16, 128): dynamic in-VMEM loads must start at
# 16-aligned rows and 128-aligned cols
_ROW_ALIGN = 16
_COL_ALIGN = 128


def _window(s: int) -> tuple[int, int]:
    """Aligned containing-window side lengths for an s x s patch."""
    rows = _round_up(s + _ROW_ALIGN - 1, _ROW_ALIGN)
    cols = _round_up(s + _COL_ALIGN - 1, _COL_ALIGN)
    return rows, cols


@functools.lru_cache(maxsize=1)
def _roll_selfcheck() -> bool:
    """One-time guard for the Mosaic roll semantics this kernel relies on.

    The kernel's correctness depends on empirically measured Mosaic
    behavior: dynamic ``pltpu.roll`` with POSITIVE shifts rotates
    correctly on the non-power-of-two window dims we use (negative shifts
    mis-rotate by +16; bf16 operands crash — both worked around).  If a
    future jaxlib/Mosaic changes roll lowering, this check fails loudly at
    first kernel use instead of silently producing wrong response
    surfaces.  Interpreter mode (CPU) is exempt — it is the semantics
    reference."""
    if jax.default_backend() != "tpu":
        return True
    rows, cols = 48, 384  # the non-power-of-two dims the kernel rolls

    def kernel(x_ref, sh_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = pltpu.roll(
            pltpu.roll(x, shift=sh_ref[0], axis=0), shift=sh_ref[1], axis=1
        )

    x = jnp.arange(rows * cols, dtype=jnp.float32).reshape(rows, cols)
    for sy, sx in ((13, 129), (rows, cols), (1, 1)):
        got = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )(x, jnp.asarray([sy, sx], jnp.int32))
        want = jnp.roll(jnp.roll(x, sy, axis=0), sx, axis=1)
        if not bool(jnp.array_equal(got, want)):
            raise RuntimeError(
                "Mosaic pltpu.roll semantics changed (positive dynamic "
                f"shift ({sy}, {sx}) on ({rows}, {cols}) mis-rotates); "
                "the pallas correlative kernel would be silently wrong — "
                "re-validate ops/pallas_correlative.py on this jaxlib or "
                "set response_method='fft'/'patch'"
            )
    return True


@functools.partial(jax.jit, static_argnames=("s",))
def _patch_sums_pallas_jit(
    grid: Array,
    ay: Array,
    ax: Array,
    s: int,
) -> Array:
    """Summed S x S patches per angle: [nA, S, S] f32 (x100 integer sums)."""
    g = grid.shape[0]
    n_a, b = ay.shape
    # aligned containing window per point: Mosaic only allows dynamic VMEM
    # loads at tile-aligned offsets, so each point loads the aligned
    # superset and extracts its s x s patch with two circular shifts
    rows, cols = _window(s)
    gr = _round_up(g + rows, _ROW_ALIGN)  # zero landing strip for masked pts
    gc = _round_up(g + cols, _COL_ALIGN)
    grid100 = jnp.zeros((gr, gc), jnp.bfloat16)
    grid100 = grid100.at[:g, :g].set(
        jnp.round(grid * 100.0).astype(jnp.bfloat16)
    )

    def kernel(ay_ref, ax_ref, grid_ref, out_ref):
        a = pl.program_id(0)

        def body(p, acc):
            y = ay_ref[a, p]
            x = ax_ref[a, p]
            ya = pl.multiple_of((y // _ROW_ALIGN) * _ROW_ALIGN, _ROW_ALIGN)
            xa = pl.multiple_of((x // _COL_ALIGN) * _COL_ALIGN, _COL_ALIGN)
            # cast before rolling: Mosaic's dynamic roll crashes on bf16
            # operands (f32 is fine; storage stays bf16)
            big = grid_ref[pl.ds(ya, rows), pl.ds(xa, cols)].astype(
                jnp.float32
            )
            # dynamic circular shifts move the patch to the top-left
            # corner — two VPU shuffles instead of two one-hot MXU
            # matmuls (measured faster; numerically identical — pure
            # element movement).  No wrap reaches [:s, :s]: the window
            # over-allocates by one alignment unit on each axis.
            # NOTE: shifts must be the POSITIVE equivalents — Mosaic's
            # dynamic roll mis-rotates NEGATIVE shifts by +16 on
            # non-power-of-two dims (measured: rows 40/48 sublane rolls
            # and cols 384 lane rolls; shift == dim is a correct no-op).
            up = pltpu.roll(big, shift=rows - (y - ya), axis=0)
            left = pltpu.roll(up, shift=cols - (x - xa), axis=1)
            return acc + left[:s, :s]

        acc = jax.lax.fori_loop(
            0, b, body, jnp.zeros((s, s), jnp.float32)
        )
        out_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid=(n_a,),
        in_specs=[
            # whole index arrays in SMEM (tiny), indexed by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # constant index map: the grid is DMA'd to VMEM once and stays
            pl.BlockSpec(
                (gr, gc), lambda a: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s, s), lambda a: (a, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_a, s, s), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(ay, ax, grid100)



def _outside_trace() -> bool:
    """Best-effort "not inside a jit/vmap trace" check for the eager-call
    selfcheck below.  trace_state_clean is private jax API with no
    stability guarantee; if it moves, fall back to True — _roll_selfcheck
    is lru_cached and runs only on its own concrete inputs, so running it
    (once) at trace time is harmless, while SKIPPING it on a jax upgrade
    is exactly the unguarded scenario it exists to prevent."""
    try:
        from jax._src import core as _core

        return bool(_core.trace_state_clean())
    except Exception:
        return True


def patch_sums_pallas(
    grid: Array,  # [G, G] f32 probabilities in [0, 1], multiples of 0.01
    ay: Array,  # [nA, B] int32 patch top rows (pre-masked, see module doc)
    ax: Array,  # [nA, B] int32 patch left cols
    s: int,  # patch side (static)
) -> Array:
    """Summed S x S patches per angle: [nA, S, S] f32 (x100 integer sums).

    Runs the one-time Mosaic roll-semantics self-check when called
    outside a trace; inside an outer jit trace (the normal match_scan
    path) the check is the caller's duty at engine construction —
    KartoMapper.__init__ runs it on TPU backends, as does verify_tpu.py."""
    if _outside_trace():
        _roll_selfcheck()
    return _patch_sums_pallas_jit(grid, ay, ax, s)


@functools.partial(jax.jit, static_argnames=("s2",))
def _patch_sums_stride2_jit(
    grid: Array,
    ay: Array,
    ax: Array,
    ok: Array,
    s2: int,
) -> Array:
    """Stride-2 patch sums: out[a, k, l] = sum_p grid100[ay + 2k, ax + 2l].

    The coarse correlative search only reads the response at a stride-2
    candidate lattice (coarse_xy steps 2*resolution = 2 grid cells,
    Mapper.cpp:219-240), so summing full (2h+1)^2 patches computes 4x the
    needed shifts AND pays tile-aligned window rolls sized to the full
    patch.  This kernel splits the grid into its four cell-parity
    subgrids — grid[2i+py, 2j+px] = sub[2*py+px][i, j] — after which a
    stride-2 patch of the full grid is a DENSE patch of one subgrid
    (grid[ay + 2k] = sub[parity(ay)][ay>>1 + k]): the same roll-extract
    walk as ``patch_sums_pallas`` on half-size windows.  Each addend is
    the identical bf16 grid value, accumulated in the identical point
    order, and every sum is an exact integer < 2^24 in f32 — the output
    is bit-identical to reading the full kernel's patches at the even
    sublattice.  Measured (v5e, 15 m loop window, 21 angles x 1081
    points): 6.9 -> 2.9 ms for the coarse response.

    ``ok`` masks dropped points (invalid beams / patch leaves the grid) —
    same contract as the full kernel's ay=G sentinel, passed explicitly
    here because callers shift ay by the first candidate offset first.
    """
    g = grid.shape[0]
    n_a, b = ay.shape
    rows, cols = _window(s2)
    g2 = (g + 1) // 2
    gr2 = _round_up(g2 + rows, _ROW_ALIGN)
    gc2 = _round_up(g2 + cols, _COL_ALIGN)
    gi = jnp.round(grid * 100.0).astype(jnp.bfloat16)
    gp = jnp.zeros((2 * g2, 2 * g2), jnp.bfloat16).at[:g, :g].set(gi)
    # the four parity subgrids ROW-STACKED into one 2-D array: subgrid
    # q = 2*(ay&1)+(ax&1) occupies rows [q*gr2, q*gr2 + g2).  A dynamic
    # row offset q*gr2 + (ay>>1) keeps the in-kernel load the same proven
    # 2-D tile-aligned dynamic-slice + roll pattern as the full kernel
    # (a [4, ., .] VMEM ref with a dynamically indexed leading dim both
    # lowered slowly AND needed a third SMEM index array, which overflowed
    # the 1 MB SMEM budget at the 81-angle expansion sweep).  The split
    # itself is a single reshape/transpose pass — four separate strided
    # gathers (gp[py::2, px::2]) measured 1.4x slower end-to-end.
    q4 = gp.reshape(g2, 2, g2, 2).transpose(1, 3, 0, 2).reshape(4, g2, g2)
    sub = (
        jnp.zeros((4, gr2, gc2), jnp.bfloat16)
        .at[:, :g2, :g2]
        .set(q4)
        .reshape(4 * gr2, gc2)
    )
    # masked points use sentinel row 2*g2: (2*g2)>>1 = g2 lands on the
    # zero strip rows [g2, g2+rows) of (even, even) subgrid 0
    ay_s = jnp.where(ok, ay, 2 * g2).astype(jnp.int32)
    ax_s = jnp.where(ok, ax, 0).astype(jnp.int32)

    def kernel(ay_ref, ax_ref, sub_ref, out_ref):
        a = pl.program_id(0)

        def body(p, acc):
            y0 = ay_ref[a, p]
            x0 = ax_ref[a, p]
            q = 2 * (y0 & 1) + (x0 & 1)
            y = y0 >> 1
            x = x0 >> 1
            ya = pl.multiple_of(
                q * gr2 + (y // _ROW_ALIGN) * _ROW_ALIGN, _ROW_ALIGN
            )
            xa = pl.multiple_of((x // _COL_ALIGN) * _COL_ALIGN, _COL_ALIGN)
            big = sub_ref[pl.ds(ya, rows), pl.ds(xa, cols)].astype(
                jnp.float32
            )
            # positive-equivalent shifts only (Mosaic dynamic-roll rule,
            # see _roll_selfcheck / module docstring)
            up = pltpu.roll(big, shift=rows - (y - (ya - q * gr2)), axis=0)
            left = pltpu.roll(up, shift=cols - (x - xa), axis=1)
            return acc + left[:s2, :s2]

        acc = jax.lax.fori_loop(0, b, body, jnp.zeros((s2, s2), jnp.float32))
        out_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid=(n_a,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (4 * gr2, gc2), lambda a: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s2, s2), lambda a: (a, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_a, s2, s2), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(ay_s, ax_s, sub)


def patch_sums_stride2(
    grid: Array,  # [G, G] f32 probabilities in [0, 1], multiples of 0.01
    ay: Array,  # [nA, B] int32 top row of the stride-2 span (candidate 0)
    ax: Array,  # [nA, B] int32 left col of the stride-2 span
    ok: Array,  # [nA, B] bool keep mask (False -> contributes nothing)
    s2: int,  # number of stride-2 shifts per axis (static)
) -> Array:
    """Summed stride-2 patches per angle: [nA, s2, s2] f32 (x100 sums)."""
    if _outside_trace():
        _roll_selfcheck()
    return _patch_sums_stride2_jit(grid, ay, ax, ok, s2)


def vmem_budget() -> int:
    """Per-core VMEM bytes the resident grid block may use.

    Every current TPU generation (v2-v5e) carries ~16 MB of VMEM per
    core; the v5e accepts single resident blocks up to ~16 MB (measured)
    and 14 MB leaves room for the patch accumulator and index arrays.
    ``TPUSLAM_VMEM_BUDGET`` (bytes) overrides for an atypical part —
    under-sizing it only shifts ``response_method='auto'`` to the
    XLA fft/patch paths, never changes results."""
    return int(os.environ.get("TPUSLAM_VMEM_BUDGET", 14 * 1024 * 1024))


def stride2_vmem_fits(g: int, s2: int, budget_bytes: int = 0) -> bool:
    """Whether the four bf16 parity subgrids (+ strips, padding) fit VMEM."""
    budget_bytes = budget_bytes or vmem_budget()
    rows, cols = _window(s2)
    g2 = (g + 1) // 2
    return (
        4 * _round_up(g2 + rows, _ROW_ALIGN) * _round_up(g2 + cols, _COL_ALIGN) * 2
        <= budget_bytes
    )


def vmem_fits(g: int, s: int, budget_bytes: int = 0) -> bool:
    """Whether the bf16 grid (+ landing strip, tile padding) fits VMEM."""
    budget_bytes = budget_bytes or vmem_budget()
    rows, cols = _window(s)
    return (
        _round_up(g + rows, _ROW_ALIGN) * _round_up(g + cols, _COL_ALIGN) * 2
        <= budget_bytes
    )
