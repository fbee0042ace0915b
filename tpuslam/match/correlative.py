"""Karto-style correlative scan matcher (lesson6's hottest loop).

Behavioral contract (reference: lesson6/lib/open_karto/src/Mapper.cpp:119-856
ScanMatcher + Karto.h:6233-6555 GridIndexLookup + Mapper.h:971-1101
CorrelationGrid):

- correlation grid side = round(search_dim/res)+1 + 2*ceil(range_threshold/res)
  cells (odd), centered on the search pose (Mapper.cpp:147-160, 219-228),
- base scans stamp occupied cells (value 100/100) with a Gaussian max-combine
  smear of half-size round(2*sigma/res) and values round(exp(-d^2/2sigma^2)*100)
  (Mapper.h:1032-1101); stamping applies a viewpoint visibility filter
  (FindValidPoints, Mapper.cpp:758-817),
- per-angle lookup offsets: the scan's sensor-frame points rotated by each
  ABSOLUTE candidate angle and quantized to whole cells (Karto.h:6409-6501) —
  position candidates then shift by whole cells, so one quantization serves
  the whole (y, x) lattice,
- response(y, x, a) = mean of grid values at the offset cells
  (GetResponse, Mapper.cpp:819-856); off-grid points contribute 0 but stay
  in the denominator,
- optional distance/angle penalties ``max(min_penalty, 1 - 0.2 d^2/var)``
  (Mapper.cpp:399-414),
- best poses averaged over all response ties, circular mean for heading
  (Mapper.cpp:455-487),
- two-pass: coarse at 2x resolution over the full window, then fine at 1x
  over ±(coarse res)/2 and ±(coarse angle res)/2 (MatchScan 219-291); if the
  coarse response is exactly 0 and response expansion is on, the angle window
  retries at +20/40/60 deg (242-272),
- positional covariance from response-weighted second moments over the
  best-response-per-cell search-space grid (535-639); angular covariance from
  the angle responses at the best cell (641-692).

TPU-native shape: the triple loop is one vectorized gather
``grid_flat[cand_cell + offset(a, p)]`` reduced over points — no lookup
tables, no sequential search.  Everything static-shaped from the config.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core import se2

Array = jax.Array

MAX_VARIANCE = 500.0  # Mapper.cpp MAX_VARIANCE
DISTANCE_PENALTY_GAIN = 0.2
ANGLE_PENALTY_GAIN = 0.2


@dataclasses.dataclass(frozen=True)
class CorrelativeSpec:
    """Static geometry of one correlative matcher (sequential or loop)."""

    resolution: float
    search_dim: float  # search_space_dimension (meters)
    smear_deviation: float
    range_threshold: float
    coarse_angle_offset: float = 0.349
    coarse_angle_resolution: float = 0.0349
    fine_angle_offset: float = 0.00349
    # penalty variances carry the UNSQUARED reference/YAML-facing values
    # (0.3 m, 20 deg); the reference squares them at set-time
    # (Mapper.cpp:1921-1926 setParam* applies math::Square) and consumes the
    # squared value (Mapper.cpp:399-414) — we square at consumption instead
    distance_variance_penalty: float = 0.3
    angle_variance_penalty: float = 0.349
    minimum_distance_penalty: float = 0.5
    minimum_angle_penalty: float = 0.9
    use_response_expansion: bool = True
    # True (default) reproduces GetResponse's exact normalization: the
    # reference's lookup arrays hold one entry per RAW beam (the matcher
    # consumes the UNFILTERED point readings, Karto.h:5336-5355) and the
    # denominator is that total count, NaN/out-of-range beams included
    # (Mapper.cpp:819-856) — the accept/reject thresholds (0.35/0.45
    # outdoor) were tuned by the reference under this normalization, so
    # lossy scans must depress responses the same way.  False divides by
    # the valid-beam count (stronger on lossy scans, but renders the
    # reference's thresholds incomparable).  NOTE under True the static
    # beam axis must equal the lidar's true beam count (size
    # ``num_beams`` to the device, as the reference's
    # m_NumberOfRangeReadings does) — padding beams would deflate
    # responses.
    count_invalid_in_denominator: bool = True
    # the lidar's TRUE beam count (the reference's m_NumberOfRangeReadings).
    # None = the static beam axis length.  Set this whenever scans are
    # PADDED beyond the lidar's beam count (make_scan num_beams > the real
    # reading count): under count_invalid_in_denominator the padding would
    # otherwise inflate the denominator and deflate every response below
    # the tuned accept thresholds.
    num_readings: int | None = None
    # response-surface computation:
    # - "patch" sums per-point grid slices (dynamic-slice gathers; the only
    #   layout that is fast on CPU),
    # - "conv" stamps a per-angle point-count indicator and cross-correlates
    #   it with the integer grid on the MXU (lax.conv, HIGHEST precision) —
    #   the fast TPU path for sequential-size windows (gathers on TPU run
    #   ~1 us per slice, so "patch" is latency-bound there),
    # - "fft" cross-correlates via rfft2 (memory-flat, wins at 15 m loop
    #   windows where the conv kernel FLOPs explode),
    # - "auto" picks per backend and size.
    # All three are numerically EXACT and identical: grid values are
    # multiples of 0.01, so conv/FFT sums scaled by 100 are integers < 2^24
    # and are rounded back to the lattice, preserving the reference's
    # response-tie averaging.
    response_method: str = "auto"

    # ---- derived static sizes (Mapper.cpp:147-160) ----
    @property
    def search_side(self) -> int:
        return int(round(self.search_dim / self.resolution)) + 1

    @property
    def margin(self) -> int:
        return int(math.ceil(self.range_threshold / self.resolution))

    @property
    def grid_size(self) -> int:
        return self.search_side + 2 * self.margin

    @property
    def half_kernel(self) -> int:
        return int(round(2.0 * self.smear_deviation / self.resolution))

    def _axis(self, offset: float, step: float) -> np.ndarray:
        n = int(round(offset * 2.0 / step)) + 1
        return -offset + step * np.arange(n)

    def coarse_xy(self) -> np.ndarray:
        off = 0.5 * (self.search_side - 1) * self.resolution
        return self._axis(off, 2.0 * self.resolution)

    def fine_xy(self) -> np.ndarray:
        return self._axis(self.resolution, self.resolution)

    def coarse_angles(self, extra: float = 0.0) -> np.ndarray:
        return self._axis(
            self.coarse_angle_offset + extra, self.coarse_angle_resolution
        )

    def fine_angles(self) -> np.ndarray:
        # the reference swaps the roles in the fine call (Mapper.cpp:274-282):
        # offset = coarse_angle_resolution/2, step = fine_search_angle_offset
        return self._axis(
            0.5 * self.coarse_angle_resolution, self.fine_angle_offset
        )


class CorrelativeResult(NamedTuple):
    pose: Array  # [3] best (averaged) pose
    response: Array  # [] best response in [0, 1]
    covariance: Array  # [3, 3]


def find_valid_points(
    pts: Array, valid: Array, viewpoint: Array, *, parallel: bool = False
) -> Array:
    """Viewpoint visibility filter (Mapper.cpp:758-817).

    A point is kept iff the next 'decision point' at >= 0.1 m from the
    rolling anchor sees the surface from the correct side (counterclockwise
    winding w.r.t. the viewpoint).  pts: [B, 2] world points.

    Two EXACT formulations of the reference's trailing-iterator loop,
    bit-identical to each other (fuzz-verified on hardware incl.
    all-invalid and sub-0.1 m-cluster scans):

    - ``parallel=False``: the direct port — two B-step ``lax.scan``s.
      Serial in B but constant in the vmap width, so it stays cheap when
      vmapped over a long base chain (the 128-scan loop matcher).
    - ``parallel=True``: O(log B) parallel steps.  The decision chain is
      the orbit of a parallel-computable pointer — next(i) = first j > i
      with valid[j] and ||pts[j] - pts[i]||^2 > 0.1^2 (if a decision
      fires at i, making pts[i] the anchor, the following decision fires
      exactly at next(i)) — so: compute next[] for every i at once
      (blocked all-pairs distances), mark the orbit of the first anchor
      by pointer doubling (log2 B scatter rounds), read each decision's
      anchor off the chain, and propagate each keep verdict backward
      with a reverse min-scan.  8x faster standalone at B=1081, but its
      [block, B] all-pairs transient scales with the vmap width — the
      caller picks it when S*B^2 is small (match_scan's rule).  Every
      comparison evaluates the same f32 expressions on the same operands
      as the scan version, hence bit-identical masks."""
    min_sq = 0.01

    # the reference seeds with the first FINITE point (its point-readings
    # vector holds only valid beams, Karto.h:5404-5434); invalid beams here
    # hold range 0 so pts[0] may be the sensor origin — anchor on the first
    # valid point instead
    if not parallel:
        first0 = pts[jnp.argmax(valid)]

        def fwd(carry, inp):
            first = carry
            p, v = inp
            delta = first - p
            decide = (jnp.sum(delta * delta) > min_sq) & v
            a = viewpoint[1] - first[1]
            b = first[0] - viewpoint[0]
            c = first[1] * viewpoint[0] - first[0] * viewpoint[1]
            ss = p[0] * a + p[1] * b + c
            keep = ss >= 0.0
            new_first = jnp.where(decide, p, first)
            return new_first, (decide, keep)

        # NOTE: unroll=16 measured 27% faster standalone on v5e but blew
        # the Mosaic/XLA compile of the big vmapped karto programs past
        # 10 min (16x program bloat under vmap x chains x batch) — keep
        # unroll=1
        _, (decide, keep_at_decision) = jax.lax.scan(
            fwd, first0, (pts, valid)
        )

        # point i is emitted by the first decision strictly AFTER i
        def bwd(carry, inp):
            nxt_keep = carry
            d, k = inp
            out = nxt_keep  # the decision after me decides my fate
            new = jnp.where(d, k, nxt_keep)
            return new, out

        _, kept = jax.lax.scan(
            bwd,
            jnp.zeros((), bool),
            (decide, keep_at_decision),
            reverse=True,
        )
        return kept & valid

    B = pts.shape[0]
    iota = jnp.arange(B, dtype=jnp.int32)
    i0 = jnp.argmax(valid).astype(jnp.int32)

    # next[i]: first j > i that is valid and farther than 0.1 m from
    # pts[i]; B if none.  Blocked rows keep the all-pairs transient at
    # [block, B].  (A banded while_loop variant was measured and
    # rejected: vmapped while_loop lowering took minutes and TPU gathers
    # ran 20x slower than these dense blocks.)
    blocks = []
    rb = 128
    for s in range(0, B, rb):
        e = min(s + rb, B)
        delta = pts[s:e, None, :] - pts[None, :, :]
        d2 = jnp.sum(delta * delta, axis=-1)  # [e-s, B]
        ok = (iota[None, :] > iota[s:e, None]) & valid[None, :] & (
            d2 > min_sq
        )
        blocks.append(
            jnp.where(jnp.any(ok, axis=1), jnp.argmax(ok, axis=1), B).astype(
                jnp.int32
            )
        )
    nxt = jnp.concatenate([jnp.concatenate(blocks), jnp.full(1, B, jnp.int32)])

    # decision set = orbit {next[i0], next^2[i0], ...} by pointer doubling:
    # after k rounds r holds next^m[i0] for all 1 <= m <= 2^k.  Index B is
    # the chain terminator (self-loop).
    r = jnp.zeros(B + 1, bool).at[nxt[i0]].set(valid[i0])
    ptr = nxt
    for _ in range(max(1, math.ceil(math.log2(max(B, 2))))):
        r = r | jnp.zeros_like(r).at[ptr].max(r)
        ptr = ptr[ptr]
    decide = r[:B]

    # each decision's anchor = its chain predecessor ({i0} U orbit); next
    # is strictly increasing so the predecessor on the chain is unique and
    # a scatter-max never collides except on the B terminator
    src = decide | (iota == i0)
    tgt = jnp.where(src, nxt[:B], B)
    anchor = jnp.zeros(B + 1, jnp.int32).at[tgt].max(iota)[:B]

    # side-of-line verdict at each decision, against ITS anchor — the same
    # f32 expression the sequential loop evaluates
    fa = pts[anchor]
    a = viewpoint[1] - fa[:, 1]
    b = fa[:, 0] - viewpoint[0]
    c = fa[:, 1] * viewpoint[0] - fa[:, 0] * viewpoint[1]
    keep_d = pts[:, 0] * a + pts[:, 1] * b + c >= 0.0

    # point i is emitted by the first decision STRICTLY after i: reverse
    # running-min of decision indices, shifted by one
    cand = jnp.where(decide, iota, B)
    nd = jax.lax.associative_scan(jnp.minimum, cand, reverse=True)
    nd_strict = jnp.concatenate([nd[1:], jnp.full(1, B, jnp.int32)])
    keep_ext = jnp.concatenate([keep_d, jnp.zeros(1, bool)])
    return keep_ext[nd_strict] & valid


def _smear_kernel(spec: CorrelativeSpec) -> np.ndarray:
    """Quantized Gaussian (Mapper.h:1058-1090): round(exp(-d^2/2s^2)*100)/100."""
    h = spec.half_kernel
    ii, jj = np.mgrid[-h : h + 1, -h : h + 1]
    d = np.hypot(ii * spec.resolution, jj * spec.resolution)
    z = np.exp(-0.5 * (d / spec.smear_deviation) ** 2)
    return np.round(z * 100.0) / 100.0


def _separable_smear_factors(spec: CorrelativeSpec) -> np.ndarray | None:
    """1-D factors e_i with round(100*e_i*e_j) == the reference kernel, if
    they reproduce it EXACTLY; else None.

    The Gaussian separates multiplicatively (exp(-(i^2+j^2)/2s^2) =
    e_i * e_j) and round() is monotone non-decreasing, so
    ``round(100 * max_stamps(e_i * e_j)) == max_stamps(round(100 e_i e_j))``
    — the dense (2h+1)^2 max-combine collapses to two 1-D passes with ONE
    final rounding, bit-identical to the reference table whenever every
    f32 product rounds to the same integer as the reference's f64
    hypot-based value (validated here per entry; a half-integer boundary
    case falls back to the dense kernel).  This is a large win: the 15 m
    loop matcher's 13x13 smear was 169 shifted max passes over a 1151^2
    grid — the single biggest cost of a loop MatchScan."""
    h = spec.half_kernel
    if h == 0:
        return None
    i = np.arange(-h, h + 1, dtype=np.float64)
    e = np.exp(-0.5 * (i * spec.resolution) ** 2 / spec.smear_deviation**2)
    want = np.round(_smear_kernel(spec) * 100.0)
    # device computes in f32: validate the f32 products round identically
    e32 = e.astype(np.float32)
    prod32 = (e32[:, None] * e32[None, :]).astype(np.float32)
    got = np.round(prod32.astype(np.float64) * 100.0)
    if not np.array_equal(got, want):
        return None
    return e32


@partial(jax.jit, static_argnames=("spec",))
def build_correlation_grid(
    spec: CorrelativeSpec,
    center_xy: Array,
    base_pts: Array,  # [S, B, 2] world points of base scans (or [B, 2])
    base_valid: Array,
) -> Array:
    """Stamp + smear base scan points into the [G, G] correlation grid.

    Grid cell (0,0) sits at ``center - 0.5*(G-1)*res`` (Mapper.cpp:219-228).
    Returns float grid in [0, 1] (the byte grid / 100)."""
    g = spec.grid_size
    res = spec.resolution
    origin = center_xy - 0.5 * (g - 1) * res

    pts = base_pts.reshape(-1, 2)
    valid = base_valid.reshape(-1)
    cells = jnp.floor((pts - origin) / res + 0.5).astype(jnp.int32)
    ix, iy = cells[:, 0], cells[:, 1]
    inb = (ix >= 0) & (ix < g) & (iy >= 0) & (iy < g) & valid
    flat = jnp.where(inb, iy * g + ix, g * g)

    occ = (
        jnp.zeros((g * g,), jnp.float32)
        .at[flat]
        .max(1.0, mode="drop")
        .reshape(g, g)
    )

    kernel = _smear_kernel(spec)
    h = spec.half_kernel
    if h == 0:
        return occ

    sep = _separable_smear_factors(spec)
    if sep is not None:
        # two 1-D max passes + ONE final rounding — bit-identical to the
        # dense (2h+1)^2 combine (see _separable_smear_factors)
        padr = jnp.pad(occ, ((h, h), (0, 0)))
        m1 = occ
        for di in range(-h, h + 1):
            if di == 0:
                continue
            shifted = jax.lax.dynamic_slice(padr, (h + di, 0), (g, g))
            m1 = jnp.maximum(m1, shifted * float(sep[di + h]))
        padc = jnp.pad(m1, ((0, 0), (h, h)))
        out = m1
        for dj in range(-h, h + 1):
            if dj == 0:
                continue
            shifted = jax.lax.dynamic_slice(padc, (0, h + dj), (g, g))
            out = jnp.maximum(out, shifted * float(sep[dj + h]))
        # one final rounding to the 0.01 lattice.  XLA lowers /100.0 to a
        # reciprocal multiply, leaving some cells 1 ulp below f32(k/100) —
        # harmless: every response path re-quantizes via round(grid*100)
        # (an exact-value table gather here measured ~9 ms on the 15 m
        # loop grid, swamping the smear savings)
        return jnp.round(out * 100.0) / 100.0

    pad = jnp.pad(occ, h)
    out = occ
    for di in range(-h, h + 1):
        for dj in range(-h, h + 1):
            kv = float(kernel[di + h, dj + h])
            if kv <= 0.0:
                continue
            shifted = jax.lax.dynamic_slice(pad, (h + di, h + dj), (g, g))
            out = jnp.maximum(out, shifted * kv)
    return out


def _correlate(
    spec: CorrelativeSpec,
    grid: Array,  # [G, G]
    grid_center: Array,  # [2] xy the grid was STAMPED around (fixed per match)
    center_pose: Array,  # [3] search center (fine pass recenters on the coarse mean)
    local_pts: Array,  # [B, 2] scan points in the SENSOR frame
    valid: Array,  # [B]
    xy_offsets: np.ndarray,  # static candidate offsets (meters)
    angle_offsets,  # [nA] candidate angle offsets (rad); np or traced Array
    penalize: bool,
    angle_mask: Array | None = None,  # [nA] False = padding entry (ignored)
):
    """Dense response tensor [nY, nX, nA] + tie-averaged best pose."""
    g = spec.grid_size
    res = spec.resolution
    origin = grid_center - 0.5 * (g - 1) * res

    angs = center_pose[2] + jnp.asarray(angle_offsets, jnp.float32)  # [nA]
    c, s = jnp.cos(angs), jnp.sin(angs)
    px, py = local_pts[:, 0], local_pts[:, 1]
    rx = c[:, None] * px[None, :] - s[:, None] * py[None, :]  # [nA, B]
    ry = s[:, None] * px[None, :] + c[:, None] * py[None, :]
    # whole-cell offsets, shared by every (y, x) candidate (Karto.h:6473-6495)
    ox = jnp.floor(rx / res + 0.5).astype(jnp.int32)
    oy = jnp.floor(ry / res + 0.5).astype(jnp.int32)

    xs = jnp.asarray(xy_offsets, jnp.float32)
    cand_x = jnp.floor((center_pose[0] + xs - origin[0]) / res + 0.5).astype(
        jnp.int32
    )  # [nX]
    cand_y = jnp.floor((center_pose[1] + xs - origin[1]) / res + 0.5).astype(
        jnp.int32
    )  # [nY] (same offsets both axes, as in the reference)

    # Response via PATCH ACCUMULATION instead of per-candidate gathers (TPU
    # random gathers from an HBM-resident grid run ~100x below DMA rate):
    # for each (angle, point) take one contiguous [S, S] slice of the grid
    # centered at the point's base cell and SUM over points — the summed
    # patch IS the response surface over every integer (y, x) shift, from
    # which the candidate lattice is read out.  Identical numerics; points
    # whose whole patch leaves the grid are dropped (the reference's margin
    # sizing guarantees in-range points never do, Mapper.cpp:150-156).
    if spec.count_invalid_in_denominator:
        denom = jnp.float32(spec.num_readings or valid.shape[0])
    else:
        denom = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    base_x = jnp.floor((center_pose[0] - origin[0]) / res + 0.5).astype(
        jnp.int32
    )
    base_y = jnp.floor((center_pose[1] - origin[1]) / res + 0.5).astype(
        jnp.int32
    )
    half = int(round(float(np.max(np.abs(xy_offsets))) / res)) + 1
    size = 2 * half + 1

    n_angles = oy.shape[0]
    b = local_pts.shape[0]

    patch_bytes = n_angles * b * size * size * 4
    method = spec.response_method
    if method == "auto":
        if jax.default_backend() == "tpu":
            # TPU: per-slice gathers are latency-bound (~1.2 us each) — use
            # the VMEM-resident Pallas kernel whenever the grid fits,
            # falling back to the size rule below for oversized grids
            from tpuslam.ops.pallas_correlative import vmem_fits

            if vmem_fits(g, size):
                method = "pallas"
        if method == "auto":  # cpu/gpu, or grid too big for VMEM
            method = "fft" if patch_bytes > 192 * 1024 * 1024 else "patch"

    if method == "pallas":
        from tpuslam.ops.pallas_correlative import (
            patch_sums_pallas,
            patch_sums_stride2,
            stride2_vmem_fits,
        )

        ay = base_y + oy - half  # [nA, B] patch top-left
        ax = base_x + ox - half
        ok = valid[None, :] & (ay >= 0) & (ax >= 0) & (ay + size <= g) & (
            ax + size <= g
        )
        dyc = half + (cand_y - base_y)
        dxc = half + (cand_x - base_x)

        # Coarse searches read the response at a STRIDE-2 candidate
        # lattice (coarse_xy steps 2*resolution, Mapper.cpp:219-240) —
        # summing full patches computes 4x the needed shifts.  At loop
        # scale (size >= 40: the 4 m / 15 m windows; sequential windows
        # are excluded to keep the fused batch programs single-kernel)
        # take the parity-split stride-2 kernel instead, guarded by a
        # runtime uniformity check on the candidate cells: cand cells are
        # floor-quantized per candidate exactly as the reference does, so
        # a half-cell float boundary can in principle break the +2
        # progression — the lax.cond then falls back to the full kernel,
        # keeping the result bit-identical to the readout path always.
        steps = np.diff(np.asarray(xy_offsets, np.float64))
        ny = len(xy_offsets)
        use_stride2 = (
            ny >= 2
            and size >= 40
            and np.allclose(steps, 2.0 * res, rtol=0, atol=1e-6 * res)
            and stride2_vmem_fits(g, ny)
        )
        if use_stride2:
            k2 = jnp.arange(ny, dtype=dyc.dtype)
            uniform = (
                jnp.all(dyc == dyc[0] + 2 * k2)
                & jnp.all(dxc == dxc[0] + 2 * k2)
                & (dyc[0] >= 0)
                & (dxc[0] >= 0)
                & (dyc[-1] <= size - 1)
                & (dxc[-1] <= size - 1)
            )

            # both branches return the 0.01-scaled surface and the /denom
            # happens OUTSIDE the cond: with `* 0.01 / denom` adjacent in
            # one computation, XLA's algebraic simplifier folds them into
            # `* (0.01/denom)` — a 1-ulp deviation from the fft/patch
            # paths' separated mul..div (caught by tests_tpu at the 8 m
            # loop spec).  The cond boundary pins the op order.
            def _stride2(_):
                p2 = patch_sums_stride2(grid, ay + dyc[0], ax + dxc[0], ok, ny)
                return p2 * 0.01

            def _full(_):
                ay_s = jnp.where(ok, ay, g)
                ax_s = jnp.where(ok, ax, 0)
                patches = patch_sums_pallas(grid, ay_s, ax_s, size) * 0.01
                return patches[:, dyc[:, None], dxc[None, :]]

            resp = jax.lax.cond(uniform, _stride2, _full, None) / denom
        else:
            # dropped points read the kernel's zero landing strip at row g
            ay = jnp.where(ok, ay, g)
            ax = jnp.where(ok, ax, 0)
            patches = patch_sums_pallas(grid, ay, ax, size) * 0.01
            resp = patches[:, dyc[:, None], dxc[None, :]] / denom
        return _finish_correlate(
            spec, resp, center_pose, xs, angs, angle_offsets, penalize,
            angle_mask,
        )

    if method == "conv":
        # Cross-correlation on the MXU: stamp a per-angle point-count
        # indicator (same construction as the FFT path) and convolve it
        # with the integer grid; the [nA, S, S] output is the summed-patch
        # response surface at every candidate shift.  Counts are <= B and
        # grid ints <= 100, so every sum is an integer < 2^24 — a
        # HIGHEST-precision f32 conv reproduces patch/FFT numerics exactly.
        # Measured (v5e): 2.3x faster than "patch" standalone, but 18x
        # SLOWER inside the karto lax.scan batch program (XLA lowers the
        # G x G-kernel conv badly under a loop), so "auto" never picks it;
        # kept as an explicit opt-in for standalone/batched matching.
        iy = base_y + oy  # [nA, B] absolute grid cells of the scan points
        ix = base_x + ox
        ok = valid[None, :] & (iy >= 0) & (ix >= 0) & (iy < g) & (ix < g)
        flat = jnp.where(ok, iy * g + ix, g * g)
        ind = jax.vmap(
            lambda f: jnp.zeros((g * g,), jnp.float32)
            .at[f]
            .add(1.0, mode="drop")
        )(flat).reshape(n_angles, 1, g, g)
        gridi = jnp.round(grid * 100.0)
        gpad = jnp.pad(gridi, half)[None, None]
        out = jax.lax.conv_general_dilated(
            gpad,
            ind,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )[0]  # [nA, S, S]
        patches = jnp.round(out) * 0.01
        dyc = half + (cand_y - base_y)
        dxc = half + (cand_x - base_x)
        resp = patches[:, dyc[:, None], dxc[None, :]] / denom
        return _finish_correlate(
            spec, resp, center_pose, xs, angs, angle_offsets, penalize,
            angle_mask,
        )

    if method == "fft":
        # Cross-correlation via FFT: response_sum(dy, dx) =
        #   sum_p grid[p_cell + (dy, dx)]
        # == correlate(point_indicator, grid) read at the candidate shifts.
        # The grid holds multiples of 0.01 (the quantized smear kernel), so
        # scaling by 100 makes every true sum an integer <= 100*B < 2^24;
        # rounding the FFT output to the nearest integer restores EXACT
        # patch-accumulation numerics (ties average identically).
        n_fft = _fft_size(g + half + 1)
        iy = base_y + oy  # [nA, B] absolute grid cells of the scan points
        ix = base_x + ox
        ok = valid[None, :] & (iy >= 0) & (ix >= 0) & (iy < g) & (ix < g)
        flat = jnp.where(ok, iy * n_fft + ix, n_fft * n_fft)
        ind = jnp.zeros((n_angles, n_fft * n_fft), jnp.float32)
        ind = jax.vmap(lambda z, f: z.at[f].add(1.0, mode="drop"))(ind, flat)
        ind = ind.reshape(n_angles, n_fft, n_fft)
        gridi = jnp.round(grid * 100.0)
        gf = jnp.fft.rfft2(gridi, (n_fft, n_fft))
        corr = jnp.fft.irfft2(
            jnp.conj(jnp.fft.rfft2(ind)) * gf[None], (n_fft, n_fft)
        )  # [nA, N, N]; corr[a, dy % N, dx % N] = sum at shift (dy, dx)
        shifts = (jnp.arange(-half, half + 1)) % n_fft
        patches = corr[:, shifts[:, None], shifts[None, :]]
        patches = jnp.round(patches) * 0.01
        dyc = half + (cand_y - base_y)
        dxc = half + (cand_x - base_x)
        resp = patches[:, dyc[:, None], dxc[None, :]] / denom
        return _finish_correlate(
            spec, resp, center_pose, xs, angs, angle_offsets, penalize,
            angle_mask,
        )

    def slice_sum(oy_f, ox_f, valid_f):
        """Masked sum of [S, S] grid slices for a flat batch of anchors."""
        ay = base_y + oy_f - half
        ax = base_x + ox_f - half
        ok = valid_f & (ay >= 0) & (ax >= 0) & (ay + size <= g) & (
            ax + size <= g
        )
        ayc = jnp.clip(ay, 0, g - size)
        axc = jnp.clip(ax, 0, g - size)
        sl = jax.vmap(
            lambda yy, xx: jax.lax.dynamic_slice(grid, (yy, xx), (size, size))
        )(ayc, axc)
        return ok, sl

    # one big batched slice-gather when the intermediate fits comfortably;
    # per-angle otherwise (the 15 m loop matcher's S≈300 patches are large)
    if n_angles * b * size * size * 4 <= 256 * 1024 * 1024:
        ok, sl = slice_sum(
            oy.reshape(-1), ox.reshape(-1), jnp.tile(valid, (n_angles,))
        )
        w = ok.astype(grid.dtype).reshape(n_angles, b)
        # HIGHEST: TPU matmuls default to bf16 passes, whose ~0.4% response
        # error flips tie sets; the reduction is gather-bound so exactness
        # here is free
        patches = jnp.einsum(
            "ap,apij->aij", w, sl.reshape(n_angles, b, size, size),
            precision=jax.lax.Precision.HIGHEST,
        )
    else:

        def one_angle(off):
            oy_a, ox_a = off
            ok, sl = slice_sum(oy_a, ox_a, valid)
            return jnp.einsum(
                "p,pij->ij", ok.astype(grid.dtype), sl,
                precision=jax.lax.Precision.HIGHEST,
            )

        patches = jax.lax.map(one_angle, (oy, ox))  # [nA, S, S]

    # snap the summed patches back to the exact integer lattice (grid
    # values are multiples of 0.01, so 100x sums are integers < 2^24).
    # This is NOT cosmetic: XLA may duplicate the einsum reduction into
    # different fusions for different consumers (the max and the tie
    # comparison), and f32 reassociation can then disagree by > the 1e-9
    # tie tolerance — observed on CPU at loop-window sizes, where it
    # EMPTIED the tie set and collapsed the averaged pose to zeros.  The
    # fft/conv paths already round for the same reason.
    patches = jnp.round(patches * 100.0) * 0.01

    # read the candidate lattice out of the response surfaces
    dyc = half + (cand_y - base_y)  # [nY] indices into the patch
    dxc = half + (cand_x - base_x)
    resp = patches[:, dyc[:, None], dxc[None, :]] / denom  # [nA, nY, nX]
    return _finish_correlate(
        spec, resp, center_pose, xs, angs, angle_offsets, penalize, angle_mask
    )


def _fft_size(n: int) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) size >= n for fast FFTs."""
    best = 1
    while best < n:
        best *= 2
    m = best
    p3 = 1
    while p3 <= best:
        p5 = 1
        while p3 * p5 <= best:
            p2 = 1
            while p2 * p3 * p5 < n:
                p2 *= 2
            cand = p2 * p3 * p5
            if n <= cand < m:
                m = cand
            p5 *= 5
        p3 *= 3
    return m


def _finish_correlate(
    spec: CorrelativeSpec,
    resp: Array,  # [nA, nY, nX] normalized responses
    center_pose: Array,
    xs: Array,  # [nXY] candidate offsets (meters)
    angs: Array,  # [nA] absolute candidate angles
    angle_offsets,
    penalize: bool,
    angle_mask: Array | None = None,
):
    """Penalties + tie-averaged best pose (shared by patch and fft paths)."""
    if angle_mask is not None:
        # padding angles (added to make nA divide a mesh axis) are removed
        # from the search with a -1 sentinel: true responses are >= 0, so
        # they never win the max, never join the tie set, and never clear
        # the >= best - 0.1 covariance-weight threshold
        resp = jnp.where(angle_mask[:, None, None], resp, -1.0)
    resp = jnp.moveaxis(resp, 0, -1)  # [nY, nX, nA]

    if penalize:
        d2 = (xs[:, None] ** 2 + xs[None, :] ** 2)[..., None]  # [nY, nX, 1]
        dist_pen = jnp.maximum(
            1.0
            - DISTANCE_PENALTY_GAIN * d2 / spec.distance_variance_penalty**2,
            spec.minimum_distance_penalty,
        )
        a2 = jnp.asarray(angle_offsets, jnp.float32) ** 2
        ang_pen = jnp.maximum(
            1.0 - ANGLE_PENALTY_GAIN * a2 / spec.angle_variance_penalty**2,
            spec.minimum_angle_penalty,
        )[None, None, :]
        resp = jnp.where(resp > 0.0, resp * dist_pen * ang_pen, resp)

    best = jnp.max(resp)
    # DoubleEqual tie set at the reference's KT_TOLERANCE (Math.h:41,138).
    # The tolerance must stay >> 1 f32 ulp of a response (~6e-8): XLA may
    # recompute `resp` in different fusions for the max and the comparison
    # (reassociated sums / FMA contraction differ by ~1e-8), and a
    # tighter tolerance (1e-9, the old value) intermittently EMPTIES the
    # tie set under jit, collapsing the averaged pose to zeros.  True
    # distinct responses are >= 1/(B*100) ~ 1e-5 apart, so 1e-6 is safe
    # on both sides — and it is what the C++ groups by.
    tie = jnp.abs(resp - best) <= 1e-6
    nt = jnp.maximum(jnp.sum(tie), 1).astype(jnp.float32)
    gx = jnp.sum(tie * (center_pose[0] + xs[None, :, None])) / nt
    gy = jnp.sum(tie * (center_pose[1] + xs[:, None, None])) / nt
    th_x = jnp.sum(tie * jnp.cos(angs)[None, None, :]) / nt
    th_y = jnp.sum(tie * jnp.sin(angs)[None, None, :]) / nt
    mean = jnp.stack([gx, gy, jnp.arctan2(th_y, th_x)])
    return resp, best, mean


def _positional_covariance(
    spec: CorrelativeSpec,
    resp: Array,  # [nY, nX, nA] coarse responses
    best: Array,
    mean: Array,
    center_pose: Array,
    xy_offsets: np.ndarray,
) -> Array:
    """Mapper.cpp:535-639 over the best-per-cell search space probs."""
    sp = jnp.max(resp, axis=-1)  # [nY, nX] search-space probabilities
    xs = jnp.asarray(xy_offsets, jnp.float32)
    dx = mean[0] - center_pose[0]
    dy = mean[1] - center_pose[1]
    w = jnp.where(sp >= best - 0.1, sp, 0.0)
    norm = jnp.sum(w)
    xrel = xs[None, :] - dx
    yrel = xs[:, None] - dy
    vxx = jnp.sum(xrel * xrel * w)
    vxy = jnp.sum(xrel * yrel * w)
    vyy = jnp.sum(yrel * yrel * w)

    res_c = 2.0 * spec.resolution  # coarse search resolution
    ok = (norm > 1e-6) & (best >= 1e-6)
    norm_s = jnp.maximum(norm, 1e-9)
    mult = 1.0 / jnp.maximum(best, 1e-9)
    vxx = jnp.maximum(vxx / norm_s, 0.1 * res_c**2) * mult
    vyy = jnp.maximum(vyy / norm_s, 0.1 * res_c**2) * mult
    vxy = vxy / norm_s * mult

    vxx = jnp.where(ok & (vxx > 0), vxx, MAX_VARIANCE)
    vyy = jnp.where(ok & (vyy > 0), vyy, MAX_VARIANCE)
    vxy = jnp.where(ok, vxy, 0.0)
    cov = jnp.eye(3, dtype=jnp.float32)
    cov = cov.at[0, 0].set(vxx).at[0, 1].set(vxy)
    cov = cov.at[1, 0].set(vxy).at[1, 1].set(vyy)
    cov = cov.at[2, 2].set(4.0 * spec.coarse_angle_resolution**2)
    return cov


def _angular_covariance(
    spec: CorrelativeSpec,
    grid: Array,
    grid_center: Array,
    center_pose: Array,
    local_pts: Array,
    valid: Array,
    mean: Array,
    best: Array,
    angle_offsets,
    angle_mask: Array | None = None,
) -> Array:
    """Mapper.cpp:641-692: angle response sweep at the best position."""
    resp, _, _ = _correlate(
        spec,
        grid,
        grid_center,
        # sweep angles around the SEARCH CENTER heading at the best position
        jnp.stack([mean[0], mean[1], center_pose[2]]),
        local_pts,
        valid,
        np.zeros(1),
        angle_offsets,
        penalize=False,
        angle_mask=angle_mask,
    )
    r = resp[0, 0, :]  # [nA]
    angs = jnp.asarray(angle_offsets, jnp.float32)
    best_angle = se2.wrap_angle(mean[2] - center_pose[2])
    w = jnp.where(r >= best - 0.1, r, 0.0)
    norm = jnp.sum(w)
    acc = jnp.sum((angs - best_angle) ** 2 * w)
    var = jnp.where(
        norm > 1e-6,
        jnp.where(acc < 1e-6, spec.coarse_angle_resolution**2, acc)
        / jnp.maximum(norm, 1e-9),
        1000.0 * spec.coarse_angle_resolution**2,
    )
    return var


@partial(jax.jit, static_argnames=("spec", "penalize", "refine"))
def match_scan(
    spec: CorrelativeSpec,
    center_pose: Array,  # [3] search center = current pose estimate
    local_pts: Array,  # [B, 2] matching scan, sensor frame
    valid: Array,
    base_pts: Array,  # [S, B, 2] base scan points, WORLD frame
    base_valid: Array,
    *,
    penalize: bool = True,
    refine: bool = True,
) -> CorrelativeResult:
    """Full MatchScan: stamp grid, coarse search (+expansion), fine refine."""
    # visibility filter.  TPU: ONE Mosaic program walks every chain scan
    # with scans in lanes (ops/pallas_fvp.py — the vmapped lax.scan pays
    # ~1.5 us/step of loop overhead, 3.5 ms for a 128-scan loop chain vs
    # ~25 us in-kernel); selected by the same signal that guards the
    # response kernel: vmapped callers override response_method away from
    # "auto"/"pallas" (models/karto.py:1283, parallel/correlative.py:86)
    # and keep the XLA formulations below, which vmap legally.
    flat_pts = base_pts.reshape(-1, base_pts.shape[-2], 2)
    n_base, n_beams = flat_pts.shape[0], flat_pts.shape[1]
    flat_valid = base_valid.reshape(-1, base_valid.shape[-1])
    use_pallas_fvp = False
    if jax.default_backend() == "tpu" and spec.response_method in (
        "auto", "pallas"
    ):
        from tpuslam.ops.pallas_fvp import (
            find_valid_points_batch,
            vmem_fits_fvp,
        )

        use_pallas_fvp = vmem_fits_fvp(n_base, n_beams)
    if use_pallas_fvp:
        vp_valid = find_valid_points_batch(
            flat_pts, flat_valid, center_pose[:2]
        )
    else:
        # the O(log B) parallel formulation wins while the vmapped
        # all-pairs transient stays small (sequential windows, flush link
        # chains); long loop-closure chains keep the serial scan, whose
        # cost is constant in the vmap width (see find_valid_points)
        fvp_parallel = n_base * n_beams * n_beams <= 16_777_216
        vp_valid = jax.vmap(
            lambda p, v: find_valid_points(
                p, v, center_pose[:2], parallel=fvp_parallel
            )
        )(flat_pts, flat_valid)
    grid = build_correlation_grid(
        spec, center_pose[:2], base_pts, vp_valid.reshape(base_valid.shape)
    )

    grid_center = center_pose[:2]
    cxy = spec.coarse_xy()
    resp, best, mean = _correlate(
        spec, grid, grid_center, center_pose, local_pts, valid, cxy,
        spec.coarse_angles(), penalize
    )
    cov_pos = _positional_covariance(spec, resp, best, mean, center_pose, cxy)

    if spec.use_response_expansion:
        # retry ±20/40/60 deg wider angle windows while response == 0
        # (Mapper.cpp:242-272); under lax.cond so the common matched case
        # pays nothing for the three extra sweeps
        def expand(args):
            best_e, mean_e, cov_e = args
            for extra in (
                math.radians(20),
                math.radians(40),
                math.radians(60),
            ):
                angs = spec.coarse_angles(extra)
                resp_x, best_x, mean_x = _correlate(
                    spec, grid, grid_center, center_pose, local_pts, valid,
                    cxy, angs, penalize
                )
                cov_x = _positional_covariance(
                    spec, resp_x, best_x, mean_x, center_pose, cxy
                )
                use = best_e == 0.0
                best_e = jnp.where(use, best_x, best_e)
                mean_e = jnp.where(use, mean_x, mean_e)
                cov_e = jnp.where(use, cov_x, cov_e)
            return best_e, mean_e, cov_e

        best, mean, cov_pos = jax.lax.cond(
            best == 0.0, expand, lambda args: args, (best, mean, cov_pos)
        )

    if refine:
        fxy = spec.fine_xy()
        fang = spec.fine_angles()
        _, best_f, mean_f = _correlate(
            spec, grid, grid_center, mean, local_pts, valid, fxy, fang, penalize
        )
        var_th = _angular_covariance(
            spec, grid, grid_center, mean, local_pts, valid, mean_f, best_f, fang
        )
        cov = cov_pos.at[2, 2].set(var_th)
        return CorrelativeResult(pose=mean_f, response=best_f, covariance=cov)
    return CorrelativeResult(pose=mean, response=best, covariance=cov_pos)


def localize(
    spec: CorrelativeSpec,
    center_pose: Array,
    local_pts: Array,
    valid: Array,
    base_pts: Array,
    base_valid: Array,
) -> CorrelativeResult:
    """Global(ish) relocalization: find the scan's pose anywhere within
    ``spec.search_dim`` of ``center_pose`` — the karto loop matcher used as
    a standalone capability (new vs the reference, which only relocalizes
    implicitly during loop closure).  Use a large ``search_dim`` (e.g. the
    map extent) and a coarse ``resolution``; refine the result with the
    sequential matcher or hector GN."""
    return match_scan(
        spec, center_pose, local_pts, valid, base_pts, base_valid,
        penalize=False, refine=True,
    )
