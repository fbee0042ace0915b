"""GMapping hit/visit counting grid + engine."""

import jax.numpy as jnp
import numpy as np

from tpuslam.core.config import GmappingConfig
from tpuslam.core.grid import GridSpec
from tpuslam.core.scan import make_scan
from tpuslam.io.simulate import rect_room, simulate_scan
from tpuslam.models import gmapping
from tpuslam.ops.counts import (
    CountGrid,
    accumulate_scan,
    gmapping_export,
    gmapping_occupancy,
    karto_export,
    zero_counts,
)

SPEC = GridSpec(resolution=1.0, size_x=32, size_y=32, origin_x=0.0, origin_y=0.0)


def acc(counts, endpoints, free_only=None, valid=None):
    endpoints = jnp.asarray(endpoints, jnp.float32)
    b = endpoints.shape[0]
    if free_only is None:
        free_only = jnp.zeros(b, bool)
    if valid is None:
        valid = jnp.ones(b, bool)
    return accumulate_scan(
        SPEC, counts, jnp.array([2.0, 4.0]), endpoints,
        jnp.asarray(free_only), jnp.asarray(valid), max_steps=64,
    )


def test_multiplicity_counts():
    # two identical beams: shared free cells visited twice, endpoint hit twice
    c = acc(zero_counts(SPEC), [[7.0, 4.0], [7.0, 4.0]])
    v, h = np.asarray(c.visits), np.asarray(c.hits)
    assert v[4, 4] == 2  # free cell crossed by both beams
    assert h[4, 7] == 2 and v[4, 7] == 2  # hit increments both
    occ = np.asarray(gmapping_occupancy(c))
    assert occ[4, 7] == 1.0 and occ[4, 4] == 0.0 and occ[10, 10] == -1.0


def test_free_only_no_hit():
    c = acc(zero_counts(SPEC), [[7.0, 4.0]], free_only=[True])
    assert np.asarray(c.hits).sum() == 0
    assert np.asarray(c.visits)[4, 4] == 1


def test_export_thresholds():
    c = CountGrid(
        hits=jnp.array([[0, 1, 3]], jnp.int32),
        visits=jnp.array([[0, 10, 10]], jnp.int32),
    )
    out = np.asarray(gmapping_export(c, occ_thresh=0.25))
    assert out.tolist() == [[-1, 0, 100]]
    k = np.asarray(karto_export(c, min_pass_through=2, occupancy_threshold=0.1))
    assert k.tolist() == [[-1, 0, 100]]


def test_engine_room_map():
    cfg = GmappingConfig(xmin=-6, ymin=-6, xmax=6, ymax=6, delta=0.1,
                         num_beams=360, ray_steps=256, maxUrange=10.0)
    segs = rect_room(8.0, 6.0)
    r, amin, ainc = simulate_scan(segs, np.zeros(3), num_beams=360, max_range=30.0)
    sc = make_scan(r, angle_min=amin, angle_increment=ainc,
                   range_min=0.1, range_max=30.0, num_beams=360)
    img = np.asarray(gmapping.map_from_scan(cfg, sc))
    spec = gmapping.make_spec(cfg)
    # wall at x=4, y=0
    mx = round((4.0 - spec.origin_x) / spec.resolution)
    my = round((0.0 - spec.origin_y) / spec.resolution)
    assert (img[my, mx - 1 : mx + 2] == 100).any()
    assert img[my, mx - 15] == 0  # free space before the wall
    assert img[my, mx + 15] == -1  # unknown behind the wall


def test_engine_clamps_long_beams():
    cfg = GmappingConfig(xmin=-16, ymin=-16, xmax=16, ymax=16, delta=0.5,
                         num_beams=4, ray_steps=128, maxRange=30.0, maxUrange=5.0)
    # one beam of 10 m: clamped to 5 m, free-only
    sc = make_scan(np.array([10.0, np.nan, np.nan, np.nan]),
                   angle_min=0.0, angle_increment=0.1)
    counts = gmapping.step(cfg, gmapping.init_counts(cfg),
                           jnp.zeros(3, jnp.float32), sc)
    assert int(np.asarray(counts.hits).sum()) == 0
    spec = gmapping.make_spec(cfg)
    v = np.asarray(counts.visits)
    my = round((0.0 - spec.origin_y) / spec.resolution)
    mx49 = round((4.9 - spec.origin_x) / spec.resolution)
    mx6 = round((6.0 - spec.origin_x) / spec.resolution)
    assert v[my, mx49 - 1] >= 1  # free up to ~5 m
    assert v[my, mx6] == 0  # nothing past the clamp


def test_map_from_scans_fold():
    cfg = GmappingConfig(xmin=-6, ymin=-6, xmax=6, ymax=6, delta=0.1,
                         num_beams=180, ray_steps=256)
    segs = rect_room(8.0, 6.0)
    poses = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.3], [0.0, 0.5, -0.3]])
    scans = []
    for p in poses:
        r, amin, ainc = simulate_scan(segs, p, num_beams=180, max_range=30.0)
        scans.append(make_scan(r, angle_min=amin, angle_increment=ainc,
                               range_min=0.1, range_max=30.0, num_beams=180))
    import jax

    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    counts = gmapping.map_from_scans(cfg, jnp.asarray(poses, jnp.float32), batched)
    occ = np.asarray(gmapping_occupancy(counts))
    assert (occ >= -1).all() and (occ <= 1).all()
    assert (occ > 0.5).sum() > 50  # walls present
