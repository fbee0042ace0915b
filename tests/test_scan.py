import jax.numpy as jnp
import numpy as np

from tpuslam.core.scan import clip_ranges, make_scan, scan_to_points


def test_make_scan_masks_invalid():
    ranges = [1.0, np.nan, np.inf, 0.05, 40.0, 2.0]
    scan = make_scan(
        ranges, angle_min=-1.0, angle_increment=0.1, range_min=0.1, range_max=30.0
    )
    valid = np.asarray(scan.valid)
    np.testing.assert_array_equal(valid, [True, False, False, False, False, True])
    # masked beams carry 0 range so downstream math stays finite
    assert np.all(np.isfinite(np.asarray(scan.ranges)))
    assert float(scan.ranges[1]) == 0.0


def test_make_scan_pad_truncate():
    scan = make_scan([1.0, 2.0, 3.0], 0.0, 0.1, num_beams=5)
    assert scan.num_beams == 5
    assert not bool(scan.valid[3]) and not bool(scan.valid[4])
    scan2 = make_scan([1.0, 2.0, 3.0], 0.0, 0.1, num_beams=2)
    assert scan2.num_beams == 2


def test_polar_to_cart():
    scan = make_scan([1.0, 2.0], angle_min=0.0, angle_increment=np.pi / 2)
    pts, valid = scan_to_points(scan)
    np.testing.assert_allclose(pts[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[1], [0.0, 2.0], atol=1e-6)
    assert bool(valid.all())


def test_clip_ranges():
    scan = make_scan([1.0, 26.0], angle_min=0.0, angle_increment=0.1)
    clipped = clip_ranges(scan, 25.0)
    assert bool(clipped.valid[0]) and not bool(clipped.valid[1])
    assert float(clipped.ranges[1]) == 0.0


def test_stamps_follow_time_increment():
    scan = make_scan([1.0] * 4, 0.0, 0.1, time_increment=0.01)
    np.testing.assert_allclose(scan.stamps, [0.0, 0.01, 0.02, 0.03], atol=1e-7)


def test_batched_ranges():
    r = np.ones((3, 8))
    scan = make_scan(r, 0.0, 0.1)
    pts, valid = scan_to_points(scan)
    assert pts.shape == (3, 8, 2)
    assert valid.shape == (3, 8)
