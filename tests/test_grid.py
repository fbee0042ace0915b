import jax.numpy as jnp
import numpy as np

from tpuslam.core.grid import GridSpec


def test_world_map_roundtrip():
    g = GridSpec.centered(0.05, 128)
    pts = jnp.array([[0.0, 0.0], [1.0, -2.0], [-3.0, 0.5]], dtype=jnp.float32)
    back = g.map_to_world(g.world_to_map(pts))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_centered_origin():
    g = GridSpec.centered(0.1, 100)
    # world (0,0) sits at the map center
    m = g.world_to_map(jnp.zeros((2,)))
    np.testing.assert_allclose(m, [50.0, 50.0], atol=1e-5)


def test_coarsen():
    g = GridSpec.centered(0.05, 128)
    c = g.coarsen()
    assert c.resolution == 0.1 and c.size_x == 64
    # same world extent: corner cell maps consistently
    w = jnp.array([1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(c.map_to_world(c.world_to_map(w))), np.asarray(w), atol=1e-6
    )


def test_pose_transform_keeps_theta():
    g = GridSpec.centered(0.05, 64)
    pose = jnp.array([1.0, 2.0, 0.7], dtype=jnp.float32)
    mp = g.world_pose_to_map(pose)
    assert float(mp[2]) == np.float32(0.7)
    back = g.map_pose_to_world(mp)
    np.testing.assert_allclose(back, pose, atol=1e-5)


def test_in_bounds_and_flat_index():
    g = GridSpec.centered(0.05, 16)
    ix = jnp.array([0, 15, 16, -1])
    iy = jnp.array([0, 15, 2, 2])
    np.testing.assert_array_equal(
        np.asarray(g.in_bounds(ix, iy)), [True, True, False, False]
    )
    np.testing.assert_array_equal(np.asarray(g.flat_index(ix, iy)), [0, 255, 47, 32])


def test_centered_independent_start_fractions():
    """hector's mapStart x/y are independent (hector_slam.cc:143-145) —
    map_start_y must not silently follow map_start_x."""
    s = GridSpec.centered(0.05, 100, 0.5, 0.2)
    assert s.origin_x == -2.5
    assert abs(s.origin_y - (-1.0)) < 1e-12
