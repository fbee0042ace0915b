"""FrameTree static extrinsics + upside-down laser detection."""

import math

import numpy as np
import pytest

from tpuslam.core.frames import (
    FrameTree,
    LaserRegistry,
    Transform3,
)


def test_planar_lookup_composes_chain():
    ft = FrameTree("base_link")
    ft.add("base_link", "mast", Transform3.from_xyz_rpy(0.1, 0.0, 0.5))
    ft.add("mast", "laser", Transform3.from_xyz_rpy(0.2, 0.05, 0.1,
                                                    yaw=math.pi / 2))
    p = ft.planar("base_link", "laser")
    assert np.allclose(p, [0.3, 0.05, math.pi / 2])
    # inverse direction: base origin seen from the laser
    q = ft.planar("laser", "base_link")
    c, s = math.cos(p[2]), math.sin(p[2])
    want = [-(c * p[0] + s * p[1]), -(-s * p[0] + c * p[1]), -p[2]]
    assert np.allclose(q, want)


def test_sibling_frames_resolve_through_root():
    ft = FrameTree()
    ft.add("base_link", "front_laser", Transform3.from_xyz_rpy(0.3, 0.0, 0.2))
    ft.add("base_link", "rear_laser",
           Transform3.from_xyz_rpy(-0.3, 0.0, 0.2, yaw=math.pi))
    rel = ft.planar("front_laser", "rear_laser")
    assert np.allclose(rel, [-0.6, 0.0, math.pi]) or np.allclose(
        rel, [-0.6, 0.0, -math.pi]
    )


def test_upside_down_detection():
    """karto_slam.cc:357-377: the +1 m 'up' point lands at z <= 0 in an
    inverted laser's frame."""
    ft = FrameTree()
    ft.add("base_link", "laser_up", Transform3.from_xyz_rpy(0.2, 0.0, 0.3))
    ft.add("base_link", "laser_down",
           Transform3.from_xyz_rpy(0.2, 0.0, 0.3, roll=math.pi))
    assert not ft.is_upside_down("laser_up")
    assert ft.is_upside_down("laser_down")


def test_registry_reverses_inverted_ranges():
    ft = FrameTree()
    ft.add("base_link", "laser", Transform3.from_xyz_rpy(0.1, 0.0, 0.2,
                                                         roll=math.pi))
    reg = LaserRegistry(ft)
    info = reg.get("laser")
    assert info.inverted
    r = np.arange(5.0)
    staged = reg.stage_ranges("laser", r)
    assert np.array_equal(staged, r[::-1])
    # non-inverted laser passes through
    ft2 = FrameTree()
    ft2.add("base_link", "laser", Transform3.from_xyz_rpy(0.1, 0.0, 0.2))
    reg2 = LaserRegistry(ft2)
    assert np.array_equal(reg2.stage_ranges("laser", r), r)


def test_sensor_pose_composition():
    ft = FrameTree()
    ft.add("base_link", "laser", Transform3.from_xyz_rpy(0.5, 0.0, 0.0,
                                                         yaw=0.3))
    reg = LaserRegistry(ft)
    base = np.array([1.0, 2.0, math.pi / 2])
    sp = reg.sensor_pose("laser", base)
    assert np.allclose(sp, [1.0, 2.5, math.pi / 2 + 0.3])


def test_unknown_and_cyclic_frames_rejected():
    ft = FrameTree()
    with pytest.raises(KeyError):
        ft.lookup("base_link", "nope")
    with pytest.raises(ValueError):
        ft.add("orphan_parent", "child", Transform3.from_xyz_rpy())
    ft.add("base_link", "a", Transform3.from_xyz_rpy(1.0))
    with pytest.raises(ValueError):
        ft.add("base_link", "a", Transform3.from_xyz_rpy())  # redefined
