from tpuslam.core import config, frames, grid, scan, se2
from tpuslam.core.frames import FrameTree, LaserRegistry, Transform3
from tpuslam.core.grid import GridSpec
from tpuslam.core.scan import Scan, make_scan, scan_to_points

__all__ = [
    "config",
    "frames",
    "grid",
    "scan",
    "se2",
    "FrameTree",
    "GridSpec",
    "LaserRegistry",
    "Scan",
    "Transform3",
    "make_scan",
    "scan_to_points",
]
