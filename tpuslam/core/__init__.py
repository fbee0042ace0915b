from tpuslam.core import config, grid, scan, se2
from tpuslam.core.grid import GridSpec
from tpuslam.core.scan import Scan, make_scan, scan_to_points

__all__ = [
    "config",
    "grid",
    "scan",
    "se2",
    "GridSpec",
    "Scan",
    "make_scan",
    "scan_to_points",
]
