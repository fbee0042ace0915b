"""tpuslam — a TPU-native 2D laser SLAM engine in JAX/XLA/Pallas.

A from-scratch rebuild of the capability set of
``xiangli0608/Creating-2D-laser-slam-from-scratch`` (ROS1/C++) as a pure,
jittable, batched SLAM library: scan feature extraction, ICP / PL-ICP
odometry, occupancy-grid mapping (GMapping / Hector / Karto styles),
Hector multi-resolution Gauss-Newton SLAM, motion-distortion correction,
Karto-style correlative scan matching with loop closure, and a sparse
pose-graph Gauss-Newton/LM optimizer — all over fixed-shape arrays with no
per-scan host round-trips.
"""

__version__ = "0.1.0"
