"""Scan-log ingestion: tpuslam's replacement for rosbag playback.

The reference streams recorded rosbags into ROS callbacks (every
lesson*/launch/*.launch plays a bag with ``--clock``; the author's datasets
are external downloads, SURVEY.md §4).  tpuslam's data plane is the
``.tslg`` binary scan log — encoded/decoded by the native C++ codec in
csrc/scanlog.cc (loaded via ctypes), with a bit-identical pure-Python
fallback — plus an ``.npz`` interchange format and a synthetic-world
generator so every workload is runnable without any external dataset.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import struct
import subprocess
from pathlib import Path

import numpy as np

_MAGIC = b"TSLG"
_VERSION = 1


@dataclasses.dataclass
class ScanLog:
    """A recorded (or synthesized) scan stream with odometry + gyro."""

    ranges: np.ndarray  # [T, B] float32 (inf/nan = invalid)
    stamps: np.ndarray  # [T] float64 seconds
    odom: np.ndarray  # [T, 3] float32 odometric poses
    imu_wz: np.ndarray  # [T] float32 yaw rate at each scan
    angle_min: float
    angle_increment: float
    range_min: float
    range_max: float
    time_increment: float = 0.0
    # rosbag-derived TF metadata (not persisted by the tslg/npz codecs):
    # the scan frame_id and the bag's static frame tree
    # (tpuslam.core.frames.FrameTree), when the source bag carried
    # /tf_static — lets the CLI resolve the laser extrinsic the way the
    # reference nodes look it up from TF (karto_slam.cc:327-405).
    laser_frame: str | None = None
    frames: object | None = None

    def __len__(self) -> int:
        return self.ranges.shape[0]

    @property
    def num_beams(self) -> int:
        return self.ranges.shape[1]

    def scan(self, i: int, num_beams: int | None = None):
        from tpuslam.core.scan import make_scan

        return make_scan(
            self.ranges[i],
            angle_min=self.angle_min,
            angle_increment=self.angle_increment,
            range_min=self.range_min,
            range_max=self.range_max,
            time_increment=self.time_increment,
            num_beams=num_beams or self.num_beams,
        )

    def scans_batched(self, num_beams: int | None = None):
        """All scans stacked into one Scan pytree [T, B] for lax.scan folds."""
        import jax
        import jax.numpy as jnp

        scans = [self.scan(i, num_beams) for i in range(len(self))]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *scans)


# --------------------------------------------------------------- native codec
_LIB: ctypes.CDLL | None = None
_LIB_TRIED = False


def _repo_root() -> Path:
    return Path(__file__).resolve().parent.parent.parent


def _native_lib() -> ctypes.CDLL | None:
    """Load the C++ codec; None if unavailable.

    Search order: the setuptools-built ``tpuslam/_native/libtslg.so``
    (``pip install .`` / ``setup.py build_ext --inplace``), then a lazy
    g++ build of ``csrc/scanlog.cc`` for source checkouts."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    built = Path(__file__).resolve().parent.parent / "_native" / "libtslg.so"
    root = _repo_root()
    src = root / "csrc" / "scanlog.cc"
    so = root / "csrc" / "libtslg.so"
    try:
        if built.exists() and (
            not src.exists()
            or built.stat().st_mtime >= src.stat().st_mtime
        ):
            # setuptools-built and not older than the source
            so = built
        elif src.exists() and (
            not so.exists() or so.stat().st_mtime < src.stat().st_mtime
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True,
                capture_output=True,
            )
        if not so.exists():
            return None
        lib = ctypes.CDLL(str(so))
        lib.tslg_write.restype = ctypes.c_int
        lib.tslg_open.restype = ctypes.c_void_p
        lib.tslg_read.restype = ctypes.c_int
        lib.tslg_close.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def save_tslg(path: str | os.PathLike, log: ScanLog) -> None:
    """Write a .tslg binary log (native codec, Python fallback)."""
    t, b = log.ranges.shape
    stamps = np.ascontiguousarray(log.stamps, np.float64)
    odom = np.ascontiguousarray(log.odom, np.float32)
    wz = np.ascontiguousarray(log.imu_wz, np.float32)
    # NaN/inf beams are the documented invalid encoding (ScanLog docstring)
    # and round-trip verbatim — f32 represents them exactly
    ranges = np.ascontiguousarray(log.ranges, np.float32)
    lib = _native_lib()
    if lib is not None:
        rc = lib.tslg_write(
            str(path).encode(),
            ctypes.c_uint32(b),
            ctypes.c_uint32(t),
            ctypes.c_float(log.angle_min),
            ctypes.c_float(log.angle_increment),
            ctypes.c_float(log.range_min),
            ctypes.c_float(log.range_max),
            ctypes.c_float(log.time_increment),
            stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            odom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            wz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"tslg_write failed: {rc}")
        return
    # fallback: same byte layout
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(
            struct.pack(
                "<IIIfffff",
                _VERSION,
                b,
                t,
                log.angle_min,
                log.angle_increment,
                log.range_min,
                log.range_max,
                log.time_increment,
            )
        )
        for i in range(t):
            f.write(struct.pack("<d", stamps[i]))
            f.write(odom[i].tobytes())
            f.write(struct.pack("<f", wz[i]))
            f.write(ranges[i].tobytes())


def load_tslg(path: str | os.PathLike) -> ScanLog:
    """Read a .tslg binary log (native codec, Python fallback)."""
    lib = _native_lib()
    if lib is not None:
        meta = (ctypes.c_double * 5)()
        counts = (ctypes.c_int64 * 2)()
        h = lib.tslg_open(str(path).encode(), meta, counts)
        if not h:
            raise IOError(f"tslg_open failed for {path}")
        try:
            b, t = int(counts[0]), int(counts[1])
            stamps = np.empty(t, np.float64)
            odom = np.empty((t, 3), np.float32)
            wz = np.empty(t, np.float32)
            ranges = np.empty((t, b), np.float32)
            rc = lib.tslg_read(
                ctypes.c_void_p(h),
                ctypes.c_int64(0),
                ctypes.c_int64(t),
                stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                odom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                wz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc != 0:
                raise IOError(f"tslg_read failed: {rc}")
        finally:
            lib.tslg_close(ctypes.c_void_p(h))
        return ScanLog(
            ranges, stamps, odom, wz,
            float(meta[0]), float(meta[1]), float(meta[2]), float(meta[3]),
            float(meta[4]),
        )
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise IOError(f"bad magic in {path}")
        ver, b, t, amin, ainc, rmin, rmax, tinc = struct.unpack(
            "<IIIfffff", f.read(32)
        )
        if ver != _VERSION:
            raise IOError(f"unsupported tslg version {ver}")
        stamps = np.empty(t, np.float64)
        odom = np.empty((t, 3), np.float32)
        wz = np.empty(t, np.float32)
        ranges = np.empty((t, b), np.float32)
        for i in range(t):
            (stamps[i],) = struct.unpack("<d", f.read(8))
            odom[i] = np.frombuffer(f.read(12), np.float32)
            (wz[i],) = struct.unpack("<f", f.read(4))
            ranges[i] = np.frombuffer(f.read(4 * b), np.float32)
    return ScanLog(ranges, stamps, odom, wz, amin, ainc, rmin, rmax, tinc)


# --------------------------------------------------------------- npz + synth
def save_npz(path: str | os.PathLike, log: ScanLog) -> None:
    np.savez_compressed(
        path,
        ranges=log.ranges,
        stamps=log.stamps,
        odom=log.odom,
        imu_wz=log.imu_wz,
        meta=np.array(
            [log.angle_min, log.angle_increment, log.range_min,
             log.range_max, log.time_increment]
        ),
    )


def load_npz(path: str | os.PathLike) -> ScanLog:
    z = np.load(path)
    m = z["meta"]
    return ScanLog(
        z["ranges"], z["stamps"], z["odom"], z["imu_wz"],
        float(m[0]), float(m[1]), float(m[2]), float(m[3]), float(m[4]),
    )


def load(path: str | os.PathLike) -> ScanLog:
    p = str(path)
    if p.endswith(".npz"):
        return load_npz(p)
    if p.endswith(".bag"):
        from tpuslam.io.rosbag import bag_to_scanlog

        return bag_to_scanlog(p)
    return load_tslg(p)


def synthesize(
    *,
    world: str = "boxes",
    trajectory: str = "circle",
    num_scans: int = 100,
    num_beams: int = 360,
    rate_hz: float = 10.0,
    odom_noise: tuple[float, float, float] = (0.01, 0.01, 0.005),
    range_noise: float = 0.0,
    max_range: float = 30.0,
    radius: float = 1.6,
    poses_per_rev: int = 40,
    seed: int = 0,
    distorted: bool = False,
) -> tuple[ScanLog, np.ndarray]:
    """Generate a synthetic scan log + ground-truth poses.

    Replaces the reference's external rosbag datasets for tests and CLI
    demos.  Returns (log, true_poses [T, 3]).

    ``distorted=True`` simulates rolling-shutter motion distortion: scan
    i's beams are cast from the poses the robot actually sweeps through
    between true[i] and true[i+1] (constant body twist), the physical
    effect lesson5's undistortion node corrects.  Scan i's beam-0 frame
    is true[i] and its sweep spans [stamps[i], stamps[i+1]]."""
    from tpuslam.io.simulate import (
        rect_room,
        simulate_distorted_scan,
        simulate_scan,
        world_with_boxes,
    )

    rng = np.random.default_rng(seed)
    segs = world_with_boxes() if world == "boxes" else rect_room(10.0, 8.0)
    if trajectory == "circle":
        # poses_per_rev poses per revolution, num_scans poses total
        s = np.linspace(0, 2 * np.pi * num_scans / poses_per_rev, num_scans,
                        endpoint=False)
        true = np.stack(
            [radius * np.cos(s), radius * np.sin(s),
             np.arctan2(np.cos(s), -np.sin(s))], axis=-1
        )
    else:  # "line"
        x = np.linspace(-3, 3, num_scans)
        true = np.stack([x, np.zeros_like(x), np.zeros_like(x)], axis=-1)

    dt = 1.0 / rate_hz
    ranges = np.zeros((num_scans, num_beams), np.float32)
    amin = ainc = 0.0
    for i, p in enumerate(true):
        if distorted and i + 1 < num_scans:
            a, b = true[i], true[i + 1]
            ca, sa = np.cos(a[2]), np.sin(a[2])
            d = b[:2] - a[:2]
            twist = np.array([
                (ca * d[0] + sa * d[1]) / dt,
                (-sa * d[0] + ca * d[1]) / dt,
                np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2])) / dt,
            ])
            r, amin, ainc, _ = simulate_distorted_scan(
                segs, p, twist, num_beams=num_beams, max_range=max_range,
                scan_period=dt,
            )
            if range_noise > 0.0:
                r = np.where(np.isfinite(r),
                             r + rng.normal(0, range_noise, r.shape), r)
        else:
            r, amin, ainc = simulate_scan(
                segs, p, num_beams=num_beams, max_range=max_range,
                noise_std=range_noise, rng=rng,
            )
        ranges[i] = r.astype(np.float32)

    # noisy odometry integration + per-scan yaw rate
    odom = np.zeros_like(true)
    odom[0] = true[0]
    wz = np.zeros(num_scans, np.float32)
    for i in range(1, num_scans):
        a, b = true[i - 1], true[i]
        ca, sa = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        rel = np.array(
            [ca * d[0] + sa * d[1], -sa * d[0] + ca * d[1],
             np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2]))]
        )
        rel = rel + rng.normal(0, odom_noise)
        co, so = np.cos(odom[i - 1, 2]), np.sin(odom[i - 1, 2])
        odom[i] = [
            odom[i - 1, 0] + co * rel[0] - so * rel[1],
            odom[i - 1, 1] + so * rel[0] + co * rel[1],
            np.arctan2(np.sin(odom[i - 1, 2] + rel[2]),
                       np.cos(odom[i - 1, 2] + rel[2])),
        ]
        wz[i] = rel[2] / dt

    log = ScanLog(
        ranges=ranges,
        stamps=np.arange(num_scans, dtype=np.float64) * dt,
        odom=odom.astype(np.float32),
        imu_wz=wz,
        angle_min=float(amin),
        angle_increment=float(ainc),
        range_min=0.1,
        range_max=float(max_range),
        # per-beam firing interval: beam B-1 fires dt after beam 0,
        # matching simulate_distorted_scan's sweep
        time_increment=dt / max(num_beams - 1, 1),
    )
    return log, true
