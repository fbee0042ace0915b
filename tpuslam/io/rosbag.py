"""rosbag (v1, format 2.0) → ScanLog bridge.

The reference's entire data plane is recorded rosbags (every
``lesson*/launch/*.launch`` ends in ``rosbag play``, e.g.
lesson6/launch/karto_slam_outdoor.launch:24-26).  This module ingests those
bags host-side — pure Python, no ROS — and converts the LaserScan + odometry
(+ IMU) streams into :class:`tpuslam.io.bag.ScanLog`, unlocking the
BASELINE.md ATE-parity runs on the author's datasets.

Implements the rosbag 2.0 container format (records with name=value headers,
chunked message storage, none/bz2/lz4 chunk compression) and the ROS1 binary
message serialization for the three message types the lessons consume:
``sensor_msgs/LaserScan``, ``nav_msgs/Odometry``, ``sensor_msgs/Imu``.
A minimal writer produces spec-conformant fixture bags for round-trip tests.
"""

from __future__ import annotations

import bz2
import dataclasses
import math
import struct
from pathlib import Path

import numpy as np

from tpuslam.io.bag import ScanLog

_VERSION_LINE = b"#ROSBAG V2.0\n"

# record op codes (rosbag/bag.py in ros_comm)
OP_MSG_DATA = 0x02
OP_BAG_HEADER = 0x03
OP_INDEX_DATA = 0x04
OP_CHUNK = 0x05
OP_CHUNK_INFO = 0x06
OP_CONNECTION = 0x07


def _parse_header(buf: bytes) -> dict[str, bytes]:
    fields: dict[str, bytes] = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        field = buf[off : off + flen]
        off += flen
        name, _, value = field.partition(b"=")
        fields[name.decode()] = value
    return fields


def _read_record(data: bytes, off: int) -> tuple[dict[str, bytes], bytes, int]:
    (hlen,) = struct.unpack_from("<I", data, off)
    off += 4
    header = _parse_header(data[off : off + hlen])
    off += hlen
    (dlen,) = struct.unpack_from("<I", data, off)
    off += 4
    payload = data[off : off + dlen]
    off += dlen
    return header, payload, off


@dataclasses.dataclass
class BagMessage:
    topic: str
    msg_type: str
    time: float  # bag receive time (s)
    raw: bytes  # serialized ROS1 message body


def read_bag(path) -> list[BagMessage]:
    """Sequentially read every message record of a rosbag v1 file.

    Index/chunk-info records are skipped (no random access needed for a
    full-log conversion); chunk compression none, bz2 and lz4 are all
    supported (lz4 via the system liblz4, io/_lz4.py)."""
    data = Path(path).read_bytes()
    if not data.startswith(_VERSION_LINE):
        raise ValueError(
            f"{path}: not a rosbag v2.0 file "
            f"(header {data[:13]!r}); rosbag v1.x and rosbag2/sqlite are "
            f"not supported"
        )
    connections: dict[int, tuple[str, str]] = {}  # conn id -> (topic, type)
    messages: list[BagMessage] = []

    def handle_records(buf: bytes):
        off = 0
        while off < len(buf):
            header, payload, off = _read_record(buf, off)
            op = header.get("op", b"\x00")[0]
            if op == OP_CONNECTION:
                (conn,) = struct.unpack("<I", header["conn"])
                conn_fields = _parse_header(payload)
                topic = header.get(
                    "topic", conn_fields.get("topic", b"")
                ).decode()
                mtype = conn_fields.get("type", b"").decode()
                connections[conn] = (topic, mtype)
            elif op == OP_MSG_DATA:
                (conn,) = struct.unpack("<I", header["conn"])
                secs, nsecs = struct.unpack("<II", header["time"])
                topic, mtype = connections.get(conn, ("?", "?"))
                messages.append(
                    BagMessage(topic, mtype, secs + nsecs * 1e-9, payload)
                )
            elif op == OP_CHUNK:
                comp = header.get("compression", b"none").decode()
                if comp == "none":
                    inner = payload
                elif comp == "bz2":
                    inner = bz2.decompress(payload)
                elif comp == "lz4":
                    # roslz4 writes standard LZ4 frames: decode with the
                    # system liblz4 (io/_lz4.py ctypes binding); fall back
                    # to the optional lz4 wheel if the .so is absent
                    from tpuslam.io import _lz4

                    if _lz4.available():
                        inner = _lz4.decompress(payload)
                    else:  # pragma: no cover
                        try:
                            import lz4.frame  # type: ignore
                        except ImportError as e:
                            raise ValueError(
                                "bag uses lz4 chunk compression; liblz4 "
                                "and the lz4 package are both unavailable"
                            ) from e
                        inner = lz4.frame.decompress(payload)
                else:
                    raise ValueError(f"unknown chunk compression {comp!r}")
                handle_records(inner)
            # OP_BAG_HEADER / OP_INDEX_DATA / OP_CHUNK_INFO: skip

    handle_records(data[len(_VERSION_LINE) :])
    return messages


# --------------------------------------------------------------------------
# ROS1 message deserialization (little-endian)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.off)
        self.off += 4
        return v

    def f32(self) -> float:
        (v,) = struct.unpack_from("<f", self.buf, self.off)
        self.off += 4
        return v

    def f64(self) -> float:
        (v,) = struct.unpack_from("<d", self.buf, self.off)
        self.off += 8
        return v

    def f64s(self, n: int) -> np.ndarray:
        out = np.frombuffer(self.buf, "<f8", n, self.off)
        self.off += 8 * n
        return out

    def string(self) -> str:
        n = self.u32()
        s = self.buf[self.off : self.off + n]
        self.off += n
        return s.decode(errors="replace")

    def time(self) -> float:
        secs, nsecs = self.u32(), self.u32()
        return secs + nsecs * 1e-9

    def header(self) -> tuple[int, float, str]:
        return self.u32(), self.time(), self.string()

    def f32_array(self) -> np.ndarray:
        n = self.u32()
        out = np.frombuffer(self.buf, "<f4", n, self.off)
        self.off += 4 * n
        return out


def parse_laser_scan(raw: bytes) -> dict:
    r = _Reader(raw)
    _, stamp, frame = r.header()
    out = {
        "stamp": stamp,
        "frame_id": frame,
        "angle_min": r.f32(),
        "angle_max": r.f32(),
        "angle_increment": r.f32(),
        "time_increment": r.f32(),
        "scan_time": r.f32(),
        "range_min": r.f32(),
        "range_max": r.f32(),
        "ranges": r.f32_array(),
    }
    out["intensities"] = r.f32_array()
    return out


def _yaw_from_quat(x: float, y: float, z: float, w: float) -> float:
    return math.atan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def parse_odometry(raw: bytes) -> dict:
    r = _Reader(raw)
    _, stamp, frame = r.header()
    child = r.string()
    px, py, pz = r.f64(), r.f64(), r.f64()
    qx, qy, qz, qw = r.f64(), r.f64(), r.f64(), r.f64()
    r.f64s(36)  # pose covariance
    lx, ly, lz = r.f64(), r.f64(), r.f64()
    ax, ay, az = r.f64(), r.f64(), r.f64()
    r.f64s(36)  # twist covariance
    return {
        "stamp": stamp,
        "frame_id": frame,
        "child_frame_id": child,
        "pose": np.array([px, py, _yaw_from_quat(qx, qy, qz, qw)]),
        "linear": np.array([lx, ly, lz]),
        "angular": np.array([ax, ay, az]),
    }


def parse_imu(raw: bytes) -> dict:
    r = _Reader(raw)
    _, stamp, frame = r.header()
    r.f64s(4)  # orientation quaternion
    r.f64s(9)
    wx, wy, wz = r.f64(), r.f64(), r.f64()
    r.f64s(9)
    r.f64s(3)  # linear acceleration
    r.f64s(9)
    return {"stamp": stamp, "frame_id": frame, "w": np.array([wx, wy, wz])}


# --------------------------------------------------------------------------
# conversion

_SCAN_TYPE = "sensor_msgs/LaserScan"
_ODOM_TYPE = "nav_msgs/Odometry"
_IMU_TYPE = "sensor_msgs/Imu"


def bag_to_scanlog(
    path,
    scan_topic: str | None = None,
    odom_topic: str | None = None,
    imu_topic: str | None = None,
) -> ScanLog:
    """Convert a rosbag into a ScanLog.

    Topic auto-detection picks the first topic of each message type.  Odom
    poses are linearly interpolated (yaw circularly) to each scan's header
    stamp — the TF-lookup-at-scan-time the reference nodes perform
    (e.g. plicp_odometry.cc:352-370); the gyro yaw rate comes from the IMU
    stream when present, else from odom twist, else zeros."""
    msgs = read_bag(path)

    def pick(explicit, mtype):
        if explicit is not None:
            return explicit
        for m in msgs:
            if m.msg_type == mtype:
                return m.topic
        return None

    scan_topic = pick(scan_topic, _SCAN_TYPE)
    if scan_topic is None:
        raise ValueError(f"{path}: no {_SCAN_TYPE} messages found")
    odom_topic = pick(odom_topic, _ODOM_TYPE)
    imu_topic = pick(imu_topic, _IMU_TYPE)

    scans = [
        parse_laser_scan(m.raw) for m in msgs if m.topic == scan_topic
    ]
    odoms = [parse_odometry(m.raw) for m in msgs if m.topic == odom_topic]
    imus = [parse_imu(m.raw) for m in msgs if m.topic == imu_topic]
    scans.sort(key=lambda s: s["stamp"])
    odoms.sort(key=lambda o: o["stamp"])
    imus.sort(key=lambda o: o["stamp"])

    first = scans[0]
    nb = len(first["ranges"])
    t = len(scans)
    ranges = np.full((t, nb), np.inf, np.float32)
    stamps = np.zeros(t, np.float64)
    for i, s in enumerate(scans):
        r = s["ranges"][:nb]
        ranges[i, : len(r)] = r
        stamps[i] = s["stamp"]

    odom_out = np.zeros((t, 3), np.float32)
    if odoms:
        ot = np.array([o["stamp"] for o in odoms])
        op = np.stack([o["pose"] for o in odoms])
        ox = np.interp(stamps, ot, op[:, 0])
        oy = np.interp(stamps, ot, op[:, 1])
        # circular yaw interpolation
        oyaw = np.arctan2(
            np.interp(stamps, ot, np.sin(op[:, 2])),
            np.interp(stamps, ot, np.cos(op[:, 2])),
        )
        odom_out = np.stack([ox, oy, oyaw], axis=-1).astype(np.float32)

    wz = np.zeros(t, np.float32)
    if imus:
        it = np.array([m["stamp"] for m in imus])
        iw = np.array([m["w"][2] for m in imus])
        wz = np.interp(stamps, it, iw).astype(np.float32)
    elif odoms:
        ot = np.array([o["stamp"] for o in odoms])
        ow = np.array([o["angular"][2] for o in odoms])
        wz = np.interp(stamps, ot, ow).astype(np.float32)

    return ScanLog(
        ranges=ranges,
        stamps=stamps,
        odom=odom_out,
        imu_wz=wz,
        angle_min=float(first["angle_min"]),
        angle_increment=float(first["angle_increment"]),
        range_min=float(first["range_min"]),
        range_max=float(first["range_max"]),
        time_increment=float(first["time_increment"]),
    )


# --------------------------------------------------------------------------
# minimal writer (fixtures / tests)


def _field(name: str, value: bytes) -> bytes:
    f = name.encode() + b"=" + value
    return struct.pack("<I", len(f)) + f


def _record(fields: dict[str, bytes], payload: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (
        struct.pack("<I", len(header))
        + header
        + struct.pack("<I", len(payload))
        + payload
    )


class _Writer:
    def __init__(self):
        self.out = bytearray()

    def string(self, s: str):
        b = s.encode()
        self.out += struct.pack("<I", len(b)) + b

    def header(self, seq: int, stamp: float, frame: str):
        secs = int(stamp)
        nsecs = int(round((stamp - secs) * 1e9))
        self.out += struct.pack("<III", seq, secs, nsecs)
        self.string(frame)


def serialize_laser_scan(
    stamp: float,
    ranges,
    angle_min: float,
    angle_increment: float,
    range_min: float = 0.0,
    range_max: float = 100.0,
    time_increment: float = 0.0,
    frame: str = "laser",
) -> bytes:
    w = _Writer()
    w.header(0, stamp, frame)
    r = np.asarray(ranges, np.float32)
    angle_max = angle_min + angle_increment * (len(r) - 1)
    w.out += struct.pack(
        "<7f",
        angle_min,
        angle_max,
        angle_increment,
        time_increment,
        len(r) * time_increment,
        range_min,
        range_max,
    )
    w.out += struct.pack("<I", len(r)) + r.tobytes()
    w.out += struct.pack("<I", 0)  # intensities
    return bytes(w.out)


def serialize_odometry(
    stamp: float, pose, angular_z: float = 0.0, frame: str = "odom"
) -> bytes:
    w = _Writer()
    w.header(0, stamp, frame)
    w.string("base_link")
    x, y, yaw = (float(v) for v in pose)
    w.out += struct.pack("<3d", x, y, 0.0)
    w.out += struct.pack(
        "<4d", 0.0, 0.0, math.sin(yaw / 2.0), math.cos(yaw / 2.0)
    )
    w.out += np.zeros(36, "<f8").tobytes()
    w.out += struct.pack("<6d", 0.0, 0.0, 0.0, 0.0, 0.0, angular_z)
    w.out += np.zeros(36, "<f8").tobytes()
    return bytes(w.out)


def serialize_imu(stamp: float, w_xyz, frame: str = "imu") -> bytes:
    w = _Writer()
    w.header(0, stamp, frame)
    w.out += np.array([0, 0, 0, 1], "<f8").tobytes()  # orientation
    w.out += np.zeros(9, "<f8").tobytes()
    w.out += np.asarray(w_xyz, "<f8").tobytes()
    w.out += np.zeros(9, "<f8").tobytes()
    w.out += np.zeros(3, "<f8").tobytes()
    w.out += np.zeros(9, "<f8").tobytes()
    return bytes(w.out)


def write_bag(
    path,
    messages: list[tuple[str, str, float, bytes]],
    compression: str = "none",
) -> None:
    """Write a minimal spec-conformant rosbag v2.0.

    messages: (topic, msg_type, time, serialized_body) tuples."""
    topics: dict[str, int] = {}
    chunk = bytearray()
    for topic, mtype, _, _ in messages:
        if topic in topics:
            continue
        conn = len(topics)
        topics[topic] = conn
        conn_header = _field("topic", topic.encode()) + _field(
            "type", mtype.encode()
        ) + _field("md5sum", b"*") + _field("message_definition", b"")
        chunk += _record(
            {
                "op": bytes([OP_CONNECTION]),
                "conn": struct.pack("<I", conn),
                "topic": topic.encode(),
            },
            conn_header,
        )
    for topic, _, t, body in messages:
        secs = int(t)
        nsecs = int(round((t - secs) * 1e9))
        chunk += _record(
            {
                "op": bytes([OP_MSG_DATA]),
                "conn": struct.pack("<I", topics[topic]),
                "time": struct.pack("<II", secs, nsecs),
            },
            body,
        )
    payload = bytes(chunk)
    if compression == "bz2":
        comp_payload = bz2.compress(payload)
    elif compression == "lz4":
        from tpuslam.io import _lz4

        comp_payload = _lz4.compress(payload)
    elif compression == "none":
        comp_payload = payload
    else:
        raise ValueError(f"unsupported writer compression {compression!r}")

    out = bytearray(_VERSION_LINE)
    # bag header record, padded to 4096 bytes with spaces (spec)
    bh = _record(
        {
            "op": bytes([OP_BAG_HEADER]),
            "index_pos": struct.pack("<Q", 0),
            "conn_count": struct.pack("<I", len(topics)),
            "chunk_count": struct.pack("<I", 1),
        },
        b" " * 4096,
    )
    out += bh
    out += _record(
        {
            "op": bytes([OP_CHUNK]),
            "compression": compression.encode(),
            "size": struct.pack("<I", len(payload)),
        },
        comp_payload,
    )
    Path(path).write_bytes(bytes(out))
