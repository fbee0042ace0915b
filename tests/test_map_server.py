"""MapPublisher: periodic map_update events with delta summaries."""

import numpy as np

from tpuslam.utils.events import EventBus
from tpuslam.utils.map_server import MapPublisher


def test_periodic_publish_and_deltas():
    bus = EventBus()
    got = []
    bus.subscribe(lambda e, p: got.append((e, p)))

    img = np.zeros((4, 4), np.int8)
    pub = MapPublisher(bus, lambda: img.copy(), period=5.0)

    assert pub.maybe_publish(0.0)  # first call always publishes
    assert not pub.maybe_publish(2.0)  # inside the period
    img[1, 2] = 100
    img[3, 3] = 100
    assert pub.maybe_publish(5.0)
    assert not pub.maybe_publish(9.9)
    assert pub.maybe_publish(10.1)  # nothing changed since last publish

    assert [e for e, _ in got] == ["map_update"] * 3
    p0, p1, p2 = (p for _, p in got)
    assert p0["full"] and p0["changed"] == 16 and p0["bbox"] is None
    assert not p1["full"] and p1["changed"] == 2
    assert p1["bbox"] == (1, 2, 3, 3)
    assert p2["changed"] == 0 and p2["bbox"] is None
    np.testing.assert_array_equal(p1["image"], img)
    assert pub.publishes == 3


def test_shape_change_is_full_refresh():
    bus = EventBus()
    got = []
    bus.subscribe(lambda e, p: got.append(p))
    imgs = [np.zeros((2, 2), np.int8), np.zeros((3, 3), np.int8)]
    pub = MapPublisher(bus, lambda: imgs.pop(0), period=1.0)
    pub.maybe_publish(0.0)
    pub.maybe_publish(1.0)
    assert got[1]["full"] and got[1]["changed"] == 9


def test_cli_map_stream(tmp_path, capsys):
    """`tpuslam karto --synthetic --map-stream` emits map_update summaries."""
    from tpuslam.cli import main

    main(["karto", "--synthetic", "--num-scans", "8", "--num-beams", "90",
          "--map-stream", "0.0"])
    err = capsys.readouterr().err
    assert '"event": "map_update"' in err
    assert '"image"' not in err  # raw image stays out of the log stream


def test_backwards_time_jump_resets_publisher():
    """A looped-bag clock reset must publish again, not silence the
    publisher forever (regression: t < last_time never fired)."""
    import numpy as np

    from tpuslam.utils.events import EventBus
    from tpuslam.utils.map_server import MapPublisher

    pub = MapPublisher(
        EventBus(), lambda: np.zeros((4, 4), np.int8), period=1.0
    )
    assert pub.maybe_publish(100.0)
    assert not pub.maybe_publish(100.5)
    assert pub.maybe_publish(3.0)  # clock jumped backwards: reset
    assert not pub.maybe_publish(3.5)
