"""SLAM-state checkpoint/resume.

The reference has NO checkpointing (SURVEY.md §5: the karto Dataset retains
scans only for memory ownership; sba_file_io exists but is unwired) — this is
a new first-class capability: engine states are pytrees of arrays, saved as
npz with a structure manifest, so any run can stop and resume.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _keypaths(tree) -> list[str]:
    """Per-leaf key-path strings ('.pose', '[3]', \"['a'].x\", ...) — the
    structure manifest.  Key paths are semantic (field/key/index names),
    unlike str(PyTreeDef) whose repr format is not stable across jax
    releases (a version upgrade must not invalidate old checkpoints)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(kp) for kp, _ in flat]


def save_pytree(path: str | os.PathLike, tree) -> None:
    """Save any pytree-of-arrays (engine states, graphs) to one npz."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__keypaths__"] = np.frombuffer(
        json.dumps(_keypaths(tree)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_pytree(path: str | os.PathLike, like):
    """Load a pytree saved by save_pytree; ``like`` provides the structure.

    The stored structure manifest is verified against ``like``'s treedef —
    a same-leaf-count but differently-structured template is rejected
    instead of silently reinterpreting the leaves."""
    z = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len([k for k in z.files if k.startswith("leaf_")])
    if n != len(leaves_like):
        raise ValueError(
            f"checkpoint has {n} leaves; template expects {len(leaves_like)}"
        )
    if "__keypaths__" in z.files:
        stored = json.loads(bytes(z["__keypaths__"]).decode())
        mine = _keypaths(like)
        if stored != mine:
            diff = next(
                (i for i, (a, b) in enumerate(zip(stored, mine)) if a != b),
                min(len(stored), len(mine)),
            )
            raise ValueError(
                "checkpoint structure manifest does not match the template "
                f"pytree (first difference at leaf {diff}: "
                f"stored={stored[diff] if diff < len(stored) else '<none>'} "
                f"template={mine[diff] if diff < len(mine) else '<none>'})"
            )
    elif "__treedef__" in z.files:
        # legacy (pre key-path manifest) checkpoints stored str(PyTreeDef);
        # that repr is only comparable under the same jax version, so the
        # strict check is kept for same-runtime resumes (its original
        # scope) — new checkpoints carry the version-stable __keypaths__
        stored = json.loads(bytes(z["__treedef__"]).decode())
        if stored != str(treedef):
            raise ValueError(
                "checkpoint structure manifest does not match the template "
                f"pytree:\n  stored:   {stored}\n  template: {treedef}"
            )
    leaves = [
        jnp.asarray(z[f"leaf_{i}"], dtype=leaves_like[i].dtype)
        if hasattr(leaves_like[i], "dtype")
        else z[f"leaf_{i}"]
        for i in range(n)
    ]
    return jax.tree.unflatten(treedef, leaves)


def save_karto(path: str | os.PathLike, mapper) -> None:
    """Checkpoint a models.karto.KartoMapper (scans, poses, edges, windows)."""
    n = len(mapper.records)
    e = len(mapper.edges)
    meta = {
        "sensors": [r.sensor for r in mapper.records],
        "sensor_scans": {k: v for k, v in mapper.sensor_scans.items()},
        "running_by_sensor": {
            k: v for k, v in mapper.running_by_sensor.items()
        },
        "last_by_sensor": {k: int(v) for k, v in mapper.last_by_sensor.items()},
    }
    np.savez_compressed(
        path,
        pts=np.asarray(mapper._pts[:n]),
        valid=np.asarray(mapper._valid[:n]),
        poses=mapper.poses[:n],
        odom=np.stack([r.odom_pose for r in mapper.records])
        if n
        else np.zeros((0, 3)),
        times=np.array([r.time for r in mapper.records]),
        mean_local=np.stack([r.mean_local for r in mapper.records])
        if n
        else np.zeros((0, 2)),
        edge_i=np.array([x[0] for x in mapper.edges], np.int32),
        edge_j=np.array([x[1] for x in mapper.edges], np.int32),
        edge_meas=np.stack([x[2] for x in mapper.edges])
        if e
        else np.zeros((0, 3)),
        edge_prec=np.stack([x[3] for x in mapper.edges])
        if e
        else np.zeros((0, 3, 3)),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def load_karto(path: str | os.PathLike, mapper) -> None:
    """Restore a KartoMapper checkpoint into a freshly-constructed mapper
    (must be built with the same config/num_beams)."""
    from tpuslam.models.karto import _ScanRecord

    z = np.load(path)
    n = z["poses"].shape[0]
    if n > mapper.max_scans:
        raise ValueError("checkpoint larger than mapper capacity")
    meta = json.loads(bytes(z["meta"]).decode())
    mapper._pts = mapper._pts.at[:n].set(jnp.asarray(z["pts"]))
    mapper._valid = mapper._valid.at[:n].set(jnp.asarray(z["valid"]))
    mapper.poses[:n] = z["poses"]
    mapper.mean_locals[:n] = z["mean_local"]
    mapper.records = [
        _ScanRecord(i, z["odom"][i], float(z["times"][i]), z["mean_local"][i],
                    meta["sensors"][i])
        for i in range(n)
    ]
    mapper.sensor_scans = {
        k: [int(x) for x in v] for k, v in meta["sensor_scans"].items()
    }
    mapper.running_by_sensor = {
        k: [int(x) for x in v] for k, v in meta["running_by_sensor"].items()
    }
    mapper.last_by_sensor = {
        k: int(v) for k, v in meta["last_by_sensor"].items()
    }
    mapper.edges = [
        (int(z["edge_i"][k]), int(z["edge_j"][k]), z["edge_meas"][k],
         z["edge_prec"][k])
        for k in range(z["edge_i"].shape[0])
    ]
    mapper.adj = {}
    mapper._edge_keys = {(i, j) for i, j, _, _ in mapper.edges}
    for i, j, _, _ in mapper.edges:
        mapper.adj.setdefault(i, set()).add(j)
        mapper.adj.setdefault(j, set()).add(i)
