"""SLAM engines (the reference's per-lesson workloads as pure step fns)."""
