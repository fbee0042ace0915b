"""On-hardware (Mosaic) test config.

Unlike ``tests/``, this suite does NOT force the CPU backend: its whole
point is to execute the Pallas kernels through the real Mosaic compiler
at every production operating size and bit-check them against the XLA
response paths.  Interpreter mode emulates primitives faithfully but
Mosaic does not always match it — two v5e findings (negative dynamic
``pltpu.roll`` mis-rotation on non-power-of-two dims; bf16 dynamic-roll
compile crash) were only ever caught on hardware (TODO.md).  Run via
``make verify-tpu`` (or ``python -m pytest tests_tpu -q``) on the bench
chip before any BENCH capture.

The suite skips itself (rather than failing) when no accelerator is
attached so a plain ``pytest`` from a CPU-only box stays green.
"""

import os
import pathlib
import sys

import jax

# match production: persistent compile cache (first compile of the big
# loop-window programs is ~30 s; cached reruns are instant)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "TPUSLAM_COMPILE_CACHE",
        os.path.expanduser("~/.cache/tpuslam-xla"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# make `from tests.test_pallas_plicp import ...` resolve regardless of
# how pytest was invoked (bare `pytest tests_tpu/` from any directory
# does not put the repo root on sys.path; `python -m pytest` does)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

collect_ignore_glob: list[str] = []

if jax.default_backend() != "tpu":
    # Mosaic-only suite: skip on cpu AND any other non-TPU accelerator
    # (pltpu lowering cannot compile there); interpret-mode coverage of
    # the same kernels lives in tests/.
    collect_ignore_glob = ["*.py"]
