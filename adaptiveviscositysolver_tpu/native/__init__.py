"""Native host runtime: compiled-on-first-use C extension with pure-Python
fallbacks.

The compute path is XLA; this module covers the host-side pieces the
reference also implements natively — octree invariant validation
(HDK_OctreeGrid.cpp:988-1304) and debug geometry export (cpp:245-308) —
at C speed so they are usable on production-sized grids.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_mod = None
_tried = False


def _compile():
    src = os.path.join(_HERE, "avs_native.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_HERE, "avs_native" + suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    try:
        import importlib.util

        path = _compile()
        spec = importlib.util.spec_from_file_location("avs_native", path)
        _mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_mod)
    except Exception:
        _mod = None
    return _mod


def available() -> bool:
    return _load() is not None


def check_octree_invariants(labels, max_fails: int = 16):
    """Run the reference's three octree unit tests; returns failure strings.

    Uses the C extension when it compiles, otherwise falls back to the
    (slow) Python transcription in tests/oracle.
    """
    import numpy as np

    bufs = [np.ascontiguousarray(np.asarray(l), np.int8) for l in labels]
    mod = _load()
    if mod is not None:
        return mod.check_octree_invariants(bufs, max_fails)
    from tests.oracle.reference_oracle import check_octree_invariants as py_check

    return py_check(bufs)


def export_octree_ply(labels, dx: float, path: str, origin=(0.0, 0.0, 0.0)) -> int:
    """ACTIVE cell centers as a binary PLY point cloud (pscale + level
    attributes — the parity analog of outputOctreeGeometry)."""
    import numpy as np

    bufs = [np.ascontiguousarray(np.asarray(l), np.int8) for l in labels]
    mod = _load()
    if mod is not None:
        return mod.export_octree_ply(bufs, float(dx), tuple(map(float, origin)), path)
    # Python fallback: ASCII PLY
    from ..octree import octree_geometry

    pos, pscale, lev = octree_geometry(bufs, dx, origin)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex %d\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float pscale\nproperty int octree_level\nend_header\n"
            % len(pos)
        )
        for p, s, l in zip(pos, pscale, lev):
            f.write(f"{p[0]} {p[1]} {p[2]} {s} {l}\n")
    return len(pos)
