"""Load the upstream reference simulator for parity testing.

The reference (mounted read-only at /root/reference) predates Python 3.12:
its ``RigidBody`` dataclass uses a mutable ``np.ndarray`` default
(rigid_body.py:22) which 3.12 rejects, and it imports ``nptyping`` which is
not installed.  This helper stages a patched copy under the system temp dir
(outside the repo tree, so no reference bytes ever sit in the working tree),
shims nptyping, and imports ``crate.crate.Crate`` from it.

Used ONLY by tests as the ground-truth oracle; nothing here ships in the
framework.
"""

from __future__ import annotations

import shutil
import sys
import types
from pathlib import Path

import numpy as np

import tempfile

REFERENCE_SRC = Path("/root/reference/src")
CACHE = Path(tempfile.gettempdir()) / "sand_crate_ref_cache"

_PATCHES = {
    "crate/rigid_body.py": [
        (
            "center_velocity: NDArray = np.array([0.0, 0.0])",
            "center_velocity: NDArray = field(default_factory=lambda: np.array([0.0, 0.0]))",
        ),
    ],
}


def stage() -> Path:
    if not REFERENCE_SRC.exists():
        raise RuntimeError("reference not mounted")
    CACHE.mkdir(exist_ok=True)
    dst = CACHE / "src"
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(REFERENCE_SRC, dst)
    for rel, patches in _PATCHES.items():
        f = dst / rel
        text = f.read_text()
        for old, new in patches:
            text = text.replace(old, new)
        f.write_text(text)
    return dst


def load_reference():
    """Return (RefCrate, RefWorldConfig) from the staged upstream code."""
    if "nptyping" not in sys.modules:
        shim = types.ModuleType("nptyping")
        shim.NDArray = np.ndarray
        sys.modules["nptyping"] = shim
    src = stage()
    if str(src) not in sys.path:
        sys.path.insert(0, str(src))
    for mod in [m for m in list(sys.modules) if m == "crate" or m.startswith("crate.")]:
        del sys.modules[mod]
    from crate.crate import Crate as RefCrate
    from crate.load_config import WorldConfig as RefWorldConfig

    return RefCrate, RefWorldConfig
