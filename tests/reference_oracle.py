"""Run the reference implementation in-process as a golden parity oracle.

The reference (`/root/reference`, read-only) depends on numba and icecream
which are not in this image; numba's ``jit`` is shimmed to an identity
decorator so the reference executes as plain NumPy. This module only *imports
and runs* the reference — no reference code lives in this repository.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_shims() -> None:
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def jit(*args, **kwargs):
            # support both @jit and @jit(...)
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]

            def deco(f):
                return f

            return deco

        numba.jit = jit
        numba.njit = jit
        sys.modules["numba"] = numba

    if "icecream" not in sys.modules:
        icecream = types.ModuleType("icecream")
        icecream.ic = lambda *a, **k: a[0] if len(a) == 1 else a
        sys.modules["icecream"] = icecream


def load_reference():
    """Import and return the reference `fsd_path_planning` package."""
    _install_shims()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import fsd_path_planning  # noqa: PLC0415

    return fsd_path_planning
