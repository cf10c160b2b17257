"""Array type aliases (parity with reference `fsd_path_planning/types.py`)."""

from __future__ import annotations

from typing import Any

import jax

FloatArray = jax.Array
IntArray = jax.Array
BoolArray = jax.Array
GenericArray = jax.Array
NumpyArray = Any  # host-side numpy arrays at the facade boundary
