"""ft-fsd-path-planning-tpu — TPU-native Formula Student path planning.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`papalotis/ft-fsd-path-planning`: cone sorting (beam search), cone matching,
centerline calculation, relocalization, batched + multi-chip execution.

Public API mirrors the reference package (`fsd_path_planning/__init__.py`):
"""

from ft_fsd_path_planning_tpu.models.facade import (
    PathPlanner,
    RelocalizationInformation,
)
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

__all__ = [
    "PathPlanner",
    "RelocalizationInformation",
    "ConeTypes",
    "MissionTypes",
]
