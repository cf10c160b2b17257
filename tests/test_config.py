"""Config factory invariants (mission preset + override interactions)."""

from ft_fsd_path_planning_tpu.config import ShapeBudget, default_config
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes


def test_acceleration_shapes_survive_n_cones_override():
    """Round-4 advisor (medium): n_cones=N must not discard the acceleration
    mission's 704-point global window / 1024 dense-sample sizing."""
    for mission in (MissionTypes.acceleration, MissionTypes.ebs_test):
        cfg = default_config(mission, n_cones=96)
        assert cfg.shapes.n_cones == 96
        assert cfg.shapes.global_window == 704
        assert cfg.shapes.dense_samples == 1024


def test_n_cones_folds_into_explicit_shapes():
    cfg = default_config(
        MissionTypes.trackdrive, n_cones=64, shapes=ShapeBudget(dense_samples=256)
    )
    assert cfg.shapes.n_cones == 64
    assert cfg.shapes.dense_samples == 256


def test_trackdrive_defaults_unchanged():
    cfg = default_config(MissionTypes.trackdrive)
    assert cfg.shapes == ShapeBudget()
    assert not cfg.supports_global_path
    cfg = default_config(MissionTypes.trackdrive, n_cones=256)
    assert cfg.shapes == ShapeBudget(n_cones=256)
