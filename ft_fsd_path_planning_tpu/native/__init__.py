"""Native (C++) runtime components: fast replay-session loading."""

from ft_fsd_path_planning_tpu.native.loader import load_session

__all__ = ["load_session"]
