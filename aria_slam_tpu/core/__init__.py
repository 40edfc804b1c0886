from aria_slam_tpu.core import lie, types  # noqa: F401
