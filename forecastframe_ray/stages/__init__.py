from forecastframe_ray.stages.keyed import keyed_window_stage, WindowKernel
from forecastframe_ray.stages.join import broadcast_left_join, broadcast_semi_join

__all__ = ["keyed_window_stage", "WindowKernel", "broadcast_left_join", "broadcast_semi_join"]
