from flame_tpu.geometry import se3
from flame_tpu.geometry import camera
from flame_tpu.geometry import epipolar

__all__ = ["se3", "camera", "epipolar"]
