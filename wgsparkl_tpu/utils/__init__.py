from wgsparkl_tpu.utils.timing import Timestamps, time_passes
from wgsparkl_tpu.utils import checkpoint

__all__ = ["Timestamps", "time_passes", "checkpoint"]
