from wgsparkl_tpu.utils.timing import Timestamps, time_passes
from wgsparkl_tpu.utils import checkpoint, diagnostics

__all__ = ["Timestamps", "time_passes", "checkpoint", "diagnostics"]
