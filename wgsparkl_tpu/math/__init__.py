from wgsparkl_tpu.math.svd import svd2x2, svd3x3, svd, recompose
from wgsparkl_tpu.math import pose

__all__ = ["svd2x2", "svd3x3", "svd", "recompose", "pose"]
