"""TPU-native compute ops: the replacements for the reference's CUDA deps.

reference dependency            -> op here
pointnet2_ops.furthest_point_sample -> ops.fps.farthest_point_sample (Pallas + jnp)
KNN_CUDA                            -> ops.knn.masked_knn
cupy cdist / torch.cdist            -> ops.scoring.cdist
coreset greedy GPU loop             -> ops.coreset.greedy_kcenter (Pallas + jnp)
PIL GaussianBlur                    -> ops.blur.pil_gaussian_blur
torch AvgPool/AdaptiveAvgPool/interp-> ops.pooling
"""

from cmdiad_tpu.ops.masked import nonzero_point_mask, BIG_DIST  # noqa: F401
from cmdiad_tpu.ops.fps import farthest_point_sample  # noqa: F401
from cmdiad_tpu.ops.knn import masked_knn  # noqa: F401
from cmdiad_tpu.ops.interpolate import three_nn_interpolate  # noqa: F401
from cmdiad_tpu.ops.pooling import (  # noqa: F401
    avg_pool_3x3_valid, adaptive_avg_pool, bilinear_resize, nearest_resize,
)
from cmdiad_tpu.ops.blur import pil_gaussian_blur  # noqa: F401
from cmdiad_tpu.ops.scoring import cdist, patchcore_score, pad_bank  # noqa: F401
from cmdiad_tpu.ops.coreset import sparse_random_projection, greedy_kcenter  # noqa: F401
