from cmdiad_tpu.data.mvtec3d import (  # noqa: F401
    mvtec3d_classes, eyecandies_classes, MVTec3DDataset)
from cmdiad_tpu.data.loader import iter_samples  # noqa: F401
