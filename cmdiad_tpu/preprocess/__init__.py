from cmdiad_tpu.preprocess.plane import (  # noqa: F401
    ransac_plane, remove_plane, border_points)
from cmdiad_tpu.preprocess.cluster import largest_cluster_cleaning  # noqa: F401
from cmdiad_tpu.preprocess.mvtec import preprocess_sample, preprocess_dataset  # noqa: F401
