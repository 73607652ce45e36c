"""Model layer: frozen backbones (ViT-B/8 DINO + Point-MAE), MTFI nets.

reference                               -> here
models/models.Model                        models.backbone.DualBackbone
timm vit_base_patch8_224_dino              models.vit.VisionTransformer
models/models.PointTransformer             models.point_mae.PointTransformer
models/hallucination_network.*             models.hallucination.*
models/hrnet.HRNet                         models.hrnet.HRNet
torch checkpoints                          models.convert (torch -> flax pytrees)
"""

from cmdiad_tpu.models.vit import VisionTransformer, ViTConfig  # noqa: F401
from cmdiad_tpu.models.point_mae import PointTransformer, PointMAEConfig  # noqa: F401
from cmdiad_tpu.models.backbone import DualBackbone  # noqa: F401
