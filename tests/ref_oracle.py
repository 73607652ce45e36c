"""Import the reference's own torch modules as differential-test oracles.

The reference checkout at /root/reference is importable as namespace packages
(``models.*`` / ``utils.*``) once its root is on sys.path.  Its
``utils/utils.py`` imports torchvision (not installed in this image), so a
faithful minimal stub of the two transforms ``KNNGaussianBlur`` actually uses
is registered first:

  * ``ToPILImage`` — torchvision semantics for the float score-map tensors the
    reference feeds it (torchvision.transforms.functional.to_pil_image with
    mode=None): 2-D tensors are unsqueezed to (1, H, W), floating tensors are
    ``mul(255).byte()``-quantised, and a single channel becomes a mode-'L'
    image.  (The reference blur path is therefore uint8-quantised end to end —
    see test_reference_parity.py::test_knn_gaussian_blur.)
  * ``ToTensor`` — PIL 'L' -> float32 (1, H, W) / 255.

Only stdlib/torch/PIL are used; nothing from the reference is copied.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def _install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    from PIL import Image

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class ToPILImage:
        def __call__(self, pic):
            if pic.ndim == 2:
                pic = pic.unsqueeze(0)
            if pic.is_floating_point():
                pic = pic.mul(255).byte()
            npimg = pic.cpu().numpy().transpose(1, 2, 0)
            if npimg.shape[2] == 1:
                return Image.fromarray(npimg[:, :, 0], mode="L")
            return Image.fromarray(npimg)

    class ToTensor:
        def __call__(self, pil):
            import torch

            arr = np.asarray(pil)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
            if t.dtype == torch.uint8:
                return t.float().div(255.0)
            return t.float()

    transforms.ToPILImage = ToPILImage
    transforms.ToTensor = ToTensor
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def ref_import(modname: str):
    """Import a module from the reference checkout (e.g. 'models.hrnet')."""
    _install_torchvision_stub()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(modname)


def _install_ref_dep_stubs() -> None:
    """Register *functional* CPU-torch stubs for the reference's CUDA-only
    imports (knn_cuda, pointnet2_ops, timm.DropPath, cupy).

    They reproduce the exact semantics the reference relies on so that
    ``models.models.PointTransformer`` — not just its import — works as a
    differential oracle:

      * ``knn_cuda.KNN(k, transpose_mode=True)`` called as ``knn(ref, query)``
        returns (dist, idx) of shape (B, G, k), ascending by distance, idx
        into ``ref`` (models/models.py:86,100 usage).
      * ``pointnet2_ops.pointnet2_utils.furthest_point_sample(xyz, n)`` —
        farthest-first selection seeded at index 0, running min squared
        distance, int32 (B, n) (the CUDA kernel's documented algorithm).
      * ``gather_operation(features (B,C,N), idx (B,n))`` -> (B, C, n).
      * ``timm.models.layers.DropPath`` — identity (the reference only uses
        it inside modules that are .eval() during inference, where the real
        DropPath is an identity).
    """
    import types as _types

    def _mod(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = _types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    _mod("cupy", asarray=lambda x: x)
    _mod("cupyx")
    _mod("cupyx.scipy")
    spatial = _mod("cupyx.scipy.spatial", distance=_types.SimpleNamespace())
    sys.modules["cupyx.scipy.spatial.distance"] = spatial.distance
    # utils/mvtec3d_util.py imports tifffile at module scope; the tiff IO
    # itself is never reached by any oracle path
    _mod("tifffile", imread=None, imwrite=None)

    if "knn_cuda" in sys.modules:
        return  # functional stubs already registered

    import torch

    class KNN:
        def __init__(self, k, transpose_mode=True):
            assert transpose_mode, "reference always passes transpose_mode=True"
            self.k = k

        def __call__(self, ref, query):
            d = torch.cdist(query.float(), ref.float())
            dist, idx = torch.topk(d, self.k, dim=-1, largest=False)
            return dist, idx

    def furthest_point_sample(xyz, npoint):
        B, N, _ = xyz.shape
        xyz = xyz.float()
        idxs = torch.zeros(B, npoint, dtype=torch.int32)
        min_d = torch.full((B, N), 1e10)
        last = torch.zeros(B, dtype=torch.long)
        for i in range(npoint):
            idxs[:, i] = last.int()
            p = xyz[torch.arange(B), last]                      # (B, 3)
            d = ((xyz - p[:, None, :]) ** 2).sum(-1)            # (B, N)
            min_d = torch.minimum(min_d, d)
            last = min_d.argmax(dim=1)
        return idxs

    def gather_operation(features, idx):
        B, C, _ = features.shape
        g = idx.long()[:, None, :].expand(B, C, idx.shape[1])
        return torch.gather(features, 2, g)

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    timm = _mod("timm", create_model=None)
    layers = _mod("timm.models.layers", DropPath=DropPath)
    _mod("timm.models", layers=layers)
    timm.models = sys.modules["timm.models"]
    _mod("knn_cuda", KNN=KNN)
    _mod("pointnet2_ops",
         pointnet2_utils=_types.SimpleNamespace(
             furthest_point_sample=furthest_point_sample,
             gather_operation=gather_operation))


def ref_import_models():
    """Import the reference's ``models.models`` with runnable CUDA-op stubs,
    making its ``PointTransformer``/``Group``/``Encoder`` executable oracles."""
    _install_ref_dep_stubs()
    return ref_import("models.models")


def ref_import_features():
    """Import the reference's ``feature_extractors.features`` module (same
    stub set; the scoring math under test never reaches the CUDA ops)."""
    _install_ref_dep_stubs()
    return ref_import("feature_extractors.features")
