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


def ref_import_features():
    """Import the reference's ``feature_extractors.features`` module.

    Its import chain needs CUDA-only packages that are absent here (cupy,
    timm, knn_cuda, pointnet2_ops); they are stubbed as empty modules with
    just the names the import statements touch — the scoring math under
    test (``compute_single_s_s_map``/``calculate_dist`` l2 path) never
    calls into any of them.
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

    cp = _mod("cupy", asarray=lambda x: x)
    _mod("cupyx")
    _mod("cupyx.scipy")
    spatial = _mod("cupyx.scipy.spatial", distance=_types.SimpleNamespace())
    sys.modules["cupyx.scipy.spatial.distance"] = spatial.distance
    timm = _mod("timm", create_model=None)
    layers = _mod("timm.models.layers", DropPath=object)
    _mod("timm.models", layers=layers)
    timm.models = sys.modules["timm.models"]
    _mod("knn_cuda", KNN=object)
    _mod("pointnet2_ops", pointnet2_utils=_types.SimpleNamespace())
    return ref_import("feature_extractors.features")
