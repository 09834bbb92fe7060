"""Harness for cross-framework parity tests against the actual reference
implementation (/root/reference, SimpleAICV, torch CPU).

The reference imports ``torchvision`` at module scope in a handful of places
(`classification/common.py:16`, `detection/decode.py:14`,
`detection/models/dcnv2.py:5`, `face_detection/decode.py:14`,
`diffusion_model/metrics/inception.py:5`) but only *calls* it at
construction/decode time, so a small stub module unblocks every model import
on this torchvision-less image.  ``torchvision.ops.nms`` is given a real
(greedy, torch-based) implementation so decode-path parity tests can run.

Usage from a test::

    from tests._reference import ref_module, torch, state_dict_numpy
    resnet = ref_module("simpleAICV.classification.backbones.resnet")
    m = resnet.resnet50(num_classes=1000).eval()
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"


def _greedy_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics: boxes [N,4] xyxy, scores [N] ->
    LongTensor of kept indices, score-descending."""
    order = torch.argsort(scores, descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        b = boxes[i]
        bx = boxes[rest]
        x1 = torch.maximum(b[0], bx[:, 0])
        y1 = torch.maximum(b[1], bx[:, 1])
        x2 = torch.minimum(b[2], bx[:, 2])
        y2 = torch.minimum(b[3], bx[:, 3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        area_b = (b[2] - b[0]) * (b[3] - b[1])
        area_r = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
        iou = inter / (area_b + area_r - inter + 1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.int64)


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    ops = types.ModuleType("torchvision.ops")
    models = types.ModuleType("torchvision.models")

    ops.nms = _greedy_nms

    def _no_deform(*a, **k):  # only DCN-variant models reach this at call time
        raise NotImplementedError("deform_conv2d stub: not needed for parity")

    ops.deform_conv2d = _no_deform
    tv.transforms = transforms
    tv.ops = ops
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.models"] = models


def _install_msda_stub():
    """The reference hard-requires the compiled ``MultiScaleDeformableAttention``
    CUDA package at import time (multiscale_deformable_attention.py:10-15),
    but also ships a pure-torch equivalent, ``ms_deform_attn_core_pytorch``
    (:43-74), in the same module.  This stub satisfies the import and
    delegates the forward to the reference's OWN pure-torch path, so
    DINO-DETR parity tests still compare against reference-authored math."""
    if "MultiScaleDeformableAttention" in sys.modules:
        return
    pkg = types.ModuleType("MultiScaleDeformableAttention")

    def ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                               sampling_locations, attention_weights,
                               im2col_step):
        mod = sys.modules[
            "simpleAICV.detection.models.multiscale_deformable_attention"]
        shapes = [(int(h), int(w)) for h, w in spatial_shapes]
        return mod.ms_deform_attn_core_pytorch(
            value, shapes, sampling_locations, attention_weights)

    def ms_deform_attn_backward(*a, **k):
        raise NotImplementedError(
            "MSDA stub: backward not needed for forward parity")

    pkg.ms_deform_attn_forward = ms_deform_attn_forward
    pkg.ms_deform_attn_backward = ms_deform_attn_backward
    sys.modules["MultiScaleDeformableAttention"] = pkg


def ref_module(dotted: str):
    """Import a module from the reference tree (with the stub installed)."""
    _install_torchvision_stub()
    _install_msda_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(dotted)


def state_dict_numpy(module) -> dict:
    """A torch module's state_dict as plain float32 numpy arrays."""
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in module.state_dict().items()}


def seed_all(seed: int = 0):
    torch.manual_seed(seed)
    np.random.seed(seed)


def to_torch_nchw(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2))).float()
