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

    # real torch inception core (tests/_torchvision_inception.py) so the
    # reference's fid_inception_v3 + FIDInception{A,C,E_1,E_2} subclasses
    # (diffusion_model/metrics/inception.py:162-325) construct for real
    from tests import _torchvision_inception as _tvi
    models.inception_v3 = _tvi.inception_v3
    models.inception = _tvi
    sys.modules["torchvision.models.inception"] = _tvi

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


def _install_runtime_stubs():
    """Stubs for modules the reference's *runtime* layer (tools/utils.py,
    tools/scripts.py) imports at module scope but that the trainer-dynamics
    parity tests never call: thop (MACs profiling, utils.py:18-19) and
    pycocotools (COCO eval, scripts.py:12-13).  Neither is installed in this
    image; neither participates in the optimizer/scheduler/train-loop math
    under test."""
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")

        def _no_profile(*a, **k):
            raise NotImplementedError("thop stub: not needed for parity")

        thop.profile = _no_profile
        thop.clever_format = _no_profile
        sys.modules["thop"] = thop
    if "pycocotools" not in sys.modules:
        pct = types.ModuleType("pycocotools")
        mask = types.ModuleType("pycocotools.mask")
        cocoeval = types.ModuleType("pycocotools.cocoeval")

        class _NoCOCOeval:  # decode/eval parity never reaches COCOeval
            def __init__(self, *a, **k):
                raise NotImplementedError("pycocotools stub")

        cocoeval.COCOeval = _NoCOCOeval
        pct.mask = mask
        sys.modules["pycocotools"] = pct
        sys.modules["pycocotools.mask"] = mask
        sys.modules["pycocotools.cocoeval"] = cocoeval


def patch_cuda_to_cpu():
    """Make ``.cuda()`` a CPU no-op so the reference's real train loops
    (which hard-code ``images.cuda()`` / ``tensor.cuda()``,
    tools/scripts.py:125) run on this GPU-less host.  torch.nn.Module.cuda
    routes through Tensor-level ``cuda`` via ``Module._apply``, so patching
    the Tensor method covers both."""
    if getattr(torch.Tensor.cuda, "_parity_noop", False):
        return
    def _cuda_noop(self, *a, **k):
        return self
    _cuda_noop._parity_noop = True
    torch.Tensor.cuda = _cuda_noop
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # DDP rejects device_ids/output_device for CPU modules; the reference
    # hard-codes them (tools/utils.py:178-185). Drop them — gloo CPU DDP
    # otherwise runs the same bucketed-allreduce path.
    real_ddp = torch.nn.parallel.DistributedDataParallel
    if not getattr(real_ddp, "_parity_wrapped", False):
        class _CpuDDP(real_ddp):
            _parity_wrapped = True

            def __init__(self, module, device_ids=None, output_device=None,
                         **kw):
                try:
                    p = next(module.parameters())
                    if p.device.type == "cpu":
                        device_ids, output_device = None, None
                except StopIteration:
                    pass
                super().__init__(module, device_ids=device_ids,
                                 output_device=output_device, **kw)

        torch.nn.parallel.DistributedDataParallel = _CpuDDP
        torch.nn.parallel.distributed.DistributedDataParallel = _CpuDDP


def init_single_process_group():
    """One-process gloo group so the reference loop's DDP wrap / all_reduce /
    barrier calls (tools/scripts.py:18-25,189-200) execute for real."""
    import tempfile
    if not torch.distributed.is_initialized():
        store = tempfile.mktemp(prefix="gloo_init_")
        torch.distributed.init_process_group(
            "gloo", init_method=f"file://{store}", world_size=1, rank=0)
    return torch.distributed.group.WORLD


def ref_module(dotted: str):
    """Import a module from the reference tree (with the stub installed)."""
    _install_torchvision_stub()
    _install_msda_stub()
    _install_runtime_stubs()
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
