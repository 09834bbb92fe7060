"""Official-weight converter golden tests: torch models restated with the
OFFICIAL checkpoint naming (torchvision ResNet, MAE/timm ViT) generate real
state_dicts; conversion must produce numerically matching logits from our
flax models (bf16-compute tolerance). Parity target: the reference's
weight_convert/ scripts + *_test_convert_from_pytorch_official_weight
verification configs (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import simpleaicv_tpu  # noqa: F401
from simpleaicv_tpu.core.converters import (apply_converted,
                                            convert_official_state_dict)
from simpleaicv_tpu.core.registry import BACKBONES

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


# ---------------- torchvision-style ResNet-50 restatement ----------------

class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(tnn.Module):
    """Structure + param names identical to torchvision.models.resnet50."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(2048, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(blocks - 1)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)


def test_resnet50_torchvision_convert_golden():
    torch.manual_seed(0)
    tm = TorchResNet50(num_classes=100)
    with torch.no_grad():
        _randomize_bn_stats(tm)
    tm.eval()

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    converted = convert_official_state_dict(sd, "torchvision_resnet")

    model = BACKBONES.create("resnet50", num_classes=100)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), False))()
    n_params = len(jax.tree.leaves(variables["params"]))
    n_stats = len(jax.tree.leaves(variables["batch_stats"]))
    variables, n = apply_converted(variables, converted)
    assert n == n_params + n_stats, (n, n_params, n_stats)

    got = np.asarray(model.apply(variables, jnp.asarray(x), False))
    # bf16 conv compute: compare direction + ranking, not exact values
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.995, cos
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


# ---------------- MAE/timm-style ViT restatement ----------------

class TorchViTBlock(tnn.Module):

    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * mlp_ratio)
        self.mlp.fc2 = tnn.Linear(dim * mlp_ratio, dim)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads,
                                       c // self.heads).permute(
                                           2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (c // self.heads)**-0.5
        att = att.softmax(dim=-1)
        h = (att @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        x = x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
        return x


class TorchViT(tnn.Module):
    """Param names identical to the official MAE/timm ViT checkpoints."""

    def __init__(self, image_size=32, patch=16, dim=64, depth=2, heads=2,
                 num_classes=10):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        n = (image_size // patch)**2
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


def test_mae_vit_convert_golden():
    torch.manual_seed(1)
    tm = TorchViT()
    tm.eval()
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    converted = convert_official_state_dict(sd, "mae_vit")

    from simpleaicv_tpu.models.backbones.vit import ViT
    model = ViT(patch_size=16, embedding_planes=64, block_nums=2, head_nums=2,
                image_size=32, num_classes=10)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), False))()
    n_params = len(jax.tree.leaves(variables["params"]))
    variables, n = apply_converted(variables, converted)
    assert n == n_params, (n, n_params)

    got = np.asarray(model.apply(variables, jnp.asarray(x), False))
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.995, cos
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


# ---------------- coverage checks via inverse naming ----------------

def _inverse_name(path_parts, leaf, arr):
    """Our flax path -> official torch name + OIHW/transposed array."""
    path = list(path_parts)
    if leaf == "kernel":
        suffix = "weight"
        arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
    elif leaf == "scale":
        suffix = "weight"
    elif leaf == "mean":
        suffix = "running_mean"
    elif leaf == "var":
        suffix = "running_var"
    else:
        suffix = leaf
    return ".".join(path + [suffix]), arr


def test_inception_v3_converter_coverage():
    """Every InceptionV3 param/stat is reachable from torchvision naming
    (names are structurally identical; layout conversion only)."""
    from flax.traverse_util import flatten_dict
    from simpleaicv_tpu.models.inception_v3 import InceptionV3
    model = InceptionV3()
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 75, 75, 3)), False))

    rng = np.random.RandomState(0)
    sd = {}
    for coll in ("params", "batch_stats"):
        for kparts, spec in flatten_dict(variables[coll]).items():
            arr = rng.rand(*spec.shape).astype(np.float32)
            name, arr = _inverse_name(kparts[:-1], kparts[-1], arr)
            sd[name] = arr

    converted = convert_official_state_dict(sd, "inception_v3")
    real_vars = {
        coll: jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                           variables[coll])
        for coll in ("params", "batch_stats")}
    _, n = apply_converted(real_vars, converted)
    expect = len(jax.tree.leaves(variables["params"])) + \
        len(jax.tree.leaves(variables["batch_stats"]))
    assert n == expect, (n, expect)


def test_convformer_converter_coverage():
    """ConvFormer params are reachable from metaformer-baselines naming."""
    from flax.traverse_util import flatten_dict
    model = BACKBONES.create("convformer_s18", num_classes=10)
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), False))

    import re
    rng = np.random.RandomState(0)
    sd = {}
    for kparts, spec in flatten_dict(variables["params"]).items():
        arr = rng.rand(*spec.shape).astype(np.float32)
        name, arr = _inverse_name(kparts[:-1], kparts[-1], arr)
        # our flax name -> official: stages_i_j -> stages.i.j, etc.
        name = re.sub(r"downsample_layers_(\d+)", r"downsample_layers.\1",
                      name)
        name = re.sub(r"stages_(\d+)_(\d+)", r"stages.\1.\2", name)
        sd[name] = arr
    converted = convert_official_state_dict(sd, "convformer")
    real_vars = {"params": jax.tree.map(
        lambda s: np.zeros(s.shape, np.float32), variables["params"])}
    _, n = apply_converted(real_vars, converted)
    n_params = len(jax.tree.leaves(variables["params"]))
    # BN running stats in our convformer live in batch_stats with names the
    # official LN-based checkpoints don't have; params must fully load
    assert n == n_params, (n, n_params)


def test_dinov2_vit_convert_golden():
    """DINOv2 official checkpoints: shared trunk converts; DINOv2-only
    tensors (mask_token / register_tokens / ls1,ls2 layer-scale) are
    dropped — the reference converter's key-intersection semantics
    (classification/weight_convert/convert_vit_dinov2_weight_from_official_
    dinov2_pretrain_weight.py:45-50)."""
    torch.manual_seed(3)
    tm = TorchViT()
    tm.eval()
    x = np.random.RandomState(3).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    del sd["head.weight"], sd["head.bias"]  # DINOv2 pretrain has no head
    # DINOv2-only keys that must be silently dropped
    sd["mask_token"] = np.zeros((1, 1, 64), np.float32)
    sd["register_tokens"] = np.zeros((1, 4, 64), np.float32)
    for i in range(2):
        sd[f"blocks.{i}.ls1.gamma"] = np.full((64,), 1e-5, np.float32)
        sd[f"blocks.{i}.ls2.gamma"] = np.full((64,), 1e-5, np.float32)

    converted = convert_official_state_dict(sd, "dinov2_vit")
    from flax.traverse_util import flatten_dict
    for path in flatten_dict(converted["params"]):
        assert "ls1" not in path and "register" not in path \
            and "mask_token" not in path, path

    from simpleaicv_tpu.models.backbones.vit import ViT
    model = ViT(patch_size=16, embedding_planes=64, block_nums=2,
                head_nums=2, image_size=32, num_classes=10)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), False))()
    n_params = len(jax.tree.leaves(variables["params"]))
    variables, n = apply_converted(variables, converted)
    assert n == n_params - 2, (n, n_params)  # all but fc kernel+bias

    # graft the torch head on so full logits are comparable
    variables["params"]["fc"]["kernel"] = jnp.asarray(
        tm.head.weight.detach().numpy().T)
    variables["params"]["fc"]["bias"] = jnp.asarray(
        tm.head.bias.detach().numpy())
    got = np.asarray(model.apply(variables, jnp.asarray(x), False))
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.995, cos
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
