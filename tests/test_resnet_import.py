"""Golden parity: Flax ResNet50 trunk/layer4 vs an independent torch
implementation with torchvision-compatible state-dict naming and the
reference stride surgery applied (detector.py:30-45).

torchvision itself is not installed in this image, so the torch side is
written here from the ResNet v1 definition — deliberately NCHW/torch-idiom so
the comparison crosses frameworks, layouts, and the checkpoint converter.
Frozen BatchNorm (eval mode, random running stats) makes it deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from visualbert_tpu.models.detector import ResNet50Layer4, ResNet50Trunk
from visualbert_tpu.tools.import_torch import convert_resnet50_state_dict


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride=1, stride_on_conv1=False):
        super().__init__()
        s1, s2 = (stride, 1) if stride_on_conv1 else (1, stride)
        self.conv1 = tnn.Conv2d(cin, width, 1, stride=s1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=s2, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU()
        if cin != width * 4 or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(width * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


def make_stage(cin, width, blocks, stride, stride_on_conv1):
    layers = [TorchBottleneck(cin, width, stride, stride_on_conv1)]
    for _ in range(blocks - 1):
        layers.append(TorchBottleneck(width * 4, width))
    return tnn.Sequential(*layers)


class TorchTrunk(tnn.Module):
    """conv1..layer3 with the reference surgery (stride on conv1 of the
    first block of layers 2/3; downsample keeps stride 2)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = make_stage(64, 64, 3, 1, False)
        self.layer2 = make_stage(256, 128, 4, 2, True)
        self.layer3 = make_stage(512, 256, 6, 2, True)
        # layer4: stride 1 everywhere (detector.py:37-38), used post-RoI
        self.layer4 = make_stage(1024, 512, 3, 1, True)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(x)))


@pytest.fixture(scope="module")
def torch_trunk():
    torch.manual_seed(0)
    m = TorchTrunk()
    # randomize BN running stats so frozen-BN math is actually exercised
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_trunk_matches_torch(torch_trunk):
    rng = np.random.RandomState(0)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_trunk(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)  # NCHW → NHWC

    tree = convert_resnet50_state_dict(
        {k: v.numpy() for k, v in torch_trunk.state_dict().items()}
    )
    model = ResNet50Trunk(dtype=jnp.float32)
    out = model.apply({"params": tree["backbone"]}, jnp.asarray(img))
    assert out.shape == ref.shape == (2, 4, 4, 1024)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_layer4_matches_torch(torch_trunk):
    rng = np.random.RandomState(1)
    roi = rng.randn(3, 7, 7, 1024).astype(np.float32)
    with torch.no_grad():
        ref = torch_trunk.layer4(torch.from_numpy(roi.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    tree = convert_resnet50_state_dict(
        {k: v.numpy() for k, v in torch_trunk.state_dict().items()}
    )
    model = ResNet50Layer4(dtype=jnp.float32)
    out = model.apply({"params": tree["after_roi_align"]}, jnp.asarray(roi))
    assert out.shape == ref.shape == (3, 7, 7, 2048)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sequential_renamed_checkpoint(torch_trunk):
    """The reference saves the trunk inside nn.Sequential wrappers
    (backbone.0.*, after_roi_align.0.*) — same tensors must land."""
    sd = {k: v.numpy() for k, v in torch_trunk.state_dict().items()}
    renamed = {}
    for k, v in sd.items():
        if k.startswith(("conv1.", "bn1.")):
            renamed[("backbone.0." if k.startswith("conv1.") else "backbone.1.") + k.split(".", 1)[1]] = v
        elif k.startswith("layer1."):
            renamed["backbone.4." + k.split(".", 1)[1]] = v
        elif k.startswith("layer2."):
            renamed["backbone.5." + k.split(".", 1)[1]] = v
        elif k.startswith("layer3."):
            renamed["backbone.6." + k.split(".", 1)[1]] = v
        elif k.startswith("layer4."):
            renamed["after_roi_align.0." + k.split(".", 1)[1]] = v
    t1 = convert_resnet50_state_dict(sd)
    t2 = convert_resnet50_state_dict(renamed)
    f1 = jax.tree.leaves(t1)
    f2 = jax.tree.leaves(t2)
    assert len(f1) == len(f2) > 0
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(a, b)


def test_s2d_stem_exact_equivalence():
    """The space-to-depth stem (4x4-stride-1 conv over 2x2-s2d input, masked
    phantom slots) must be EXACTLY the 7x7-stride-2 conv — same trunk output
    for the same 7x7 weights mapped through stem_7x7_to_s2d."""
    from visualbert_tpu.models.detector import (
        ResNet50Trunk,
        s2d_stem_mask,
        stem_7x7_to_s2d,
        stem_s2d_to_7x7,
    )

    rng = np.random.RandomState(0)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)

    ref = ResNet50Trunk(dtype=jnp.float32, blocks=(1, 1, 1), width_div=4,
                        s2d_stem=False)
    v = ref.init(jax.random.PRNGKey(0), jnp.asarray(img))
    out_ref = ref.apply(v, jnp.asarray(img))

    s2d = ResNet50Trunk(dtype=jnp.float32, blocks=(1, 1, 1), width_div=4,
                        s2d_stem=True)
    params = jax.tree.map(lambda x: x, v["params"])
    w7 = np.asarray(params["conv1"]["kernel"])
    params["conv1"] = {"kernel": jnp.asarray(stem_7x7_to_s2d(w7))}
    out_s2d = s2d.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    # kernel mapping round-trips losslessly (the export direction), and the
    # forward mask spans exactly the mapped slots
    np.testing.assert_array_equal(stem_s2d_to_7x7(stem_7x7_to_s2d(w7)), w7)
    m = s2d_stem_mask(3, w7.shape[-1])
    assert m.sum() == 7 * 7 * 3 * w7.shape[-1]
    assert (stem_7x7_to_s2d(np.ones_like(w7)) == m).all()


def test_resnet_export_round_trip(torch_trunk):
    """convert_resnet50_state_dict → export_resnet50_state_dict reproduces
    the torchvision-format dict exactly, INCLUDING the 7×7 stem recovered
    from the s2d layout (the lossless-export claim, both directions)."""
    from visualbert_tpu.tools.export_torch import export_resnet50_state_dict
    from visualbert_tpu.tools.import_torch import convert_resnet50_state_dict

    flat = {k: v.numpy() for k, v in torch_trunk.state_dict().items()
            if "num_batches_tracked" not in k}
    tree = convert_resnet50_state_dict(flat)  # s2d stem by default
    assert tree["backbone"]["conv1"]["kernel"].shape[:2] == (4, 4)
    back = export_resnet50_state_dict(tree)
    missing = set(flat) - set(back)
    assert not missing, sorted(missing)[:5]
    for k, v in flat.items():
        np.testing.assert_array_equal(back[k], np.asarray(v, np.float32),
                                      err_msg=k)
