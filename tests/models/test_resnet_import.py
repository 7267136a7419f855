"""torchvision ResNet state_dict -> flax backbone transplant tests
(VERDICT r2 missing #2: the reference injects torchvision pretrained weights
into the UniPose backbone, ``modules/pose_estimation/unipose/overrides.py:
33-46``; torchvision itself is absent here, so the tests build state_dicts
with torchvision's exact naming/shape conventions)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from pedestrians_video_2_carla_tpu.models.backbones.resnet import (  # noqa: E402
    ResNet, import_torchvision_resnet)
from pedestrians_video_2_carla_tpu.models.torch_import import \
    graft_resnet_backbone  # noqa: E402


class _TorchBottleneck(tnn.Module):
    """torchvision ``Bottleneck`` replica (same child names: conv1/bn1/
    conv2/bn2/conv3/bn3/downsample.0/downsample.1)."""

    def __init__(self, cin, features, stride=1):
        super().__init__()
        cout = features * 4
        self.conv1 = tnn.Conv2d(cin, features, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(features)
        self.conv2 = tnn.Conv2d(features, features, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(features)
        self.conv3 = tnn.Conv2d(features, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if cin != cout or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        y = self.bn1(self.conv1(x)).relu()
        y = self.bn2(self.conv2(y)).relu()
        y = self.bn3(self.conv3(y))
        r = x if self.downsample is None else self.downsample(x)
        return (y + r).relu()


class _TorchResNet(tnn.Module):
    """torchvision ``ResNet`` replica (conv1/bn1/layer{1..4}.{i} naming)."""

    def __init__(self, stage_sizes):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for stage, blocks in enumerate(stage_sizes):
            features = 64 * (2 ** stage)
            layers = []
            for b in range(blocks):
                layers.append(_TorchBottleneck(
                    cin, features, stride=(2 if stage > 0 and b == 0 else 1)))
                cin = features * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*layers))
        self.stage_sizes = stage_sizes

    def forward(self, x):
        y = self.maxpool(self.bn1(self.conv1(x)).relu())
        for s in range(len(self.stage_sizes)):
            y = getattr(self, f"layer{s + 1}")(y)
        return y


def test_resnet_import_forward_parity(rng):
    """Random-init torch ResNet (1,1,1,1) -> flax: forward match to 1e-4
    (same bar as the other four importers in test_torch_import.py)."""
    stage_sizes = (1, 1, 1, 1)
    torch.manual_seed(0)
    tmodel = _TorchResNet(stage_sizes).eval()
    # nonzero running stats so the BN import is actually exercised
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.1, 0.1)
            m.running_var.uniform_(0.7, 1.3)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "num_batches_tracked" not in k}
    params, stats = import_torchvision_resnet(sd, stage_sizes)

    x = rng.normal(size=(2, 33, 33, 3)).astype(np.float32)
    with torch.no_grad():
        expected = tmodel(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    expected = np.transpose(expected.numpy(), (0, 2, 3, 1))

    model = ResNet(stage_sizes=stage_sizes)
    high, _ = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(high), expected, atol=1e-4)


def _fake_torchvision_sd(stage_sizes):
    """Random state_dict with torchvision resnet50/101 naming + shapes."""
    g = np.random.default_rng(0)

    def t(*shape):
        return (g.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {"conv1.weight": t(64, 3, 7, 7),
          "bn1.weight": t(64), "bn1.bias": t(64),
          "bn1.running_mean": t(64),
          "bn1.running_var": np.abs(t(64)) + 1.0}
    cin = 64
    for stage, blocks in enumerate(stage_sizes):
        f = 64 * (2 ** stage)
        for b in range(blocks):
            p = f"layer{stage + 1}.{b}"
            for name, (o, i, k) in {
                    "conv1": (f, cin, 1), "conv2": (f, f, 3),
                    "conv3": (f * 4, f, 1)}.items():
                sd[f"{p}.{name}.weight"] = t(o, i, k, k)
                bn = name.replace("conv", "bn")
                sd[f"{p}.{bn}.weight"] = t(o)
                sd[f"{p}.{bn}.bias"] = t(o)
                sd[f"{p}.{bn}.running_mean"] = t(o)
                sd[f"{p}.{bn}.running_var"] = np.abs(t(o)) + 1.0
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = t(f * 4, cin, 1, 1)
                sd[f"{p}.downsample.1.weight"] = t(f * 4)
                sd[f"{p}.downsample.1.bias"] = t(f * 4)
                sd[f"{p}.downsample.1.running_mean"] = t(f * 4)
                sd[f"{p}.downsample.1.running_var"] = np.abs(t(f * 4)) + 1.0
            cin = f * 4
    return sd


def test_graft_resnet_backbone_into_unipose_tree():
    """Full resnet50-shaped state_dict grafts into the real UniPoseLSTM
    variables tree: every backbone leaf shape must match the model's
    (structure via eval_shape — no compute), and the 4-channel conv1
    (RGB + centermap) keeps its extra-channel slice."""
    from pedestrians_video_2_carla_tpu.models.pose_estimation.unipose_lstm \
        import UniPoseLSTM

    model = UniPoseLSTM(backbone="resnet50")
    x = jnp.zeros((1, 1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda k: model.init(k, x, training=False), jax.random.PRNGKey(0))
    # concretize only what the graft touches structurally
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))

    sd = _fake_torchvision_sd((3, 4, 6, 3))
    marker = np.array(params["ResNet_0"]["conv1"]["kernel"])
    marker[:, :, 3:, :] = 7.0  # the centermap input channel
    params["ResNet_0"] = {**params["ResNet_0"],
                          "conv1": {"kernel": marker}}
    new_params, new_stats = graft_resnet_backbone(sd, params, stats)

    ref_p = variables["params"]["ResNet_0"]
    got_p = new_params["ResNet_0"]
    assert jax.tree_util.tree_structure(ref_p) \
        == jax.tree_util.tree_structure(got_p)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_p),
            jax.tree_util.tree_leaves_with_path(got_p)):
        assert a.shape == b.shape, f"{kp}: {a.shape} vs {b.shape}"
    assert jax.tree_util.tree_structure(variables["batch_stats"]["ResNet_0"]) \
        == jax.tree_util.tree_structure(new_stats["ResNet_0"])
    # RGB slice replaced, centermap slice preserved
    k = new_params["ResNet_0"]["conv1"]["kernel"]
    np.testing.assert_array_equal(
        k[:, :, :3, :], np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(k[:, :, 3:, :], 7.0)


def test_graft_detects_resnet101():
    sd = _fake_torchvision_sd((3, 4, 23, 3))
    params = {"ResNet_0": {"conv1": {"kernel": np.zeros((7, 7, 4, 64),
                                                        np.float32)}}}
    new_params, _ = graft_resnet_backbone(sd, params, {})
    assert "layer3_22" in new_params["ResNet_0"]
