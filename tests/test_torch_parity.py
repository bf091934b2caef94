"""Forward parity against a PyTorch ResNet-18 (BASELINE.md fp-tolerance target).

A minimal torchvision-compatible ResNet-18 is defined in-test (same
architecture, same state_dict naming), randomly initialized; its weights are
converted with models.torch_import and both frameworks run the same input.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from wsiseg_tpu.models.resnet import ResNetEncoder  # noqa: E402
from wsiseg_tpu.models.torch_import import (convert_resnet_state_dict,  # noqa: E402
                                            graft_encoder)


class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class _TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_TorchBasicBlock(64, 64), _TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(_TorchBasicBlock(64, 128, 2), _TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(_TorchBasicBlock(128, 256, 2), _TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(_TorchBasicBlock(256, 512, 2), _TorchBasicBlock(512, 512))

    def forward(self, x):
        c1 = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(c1)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c5, c4, c3, c2, c1


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = _TorchResNet18()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_encoder_forward_parity_with_torch(torch_model):
    x = np.random.RandomState(0).randn(2, 48, 48, 3).astype(np.float32)

    with torch.no_grad():
        t5, t4, t3, t2, t1 = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    converted = convert_resnet_state_dict(sd)

    enc = ResNetEncoder(arch="resnet18", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = graft_encoder(dict(variables), converted, encoder_name="")

    feats = enc.apply(variables, jnp.asarray(x))
    for ours, theirs, tol in [
        (feats[4], t1, 1e-4), (feats[3], t2, 1e-4), (feats[2], t3, 1e-4),
        (feats[1], t4, 2e-4), (feats[0], t5, 5e-4),
    ]:
        ref = theirs.numpy().transpose(0, 2, 3, 1)
        got = np.asarray(ours)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=tol, rtol=1e-3)


def test_converter_rejects_shape_mismatch(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    sd["conv1.weight"] = sd["conv1.weight"][:, :, :3, :3]  # corrupt
    converted = convert_resnet_state_dict(sd)
    enc = ResNetEncoder(arch="resnet18", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="shape mismatch"):
        graft_encoder(dict(variables), converted, encoder_name="")
