"""LPIPS numeric parity vs a torch reference (VERDICT round-1 weak #6).

The converter (models/vae2d/lpips.py::load_lpips_params) maps
torchvision-layout VGG16 weights + vgg_lpips linear heads into the flax
LPIPS pytree. No published weights ship in this image, so parity is proven
against a torch-side reimplementation of the reference formula
(opensora/models/vae/lpips.py: scaling layer -> VGG16 relu taps ->
unit-normalize -> 1x1 heads -> spatial mean -> sum) built from the SAME
random torchvision-layout state dict. Converter + architecture + math all
have to agree for these to match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# torchvision vgg16.features layout: Sequential indices of convs; relu taps
# relu1_2/2_2/3_3/4_3/5_3 sit right after convs 1, 3, 6, 9, 12
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_TAP_SEQ = {3, 8, 15, 22, 29}  # Sequential index of the tapped relus
_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_vgg16_features():
    layers, in_ch = [], 3
    for v in _CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU())
            in_ch = v
    return torch.nn.Sequential(*layers)


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    d = tmp_path_factory.mktemp("lpips")
    torch.manual_seed(0)
    net = _torch_vgg16_features()
    # torchvision checkpoint layout: "features.<seq_idx>.{weight,bias}"
    sd = {f"features.{k.split('.')[0]}.{k.split('.')[1]}": v
          for k, v in net.state_dict().items()}
    vgg_path = str(d / "vgg16.pth")
    torch.save(sd, vgg_path)
    # vgg_lpips head layout: "lin<i>.model.1.weight" of shape (1, C, 1, 1)
    lp = {
        f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
        for i, c in enumerate(_CHANNELS)
    }
    lp_path = str(d / "lpips_heads.pth")
    torch.save(lp, lp_path)
    return net, vgg_path, lp, lp_path


def _torch_taps(net, x):
    feats, h = [], x
    for i, layer in enumerate(net):
        h = layer(h)
        if i in _TAP_SEQ:
            feats.append(h)
    return feats


def _torch_lpips(net, lp, x, y):
    """Reference formula (opensora/models/vae/lpips.py forward)."""
    def norm(t, eps=1e-10):
        return t / (t.pow(2).sum(dim=1, keepdim=True).sqrt() + eps)

    xin = (x - _SHIFT) / _SCALE
    yin = (y - _SHIFT) / _SCALE
    total = 0.0
    for i, (a, b) in enumerate(zip(_torch_taps(net, xin), _torch_taps(net, yin))):
        diff = (norm(a) - norm(b)) ** 2
        w = lp[f"lin{i}.model.1.weight"]
        lin = torch.nn.functional.conv2d(diff, w)
        total = total + lin.mean(dim=(2, 3), keepdim=True)
    return total


def test_vgg_tap_parity(weights):
    from opensora_tpu.models.vae2d.lpips import VGG16Features, load_lpips_params

    net, vgg_path, _, _ = weights
    variables = load_lpips_params(vgg_path)
    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        ref = _torch_taps(net, torch.from_numpy(x))
    got = VGG16Features().apply(
        {"params": variables["params"]["vgg"]}, np.transpose(x, (0, 2, 3, 1))
    )
    assert len(got) == len(ref) == 5
    for i, (a, b) in enumerate(zip(got, ref)):
        b = b.permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC
        np.testing.assert_allclose(
            np.asarray(a), b, atol=2e-4, rtol=2e-4, err_msg=f"tap {i}"
        )


def test_lpips_distance_parity(weights):
    from opensora_tpu.models.vae2d.lpips import LPIPS, load_lpips_params

    net, vgg_path, lp, lp_path = weights
    variables = load_lpips_params(vgg_path, lp_path)
    rng = np.random.default_rng(2)
    x = np.clip(rng.normal(scale=0.5, size=(2, 3, 64, 64)), -1, 1).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.2, size=x.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        ref = _torch_lpips(net, lp, torch.from_numpy(x), torch.from_numpy(y))
    got = LPIPS().apply(variables, x, y)
    assert got.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray(got).ravel(), ref.numpy().ravel(), atol=1e-4, rtol=1e-3
    )
    # distance of an image to itself is exactly zero
    same = LPIPS().apply(variables, x, x)
    assert float(np.abs(np.asarray(same)).max()) < 1e-7
