"""Round-trip validation of the droid.pth weight converter.

Builds a torch implementation of the upstream DROID-SLAM modules (written
here from the public architecture; the reference's submodule is empty —
its in-tree load_weights at nerf_vo/tracking/droid_slam.py:1257-1277 pins
the key layout), randomizes it, converts the state dict with
``convert_torch_checkpoint``, and asserts the Flax forward matches the
torch forward numerically. This is the same standard as the LPIPS
converter test (tests/test_lpips.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_vo_tpu.models.droid_net import (  # noqa: E402
    DroidNet,
    convert_torch_checkpoint,
    cvx_upsample,
    init_droid_params,
)


# ---------------------------------------------------------------------------
# torch reference modules (upstream DROID-SLAM layout)
# ---------------------------------------------------------------------------

class TResidualBlock(tnn.Module):
    def __init__(self, in_planes, planes, norm_fn="instance", stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_planes, planes, 3, padding=1,
                                stride=stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        self.relu = tnn.ReLU(inplace=True)
        if norm_fn == "instance":
            self.norm1 = tnn.InstanceNorm2d(planes)
            self.norm2 = tnn.InstanceNorm2d(planes)
            self.norm3 = tnn.InstanceNorm2d(planes)
        else:
            self.norm1 = tnn.Sequential()
            self.norm2 = tnn.Sequential()
            self.norm3 = tnn.Sequential()
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_planes, planes, 1, stride=stride), self.norm3
            )

    def forward(self, x):
        y = x
        y = self.relu(self.norm1(self.conv1(y)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class TBasicEncoder(tnn.Module):
    def __init__(self, output_dim=128, norm_fn="instance"):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = (
            tnn.InstanceNorm2d(64) if norm_fn == "instance"
            else tnn.Sequential()
        )
        self.relu1 = tnn.ReLU(inplace=True)

        def layer(inp, planes, stride):
            return tnn.Sequential(
                TResidualBlock(inp, planes, norm_fn, stride),
                TResidualBlock(planes, planes, norm_fn, 1),
            )

        self.layer1 = layer(64, 64, 1)
        self.layer2 = layer(64, 96, 2)
        self.layer3 = layer(96, 128, 2)
        self.conv2 = tnn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.conv2(x)


class TConvGRU(tnn.Module):
    def __init__(self, h_planes=128, i_planes=320):
        super().__init__()
        self.convz = tnn.Conv2d(h_planes + i_planes, h_planes, 3, padding=1)
        self.convr = tnn.Conv2d(h_planes + i_planes, h_planes, 3, padding=1)
        self.convq = tnn.Conv2d(h_planes + i_planes, h_planes, 3, padding=1)
        self.w = tnn.Conv2d(h_planes, h_planes, 1)
        self.convz_glo = tnn.Conv2d(h_planes, h_planes, 1)
        self.convr_glo = tnn.Conv2d(h_planes, h_planes, 1)
        self.convq_glo = tnn.Conv2d(h_planes, h_planes, 1)

    def forward(self, net, *inputs):
        inp = torch.cat(inputs, dim=1)
        net_inp = torch.cat([net, inp], dim=1)
        b, c, h, w = net.shape
        glo = torch.sigmoid(self.w(net)) * net
        glo = glo.view(b, c, h * w).mean(-1).view(b, c, 1, 1)
        z = torch.sigmoid(self.convz(net_inp) + self.convz_glo(glo))
        r = torch.sigmoid(self.convr(net_inp) + self.convr_glo(glo))
        q = torch.tanh(
            self.convq(torch.cat([r * net, inp], dim=1)) + self.convq_glo(glo)
        )
        return (1 - z) * net + z * q


class TGraphAgg(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(128, 128, 3, padding=1)
        self.conv2 = tnn.Conv2d(128, 128, 3, padding=1)
        self.relu = tnn.ReLU(inplace=True)
        self.eta = tnn.Sequential(tnn.Conv2d(128, 1, 3, padding=1),
                                  tnn.Softplus())
        self.upmask = tnn.Sequential(tnn.Conv2d(128, 8 * 8 * 9, 1))

    def forward(self, net, ii):
        # test uses ii covering 0..F-1, so unique-inverse == identity
        E, ch, ht, wd = net.shape
        F_ = int(ii.max()) + 1
        net = self.relu(self.conv1(net))
        pooled = torch.zeros(F_, ch, ht, wd)
        count = torch.zeros(F_)
        for e in range(E):
            pooled[ii[e]] += net[e]
            count[ii[e]] += 1
        pooled = pooled / count.clamp(min=1)[:, None, None, None]
        net = self.relu(self.conv2(pooled))
        eta = self.eta(net)[:, 0]
        upmask = self.upmask(net)
        return 0.01 * eta, upmask


class TUpdateModule(tnn.Module):
    def __init__(self):
        super().__init__()
        cor_planes = 4 * 49
        self.corr_encoder = tnn.Sequential(
            tnn.Conv2d(cor_planes, 128, 1, padding=0), tnn.ReLU(inplace=True),
            tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(inplace=True),
        )
        self.flow_encoder = tnn.Sequential(
            tnn.Conv2d(4, 128, 7, padding=3), tnn.ReLU(inplace=True),
            tnn.Conv2d(128, 64, 3, padding=1), tnn.ReLU(inplace=True),
        )
        # upstream heads emit 3 channels; the SLAM frontend uses [..., :2]
        self.weight = tnn.Sequential(
            tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.Conv2d(128, 3, 3, padding=1), tnn.Sequential(),  # GradClip
            tnn.Sigmoid(),
        )
        self.delta = tnn.Sequential(
            tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.Conv2d(128, 3, 3, padding=1), tnn.Sequential(),  # GradClip
        )
        self.gru = TConvGRU(128, 128 + 128 + 64)
        self.agg = TGraphAgg()

    def forward(self, net, inp, corr, flow, ii):
        corr = self.corr_encoder(corr)
        flow = self.flow_encoder(flow)
        net = self.gru(net, inp, corr, flow)
        delta = self.delta(net)[:, :2]
        weight = self.weight(net)[:, :2]
        eta, upmask = self.agg(net, ii)
        return net, delta, weight, eta, upmask


class TDroidNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TBasicEncoder(128, "instance")
        self.cnet = TBasicEncoder(256, "none")
        self.update = TUpdateModule()


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(np.asarray(x), -1, 1)
    ).astype(np.float32))


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.fixture(scope="module")
def nets():
    torch.manual_seed(7)
    tnet = TDroidNet()
    tnet.eval()
    sd = {"module." + k: v for k, v in tnet.state_dict().items()}
    params = convert_torch_checkpoint(sd)
    model, _ = init_droid_params(jax.random.PRNGKey(0), 64, 64)
    return tnet, model, params


def test_feature_encoder_parity(nets, rng):
    tnet, model, params = nets
    x = rng.standard_normal((1, 64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(tnet.fnet(_nchw(x)))
    out = np.asarray(model.apply(params, jnp.asarray(x),
                                 method=model.encode_features))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_context_encoder_parity(nets, rng):
    tnet, model, params = nets
    x = rng.standard_normal((1, 64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        c = tnet.cnet(_nchw(x))
        t_net, t_inp = torch.split(c, [128, 128], dim=1)
        ref_net = _nhwc(torch.tanh(t_net))
        ref_inp = _nhwc(torch.relu(t_inp))
    o_net, o_inp = model.apply(params, jnp.asarray(x),
                               method=model.encode_context)
    np.testing.assert_allclose(np.asarray(o_net), ref_net, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_inp), ref_inp, rtol=1e-4,
                               atol=1e-4)


def test_update_module_parity(nets, rng):
    tnet, model, params = nets
    E, h, w, F_ = 5, 8, 10, 3
    net = rng.standard_normal((E, h, w, 128)).astype(np.float32) * 0.5
    inp = rng.standard_normal((E, h, w, 128)).astype(np.float32) * 0.5
    corr = rng.standard_normal((E, h, w, 196)).astype(np.float32)
    flow = rng.standard_normal((E, h, w, 4)).astype(np.float32)
    ii = np.asarray([0, 0, 1, 2, 2])

    with torch.no_grad():
        t_out = tnet.update(
            _nchw(net), _nchw(inp), _nchw(corr), _nchw(flow),
            torch.from_numpy(ii),
        )
    o_net, o_delta, o_weight, o_eta, o_upmask = model.apply(
        params, jnp.asarray(net), jnp.asarray(inp), jnp.asarray(corr),
        jnp.asarray(flow), jnp.asarray(ii), F_,
        method=model.update_step,
    )
    np.testing.assert_allclose(np.asarray(o_net), _nhwc(t_out[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_delta), _nhwc(t_out[1]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_weight), _nhwc(t_out[2]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_eta), t_out[3].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_upmask), _nhwc(t_out[4]),
                               rtol=1e-4, atol=1e-4)


def test_cvx_upsample_matches_torch_unfold(rng):
    """The 576-channel mask layout must match torch's (9, 8, 8) view +
    zero-padded unfold so converted agg.upmask weights drop in."""
    N, h, w = 2, 4, 5
    data = rng.standard_normal((N, h, w)).astype(np.float32)
    mask = rng.standard_normal((N, h, w, 576)).astype(np.float32)

    d = torch.from_numpy(data)[:, None]  # [N, 1, h, w]
    m = torch.from_numpy(np.moveaxis(mask, -1, 1))  # [N, 576, h, w]
    m = m.view(N, 9, 8, 8, h, w)
    m = torch.softmax(m, dim=1)
    up_d = F.unfold(d, [3, 3], padding=1).view(N, 9, 1, 1, h, w)
    ref = torch.sum(m * up_d, dim=1)  # [N, 8, 8, h, w]
    ref = ref.permute(0, 3, 1, 4, 2).reshape(N, 8 * h, 8 * w).numpy()

    out = np.asarray(cvx_upsample(jnp.asarray(data), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
