"""Round-trip validation of the dpvo.pth weight converter.

Builds a torch implementation of the upstream DPVO modules (written here
from the public architecture — the reference's submodule is empty), loads
its randomized state dict through ``convert_torch_checkpoint``, and
asserts the Flax forward matches the torch forward numerically. Same
standard as tests/test_lpips.py and tests/test_convert_droid.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_vo_tpu.models.dpvo_net import (  # noqa: E402
    DPVONet,
    convert_torch_checkpoint,
    init_dpvo_params,
)

DIM = 384


class TResidualBlock(tnn.Module):
    def __init__(self, in_planes, planes, norm_fn="instance", stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_planes, planes, 3, padding=1,
                                stride=stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        self.relu = tnn.ReLU(inplace=True)
        mk = (lambda: tnn.InstanceNorm2d(planes)) if norm_fn == "instance" \
            else (lambda: tnn.Sequential())
        self.norm1, self.norm2, self.norm3 = mk(), mk(), mk()
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_planes, planes, 1, stride=stride), self.norm3
            )

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class TBasicEncoder4(tnn.Module):
    def __init__(self, output_dim=128, norm_fn="instance"):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 32, 7, stride=2, padding=3)
        self.norm1 = (tnn.InstanceNorm2d(32) if norm_fn == "instance"
                      else tnn.Sequential())
        self.relu1 = tnn.ReLU(inplace=True)
        self.layer1 = tnn.Sequential(
            TResidualBlock(32, 32, norm_fn, 1),
            TResidualBlock(32, 32, norm_fn, 1),
        )
        self.layer2 = tnn.Sequential(
            TResidualBlock(32, 64, norm_fn, 2),
            TResidualBlock(64, 64, norm_fn, 1),
        )
        self.conv2 = tnn.Conv2d(64, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        return self.conv2(x)


class TPatchify(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TBasicEncoder4(128, "instance")
        self.inet = TBasicEncoder4(DIM, "none")


class TSoftAgg(tnn.Module):
    def __init__(self, dim=DIM):
        super().__init__()
        self.f = tnn.Linear(dim, dim)
        self.g = tnn.Linear(dim, dim)
        self.h = tnn.Linear(dim, dim)

    def forward(self, x, ix):
        # channel-wise segment softmax (torch_scatter.scatter_softmax)
        _, jx = torch.unique(ix, return_inverse=True)
        G = int(jx.max()) + 1
        gx, fx = self.g(x), self.f(x)
        out_w = torch.zeros_like(gx)
        y = torch.zeros(G, gx.shape[1])
        for gi in range(G):
            m = jx == gi
            w = torch.softmax(gx[m], dim=0)
            out_w[m] = w
            y[gi] = (fx[m] * w).sum(0)
        return self.h(y)[jx]


class TGatedResidual(tnn.Module):
    def __init__(self, dim=DIM):
        super().__init__()
        self.gate = tnn.Sequential(tnn.Linear(dim, dim), tnn.Sigmoid())
        self.res = tnn.Sequential(tnn.Linear(dim, dim),
                                  tnn.ReLU(inplace=True),
                                  tnn.Linear(dim, dim))

    def forward(self, x):
        return x + self.gate(x) * self.res(x)


class TUpdate(tnn.Module):
    def __init__(self, p=3):
        super().__init__()
        self.c1 = tnn.Sequential(tnn.Linear(DIM, DIM),
                                 tnn.ReLU(inplace=True),
                                 tnn.Linear(DIM, DIM))
        self.c2 = tnn.Sequential(tnn.Linear(DIM, DIM),
                                 tnn.ReLU(inplace=True),
                                 tnn.Linear(DIM, DIM))
        self.norm = tnn.LayerNorm(DIM, eps=1e-3)
        self.agg_kk = TSoftAgg(DIM)
        self.agg_ij = TSoftAgg(DIM)
        self.gru = tnn.Sequential(
            tnn.LayerNorm(DIM, eps=1e-3), TGatedResidual(DIM),
            tnn.LayerNorm(DIM, eps=1e-3), TGatedResidual(DIM),
        )
        self.corr = tnn.Sequential(
            tnn.Linear(2 * 49 * p * p, DIM), tnn.ReLU(inplace=True),
            tnn.Linear(DIM, DIM), tnn.LayerNorm(DIM, eps=1e-3),
            tnn.ReLU(inplace=True), tnn.Linear(DIM, DIM),
        )
        self.d = tnn.Sequential(tnn.ReLU(inplace=False),
                                tnn.Linear(DIM, 2), tnn.Sequential())
        self.w = tnn.Sequential(tnn.ReLU(inplace=False),
                                tnn.Linear(DIM, 2), tnn.Sequential(),
                                tnn.Sigmoid())
        self.lmbda = tnn.Parameter(torch.zeros(1))  # dropped by converter

    def forward(self, net, inp, corr, ix, jx, kk, pair):
        net = net + inp + self.corr(corr)
        net = self.norm(net)
        mask_ix = (ix >= 0).float()[:, None]
        mask_jx = (jx >= 0).float()[:, None]
        net = net + self.c1(mask_ix * net[ix.clamp(min=0)])
        net = net + self.c2(mask_jx * net[jx.clamp(min=0)])
        net = net + self.agg_kk(net, kk)
        net = net + self.agg_ij(net, pair)
        net = self.gru(net)
        return net, self.d(net), self.w(net)


class TVONet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.patchify = TPatchify()
        self.update = TUpdate(3)


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(np.asarray(x), -1, 1)).astype(np.float32))


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.fixture(scope="module")
def nets():
    torch.manual_seed(11)
    tnet = TVONet()
    tnet.eval()
    sd = {"module." + k: v for k, v in tnet.state_dict().items()}
    params = convert_torch_checkpoint(sd)
    model = DPVONet()
    return tnet, model, params


def test_encoder_parity(nets, rng):
    tnet, model, params = nets
    img = rng.uniform(0, 255, (1, 48, 64, 3)).astype(np.float32)
    x = 2.0 * (img / 255.0) - 0.5
    with torch.no_grad():
        ref_f = _nhwc(tnet.patchify.fnet(_nchw(x))) / 4.0
        ref_i = _nhwc(tnet.patchify.inet(_nchw(x))) / 4.0
    f1, f2, im = model.apply(params, jnp.asarray(img), method=model.encode)
    np.testing.assert_allclose(np.asarray(f1), ref_f, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref_i, rtol=1e-4, atol=1e-4)
    # pyramid level 1 = 2x2 average pool of level 0
    ref_f2 = ref_f.reshape(1, 6, 2, 8, 2, 128).mean((2, 4))
    np.testing.assert_allclose(np.asarray(f2), ref_f2, rtol=1e-4, atol=1e-4)


def test_update_parity(nets, rng):
    tnet, model, params = nets
    E = 12
    net = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    imap = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    corr = rng.standard_normal((E, 882)).astype(np.float32)
    # a small patch graph: 4 patches x 3 target frames, all edges live
    kk = np.repeat(np.arange(4), 3).astype(np.int32)
    jj = np.tile(np.arange(3), 4).astype(np.int32)
    pair = jj.copy()  # single host frame -> pair group == target frame
    # temporal neighbors within each patch's edge triple
    ix = np.where(jj > 0, np.arange(E) - 1, -1).astype(np.int32)
    jx = np.where(jj < 2, np.arange(E) + 1, -1).astype(np.int32)

    with torch.no_grad():
        t_net, t_d, t_w = tnet.update(
            torch.from_numpy(net), torch.from_numpy(imap),
            torch.from_numpy(corr), torch.from_numpy(ix),
            torch.from_numpy(jx), torch.from_numpy(kk),
            torch.from_numpy(pair),
        )
    o_net, o_d, o_w = model.apply(
        params, jnp.asarray(net), jnp.asarray(imap), jnp.asarray(corr),
        jnp.asarray(kk), jnp.asarray(pair), jnp.asarray(ix),
        jnp.asarray(jx), jnp.ones((E,), bool), 4, 3,
        method=model.update_step,
    )
    np.testing.assert_allclose(np.asarray(o_net), t_net.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_d), t_d.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_w), t_w.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_update_member_table_route(nets, rng):
    """The gather-route SoftAgg (host member tables) must match torch and
    the scatter route bit-for-bit-ish on live lanes — it is the production
    path in the tracker (mt_kk/mt_ij derived from nbr_tab)."""
    tnet, model, params = nets
    E = 12
    net = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    imap = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    corr = rng.standard_normal((E, 882)).astype(np.float32)
    kk = np.repeat(np.arange(4), 3).astype(np.int32)
    jj = np.tile(np.arange(3), 4).astype(np.int32)
    pair = jj.copy()
    ix = np.where(jj > 0, np.arange(E) - 1, -1).astype(np.int32)
    jx = np.where(jj < 2, np.arange(E) + 1, -1).astype(np.int32)
    # member tables (one pad slot each to exercise the -1 masking)
    mt_kk = np.full((4, 4), -1, np.int32)
    mt_kk[:, :3] = np.arange(12).reshape(4, 3)
    mt_ij = np.full((3, 5), -1, np.int32)
    mt_ij[:, :4] = np.arange(12).reshape(4, 3).T

    with torch.no_grad():
        t_net, t_d, t_w = tnet.update(
            torch.from_numpy(net), torch.from_numpy(imap),
            torch.from_numpy(corr), torch.from_numpy(ix),
            torch.from_numpy(jx), torch.from_numpy(kk),
            torch.from_numpy(pair),
        )
    o_net, o_d, o_w = model.apply(
        params, jnp.asarray(net), jnp.asarray(imap), jnp.asarray(corr),
        jnp.asarray(kk), jnp.asarray(pair), jnp.asarray(ix),
        jnp.asarray(jx), jnp.ones((E,), bool), 4, 3, 0,
        jnp.asarray(mt_kk), jnp.asarray(mt_ij),
        method=model.update_step,
    )
    np.testing.assert_allclose(np.asarray(o_net), t_net.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_d), t_d.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_w), t_w.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_dead_edges_cannot_pollute(nets, rng):
    """Padding edges routed to the trash groups must not change live
    edges' outputs (upstream has no padding; this pins our masking)."""
    tnet, model, params = nets
    E = 6
    net = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    imap = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    corr = rng.standard_normal((E, 882)).astype(np.float32)
    kk = np.asarray([0, 0, 1, 1, 2, 2], np.int32)
    pair = np.asarray([0, 1, 0, 1, 2, 2], np.int32)
    ix = np.full(E, -1, np.int32)
    jx = np.full(E, -1, np.int32)
    live = np.ones(E, bool)

    out_full = model.apply(
        params, jnp.asarray(net), jnp.asarray(imap), jnp.asarray(corr),
        jnp.asarray(kk), jnp.asarray(pair), jnp.asarray(ix),
        jnp.asarray(jx), jnp.asarray(live), 4, 4,
        method=model.update_step,
    )

    # kill the last two edges: route to trash groups 4/4
    kk2 = kk.copy(); kk2[4:] = 4
    pair2 = pair.copy(); pair2[4:] = 4
    live2 = live.copy(); live2[4:] = False
    out_masked = model.apply(
        params, jnp.asarray(net), jnp.asarray(imap), jnp.asarray(corr),
        jnp.asarray(kk2), jnp.asarray(pair2), jnp.asarray(ix),
        jnp.asarray(jx), jnp.asarray(live2), 4, 4,
        method=model.update_step,
    )
    # live edges 0-3 unaffected by the two trash edges
    for a, b in zip(out_full, out_masked):
        np.testing.assert_allclose(np.asarray(a)[:4], np.asarray(b)[:4],
                                   rtol=1e-5, atol=1e-5)


def test_dead_edges_cannot_pollute_member_table(nets, rng):
    """Member-table variant of the pollution test (ADVICE r4): on the
    gather route, dead-edge exclusion depends on the tracker OMITTING dead
    slots from mt_kk/mt_ij (nbr_idx routes them to the trash row), not on
    the trash group. Build tables that list only the live edges and assert
    live lanes match a live-only scatter-route reference."""
    tnet, model, params = nets
    E = 6
    net = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    imap = rng.standard_normal((E, DIM)).astype(np.float32) * 0.5
    corr = rng.standard_normal((E, 882)).astype(np.float32)
    kk = np.asarray([0, 0, 1, 1, 2, 2], np.int32)
    pair = np.asarray([0, 1, 0, 1, 2, 2], np.int32)
    ix = np.full(E, -1, np.int32)
    jx = np.full(E, -1, np.int32)

    # scatter-route reference with edges 4/5 dead (pinned correct by
    # test_dead_edges_cannot_pollute)
    kk2 = kk.copy(); kk2[4:] = 4
    pair2 = pair.copy(); pair2[4:] = 4
    live2 = np.asarray([True] * 4 + [False] * 2)
    out_ref = model.apply(
        params, jnp.asarray(net), jnp.asarray(imap), jnp.asarray(corr),
        jnp.asarray(kk2), jnp.asarray(pair2), jnp.asarray(ix),
        jnp.asarray(jx), jnp.asarray(live2), 4, 4,
        method=model.update_step,
    )

    # member tables that OMIT the dead edges (exactly what nbr_idx-based
    # construction produces: dead edges scatter to the trash row, which is
    # sliced off): group 2 lists no members at all.
    mt_kk = np.full((4, 3), -1, np.int32)
    mt_kk[0, :2] = [0, 1]
    mt_kk[1, :2] = [2, 3]
    mt_ij = np.full((4, 3), -1, np.int32)
    mt_ij[0, :2] = [0, 2]
    mt_ij[1, :2] = [1, 3]
    out_mt = model.apply(
        params, jnp.asarray(net), jnp.asarray(imap), jnp.asarray(corr),
        jnp.asarray(kk2), jnp.asarray(pair2), jnp.asarray(ix),
        jnp.asarray(jx), jnp.asarray(live2), 4, 4, 0,
        jnp.asarray(mt_kk), jnp.asarray(mt_ij),
        method=model.update_step,
    )
    for a, b in zip(out_ref, out_mt):
        np.testing.assert_allclose(np.asarray(a)[:4], np.asarray(b)[:4],
                                   rtol=1e-5, atol=1e-5)
