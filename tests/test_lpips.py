"""LPIPS(alex) implementation tests (random weights; properties + converter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.evaluation import lpips as L


@pytest.fixture(scope="module")
def params():
    return L.init_params(jax.random.PRNGKey(0))


def test_identity_is_zero(params, rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    d = L.lpips_alex(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_symmetric_and_positive(params, rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    dxy = float(L.lpips_alex(params, x, y)[0])
    dyx = float(L.lpips_alex(params, y, x)[0])
    assert dxy > 0
    np.testing.assert_allclose(dxy, dyx, rtol=1e-5)


def test_monotone_in_perturbation(params, rng):
    x = jnp.asarray(rng.uniform(0.2, 0.8, (1, 64, 64, 3)), jnp.float32)
    n = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    d_small = float(L.lpips_alex(params, x, x + 0.01 * n)[0])
    d_large = float(L.lpips_alex(params, x, x + 0.1 * n)[0])
    assert d_large > d_small


def test_torch_converter_layouts(tmp_path, params, rng):
    """Both supported torch key layouts convert to the same param tree."""
    torch = pytest.importorskip("torch")

    tv_idx = (0, 3, 6, 8, 10)
    cin = 3
    sd_tv, sd_lpips = {}, {}
    for i, (cout, k, _, _, _) in enumerate(L._ALEX):
        w = torch.randn(cout, cin, k, k)
        b = torch.randn(cout)
        lin = torch.rand(1, cout, 1, 1)
        sd_tv[f"features.{tv_idx[i]}.weight"] = w
        sd_tv[f"features.{tv_idx[i]}.bias"] = b
        sd_tv[f"lin{i}.model.1.weight"] = lin
        s, li = ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10))[i]
        sd_lpips[f"net.slice{s}.{li}.weight"] = w
        sd_lpips[f"net.slice{s}.{li}.bias"] = b
        sd_lpips[f"lins.{i}.model.1.weight"] = lin
        cin = cout

    p_tv = tmp_path / "tv.pth"
    p_lp = tmp_path / "lp.pth"
    torch.save(sd_tv, str(p_tv))
    torch.save(sd_lpips, str(p_lp))
    a = L.load_torch_weights(str(p_tv))
    b = L.load_torch_weights(str(p_lp))
    for key in a:
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]))
    assert a["conv0_w"].shape == (11, 11, 3, 64)
    assert a["lin2"].shape == (384,)

    # converted weights drive the metric end to end
    x = np.asarray(rng.uniform(0, 1, (32, 32, 3)), np.float32)
    y = np.asarray(rng.uniform(0, 1, (32, 32, 3)), np.float32)
    d = L.lpips_from_file(x, y, str(p_tv))
    assert np.isfinite(d) and d > 0
