import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.ops import rendering as R
from nerf_vo_tpu.ops import losses as L


def test_spacing_roundtrip():
    s = jnp.linspace(0, 1, 11)
    for name, (s2t, t2s) in R.SPACINGS.items():
        t = s2t(s, 0.1, 10.0)
        np.testing.assert_allclose(t2s(t, 0.1, 10.0), s, atol=1e-5, err_msg=name)
        assert float(t[0]) == np.float32(0.1) and abs(float(t[-1]) - 10.0) < 1e-4


def test_uniform_bins():
    edges = R.uniform_bins(None, 4, 8, stratified=False)
    assert edges.shape == (4, 9)
    np.testing.assert_allclose(edges[0], jnp.linspace(0, 1, 9), atol=1e-6)
    edges_s = R.uniform_bins(jax.random.PRNGKey(0), 4, 8)
    assert np.all(np.diff(np.asarray(edges_s), axis=-1) > 0)
    np.testing.assert_allclose(edges_s[:, 0], 0.0)
    np.testing.assert_allclose(edges_s[:, -1], 1.0)


def test_render_weights_opaque_and_empty():
    deltas = jnp.full((2, 4), 0.25)
    dens = jnp.asarray([[0.0, 1000.0, 1000.0, 0.0], [0.0, 0.0, 0.0, 0.0]])
    w, trans = R.render_weights(dens, deltas)
    np.testing.assert_allclose(w[0], [0, 1, 0, 0], atol=1e-4)  # all at first opaque
    np.testing.assert_allclose(w[1], 0.0, atol=1e-6)
    assert np.all(np.sum(np.asarray(w), -1) <= 1.0 + 1e-5)


def test_sample_pdf_concentrates():
    key = jax.random.PRNGKey(0)
    edges = jnp.broadcast_to(jnp.linspace(0, 1, 9), (3, 9))
    w = jnp.zeros((3, 8)).at[:, 4].set(1.0)  # all mass in bin [0.5, 0.625]
    new_edges = R.sample_pdf(key, edges, w, 16, histogram_padding=0.0)
    mids = 0.5 * (new_edges[:, 1:] + new_edges[:, :-1])
    frac_in = np.mean((np.asarray(mids) >= 0.5) & (np.asarray(mids) <= 0.625))
    assert frac_in > 0.8
    assert np.all(np.diff(np.asarray(new_edges), axis=-1) >= 0)


def test_render_depth_and_composite():
    w = jnp.asarray([[0.0, 1.0, 0.0]])
    t = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(R.render_depth(w, t), [2.0], atol=1e-6)
    vals = jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]])
    np.testing.assert_allclose(R.composite(w, vals), [[0, 1, 0]], atol=1e-6)
    out = R.composite(w * 0.5, vals, background=jnp.ones(3))
    np.testing.assert_allclose(out, [[0.5, 1.0, 0.5]], atol=1e-6)


def test_distortion_loss_prefers_compact():
    edges = jnp.broadcast_to(jnp.linspace(0, 1, 17), (1, 17))
    w_spread = jnp.full((1, 16), 1.0 / 16)
    w_compact = jnp.zeros((1, 16)).at[0, 8].set(1.0)
    assert float(R.distortion_loss(edges, w_compact)) < float(
        R.distortion_loss(edges, w_spread)
    )


def test_distortion_matches_bruteforce(rng):
    edges = jnp.asarray(np.sort(rng.uniform(0, 1, size=(2, 9)), axis=-1), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 0.2, size=(2, 8)), jnp.float32)
    got = float(R.distortion_loss(edges, w))
    sm = np.asarray(0.5 * (edges[:, 1:] + edges[:, :-1]))
    ds = np.asarray(edges[:, 1:] - edges[:, :-1])
    wn = np.asarray(w)
    total = 0.0
    for r in range(2):
        inter = sum(
            wn[r, i] * wn[r, j] * abs(sm[r, i] - sm[r, j])
            for i in range(8)
            for j in range(8)
        )
        total += inter + np.sum(wn[r] ** 2 * ds[r]) / 3.0
    np.testing.assert_allclose(got, total / 2.0, rtol=1e-4)


def test_interlevel_zero_when_consistent():
    edges = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
    w = jnp.full((2, 8), 0.1)
    loss = R.interlevel_loss(edges, w, edges, w)
    assert float(loss) < 1e-8
    # proposal that misses the final mass must be penalized
    w_bad = jnp.zeros((2, 8)).at[:, 0].set(0.8)
    assert float(R.interlevel_loss(edges, w_bad, edges, w)) > 1e-4


def test_sample_pdf_matches_searchsorted_reference(rng):
    """Telescoped-contraction inverse CDF == classic searchsorted interp."""
    R_, B, N = 11, 32, 16
    s = np.sort(rng.uniform(0, 1, (R_, B + 1)), axis=-1).astype(np.float32)
    w = (rng.uniform(0, 1, (R_, B)) * (rng.random((R_, B)) < 0.4)).astype(
        np.float32
    )
    got = np.asarray(
        R.sample_pdf(None, jnp.asarray(s), jnp.asarray(w), N,
                     stratified=False, histogram_padding=0.01)
    )
    u = np.linspace(0.0, 1.0, N + 1)
    for r in range(R_):
        wp = w[r] + 0.01
        cdf = np.concatenate([[0.0], np.cumsum(wp / wp.sum())])
        cdf = np.minimum(cdf, 1.0)
        cdf[-1] = 1.0
        # last edge with cdf <= u / first edge with cdf > u (terminal: last)
        below = np.clip(np.searchsorted(cdf, u, side="right") - 1, 0, B)
        above = np.clip(np.searchsorted(cdf, u, side="right"), 0, B)
        denom = np.maximum(cdf[above] - cdf[below], 1e-8)
        frac = np.clip((u - cdf[below]) / denom, 0.0, 1.0)
        ref = s[r][below] + frac * (s[r][above] - s[r][below])
        # f32 telescoped sums vs this f64 reference: ~1e-5 slop near
        # bracket boundaries
        np.testing.assert_allclose(got[r], ref, rtol=1e-4, atol=1e-4)
    assert np.all(np.diff(got, axis=-1) >= 0)


def test_outer_bounds_matches_searchsorted_reference(rng):
    """Mask-reduce _outer_bounds == the classic searchsorted formulation."""
    R_, B, K = 7, 13, 5
    t1 = np.sort(rng.uniform(0, 1, (R_, B + 1)), axis=-1)
    t0 = np.sort(rng.uniform(0, 1, (R_, K + 1)), axis=-1)
    y1 = rng.uniform(0, 1, (R_, B)).astype(np.float32)
    got = np.asarray(R._outer_bounds(jnp.asarray(t0), jnp.asarray(t1),
                                     jnp.asarray(y1)))
    for r in range(R_):
        cy1 = np.concatenate([[0.0], np.cumsum(y1[r])])
        lo = np.clip(np.searchsorted(t1[r], t0[r, :-1], side="right") - 1,
                     0, B)
        hi = np.clip(np.searchsorted(t1[r], t0[r, 1:], side="left"), 0, B)
        np.testing.assert_allclose(got[r], cy1[hi] - cy1[lo],
                                   rtol=1e-5, atol=1e-6)


def test_ds_nerf_depth_loss_minimized_at_gt():
    t = jnp.broadcast_to(jnp.linspace(0.1, 5.0, 32), (1, 32))
    deltas = jnp.full((1, 32), (5.0 - 0.1) / 32)
    sigma = 0.05
    d_gt = jnp.asarray([2.0])

    def loss_with_peak(center):
        w = jnp.exp(-((t - center) ** 2) / (2 * 0.01))
        w = w / jnp.sum(w)
        return float(L.ds_nerf_depth_loss(w, t, deltas, d_gt, sigma))

    assert loss_with_peak(2.0) < loss_with_peak(2.5)
    assert loss_with_peak(2.0) < loss_with_peak(1.0)


def test_depth_l2_loss_cov_weighting():
    pred = jnp.asarray([1.0, 2.0])
    tgt = jnp.asarray([2.0, 2.0])
    assert float(L.depth_l2_loss(pred, tgt)) == 0.5
    cov = jnp.asarray([4.0, 1.0])
    np.testing.assert_allclose(float(L.depth_l2_loss(pred, tgt, cov)), 0.125)
    # invalid (zero) target depths are masked out
    tgt0 = jnp.asarray([0.0, 3.0])
    np.testing.assert_allclose(float(L.depth_l2_loss(pred, tgt0)), 1.0)


def test_normal_loss_zero_for_equal():
    n = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    assert float(L.monosdf_normal_loss(n, n)) < 1e-6
    flipped = -n
    assert float(L.monosdf_normal_loss(n, flipped)) > 1.0


def test_sh_encode_shapes_and_constant():
    from nerf_vo_tpu.ops.sh import sh_encode

    d = jnp.asarray([[0.0, 0.0, 1.0]])
    for deg in (1, 2, 3, 4):
        out = sh_encode(d, deg)
        assert out.shape == (1, deg**2)
    np.testing.assert_allclose(out[0, 0], 0.28209479, atol=1e-6)
