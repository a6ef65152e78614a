import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.ops import hash_grid
from nerf_vo_tpu.ops.hash_grid import HashGridConfig

CFG = HashGridConfig(
    n_levels=4, features_per_level=2, log2_table_size=10,
    base_resolution=4, max_resolution=32,
)


def _np_reference_encode(tables, x, cfg):
    """Independent numpy trilinear BRICK-grid implementation (3x3x3 corner
    bricks over 2x2x2-cell regions; dense brick lattice when it fits the
    table, NGP spatial hash of the brick coordinate otherwise)."""
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    F = cfg.features_per_level
    NB = cfg.bricks_per_level
    out = np.zeros((x.shape[0], cfg.n_levels, F), np.float32)
    for l, res in enumerate(cfg.resolutions):
        xs = np.clip(x, 0, 1) * res
        c0 = np.clip(np.floor(xs).astype(np.int64), 0, res - 1)
        frac = xs - np.floor(xs)
        brick = c0 >> 1
        local = c0 & 1
        bpa = ((res - 1) >> 1) + 1
        if bpa**3 <= NB:
            bid = (brick[:, 0] * bpa + brick[:, 1]) * bpa + brick[:, 2]
        else:
            h = (
                (brick[:, 0].astype(np.uint64) * primes[0])
                ^ (brick[:, 1].astype(np.uint64) * primes[1])
                ^ (brick[:, 2].astype(np.uint64) * primes[2])
            ) & np.uint64(0xFFFFFFFF)
            bid = (h % np.uint64(NB)).astype(np.int64)
        bid = bid + l * NB
        cols = tables[:, bid].T.reshape(x.shape[0], 32, F)  # entry-major
        for corner in range(8):
            off = np.array([corner & 1, (corner >> 1) & 1, (corner >> 2) & 1])
            lc = local + off  # in-brick 3x3x3 coords
            o = (lc[:, 0] * 3 + lc[:, 1]) * 3 + lc[:, 2]
            w = np.prod(np.where(off == 1, frac, 1 - frac), axis=-1)
            out[:, l] += cols[np.arange(x.shape[0]), o] * w[:, None]
    return out.reshape(x.shape[0], -1)


def test_resolutions_geometric():
    cfg = HashGridConfig(n_levels=16, base_resolution=16, max_resolution=2048)
    res = cfg.resolutions
    assert res[0] == 16
    assert res[-1] == 2048
    assert all(res[i] < res[i + 1] for i in range(15))


def test_encode_matches_numpy_reference(rng):
    key = jax.random.PRNGKey(0)
    tables = hash_grid.init_tables(key, CFG)
    x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)), jnp.float32)
    got = hash_grid.hash_encode(tables, x, CFG)
    want = _np_reference_encode(np.asarray(tables), np.asarray(x), CFG)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (64, CFG.output_dim)


def test_encode_batch_shapes():
    tables = hash_grid.init_tables(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((4, 5, 3))
    out = hash_grid.hash_encode(tables, x, CFG)
    assert out.shape == (4, 5, CFG.output_dim)


def test_gradient_flows_to_tables(rng):
    tables = hash_grid.init_tables(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.uniform(0, 1, size=(16, 3)), jnp.float32)

    def f(t):
        return jnp.sum(hash_grid.hash_encode(t, x, CFG) ** 2)

    g = jax.grad(f)(tables)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_table_grad_matches_autodiff_oracle(rng):
    """The custom-VJP brick-scatter backward equals plain JAX autodiff
    through an unadorned bf16-shadow take (the scatter XLA would derive
    itself), with f32 accumulation (SCATTER_BF16 off); bf16 accumulation
    stays close."""
    tables = hash_grid.init_tables(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)), jnp.float32)
    co = jnp.asarray(rng.normal(size=(64, CFG.output_dim)), jnp.float32)

    def grad_with(bf16):
        old = hash_grid.SCATTER_BF16
        hash_grid.SCATTER_BF16 = bf16
        try:
            f = lambda t: jnp.sum(hash_grid.hash_encode(t, x, CFG) * co)
            return np.asarray(jax.grad(f)(tables))
        finally:
            hash_grid.SCATTER_BF16 = old

    g_custom = grad_with(False)
    assert np.abs(g_custom).sum() > 0

    # oracle: swap the custom-VJP factory for a plain differentiable take
    # of the bf16 table shadow — JAX derives the scatter-add transpose
    orig = hash_grid._gather_scattered
    hash_grid._gather_scattered = lambda nb, base: (
        lambda t, idx, loc: hash_grid._split_take(
            t.astype(jnp.bfloat16), idx
        )
    )
    try:
        f = lambda t: jnp.sum(hash_grid.hash_encode(t, x, CFG) * co)
        g_oracle = np.asarray(jax.grad(f)(tables))
    finally:
        hash_grid._gather_scattered = orig
    # identical bf16 cotangents; the oracle's derived scatter accumulates
    # in bf16 (primal dtype) while the custom route accumulates f32 here —
    # cancellation inflates relative error on near-zero entries, so the
    # tolerance targets index/layout bugs (order-1 errors), not rounding
    np.testing.assert_allclose(g_custom, g_oracle, rtol=0.02, atol=5e-3)

    # bf16 accumulation stays close to the f32 route
    np.testing.assert_allclose(
        grad_with(True), g_custom, rtol=0.05, atol=1e-4
    )


def test_phased_table_grad_is_exact_per_level(rng):
    """grad_phase=p produces EXACTLY the full gradient on the active
    scattered level's column span, zeros on the other scattered levels,
    and an untouched one-hot-level gradient (CFG: 1 one-hot + 3 scattered
    levels)."""
    tables = hash_grid.init_tables(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)), jnp.float32)
    co = jnp.asarray(rng.normal(size=(64, CFG.output_dim)), jnp.float32)
    NB = CFG.bricks_per_level
    n_oh = 1  # res-4 level fits 32 bricks; res-8 (64 bricks) does not

    g_full = np.asarray(jax.grad(
        lambda t: jnp.sum(hash_grid.hash_encode(t, x, CFG) * co)
    )(tables))

    def g_phase(p):
        return np.asarray(jax.grad(lambda t: jnp.sum(
            hash_grid.hash_encode(
                t, x, CFG, grad_phase=jnp.asarray(p, jnp.int32)
            ) * co
        ))(tables))

    n_scat = CFG.n_levels - n_oh
    for p in range(n_scat + 1):  # +1 exercises the % n_scat wrap
        g = g_phase(p)
        active = n_oh + (p % n_scat)
        for l in range(CFG.n_levels):
            span = slice(l * NB, (l + 1) * NB)
            if l < n_oh or l == active:
                np.testing.assert_allclose(
                    g[:, span], g_full[:, span], rtol=1e-6, atol=1e-7,
                    err_msg=f"phase {p} level {l} (active)",
                )
            else:
                np.testing.assert_allclose(
                    g[:, span], 0.0,
                    err_msg=f"phase {p} level {l} (should be masked)",
                )


def test_tp_compact_branch_matches_replicated(rng):
    """The tensor-parallel backward's COMPACTED scatter arm (taken when a
    shard owns fewer descriptors than the argsort cap — needs a batch big
    enough that cap < n) produces the same table gradient as the
    replicated single-chip path."""
    import jax.sharding as jsh

    shard_map = jax.shard_map

    n_dev = len(jax.devices())
    if n_dev < 2:
        import pytest

        pytest.skip("needs >= 2 devices")
    cfg = CFG
    NB = cfg.bricks_per_level
    tables = hash_grid.init_tables(jax.random.PRNGKey(0), cfg)
    # n must exceed cap = ceil(1.5 * n / shards / 128) * 128 -> n >= ~2048
    x = jnp.asarray(rng.uniform(0, 1, size=(4096, 3)), jnp.float32)
    co = jnp.asarray(rng.normal(size=(4096, cfg.output_dim)), jnp.float32)

    mesh = jsh.Mesh(np.array(jax.devices()[:2]), ("model",))
    cols = tables.shape[1]

    def tp_grad():
        old = hash_grid.SCATTER_BF16
        hash_grid.SCATTER_BF16 = False
        try:
            def local(tl):
                f = lambda t: jnp.sum(
                    hash_grid.hash_encode(t, x, cfg, model_axis="model") * co
                )
                return jax.grad(f)(tl)

            g = shard_map(
                local, mesh=mesh,
                in_specs=jsh.PartitionSpec(None, "model"),
                out_specs=jsh.PartitionSpec(None, "model"),
            )(tables)
            return np.asarray(g)
        finally:
            hash_grid.SCATTER_BF16 = old

    def ref_grad():
        old = hash_grid.SCATTER_BF16
        hash_grid.SCATTER_BF16 = False
        try:
            f = lambda t: jnp.sum(hash_grid.hash_encode(t, x, cfg) * co)
            return np.asarray(jax.grad(f)(tables))
        finally:
            hash_grid.SCATTER_BF16 = old

    # the compact cond arm must actually be live at this size
    cap = min(-(-int(4096 * (cfg.n_levels - 1)
                     * hash_grid._TP_BWD_SLACK / 2) // 128) * 128,
              4096 * (cfg.n_levels - 1))
    assert cap < 4096 * (cfg.n_levels - 1)

    got = tp_grad()
    want = ref_grad()
    assert np.abs(want).sum() > 0
    # f32 accumulation both routes: only reduction-order noise remains;
    # a compaction/ownership bug shows up at order-1 magnitude
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradient_wrt_positions(rng):
    tables = hash_grid.init_tables(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, 3)), jnp.float32)
    g = jax.grad(lambda p: jnp.sum(hash_grid.hash_encode(tables, p, CFG)))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_contract():
    x = jnp.asarray([[0.3, 0.0, 0.0], [10.0, 0.0, 0.0], [0.0, 0.0, -100.0]])
    c = hash_grid.contract(x)
    np.testing.assert_allclose(c[0], [0.3, 0, 0], atol=1e-6)
    assert np.abs(np.asarray(c)).max() < 2.0
    np.testing.assert_allclose(c[1, 0], 2.0 - 1.0 / 10.0, atol=1e-5)
    unit = hash_grid.contract_to_unit_cube(x)
    assert (np.asarray(unit) >= 0).all() and (np.asarray(unit) <= 1).all()


def test_normalize_to_unit_cube():
    x = jnp.asarray([[-2.0, 0.0, 2.0]])
    out = hash_grid.normalize_to_unit_cube(x, -2.0, 2.0)
    np.testing.assert_allclose(out, [[0.0, 0.5, 1.0]], atol=1e-6)
