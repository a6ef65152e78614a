"""Volume rendering primitives: spacing, resampling, compositing, reg losses.

TPU-native replacement for the sampling/rendering stack the reference gets
from nerfstudio's samplers + renderers and nerfacc's CUDA ray marching
(SURVEY.md N7/N9). Everything here is static-shape: a fixed number of samples
per ray at every stage (proposal-in-proposal PDF resampling emulates adaptive
ray marching without dynamic shapes — SURVEY.md §7.3(3)).

Sample positions live in a normalized "s-space" in [0, 1] related to metric
ray distance t through an invertible spacing function; histograms from coarse
(proposal) passes are resampled via inverse-CDF in s-space exactly like
mipnerf-360 / nerfacto [upstream].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# spacing functions: s in [0,1] <-> metric distance t
# ---------------------------------------------------------------------------


def s_to_t_disparity(s, near, far):
    """Linear-in-disparity spacing (nerfacto default for contracted scenes)."""
    return 1.0 / ((1.0 - s) / near + s / far)


def t_to_s_disparity(t, near, far):
    inv_t = 1.0 / jnp.clip(t, 1e-8)
    return (1.0 / near - inv_t) / (1.0 / near - 1.0 / far)


def s_to_t_linear(s, near, far):
    return near + s * (far - near)


def t_to_s_linear(t, near, far):
    return (t - near) / (far - near)


SPACINGS = {
    "disparity": (s_to_t_disparity, t_to_s_disparity),
    "linear": (s_to_t_linear, t_to_s_linear),
}


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def uniform_bins(key, n_rays: int, n_samples: int, stratified: bool = True):
    """[R, S+1] stratified bin edges in s-space."""
    edges = jnp.linspace(0.0, 1.0, n_samples + 1)
    edges = jnp.broadcast_to(edges, (n_rays, n_samples + 1))
    if stratified and key is not None:
        # jitter interior edges within half a bin each way
        delta = 1.0 / n_samples
        noise = jax.random.uniform(key, (n_rays, n_samples + 1), minval=-0.5, maxval=0.5)
        noise = noise.at[:, 0].set(0.0).at[:, -1].set(0.0)
        edges = edges + noise * delta
    return edges


def sample_pdf(key, s_edges, weights, n_samples: int, stratified: bool = True,
               histogram_padding: float = 0.01):
    """Inverse-CDF resampling of a weight histogram (static shapes).

    Args:
      s_edges: [R, B+1] existing bin edges in s-space.
      weights: [R, B] rendering weights of those bins.
      n_samples: number of NEW bins to draw -> returns [R, n_samples+1] edges.

    Mirrors nerfstudio's PDFSampler semantics [upstream] including histogram
    padding for stability.
    """
    R = weights.shape[0]
    weights = weights + histogram_padding
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros((R, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1)
    cdf = jnp.minimum(cdf, 1.0)
    cdf = cdf.at[:, -1].set(1.0)  # exact upper edge

    if stratified and key is not None:
        # (q + xi_q)/(n+1) with xi in [0,1) is sorted BY CONSTRUCTION —
        # no jnp.sort needed
        u = (jnp.arange(n_samples + 1) + jax.random.uniform(
            key, (R, n_samples + 1))) / (n_samples + 1)
    else:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples + 1), (R, n_samples + 1))

    # Inverse CDF via one-hot contractions instead of searchsorted: with a
    # monotone CDF the indicator ind[b] = 1[cdf[b] <= u] is nonincreasing
    # in b, so its difference d1[b] = ind[b] - ind[b+1] one-hots "the last
    # edge with cdf <= u" and d0[b] = ind[b-1] - ind[b] (+ terminal fixup)
    # one-hots "the first edge with cdf > u" — no max/argmax chains, no
    # serial dynamic gathers (the vmapped-searchsorted formulation those
    # replaced measured ~40 ms/batch). Telescoping the differences onto the
    # VALUES (pick(vals, d1) == Δ1vals·ind, pick(vals, d0) == vals[0] +
    # Δ0vals·ind) lets all four lookups ride ONE batched dot_general against
    # the shared [R, B+1, n+1] indicator, so d1/d0 are never materialized —
    # the sampler's HBM traffic is one indicator write + one read.
    ind = (cdf[:, :, None] <= u[:, None, :]).astype(cdf.dtype)  # [R,B+1,n+1]
    z = jnp.zeros_like(cdf[:, :1])
    V = jnp.stack(
        [
            jnp.diff(cdf, axis=1, prepend=0.0),      # Δ1cdf (cdf[-1] := 0)
            jnp.diff(s_edges, axis=1, prepend=0.0),  # Δ1s  (s[-1] := 0)
            jnp.concatenate([jnp.diff(cdf, axis=1), z], axis=1),      # Δ0cdf
            jnp.concatenate([jnp.diff(s_edges, axis=1), z], axis=1),  # Δ0s
        ],
        axis=1,
    )  # [R, 4, B+1]
    # precision HIGHEST: the default TPU bf16 dot rounds each DELTA, and two
    # independently-rounded telescoped sums can put s_above < s_below —
    # non-monotone edges feed negative deltas into exp() and the render
    # NaNs out. (The one-hot formulation this replaced was bf16-safe: its
    # picks were single rounded table values, so ordering survived.) The
    # contraction is ~0.3 GFLOP — f32 costs nothing measurable.
    picks = jax.lax.dot_general(
        V, ind, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, 4, n+1]
    cdf_below = picks[:, 0]
    s_below = picks[:, 1]
    # the Δ0 rows zero their last entry, which folds the u >= cdf[-1]
    # terminal fixup (route "above" to the last edge) in exactly; the
    # leading constant is vals[0] (cdf[0] == 0 needs none)
    cdf_above = picks[:, 2]
    s_above = picks[:, 3] + s_edges[:, :1]

    denom = jnp.clip(cdf_above - cdf_below, 1e-8)
    frac = jnp.clip((u - cdf_below) / denom, 0.0, 1.0)
    new_edges = s_below + frac * (jnp.maximum(s_above, s_below) - s_below)
    # exact math gives monotone edges (u sorted, CDF inverse monotone);
    # the telescoped sums carry ~1e-7 rounding slop, so pin it — negative
    # bin deltas downstream would overflow exp() in the compositor
    new_edges = jax.lax.cummax(new_edges, axis=new_edges.ndim - 1)
    return jax.lax.stop_gradient(new_edges)


# ---------------------------------------------------------------------------
# compositing
# ---------------------------------------------------------------------------


def render_weights(densities, deltas):
    """Rendering weights from volume densities.

    Args:
      densities: [R, S] non-negative densities at sample midpoints.
      deltas: [R, S] metric lengths of each sample interval.

    Returns:
      (weights[R, S], transmittance[R, S]) with
      w_i = T_i * (1 - exp(-sigma_i * delta_i)).
    """
    alpha_exp = densities * deltas
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(alpha_exp[:, :1]), jnp.cumsum(alpha_exp[:, :-1], axis=-1)],
        axis=-1,
    ))
    alpha = 1.0 - jnp.exp(-alpha_exp)
    return alpha * trans, trans


def composite(weights, values, background=None):
    """Weighted sum along samples: [R, S] x [R, S, C] -> [R, C]."""
    out = jnp.sum(weights[..., None] * values, axis=-2)
    if background is not None:
        acc = jnp.sum(weights, axis=-1, keepdims=True)
        out = out + (1.0 - acc) * background
    return out


def render_depth(weights, t_mid, eps: float = 1e-10):
    """Expected (weight-normalized) ray distance, as nerfstudio's DepthRenderer."""
    acc = jnp.sum(weights, axis=-1)
    d = jnp.sum(weights * t_mid, axis=-1) / jnp.clip(acc, eps)
    return jnp.clip(d, t_mid[..., 0], t_mid[..., -1])


def render_accumulation(weights):
    return jnp.sum(weights, axis=-1)


# ---------------------------------------------------------------------------
# regularization losses (mipnerf-360 family, as used by nerfacto)
# ---------------------------------------------------------------------------


def _outer_bounds(t0, t1, y1):
    """For each target bin [t0], integrate histogram (t1, y1) that overlaps it.

    Standard 'lossfun_outer' inner machinery [upstream mipnerf-360]: returns
    the total mass of histogram 1 falling inside each bin of histogram 0.

    Formulated as indicator-SUM contractions instead of CDF lookups: with
    monotone edges, "cy1 at the last t1 edge <= t" equals
    sum_b y1[b] * 1[t1[b+1] <= t] and "cy1 at the first t1 edge >= t"
    equals sum_b y1[b] * 1[t1[b] < t] — exact identities. Each bound is
    then one [R]-batched [K, B] @ [B] product with f32 accumulation, and
    the backward wrt y1 reuses the same indicator (no max/argmax select
    chains). The masked-max/min formulation this replaces cost ~27 ms per
    train step at production sizes (scripts/profile_mapping_ablate.py);
    the earlier vmapped-searchsorted one lowered to serial dynamic
    gathers and was worse still (~40 ms per level).
    """
    t0lo = t0[..., :-1]  # [R, K]
    t0hi = t0[..., 1:]
    # [R, B, K] 0/1 indicators, contracted over B (f32 accumulate; the
    # contraction is tiny — the win over masked max/min is structural)
    left = (t1[..., 1:, None] <= t0lo[..., None, :]).astype(jnp.float32)
    right = (t1[..., :-1, None] < t0hi[..., None, :]).astype(jnp.float32)
    y = y1
    lo = jax.lax.dot_general(
        y[..., None, :], left, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[..., 0, :]
    hi = jax.lax.dot_general(
        y[..., None, :], right, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[..., 0, :]
    return hi - lo


def interlevel_loss(proposal_edges, proposal_weights, final_edges, final_weights):
    """Histogram consistency loss ('interlevel' / proposal loss).

    Penalizes proposal histograms that assign less mass than the final (nerf)
    histogram over the same span. Reference weight 1.0
    (nerf_vo/mapping/nerfstudio.py:71-82).
    """
    fw = jax.lax.stop_gradient(final_weights)
    fe = jax.lax.stop_gradient(final_edges)
    bound = _outer_bounds(fe, proposal_edges, proposal_weights)
    clipped = jnp.clip(fw - bound, min=0.0)
    return jnp.mean(clipped**2 / jnp.clip(fw, 1e-7))


def distortion_loss(s_edges, weights):
    """Mipnerf-360 distortion loss in s-space. Reference weight 0.002."""
    s_mid = 0.5 * (s_edges[..., 1:] + s_edges[..., :-1])
    ds = s_edges[..., 1:] - s_edges[..., :-1]
    # pairwise term: sum_ij w_i w_j |s_i - s_j| via O(S) cumulative trick
    w = weights
    wm = w * s_mid
    cw = jnp.cumsum(w, axis=-1)
    cwm = jnp.cumsum(wm, axis=-1)
    # loss_inter = 2 * sum_i w_i * (s_i * cw_{i-1} - cwm_{i-1})
    cw_prev = jnp.concatenate([jnp.zeros_like(cw[..., :1]), cw[..., :-1]], -1)
    cwm_prev = jnp.concatenate([jnp.zeros_like(cwm[..., :1]), cwm[..., :-1]], -1)
    loss_inter = 2.0 * jnp.sum(w * (s_mid * cw_prev - cwm_prev), axis=-1)
    loss_intra = jnp.sum(w**2 * ds, axis=-1) / 3.0
    return jnp.mean(loss_inter + loss_intra)
