"""Multi-hypothesis joint view selection.

Reference ACMMP.cu:1146-1208: per pixel, per source view, score how well the 8
candidate hypotheses agree with that view (annealed cost threshold), combine
with a 0.9/0.1 prior from the 4 adjacent pixels' previous selections, turn the
scores into a CDF and draw 15 importance-sample votes; views with >=1 vote get
integer weights used for cost aggregation.

The neighbour prior is computed on the full grid (cheap shifts); the scoring
and voting run on whatever grid the caller passes -- the packed checkerboard
half-grid in the fast path.

Deviation (documented): for invalid candidate regions the reference reads
uninitialised stack memory as costs (the ``= {2.0f}`` aggregate-init quirk,
ACMMP.cu:957), polluting border pixels' statistics with phantom zeros.  We
exclude invalid regions from both the good-view and the bad-view counts -- the
evidently intended semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.ops.candidates import neighbor_selected_views


class ViewSelection(NamedTuple):
    weights: jax.Array        # (S, ...) float vote counts
    weight_norm: jax.Array    # (...) sum of weights
    temp_selected: jax.Array  # (S, ...) bool: weights > 0


def view_selection_priors(
    selected_prev: jax.Array,  # (S, H, W) previous selected-view masks
    near_valid: jax.Array,     # (4, H, W) validity of the 4 near regions
    params: PatchMatchParams,
    *,
    wrap_x: bool,
) -> jax.Array:
    """0.9/0.1 neighbour priors on the full grid (ACMMP.cu:1149-1160).
    Returns (S, H, W)."""
    neigh_sel, _ = neighbor_selected_views(selected_prev, wrap_x=wrap_x)
    contrib = jnp.where(
        neigh_sel, params.view_prior_selected, params.view_prior_unselected
    )  # (4, S, H, W)
    return jnp.sum(contrib * near_valid[:, None], axis=0)  # (S, H, W)


def joint_view_selection(
    cost_arrays: jax.Array,    # (8, S, ...) candidate cost vectors
    cand_valid: jax.Array,     # (8, ...) region validity
    priors: jax.Array,         # (S, ...) from view_selection_priors (packed)
    src_valid: jax.Array,      # (S,) padded-view mask
    params: PatchMatchParams,
    key: jax.Array,
    iteration,
) -> ViewSelection:
    S = cost_arrays.shape[1]
    spatial = cost_arrays.shape[2:]

    # -- per-view scores over the 8 candidates (ACMMP.cu:1162-1184) ----------
    it = jnp.asarray(iteration, jnp.float32)
    thr = params.cost_threshold_base * jnp.exp(
        -(it * it) / params.cost_threshold_anneal
    )
    ca = cost_arrays
    good = (ca < thr) & cand_valid[:, None]               # (8, S, ...)
    bad = (ca > params.bad_cost) & cand_valid[:, None]
    n_good = jnp.sum(good, axis=0).astype(jnp.float32)    # (S, ...)
    n_bad = jnp.sum(bad, axis=0)
    gw = jnp.where(good, jnp.exp(ca * ca / (-params.view_weight_beta)), 0.0)
    sum_gw = jnp.sum(gw, axis=0)

    mean_path = sum_gw / jnp.maximum(n_good, 1.0)
    fallback = jnp.exp(thr * thr / (-params.view_fallback_beta))
    probs = jnp.where(
        n_bad < params.max_bad_views,
        jnp.where(n_good > params.min_good_candidates, mean_path, fallback),
        0.0,
    )
    vshape = (S,) + (1,) * len(spatial)
    probs = probs * priors * src_valid.reshape(vshape)

    # -- CDF + votes (ACMMP.cu:1186-1197) ------------------------------------
    total = jnp.sum(probs, axis=0)
    cdf = jnp.cumsum(probs, axis=0) / jnp.maximum(total, 1e-30)
    anyprob = total > 0.0

    u = jax.random.uniform(key, (params.num_votes,) + spatial, jnp.float32)
    weights = jnp.zeros((S,) + spatial, jnp.float32)
    view_ids = jax.lax.broadcasted_iota(jnp.int32, (S,) + spatial, 0)

    def body(weights, uv):
        idx = jnp.sum((cdf <= uv[None]).astype(jnp.int32), axis=0)
        hit = (view_ids == idx[None]) & anyprob[None] & (idx < S)[None]
        return weights + hit.astype(jnp.float32), None

    weights, _ = jax.lax.scan(body, weights, u)
    weight_norm = jnp.sum(weights, axis=0)
    return ViewSelection(weights, weight_norm, weights > 0.0)
