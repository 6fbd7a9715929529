"""Multi-hypothesis joint view selection.

Reference ACMMP.cu:1146-1208: per pixel, per source view, score how well the 8
candidate hypotheses agree with that view (annealed cost threshold), combine
with a 0.9/0.1 prior from the 4 adjacent pixels' previous selections, turn the
scores into a CDF and draw 15 importance-sample votes; views with >=1 vote get
integer weights used for cost aggregation.

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
from acmmp_spherical_tpu.ops.candidates import neighbor_selected_views, NEAR_REGION_INDICES


class ViewSelection(NamedTuple):
    weights: jax.Array        # (S, H, W) float vote counts
    weight_norm: jax.Array    # (H, W) sum of weights
    temp_selected: jax.Array  # (S, H, W) bool: weights > 0


def joint_view_selection(
    cost_arrays: jax.Array,    # (8, S, H, W) candidate cost vectors
    cand_valid: jax.Array,     # (8, H, W) region validity
    selected_prev: jax.Array,  # (S, H, W) previous selected-view masks
    src_valid: jax.Array,      # (S,) padded-view mask
    params: PatchMatchParams,
    key: jax.Array,
    iteration,
    *,
    wrap_x: bool,
) -> ViewSelection:
    S = cost_arrays.shape[1]
    H, W = cost_arrays.shape[2:]

    # -- priors from the 4 adjacent pixels (ACMMP.cu:1149-1160) --------------
    neigh_sel, neigh_ok = neighbor_selected_views(selected_prev, wrap_x=wrap_x)
    # the reference gates each neighbour's contribution on flag[2i] == the
    # corresponding near region's validity
    near_valid = cand_valid[jnp.asarray(NEAR_REGION_INDICES)]  # (4, H, W)
    contrib = jnp.where(
        neigh_sel, params.view_prior_selected, params.view_prior_unselected
    )  # (4, S, H, W)
    priors = jnp.sum(contrib * near_valid[:, None], axis=0)  # (S, H, W)

    # -- per-view scores over the 8 candidates (ACMMP.cu:1162-1184) ----------
    it = jnp.asarray(iteration, jnp.float32)
    thr = params.cost_threshold_base * jnp.exp(
        -(it * it) / params.cost_threshold_anneal
    )
    ca = cost_arrays
    good = (ca < thr) & cand_valid[:, None]               # (8, S, H, W)
    bad = (ca > params.bad_cost) & cand_valid[:, None]
    n_good = jnp.sum(good, axis=0).astype(jnp.float32)    # (S, H, W)
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
    probs = probs * priors * src_valid[:, None, None]

    # -- CDF + votes (ACMMP.cu:1186-1197) ------------------------------------
    total = jnp.sum(probs, axis=0)                        # (H, W)
    cdf = jnp.cumsum(probs, axis=0) / jnp.maximum(total, 1e-30)
    anyprob = total > 0.0

    u = jax.random.uniform(key, (params.num_votes, H, W), jnp.float32)
    weights = jnp.zeros((S, H, W), jnp.float32)
    view_ids = jax.lax.broadcasted_iota(jnp.int32, (S, H, W), 0)

    def body(weights, uv):
        # first view whose cdf exceeds the draw
        idx = jnp.sum((cdf <= uv[None]).astype(jnp.int32), axis=0)  # (H, W)
        hit = (view_ids == idx[None]) & anyprob[None] & (idx < S)[None]
        return weights + hit.astype(jnp.float32), None

    weights, _ = jax.lax.scan(body, weights, u)
    weight_norm = jnp.sum(weights, axis=0)
    return ViewSelection(weights, weight_norm, weights > 0.0)
