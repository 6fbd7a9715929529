"""Unit tests for the joint view-selection scoring (reference ACMMP.cu:1146-1208)."""

import numpy as np
import jax
import jax.numpy as jnp

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.ops.view_select import (
    joint_view_selection, view_selection_priors,
)


def _run(cost_arrays, cand_valid, priors, src_valid, params, it=0, seed=0):
    return joint_view_selection(
        jnp.asarray(cost_arrays), jnp.asarray(cand_valid), jnp.asarray(priors),
        jnp.asarray(src_valid), params, jax.random.key(seed), it,
    )


def test_good_view_gets_all_votes():
    """One view consistently good, one consistently bad -> all 15 votes go to
    the good view."""
    params = PatchMatchParams()
    S, shape = 2, (1, 1)
    ca = np.full((8, S) + shape, 2.0, np.float32)
    ca[:, 0] = 0.05        # view 0: excellent across all 8 candidates
    ca[:, 1] = 1.9         # view 1: terrible (>1.2 for all 8 -> rejected)
    sel = _run(ca, np.ones((8,) + shape, bool), np.ones((S,) + shape, np.float32),
               np.ones(S, bool), params)
    w = np.asarray(sel.weights)[:, 0, 0]
    assert w[0] == params.num_votes and w[1] == 0.0
    assert np.asarray(sel.weight_norm)[0, 0] == params.num_votes
    assert np.asarray(sel.temp_selected)[:, 0, 0].tolist() == [True, False]


def test_rejected_when_three_bad_candidates():
    """>= 3 candidates above bad_cost reject a view entirely
    (ACMMP.cu:1173-1182)."""
    params = PatchMatchParams()
    ca = np.full((8, 1, 1, 1), 0.05, np.float32)
    ca[:3, 0] = 1.5   # three bad candidates
    sel = _run(ca, np.ones((8, 1, 1), bool), np.ones((1, 1, 1), np.float32),
               np.ones(1, bool), params)
    assert np.asarray(sel.weight_norm)[0, 0] == 0.0


def test_fallback_path_when_few_good():
    """count <= 2 good but not rejected -> fallback weight exp(-thr^2/0.32)
    still yields votes (ACMMP.cu:1180-1182)."""
    params = PatchMatchParams()
    ca = np.full((8, 1, 1, 1), 1.0, np.float32)  # below bad_cost, above thr
    sel = _run(ca, np.ones((8, 1, 1), bool), np.ones((1, 1, 1), np.float32),
               np.ones(1, bool), params)
    assert np.asarray(sel.weight_norm)[0, 0] == params.num_votes


def test_padded_views_never_selected():
    params = PatchMatchParams()
    ca = np.full((8, 2, 1, 1), 0.05, np.float32)
    sel = _run(ca, np.ones((8, 1, 1), bool), np.ones((2, 1, 1), np.float32),
               np.asarray([True, False]), params)
    assert np.asarray(sel.weights)[1, 0, 0] == 0.0


def test_annealed_threshold_tightens():
    """iteration 0: cost 0.5 < 0.8 counts as good; by iteration 5 the
    threshold 0.8*exp(-25/90)=0.6 still passes 0.5 but iteration 10
    (thr=0.26) does not -> fallback weights."""
    params = PatchMatchParams()
    ca = np.full((8, 1, 1, 1), 0.5, np.float32)
    s0 = _run(ca, np.ones((8, 1, 1), bool), np.ones((1, 1, 1), np.float32),
              np.ones(1, bool), params, it=0)
    s10 = _run(ca, np.ones((8, 1, 1), bool), np.ones((1, 1, 1), np.float32),
               np.ones(1, bool), params, it=10)
    # both still produce votes (fallback), but the scoring path differs;
    # verify via the deterministic weight_norm
    assert np.asarray(s0.weight_norm)[0, 0] == params.num_votes
    assert np.asarray(s10.weight_norm)[0, 0] == params.num_votes


def test_neighbor_priors():
    params = PatchMatchParams()
    S, H, W = 1, 4, 4
    selected = np.zeros((S, H, W), bool)
    selected[0, 1, 2] = True  # the up-neighbour of (2,2) selected view 0
    near_valid = np.ones((4, H, W), bool)
    pr = np.asarray(view_selection_priors(
        jnp.asarray(selected), jnp.asarray(near_valid), params, wrap_x=False))
    # at (2,2): up neighbour selected (0.9), other three unselected (0.1 each)
    np.testing.assert_allclose(pr[0, 2, 2], 0.9 + 3 * 0.1, atol=1e-6)
    # far away: all four neighbours unselected
    np.testing.assert_allclose(pr[0, 0, 0], 4 * 0.1, atol=1e-6)
