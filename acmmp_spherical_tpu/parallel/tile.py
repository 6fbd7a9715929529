"""Intra-image tile parallelism.

For very large frames (SURVEY.md 5.8 #4) a single depth map is sharded along
the image width over the ``tile`` mesh axis.  The checkerboard stencils
(candidate strips, median filter) are expressed as pad+slice shifts, which
GSPMD partitions automatically with halo exchanges over ICI; the NCC source
sampling gathers from *replicated* source images, so no halo is needed on the
gather side.  For spherical frames the width axis is a longitude ring: the
wrap shifts become collective-permutes around the ring, which is exactly the
ring topology SURVEY.md 5.7 calls for.

``tile_parallel_pass`` is the single-problem analogue of
``view_parallel.multichip_train_step``: one reference view, its plane state
sharded over tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acmmp_spherical_tpu.config import PatchMatchParams
from acmmp_spherical_tpu.ops.ncc import ref_tap_context
from acmmp_spherical_tpu.ops.propagate import (
    PatchMatchInputs,
    checkerboard_halfstep,
    extract_depth_and_normal,
    initialize_state,
    prepare_inputs,
)


def tile_parallel_pass(mesh: Mesh, params: PatchMatchParams,
                       n_iterations: int = 1, tile_axis: str = "tile"):
    """Build a jitted photometric pass with the plane state sharded along the
    image width over ``tile_axis``.  Inputs stay replicated (images are shared
    by all tiles); intermediate state is constrained to the tile sharding so
    XLA keeps the propagation stencils partitioned with halo exchange."""
    repl = NamedSharding(mesh, P())
    row_shard = NamedSharding(mesh, P(None, tile_axis))       # (H, W) over W

    def shard_state(state):
        return state._replace(
            normal=jax.lax.with_sharding_constraint(
                state.normal, NamedSharding(mesh, P(None, tile_axis, None))),
            w=jax.lax.with_sharding_constraint(state.w, row_shard),
            cost=jax.lax.with_sharding_constraint(state.cost, row_shard),
            selected=jax.lax.with_sharding_constraint(
                state.selected, NamedSharding(mesh, P(None, None, tile_axis))),
            pre_cost=jax.lax.with_sharding_constraint(state.pre_cost, row_shard),
        )

    @functools.partial(jax.jit, in_shardings=(repl, repl),
                       out_shardings=(row_shard, None, row_shard))
    def run(inputs: PatchMatchInputs, key):
        inputs = prepare_inputs(inputs)
        ctx = ref_tap_context(inputs.ref_image, inputs.ref_cam, params)
        state = shard_state(initialize_state(inputs, params, key, ctx=ctx))

        def step(state, sk):
            k, it = sk
            k0, k1 = jax.random.split(k)
            state = checkerboard_halfstep(state, inputs, ctx, params, k0, it, 0)
            state = shard_state(state)
            state = checkerboard_halfstep(state, inputs, ctx, params, k1, it, 1)
            return shard_state(state), None

        keys = jax.vmap(lambda i: jax.random.fold_in(key, i + 1))(
            jnp.arange(n_iterations)
        )
        state, _ = jax.lax.scan(step, state, (keys, jnp.arange(n_iterations)))
        depth, normal = extract_depth_and_normal(state, inputs.ref_cam)
        return depth, normal, state.cost

    return run


@functools.lru_cache(maxsize=8)
def make_state_sharder(mesh: Mesh, tile_axis: str = "tile"):
    """``PlaneState -> PlaneState`` width-sharding hook for the production
    pass (pipeline/patchmatch.run_patchmatch ``shard_state=``): pins the
    plane state to a width sharding so GSPMD partitions the propagation
    stencils with halo exchange over ICI.  Used by the pipeline's
    ``--tile-shard`` mode for frames too large for one chip's working set;
    the Pallas fast paths do not partition, so that mode runs the exact
    array-program path (the CLI forces fast/rect off).

    lru_cached per (mesh, axis): the closure is a STATIC jit argument of
    ``run_patchmatch`` (cached by object identity), so handing every problem
    a fresh closure would recompile the full pass per image (advisor r3)."""
    row_shard = NamedSharding(mesh, P(None, tile_axis))

    def shard(state):
        return state._replace(
            normal=jax.lax.with_sharding_constraint(
                state.normal, NamedSharding(mesh, P(None, tile_axis, None))),
            w=jax.lax.with_sharding_constraint(state.w, row_shard),
            cost=jax.lax.with_sharding_constraint(state.cost, row_shard),
            selected=jax.lax.with_sharding_constraint(
                state.selected, NamedSharding(mesh, P(None, None, tile_axis))),
            pre_cost=jax.lax.with_sharding_constraint(state.pre_cost,
                                                      row_shard),
        )

    return shard


def make_tile_mesh(n: int, *, devices=None) -> Mesh:
    """A 1D ``tile`` mesh over the first ``n`` local devices."""
    import numpy as np

    if devices is None:
        devices = jax.local_devices()
    assert len(devices) >= n, (len(devices), n)
    return Mesh(np.asarray(devices[:n]), ("tile",))
