#!/usr/bin/env python
"""Hardware probes for the round-3 compacted-transport redesign.

1. Pallas kernel with a flattened (S, k) grid, an SMEM (1, 1) int32 tile-id
   block, and BlockSpecs indexed (0, s, k, 0) over a (C, S, N*8, 128) array.
2. XLA gather element-cost for u32 (f16-packed pairs) vs f32, and the
   f32 <-> f16 conversion cost on TPU.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(f, *a, reps=3):
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def probe_kernel():
    S, N, C = 2, 16, 3
    tx = 4

    def kern(tile_ref, d_ref, big_ref, out_ref, win, sem):
        t = tile_ref[pl.program_id(0), pl.program_id(1)]
        i = t // tx
        j = t - i * tx
        cp = pltpu.make_async_copy(
            big_ref.at[pl.program_id(0), pl.ds(8 * i, 8), pl.ds(128 * j, 128)],
            win, sem)
        cp.start()
        cp.wait()
        for c in range(C):
            out_ref[c, 0] = d_ref[c, 0] + win[:, :]

    big = jnp.arange(2 * 64 * 512, dtype=jnp.float32).reshape(2, 64, 512)
    tiles = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None] % (8 * tx), (S, 1))
    D = jnp.ones((C, S, N * 8, 128), jnp.float32)

    out = pl.pallas_call(
        kern,
        grid=(S, N),
        in_specs=[
            pl.BlockSpec((S, N), lambda s, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, 1, 8, 128), lambda s, k: (0, s, k, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((C, 1, 8, 128), lambda s, k: (0, s, k, 0)),
        out_shape=jax.ShapeDtypeStruct((C, S, N * 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(tiles, D, big)
    out = np.asarray(out)
    # verify: out[c, s, 8k:8k+8, :] = 1 + big[s, window of tile tiles[s,k]]
    ok = True
    for s in range(S):
        for k in range(N):
            t = int(tiles[s, k])
            i, j = t // tx, t % tx
            want = 1.0 + np.asarray(big[s, 8 * i:8 * i + 8, 128 * j:128 * j + 128])
            got = out[:, s, 8 * k:8 * k + 8, :]
            ok &= np.allclose(got, want[None])
    print(f"[probe1] SMEM tile-id + flat grid kernel: {'OK' if ok else 'FAIL'}")


def probe_gather():
    HW = 786_432
    M = 1_048_576  # gather positions
    C = 9
    key = jax.random.key(0)
    idx = jax.random.randint(key, (M,), 0, HW, jnp.int32)
    tab_f32 = jax.random.uniform(key, (HW, C), jnp.float32)

    g32 = jax.jit(lambda t, i: t[i])
    t_f32, _ = fence(g32, tab_f32, idx)
    print(f"[probe2] f32 gather rows={M} width={C}: {t_f32*1e3:.1f} ms "
          f"({M*C/t_f32/1e6:.0f} M el/s)")

    # f16-packed pairs: width ceil(C/2)
    Cp = (C + 1) // 2
    tab_u32 = jax.random.randint(key, (HW, Cp), 0, 2**31 - 1, jnp.int32)
    t_u32, _ = fence(g32, tab_u32, idx)
    print(f"[probe2] i32 gather rows={M} width={Cp}: {t_u32*1e3:.1f} ms "
          f"({M*Cp/t_u32/1e6:.0f} M el/s)")

    # f32 -> f16 pack + unpack cost at cost-plane scale
    big = jax.random.uniform(key, (C, 8, HW), jnp.float32) * 2.0

    def pack(x):
        h = x.astype(jnp.float16)
        u = jax.lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)
        C_, S_, n_ = x.shape
        ue = u[0::2]
        uo = u[1::2] if C_ % 2 == 0 else jnp.concatenate(
            [u[1::2], jnp.zeros_like(u[:1])], 0)
        return (ue << 16) | uo

    t_pack, packed = fence(jax.jit(pack), big)
    print(f"[probe2] f16 pack of (9,8,{HW}) f32: {t_pack*1e3:.1f} ms")

    def unpack(p):
        hi = jax.lax.bitcast_convert_type(
            (p >> 16).astype(jnp.uint16), jnp.float16)
        lo = jax.lax.bitcast_convert_type(
            p.astype(jnp.uint16), jnp.float16)
        return hi.astype(jnp.float32), lo.astype(jnp.float32)

    t_un, _ = fence(jax.jit(unpack), packed)
    print(f"[probe2] f16 unpack: {t_un*1e3:.1f} ms")
    # round-trip error
    hi, lo = jax.jit(unpack)(jax.jit(pack)(big))
    err = float(jnp.max(jnp.abs(hi - big[0::2])))
    print(f"[probe2] f16 round-trip max err (vals in [0,2]): {err:.5f}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_kernel()
    probe_gather()
