"""TPU probe: which Mosaic features can the flagship kernel redesign use?

Checks compile+run (and rough cost via differential timing) of:
  1. in-kernel 2D transpose (8, N) <-> (N, 8)            [persistent rT copy]
  2. in-kernel 2D transpose (128, 128)                   [per-tile relayout]
  3. dynamic lane-dim slice at UNALIGNED offset          [hole-free j-runs]
  4. dynamic sublane-dim slice at 8-granularity offset   [transposed j-runs]
  5. sublane-dim slice at unaligned (non-8) offset
  6. pltpu.roll with dynamic shift on lanes              [gather-by-rotation]

Usage: timeout 560 python scripts/exp_mosaic_support.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
ITERS = 200  # fori iterations inside the kernel to expose per-op cost


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    s = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r))
        best = min(best, time.perf_counter() - t0)
    return best, s


def probe(name, build):
    try:
        f, args = build()
        t, s = timed(f, *args)
        print(f"{name:45s}: OK   {t*1e3:8.3f} ms ({ITERS} iters) sum={s:.3e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{name:45s}: FAIL {type(e).__name__}: {msg}", flush=True)


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


# 1. transpose (8, N) -> (N, 8), iterated
def build_t8n():
    def kern(x_ref, o_ref):
        def body(i, c):
            o_ref[:, :] = jnp.transpose(x_ref[:, :]) + c
            return c + 1.0
        jax.lax.fori_loop(0, ITERS, body, 0.0)

    f = pl.pallas_call(
        kern, in_specs=[vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
    )
    x = jnp.arange(8 * N, dtype=jnp.float32).reshape(8, N) * 1e-6
    return jax.jit(f), (x,)


# 2. transpose (128, 128) iterated
def build_t128():
    def kern(x_ref, o_ref):
        def body(i, c):
            o_ref[:, :] = jnp.transpose(x_ref[:, :]) + c
            return c + 1.0
        jax.lax.fori_loop(0, ITERS, body, 0.0)

    f = pl.pallas_call(
        kern, in_specs=[vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )
    x = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128) * 1e-6
    return jax.jit(f), (x,)


# 3. dynamic lane slice, unaligned offsets
def build_lane_unaligned():
    def kern(off_ref, x_ref, o_ref):
        def body(i, c):
            o = off_ref[i]
            o_ref[0, :] += x_ref[0, pl.ds(o, 512)]
            return c
        jax.lax.fori_loop(0, ITERS, body, 0)

    f = pl.pallas_call(
        kern, in_specs=[smem(), vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )
    x = jnp.arange(8 * N, dtype=jnp.float32).reshape(8, N) * 1e-6
    offs = (jnp.arange(ITERS, dtype=jnp.int32) * 37) % (N - 512)
    return jax.jit(f), (offs, x)


# 3b. dynamic lane slice, 128-aligned offsets (control)
def build_lane_aligned():
    def kern(off_ref, x_ref, o_ref):
        def body(i, c):
            o = off_ref[i] * 128
            o_ref[0, :] += x_ref[0, pl.ds(o, 512)]
            return c
        jax.lax.fori_loop(0, ITERS, body, 0)

    f = pl.pallas_call(
        kern, in_specs=[smem(), vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )
    x = jnp.arange(8 * N, dtype=jnp.float32).reshape(8, N) * 1e-6
    offs = (jnp.arange(ITERS, dtype=jnp.int32) * 7) % ((N - 512) // 128)
    return jax.jit(f), (offs, x)


# 4. dynamic sublane slice at 8-granularity on (N, 128)
def build_sublane8():
    def kern(off_ref, x_ref, o_ref):
        def body(i, c):
            o = off_ref[i] * 8
            o_ref[:, :] += x_ref[pl.ds(o, 256), :]
            return c
        jax.lax.fori_loop(0, ITERS, body, 0)

    f = pl.pallas_call(
        kern, in_specs=[smem(), vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )
    x = jnp.arange(N * 128, dtype=jnp.float32).reshape(N, 128) * 1e-7
    offs = (jnp.arange(ITERS, dtype=jnp.int32) * 5) % ((N - 256) // 8)
    return jax.jit(f), (offs, x)


# 5. dynamic sublane slice at arbitrary offset
def build_sublane_any():
    def kern(off_ref, x_ref, o_ref):
        def body(i, c):
            o = off_ref[i]
            o_ref[:, :] += x_ref[pl.ds(o, 256), :]
            return c
        jax.lax.fori_loop(0, ITERS, body, 0)

    f = pl.pallas_call(
        kern, in_specs=[smem(), vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )
    x = jnp.arange(N * 128, dtype=jnp.float32).reshape(N, 128) * 1e-7
    offs = (jnp.arange(ITERS, dtype=jnp.int32) * 37) % (N - 256)
    return jax.jit(f), (offs, x)


# 6. pltpu.roll dynamic shift on lane dim
def build_roll():
    def kern(off_ref, x_ref, o_ref):
        def body(i, c):
            o_ref[:, :] += pltpu.roll(x_ref[:, :], off_ref[i], 1)
            return c
        jax.lax.fori_loop(0, ITERS, body, 0)

    f = pl.pallas_call(
        kern, in_specs=[smem(), vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )
    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512) * 1e-6
    offs = (jnp.arange(ITERS, dtype=jnp.int32) * 37) % 512
    return jax.jit(f), (offs, x)


# 7. sum(axis=1) of (128,512) -> accumulate into (128,1) register then store
def build_rowsum():
    def kern(x_ref, o_ref):
        def body(i, acc):
            return acc + jnp.sum(x_ref[:, :] * (1.0 + i), axis=1,
                                 keepdims=True)
        acc = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((128, 1), jnp.float32))
        o_ref[:, :] = acc

    f = pl.pallas_call(
        kern, in_specs=[vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
    )
    x = jnp.ones((128, 512), jnp.float32)
    return jax.jit(f), (x,)


# 8. same but store per iter into sublane-sliced scratch (n, 8)
def build_rowsum_store():
    def kern(x_ref, o_ref):
        def body(i, c):
            s = jnp.sum(x_ref[:, :] * (1.0 + i), axis=1, keepdims=True)
            o_ref[pl.ds((i % 32) * 128, 128), 0:1] += s
            return c
        jax.lax.fori_loop(0, ITERS, body, 0.0)

    f = pl.pallas_call(
        kern, in_specs=[vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((N, 8), jnp.float32),
    )
    x = jnp.ones((128, 512), jnp.float32)
    return jax.jit(f), (x,)


def main():
    print("devices:", jax.devices(), flush=True)
    probe("transpose (8,4096)->(4096,8)", build_t8n)
    probe("transpose (128,128)", build_t128)
    probe("lane ds unaligned (512 from 4096)", build_lane_unaligned)
    probe("lane ds 128-aligned (control)", build_lane_aligned)
    probe("sublane ds 8-aligned (256,128)", build_sublane8)
    probe("sublane ds any-offset (256,128)", build_sublane_any)
    probe("pltpu.roll dynamic lanes (8,512)", build_roll)
    probe("rowsum(128,512)->reg(128,1)", build_rowsum)
    probe("rowsum + sublane store (N,8)", build_rowsum_store)


if __name__ == "__main__":
    main()
