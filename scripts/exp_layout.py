"""TPU experiment: per-visit cost of pair-tile body variants (DIFFERENTIAL).

The flagship budget at N=4000 is ~48us pair math + ~40us per-visit overhead
(~0.4us/visit: dynamic-slice setup, reduction relayouts, f_acc RMW). This
measures where the 0.4us goes by timing visit-count SLOPES of three bodies:

  K1  current layout: tile (TI=128 sub?, TJ lanes); xi via lane-slice +
      reshape(TI,1) (a lane->sublane relayout per visit), i-sums relayouted
      into lane rows.
  K2b same tile shape, but xi read from a TRANSPOSED position copy
      rT (n_pad, 8) [no per-visit transpose] and i-sums accumulated into a
      transposed force scratch fT (n_pad, 8) [keepdims lane-reduction is
      sublane-native] — zero relayouts, j still 128-lane granularity.
  K2  transposed tile (TJ sublanes, TI=128 lanes): xj from rT at ARBITRARY
      sublane offsets (8-gran j-runs!), xi via lane slices; i-sums axis=0
      (native), j-sums axis=1 keepdims (native).

Plus the per-step glue costs those designs need: jnp.transpose of (8, n_pad)
and (n_pad, 8), and a chunked MXU dot-transpose alternative.

All numbers are slopes between two visit counts / iter counts — the ~30ms
tunnel fetch cost cancels.

Usage: timeout 560 python scripts/exp_layout.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ljmd_tpu.ops.pallas_common import lj_pair_terms

N_PAD = 4096
L = 16.796
RC2 = 6.25
# STEPS * OUTER sets the differential signal size: slope variants differ by
# (v_hi - v_lo) * STEPS * OUTER visit-executions ~ 96 * 1000 * ~1us. The
# tunnel fetch jitter is ~2-3ms, so STEPS=50 alone (round-2 value) gave a
# ~5ms signal — AT the noise floor; K1/K4 numbers measured with it flipped
# by 2x between runs (the "439ns/visit unroll win" was noise). Raising
# STEPS to 500 blows up the Mosaic compile (in-kernel trip count scales
# compile time), so the extra factor comes from OUTER jit-chained calls of
# the same compiled program (launch glue is identical across variants and
# cancels in the slope).
STEPS = 50
OUTER = 20


def chain(pallas_fn, args, r_index, out_index=None):
    """jit(scan) the compiled program OUTER times, threading args[r_index]
    through (the position-state array); other operands stay constant."""
    args = tuple(args)

    @jax.jit
    def g(*a):
        def body(r, _):
            inner = a[:r_index] + (r,) + a[r_index + 1:]
            out = pallas_fn(*inner)
            r_next = out if out_index is None else out[out_index]
            return r_next, None

        r_end, _ = jax.lax.scan(body, a[r_index], None, length=OUTER)
        return r_end

    return g, args


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def fetch(x):
    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x))


def diff(fa, fb, scale, label, reps=5):
    """Per-unit slope between two variants differing by `scale` units."""
    fn_a, args_a = fa
    fn_b, args_b = fb
    print(f"[compile] {label} (a)", flush=True)
    fetch(fn_a(*args_a))
    print(f"[compile] {label} (b)", flush=True)
    fetch(fn_b(*args_b))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn_a(*args_a))
        t1 = time.perf_counter()
        fetch(fn_b(*args_b))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / scale)
    slopes.sort()
    s = slopes[len(slopes) // 2]
    print(f"{label:44s}: {s*1e9:9.1f} ns/unit", flush=True)
    return s


def make_state(key):
    r = jax.random.uniform(key, (3, N_PAD), jnp.float32, 0.0, L)
    r8 = jnp.zeros((8, N_PAD), jnp.float32).at[0:3].set(r)
    rT = jnp.zeros((N_PAD, 8), jnp.float32).at[:, 0:3].set(r.T)
    return r8, rT


def visit_lists(v, key):
    # random (i_tile, j_tile) pairs at (128,512) granularity
    ti = jax.random.randint(key, (v,), 0, N_PAD // 128).astype(jnp.int32)
    tj = jax.random.randint(jax.random.fold_in(key, 1), (v,), 0,
                            N_PAD // 512).astype(jnp.int32)
    return ti, tj


# ---------------- K1: current-layout body ----------------
def k1_kernel(ti_ref, tj_ref, r_in, r_out, f_acc, *, v, tj_w):
    r_out[:, :] = r_in[:, :]

    def step(s, c):
        r_out[0, :] += 1e-6
        f_acc[:, :] = jnp.zeros_like(f_acc)

        def body(t, c2):
            i_lo = ti_ref[t] * 128
            j_lo = tj_ref[t] * tj_w
            isl = pl.ds(i_lo, 128)
            jsl = pl.ds(j_lo, tj_w)
            xi = r_out[0, isl].reshape(128, 1)
            yi = r_out[1, isl].reshape(128, 1)
            zi = r_out[2, isl].reshape(128, 1)
            xj = r_out[0, jsl].reshape(1, tj_w)
            yj = r_out[1, jsl].reshape(1, tj_w)
            zj = r_out[2, jsl].reshape(1, tj_w)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - L * jnp.round(dx * (1.0 / L))
            dy = dy - L * jnp.round(dy * (1.0 / L))
            dz = dz - L * jnp.round(dz * (1.0 / L))
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < RC2
            coef, _du, _e, _ddu = lj_pair_terms(r2, mask, True, False)
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            f_acc[0, isl] += jnp.sum(fx, axis=1)
            f_acc[1, isl] += jnp.sum(fy, axis=1)
            f_acc[2, isl] += jnp.sum(fz, axis=1)
            f_acc[0, jsl] -= jnp.sum(fx, axis=0)
            f_acc[1, jsl] -= jnp.sum(fy, axis=0)
            f_acc[2, jsl] -= jnp.sum(fz, axis=0)
            return c2

        jax.lax.fori_loop(0, v, body, 0)
        r_out[1, :] += f_acc[1, :] * 1e-9
        return c

    jax.lax.fori_loop(0, STEPS, step, 0)


def run_k1(r8, ti, tj, v, tj_w=512):
    kern = functools.partial(k1_kernel, v=v, tj_w=tj_w)
    f = pl.pallas_call(
        kern, in_specs=[smem(), smem(), vmem()],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, N_PAD), jnp.float32)],
    )
    return chain(f, (ti, tj, r8), r_index=2)


# ---------------- K2b: same tiles, transposed i accumulation ----------------
def k2b_kernel(ti_ref, tj_ref, r_in, rT_in, r_out, fT_out, f_acc, fT_acc,
               *, v, tj_w):
    r_out[:, :] = r_in[:, :]
    fT_out[:, :] = rT_in[:, :]

    def step(s, c):
        r_out[0, :] += 1e-6
        f_acc[:, :] = jnp.zeros_like(f_acc)
        fT_acc[:, :] = jnp.zeros_like(fT_acc)

        def body(t, c2):
            i_lo = ti_ref[t] * 128
            j_lo = tj_ref[t] * tj_w
            isl = pl.ds(i_lo, 128)
            jsl = pl.ds(j_lo, tj_w)
            xi = fT_out[isl, 0:1]
            yi = fT_out[isl, 1:2]
            zi = fT_out[isl, 2:3]
            xj = r_out[0, jsl].reshape(1, tj_w)
            yj = r_out[1, jsl].reshape(1, tj_w)
            zj = r_out[2, jsl].reshape(1, tj_w)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - L * jnp.round(dx * (1.0 / L))
            dy = dy - L * jnp.round(dy * (1.0 / L))
            dz = dz - L * jnp.round(dz * (1.0 / L))
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < RC2
            coef, _du, _e, _ddu = lj_pair_terms(r2, mask, True, False)
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            fT_acc[isl, 0:1] += jnp.sum(fx, axis=1, keepdims=True)
            fT_acc[isl, 1:2] += jnp.sum(fy, axis=1, keepdims=True)
            fT_acc[isl, 2:3] += jnp.sum(fz, axis=1, keepdims=True)
            f_acc[0, jsl] -= jnp.sum(fx, axis=0)
            f_acc[1, jsl] -= jnp.sum(fy, axis=0)
            f_acc[2, jsl] -= jnp.sum(fz, axis=0)
            return c2

        jax.lax.fori_loop(0, v, body, 0)
        r_out[1, :] += f_acc[1, :] * 1e-9
        return c

    jax.lax.fori_loop(0, STEPS, step, 0)


def run_k2b(r8, rT, ti, tj, v, tj_w=512):
    kern = functools.partial(k2b_kernel, v=v, tj_w=tj_w)
    f = pl.pallas_call(
        kern, in_specs=[smem(), smem(), vmem(), vmem()],
        out_specs=[vmem(), vmem()],
        out_shape=[jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((N_PAD, 8), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, N_PAD), jnp.float32),
                        pltpu.VMEM((N_PAD, 8), jnp.float32)],
    )
    return chain(f, (ti, tj, r8, rT), r_index=2, out_index=0)


# ---------------- K2: transposed tile (TJ sub, 128 lanes) ----------------
def k2_kernel(ti_ref, tj_ref, r_in, rT_in, r_out, fT_out, f_acc, fT_acc,
              *, v, tj_w):
    r_out[:, :] = r_in[:, :]
    fT_out[:, :] = rT_in[:, :]

    def step(s, c):
        r_out[0, :] += 1e-6
        f_acc[:, :] = jnp.zeros_like(f_acc)
        fT_acc[:, :] = jnp.zeros_like(fT_acc)

        def body(t, c2):
            i_lo = ti_ref[t] * 128
            j_lo = tj_ref[t] * 8  # arbitrary 8-gran sublane offset
            isl = pl.ds(i_lo, 128)
            jsl = pl.ds(j_lo, tj_w)
            xi = r_out[0, isl].reshape(1, 128)
            yi = r_out[1, isl].reshape(1, 128)
            zi = r_out[2, isl].reshape(1, 128)
            xj = fT_out[jsl, 0:1]
            yj = fT_out[jsl, 1:2]
            zj = fT_out[jsl, 2:3]
            dx = xj - xi   # (tj_w, 128)
            dy = yj - yi
            dz = zj - zi
            dx = dx - L * jnp.round(dx * (1.0 / L))
            dy = dy - L * jnp.round(dy * (1.0 / L))
            dz = dz - L * jnp.round(dz * (1.0 / L))
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < RC2
            coef, _du, _e, _ddu = lj_pair_terms(r2, mask, True, False)
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            f_acc[0, isl] -= jnp.sum(fx, axis=0)
            f_acc[1, isl] -= jnp.sum(fy, axis=0)
            f_acc[2, isl] -= jnp.sum(fz, axis=0)
            fT_acc[jsl, 0:1] += jnp.sum(fx, axis=1, keepdims=True)
            fT_acc[jsl, 1:2] += jnp.sum(fy, axis=1, keepdims=True)
            fT_acc[jsl, 2:3] += jnp.sum(fz, axis=1, keepdims=True)
            return c2

        jax.lax.fori_loop(0, v, body, 0)
        r_out[1, :] += f_acc[1, :] * 1e-9
        return c

    jax.lax.fori_loop(0, STEPS, step, 0)


def run_k2(r8, rT, ti, tj, v, tj_w=512):
    kern = functools.partial(k2_kernel, v=v, tj_w=tj_w)
    f = pl.pallas_call(
        kern, in_specs=[smem(), smem(), vmem(), vmem()],
        out_specs=[vmem(), vmem()],
        out_shape=[jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((N_PAD, 8), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, N_PAD), jnp.float32),
                        pltpu.VMEM((N_PAD, 8), jnp.float32)],
    )
    return chain(f, (ti, tj, r8, rT), r_index=2, out_index=0)


# ---------------- per-step glue probes (differential over ITERS) --------
def transpose_cost(shape_in, iters):
    def kern(x_ref, o_ref):
        def body(i, c):
            o_ref[:, :] = jnp.transpose(x_ref[:, :]) * (1.0 + 1e-9 * i)
            return c + 1.0
        jax.lax.fori_loop(0, iters, body, 0.0)

    out_shape = (shape_in[1], shape_in[0])
    f = pl.pallas_call(
        kern, in_specs=[vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    x = jnp.ones(shape_in, jnp.float32)
    return jax.jit(f), (x,)


def dot_transpose_cost(iters):
    """(N_PAD, 8) -> (8, N_PAD) via 32 chunked MXU dot_generals."""
    eye = jnp.eye(128, dtype=jnp.float32)

    def kern(x_ref, e_ref, o_ref):
        def body(i, c):
            for b in range(N_PAD // 128):
                blk = x_ref[pl.ds(b * 128, 128), :]  # (128, 8)
                t = jax.lax.dot_general(
                    blk, e_ref[:, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (8, 128)
                o_ref[:, pl.ds(b * 128, 128)] = t * (1.0 + 1e-9 * i)
            return c + 1.0
        jax.lax.fori_loop(0, iters, body, 0.0)

    f = pl.pallas_call(
        kern, in_specs=[vmem(), vmem()], out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
    )
    x = jnp.ones((N_PAD, 8), jnp.float32)
    return jax.jit(f), (x, eye)


def main(which):
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    r8, rT = make_state(key)
    v_lo, v_hi = 32, 128
    ti_hi, tj_hi = visit_lists(v_hi, jax.random.fold_in(key, 7))
    ti_lo = ti_hi[:v_lo]

    scale = (v_hi - v_lo) * STEPS * OUTER
    for tj_w in (512, 128):
        tag = f"{tj_w}"
        tjh = tj_hi % max(1, (N_PAD // tj_w))
        tjl = tjh[:v_lo]
        if f"k1-{tag}" in which:
            diff(run_k1(r8, ti_lo, tjl, v_lo, tj_w),
                 run_k1(r8, ti_hi, tjh, v_hi, tj_w),
                 scale, f"K1  current body   ({tj_w} lanes j)")
        if f"k2b-{tag}" in which:
            diff(run_k2b(r8, rT, ti_lo, tjl, v_lo, tj_w),
                 run_k2b(r8, rT, ti_hi, tjh, v_hi, tj_w),
                 scale, f"K2b transposed-acc ({tj_w} lanes j)")
        if f"k2-{tag}" in which:
            tjs = (tj_hi * 37) % ((N_PAD - tj_w) // 8)
            diff(run_k2(r8, rT, ti_lo, tjs[:v_lo], v_lo, tj_w),
                 run_k2(r8, rT, ti_hi, tjs, v_hi, tj_w),
                 scale, f"K2  transposed tile ({tj_w} sub j)")

    if "k4-512" in which:
        tjh = tj_hi % (N_PAD // 512)
        diff(run_k4(r8, ti_lo, tjh[:v_lo], v_lo, 512),
             run_k4(r8, ti_hi, tjh, v_hi, 512),
             scale, "K4  K1+unroll2+dualacc (512)")
    if "k6-512" in which:
        tjh = tj_hi % (N_PAD // 512)
        diff(run_k6(r8, ti_lo, tjh[:v_lo], v_lo, 512),
             run_k6(r8, ti_hi, tjh, v_hi, 512),
             scale, "K6  pure-math ceiling    (512)")
    if "k5" in which:
        tjh = tj_hi % (N_PAD // 512)
        for tail, second, label in (
            (False, False, "K5a K4+dynamic trip      (512)"),
            (True, False, "K5b K5a+pl.when tail     (512)"),
            (True, True, "K5c K5b+masked loop body (512)"),
        ):
            diff(run_k5(r8, ti_lo, tjh[:v_lo], v_lo, 512, tail, second),
                 run_k5(r8, ti_hi, tjh, v_hi, 512, tail, second),
                 scale, label)
    if "k4z-512" in which:
        tjh = tj_hi % (N_PAD // 512)
        diff(run_k4(r8, ti_lo, tjh[:v_lo], v_lo, 512, mic_z=False),
             run_k4(r8, ti_hi, tjh, v_hi, 512, mic_z=False),
             scale, "K4z K4 without z-MIC (512)")
    if "k3-512" in which:
        tjh = tj_hi % (N_PAD // 512)
        diff(run_k3(r8, rT, ti_lo, tjh[:v_lo], v_lo, 512),
             run_k3(r8, rT, ti_hi, tjh, v_hi, 512),
             scale, "K3  K2b+unroll2+dualacc (512)")

    it_lo, it_hi = 64, 512  # transpose probes: un-chained (signal is fine)
    if "trans" in which:
        for shape in ((8, N_PAD), (N_PAD, 8)):
            diff(transpose_cost(shape, it_lo), transpose_cost(shape, it_hi),
                 it_hi - it_lo, f"jnp.transpose {shape}")
    if "dot" in which:
        diff(dot_transpose_cost(it_lo), dot_transpose_cost(it_hi),
             it_hi - it_lo, "dot-transpose (N,8)->(8,N) chunked")


# ---------------- K3: K2b + 2-way unroll + dual accumulators ----------------
def k3_kernel(ti_ref, tj_ref, r_in, rT_in, r_out, fT_out, f_acc, f_acc2,
              fT_acc, fT_acc2, *, v, tj_w):
    r_out[:, :] = r_in[:, :]
    fT_out[:, :] = rT_in[:, :]

    def step(s, c):
        r_out[0, :] += 1e-6
        f_acc[:, :] = jnp.zeros_like(f_acc)
        f_acc2[:, :] = jnp.zeros_like(f_acc2)
        fT_acc[:, :] = jnp.zeros_like(fT_acc)
        fT_acc2[:, :] = jnp.zeros_like(fT_acc2)

        def one(t, fa, fta):
            i_lo = ti_ref[t] * 128
            j_lo = tj_ref[t] * tj_w
            isl = pl.ds(i_lo, 128)
            jsl = pl.ds(j_lo, tj_w)
            xi = fT_out[isl, 0:1]
            yi = fT_out[isl, 1:2]
            zi = fT_out[isl, 2:3]
            xj = r_out[0, jsl].reshape(1, tj_w)
            yj = r_out[1, jsl].reshape(1, tj_w)
            zj = r_out[2, jsl].reshape(1, tj_w)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - L * jnp.round(dx * (1.0 / L))
            dy = dy - L * jnp.round(dy * (1.0 / L))
            dz = dz - L * jnp.round(dz * (1.0 / L))
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < RC2
            coef, _du, _e, _ddu = lj_pair_terms(r2, mask, True, False)
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            fta[isl, 0:1] += jnp.sum(fx, axis=1, keepdims=True)
            fta[isl, 1:2] += jnp.sum(fy, axis=1, keepdims=True)
            fta[isl, 2:3] += jnp.sum(fz, axis=1, keepdims=True)
            fa[0, jsl] -= jnp.sum(fx, axis=0)
            fa[1, jsl] -= jnp.sum(fy, axis=0)
            fa[2, jsl] -= jnp.sum(fz, axis=0)

        def body(t2, c2):
            one(2 * t2, f_acc, fT_acc)
            one(2 * t2 + 1, f_acc2, fT_acc2)
            return c2

        jax.lax.fori_loop(0, v // 2, body, 0)
        r_out[1, :] += (f_acc[1, :] + f_acc2[1, :]) * 1e-9
        r_out[2, :] += (fT_acc[0:8, 0] + fT_acc2[0:8, 0]).reshape(8)[0] * 0.0
        return c

    jax.lax.fori_loop(0, STEPS, step, 0)


def run_k3(r8, rT, ti, tj, v, tj_w=512):
    kern = functools.partial(k3_kernel, v=v, tj_w=tj_w)
    f = pl.pallas_call(
        kern, in_specs=[smem(), smem(), vmem(), vmem()],
        out_specs=[vmem(), vmem()],
        out_shape=[jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((N_PAD, 8), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, N_PAD), jnp.float32),
                        pltpu.VMEM((8, N_PAD), jnp.float32),
                        pltpu.VMEM((N_PAD, 8), jnp.float32),
                        pltpu.VMEM((N_PAD, 8), jnp.float32)],
    )
    return chain(f, (ti, tj, r8, rT), r_index=2, out_index=0)




# ---------------- K5: K4 + production-structure factors -------------------
# bench/exp_prodkernel showed the K4 gain INVERTS in the production kernel
# (mono 939ns -> dual 1150ns/visit). Production differs by: (a) DYNAMIC trip
# count read from SMEM, (b) a pl.when odd-count tail, (c) a second (masked)
# loop body doubling code footprint. K5 variants add these one at a time to
# the winning K4 structure to find the culprit.
def k5_kernel(cnt_ref, ti_ref, tj_ref, r_in, r_out, f_acc, f_acc2, *,
              tj_w, tail, second_loop):
    r_out[:, :] = r_in[:, :]

    def step(s, c):
        r_out[0, :] += 1e-6
        f_acc[:, :] = jnp.zeros_like(f_acc)
        f_acc2[:, :] = jnp.zeros_like(f_acc2)

        def one(t, fa, masked=False):
            i_lo = ti_ref[t] * 128
            j_lo = tj_ref[t] * tj_w
            isl = pl.ds(i_lo, 128)
            jsl = pl.ds(j_lo, tj_w)
            xi = r_out[0, isl].reshape(128, 1)
            yi = r_out[1, isl].reshape(128, 1)
            zi = r_out[2, isl].reshape(128, 1)
            xj = r_out[0, jsl].reshape(1, tj_w)
            yj = r_out[1, jsl].reshape(1, tj_w)
            zj = r_out[2, jsl].reshape(1, tj_w)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - L * jnp.round(dx * (1.0 / L))
            dy = dy - L * jnp.round(dy * (1.0 / L))
            dz = dz - L * jnp.round(dz * (1.0 / L))
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < RC2
            if masked:
                gi = i_lo + jax.lax.broadcasted_iota(jnp.int32, (128, tj_w), 0)
                gj = j_lo + jax.lax.broadcasted_iota(jnp.int32, (128, tj_w), 1)
                mask = mask & (gj > gi) & (gj < N_PAD) & (gi < N_PAD)
            coef, _du, _e, _ddu = lj_pair_terms(r2, mask, True, False)
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            fa[0, isl] += jnp.sum(fx, axis=1)
            fa[1, isl] += jnp.sum(fy, axis=1)
            fa[2, isl] += jnp.sum(fz, axis=1)
            fa[0, jsl] -= jnp.sum(fx, axis=0)
            fa[1, jsl] -= jnp.sum(fy, axis=0)
            fa[2, jsl] -= jnp.sum(fz, axis=0)

        def body(t2, c2):
            one(2 * t2, f_acc)
            one(2 * t2 + 1, f_acc2)
            return c2

        cnt = cnt_ref[0]
        jax.lax.fori_loop(0, cnt // 2, body, 0)
        if tail:
            @pl.when(cnt % 2 == 1)
            def _():
                one(cnt - 1, f_acc)
        if second_loop:
            def mbody(t2, c2):
                one(2 * t2, f_acc, masked=True)
                one(2 * t2 + 1, f_acc2, masked=True)
                return c2

            cnt2 = cnt_ref[1]
            jax.lax.fori_loop(0, cnt2 // 2, mbody, 0)
            if tail:
                @pl.when(cnt2 % 2 == 1)
                def _():
                    one(cnt2 - 1, f_acc, masked=True)
        r_out[1, :] += (f_acc[1, :] + f_acc2[1, :]) * 1e-9
        return c

    jax.lax.fori_loop(0, STEPS, step, 0)


def run_k5(r8, ti, tj, v, tj_w=512, tail=False, second_loop=False):
    # counts: all v visits in the main loop; the masked loop runs 0 visits
    # (its code is present, its trip count is zero) — matching a production
    # step where the masked list is short.
    cnt = jnp.array([v, 0], dtype=jnp.int32)
    kern = functools.partial(k5_kernel, tj_w=tj_w, tail=tail,
                             second_loop=second_loop)
    f = pl.pallas_call(
        kern, in_specs=[smem(), smem(), smem(), vmem()],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, N_PAD), jnp.float32),
                        pltpu.VMEM((8, N_PAD), jnp.float32)],
    )
    return chain(f, (cnt, ti, tj, r8), r_index=3)


# ---------------- K6: pure-math ceiling probe ------------------------------
# Same tile loads and pair math as K1, but the per-visit force reduction
# (6 axis-sums + 6 dynamic-slice RMW) is replaced by an elementwise add into
# a full-tile VMEM accumulator at a FIXED address — no relayouts, no dynamic
# stores. The K1-minus-K6 gap is the true reduction/RMW overhead per visit;
# K6 itself bounds the achievable Gcand/s of this pair body on the VPU.
def k6_kernel(ti_ref, tj_ref, r_in, r_out, acc, *, v, tj_w):
    r_out[:, :] = r_in[:, :]

    def step(s, c):
        r_out[0, :] += 1e-6
        acc[:, :] = jnp.zeros_like(acc)

        def body(t, c2):
            i_lo = ti_ref[t] * 128
            j_lo = tj_ref[t] * tj_w
            isl = pl.ds(i_lo, 128)
            jsl = pl.ds(j_lo, tj_w)
            xi = r_out[0, isl].reshape(128, 1)
            yi = r_out[1, isl].reshape(128, 1)
            zi = r_out[2, isl].reshape(128, 1)
            xj = r_out[0, jsl].reshape(1, tj_w)
            yj = r_out[1, jsl].reshape(1, tj_w)
            zj = r_out[2, jsl].reshape(1, tj_w)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - L * jnp.round(dx * (1.0 / L))
            dy = dy - L * jnp.round(dy * (1.0 / L))
            dz = dz - L * jnp.round(dz * (1.0 / L))
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < RC2
            coef, _du, _e, _ddu = lj_pair_terms(r2, mask, True, False)
            acc[:, 0:tj_w] += coef * dx + coef * dy + coef * dz
            return c2

        jax.lax.fori_loop(0, v, body, 0)
        r_out[1, :] += acc[1, :] * 1e-9
        return c

    jax.lax.fori_loop(0, STEPS, step, 0)


def run_k6(r8, ti, tj, v, tj_w=512):
    kern = functools.partial(k6_kernel, v=v, tj_w=tj_w)
    f = pl.pallas_call(
        kern, in_specs=[smem(), smem(), vmem()],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, N_PAD), jnp.float32)],
    )
    return chain(f, (ti, tj, r8), r_index=2)


# ---------------- K4: K1 layout + 2-way unroll + dual accumulators --------
def k4_kernel(ti_ref, tj_ref, r_in, r_out, f_acc, f_acc2, *, v, tj_w,
              mic_z=True):
    r_out[:, :] = r_in[:, :]

    def step(s, c):
        r_out[0, :] += 1e-6
        f_acc[:, :] = jnp.zeros_like(f_acc)
        f_acc2[:, :] = jnp.zeros_like(f_acc2)

        def one(t, fa):
            i_lo = ti_ref[t] * 128
            j_lo = tj_ref[t] * tj_w
            isl = pl.ds(i_lo, 128)
            jsl = pl.ds(j_lo, tj_w)
            xi = r_out[0, isl].reshape(128, 1)
            yi = r_out[1, isl].reshape(128, 1)
            zi = r_out[2, isl].reshape(128, 1)
            xj = r_out[0, jsl].reshape(1, tj_w)
            yj = r_out[1, jsl].reshape(1, tj_w)
            zj = r_out[2, jsl].reshape(1, tj_w)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            dx = dx - L * jnp.round(dx * (1.0 / L))
            dy = dy - L * jnp.round(dy * (1.0 / L))
            if mic_z:
                dz = dz - L * jnp.round(dz * (1.0 / L))
            r2 = dx * dx + dy * dy + dz * dz
            mask = r2 < RC2
            coef, _du, _e, _ddu = lj_pair_terms(r2, mask, True, False)
            fx = coef * dx
            fy = coef * dy
            fz = coef * dz
            fa[0, isl] += jnp.sum(fx, axis=1)
            fa[1, isl] += jnp.sum(fy, axis=1)
            fa[2, isl] += jnp.sum(fz, axis=1)
            fa[0, jsl] -= jnp.sum(fx, axis=0)
            fa[1, jsl] -= jnp.sum(fy, axis=0)
            fa[2, jsl] -= jnp.sum(fz, axis=0)

        def body(t2, c2):
            one(2 * t2, f_acc)
            one(2 * t2 + 1, f_acc2)
            return c2

        jax.lax.fori_loop(0, v // 2, body, 0)
        r_out[1, :] += (f_acc[1, :] + f_acc2[1, :]) * 1e-9
        return c

    jax.lax.fori_loop(0, STEPS, step, 0)


def run_k4(r8, ti, tj, v, tj_w=512, mic_z=True):
    kern = functools.partial(k4_kernel, v=v, tj_w=tj_w, mic_z=mic_z)
    f = pl.pallas_call(
        kern, in_specs=[smem(), smem(), vmem()],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((8, N_PAD), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, N_PAD), jnp.float32),
                        pltpu.VMEM((8, N_PAD), jnp.float32)],
    )
    return chain(f, (ti, tj, r8), r_index=2)


if __name__ == "__main__":
    main(sys.argv[1:] or
         ["k1-512", "k2b-512", "k2-512", "k3-512", "k1-128", "k2b-128",
          "k2-128", "trans", "dot"])


