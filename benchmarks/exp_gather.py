"""Empirical probe of Mosaic in-kernel gather support (jax 0.9).

The Mosaic lowering of lax.gather_p supports exactly two forms of
tpu.dynamic_gather (take_along_axis on a 2D operand, indices shaped like
the operand): gather along sublanes (axis=0) and along lanes (axis=1).
This script checks which shapes compile ON CHIP and how fast they run —
the decision input for the unstructured (windowed-gather ELL) SpMV
kernel design.
"""

import sys, time, functools

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_sub(table_ref, idx_ref, out_ref):
    # out[i,j] = table[idx[i,j], j]  (gather along sublanes)
    out_ref[...] = jnp.take_along_axis(table_ref[...], idx_ref[...], axis=0)


def kernel_lane(table_ref, idx_ref, out_ref):
    # out[i,j] = table[i, idx[i,j]]  (gather along lanes)
    out_ref[...] = jnp.take_along_axis(table_ref[...], idx_ref[...], axis=1)


def try_one(name, kernel, S, L, idx_max, reps=50):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((S, L)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, idx_max, (S, L)), jnp.int32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
    )
    try:
        out = jax.jit(call)(table, idx)
        out_np = np.asarray(out[:8, :8])
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name} S={S} L={L}: FAIL {type(e).__name__}: {msg}")
        return False
    tnp = np.asarray(table)
    inp = np.asarray(idx)
    if kernel is kernel_sub:
        ref = np.take_along_axis(tnp, inp, axis=0)
    else:
        ref = np.take_along_axis(tnp, inp, axis=1)
    ok = np.allclose(out_np, ref[:8, :8])

    # speed: loop the gather inside one jit to avoid dispatch noise
    @jax.jit
    def bench(t, i):
        def body(k, acc):
            g = call(t, i + (k - k))   # keep idx dependence trivial
            return acc + g[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    r = bench(table, idx); float(r)  # warm + sync
    t0 = time.perf_counter()
    r = bench(table, idx); float(r)
    dt = (time.perf_counter() - t0) / reps
    gps = S * L / dt / 1e9
    print(f"{name} S={S} L={L}: ok={ok} {dt*1e6:.1f} us/call "
          f"{gps:.2f} Gelem/s")
    return True


if __name__ == "__main__":
    print(jax.devices())
    # lane gather: table row length 128 (single vreg row) and wider
    for L in (128, 256, 512):
        try_one("lane", kernel_lane, 256, L, L)
    # sublane gather with replicated-x semantics: table (W,128), idx in [0,W)
    for S in (8, 64, 256, 1024, 4096):
        try_one("sub ", kernel_sub, S, 128, S)
