"""Probe: does Mosaic compile s8 x s8 -> s32 MXU dots on this v5e, and at
what speed vs bf16?  Small shapes FIRST (compile-pathology rule, CLAUDE.md),
then one bank-kernel-shaped tile.  Informs an opt-in int8 bank-scoring mode
(v5e int8 peak is ~2x bf16).

Usage: python benchmarks/probe_int8_dot.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(x_ref, b_ref, o_ref, acc_dtype):
    o_ref[...] = jnp.dot(x_ref[...], b_ref[...],
                         preferred_element_type=acc_dtype,
                         precision=lax.Precision.DEFAULT)


def run(m, k, n, in_dtype, acc_dtype, iters=50):
    x = jnp.asarray(np.random.default_rng(0).integers(-127, 127, (m, k)),
                    in_dtype)
    b = jnp.asarray(np.random.default_rng(1).integers(-127, 127, (k, n)),
                    in_dtype)
    f = pl.pallas_call(
        functools.partial(_kern, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
    )
    t0 = time.time()
    out = f(x, b)
    out.block_until_ready()
    compile_s = time.time() - t0

    # chained timing: perturb x so the loop isn't hoisted
    @jax.jit
    def chain(x, b):
        def body(c, _):
            o = f(c, b)
            c = (c + o[:1, :k].astype(in_dtype) * 0).astype(in_dtype)
            return c, o[0, 0]
        c, outs = lax.scan(body, x, None, length=iters)
        return outs[-1]

    r = chain(x, b)
    r.block_until_ready()
    t0 = time.time()
    r = chain(x, b)
    r.block_until_ready()
    dt = (time.time() - t0) / iters
    flops = 2 * m * k * n
    print(f"{in_dtype.__name__:9s} {m}x{k}x{n}: compile {compile_s:.1f}s, "
          f"{dt*1e3:.3f} ms/iter, {flops/dt/1e12:.1f} TOP/s, out[0,0]={r}")
    return dt


def main():
    print("devices:", jax.devices())
    # tiny first: does s8 compile at all?
    run(128, 256, 128, jnp.int8, jnp.int32, iters=10)
    # bank-kernel-shaped tile (the production kernel's per-grid-step dot is
    # (1024, 768) x (768, bank_tile)); compare int8 vs bf16 at that shape
    d8 = run(1024, 768, 2048, jnp.int8, jnp.int32)
    db = run(1024, 768, 2048, jnp.bfloat16, jnp.float32)
    print(f"int8 speedup vs bf16 at bank-tile shape: {db/d8:.2f}x")


if __name__ == "__main__":
    main()
