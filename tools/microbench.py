"""VPU micro-benchmarks for kernel design decisions (single TPU process).

Measures the real per-op cost of the shapes the trace kernel uses:
  bcast   [512,1] op [1,128] broadcast multiplies (the MT sweep's shape)
  full    [512,128] op [512,128] vreg-resident multiplies
  recip   divide vs approx-reciprocal+Newton on [512,128]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 600


def _bench(fn, *args):
    r = jax.jit(fn)(*args)
    r.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.jit(fn)(*args)
        s = float(jnp.sum(r))
        best = min(best, time.perf_counter() - t0)
    return best


def k_bcast(a_ref, b_ref, o_ref):
    a = a_ref[:]          # [512,1]
    b = b_ref[:]          # [1,128]
    acc = a * b
    for _ in range(REPS):
        acc = acc + a * b
    o_ref[:] = acc


def k_full(a_ref, b_ref, o_ref):
    a = a_ref[:]          # [512,128]
    b = b_ref[:]
    acc = a * b
    for _ in range(REPS):
        acc = acc + a * b
    o_ref[:] = acc


def k_div(a_ref, b_ref, o_ref):
    a, b = a_ref[:], b_ref[:]
    acc = a / b
    for _ in range(8):
        acc = acc + a / (b + acc)
    o_ref[:] = acc


def k_recip(a_ref, b_ref, o_ref):
    a, b = a_ref[:], b_ref[:]

    def rcp(x):
        r = pl.reciprocal(x, approx=True)
        return r * (2.0 - x * r)

    acc = a * rcp(b)
    for _ in range(8):
        acc = acc + a * rcp(b + acc)
    o_ref[:] = acc


def run(kernel, ashape, bshape):
    f = lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    a = jnp.ones(ashape, jnp.float32) * 1.5
    b = jnp.ones(bshape, jnp.float32) * 0.5
    return _bench(f, a, b)


def main():
    t1 = run(k_bcast, (512, 1), (1, 128))
    t2 = run(k_full, (512, 128), (512, 128))
    print(json.dumps({"step": "bcast_vs_full",
                      "bcast_us": round(t1 * 1e6, 1),
                      "full_us": round(t2 * 1e6, 1),
                      "ratio": round(t1 / t2, 2)}))
    t3 = run(k_div, (512, 128), (512, 128))
    t4 = run(k_recip, (512, 128), (512, 128))
    print(json.dumps({"step": "div_vs_recip",
                      "div_us": round(t3 * 1e6, 1),
                      "recip_us": round(t4 * 1e6, 1)}))


if __name__ == "__main__":
    main()
