"""Cost of per-iteration wavefront sorting at N=320k on TPU — KEPT AS A
CAUTIONARY MEASUREMENT.

Standalone results (one chip, round 3): keyfn 0.06 ms, lax.sort 0.03 ms,
26-plane permute 0.21 ms.  These numbers do NOT transfer into a
while_loop body: the same permutation applied to the wavefront carry
in situ measured ~74 ms/iteration (TNW 6.2 -> 1.7 Mrays/s), including
with an identity permutation — TPU gathers cost ~11 cycles/lane and the
loop context denies whatever fusion made the standalone version cheap.
See docs/QUIRKS.md "Wavefront scheduler economics".  Always cost
permutations inside the loop they will live in.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = 320 * 1024
K_PLANES = 26    # queue carry: ~26 [N] planes get permuted

rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 512, N).astype(np.int32))
planes = [jnp.asarray(rng.uniform(size=N).astype(np.float32))
          for _ in range(K_PLANES)]
o = [jnp.asarray(rng.uniform(-10, 10, N).astype(np.float32))
     for _ in range(3)]
d = [jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32)) for _ in range(3)]


@jax.jit
def keyfn(o, d):
    oct_ = ((d[0] < 0).astype(jnp.int32) + 2 * (d[1] < 0).astype(jnp.int32)
            + 4 * (d[2] < 0).astype(jnp.int32))
    cell = 0
    for ax in range(3):
        q = jnp.clip(((o[ax] + 10.0) * (4.0 / 20.0)).astype(jnp.int32), 0, 3)
        cell = cell * 4 + q
    return cell * 8 + oct_


@jax.jit
def argsort_only(k):
    return jnp.argsort(k)


@jax.jit
def sort_iota(k):
    _, perm = jax.lax.sort((k, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    return perm


@jax.jit
def permute(perm, planes):
    return [p[perm] for p in planes]


@jax.jit
def full(o, d, planes):
    k = keyfn(o, d)
    _, perm = jax.lax.sort((k, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    return [p[perm] for p in planes]


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print({"name": name, "ms": round(dt, 3)}, flush=True)


timeit("keyfn", keyfn, o, d)
timeit("argsort", argsort_only, keys)
timeit("lax_sort_iota", sort_iota, keys)
timeit("permute26", permute, jnp.argsort(keys), planes)
timeit("full_sort", full, o, d, planes)
