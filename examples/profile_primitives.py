"""Micro-benchmarks of the data-movement primitives the binning chain uses,
at representative sizes, on the real chip. Establishes the cost model that
ROOFLINE.md cites: which of gather/scatter/sort/scan/cumsum XLA lowers well
on TPU, so the binning is expressed in the fast ones."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.utils.profiling import loop_bench

N = 600_000
M = 1 << 22  # 4.2M pairs
CAP = M + (1 << 21)  # 6.3M padded

rng = np.random.default_rng(0)
idx_m_n = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
idx_m_n_sorted = jnp.sort(idx_m_n)
idx_small = jnp.asarray(rng.integers(0, 6400, M).astype(np.int32))
vals_n = jnp.asarray(rng.standard_normal(N).astype(np.float32))
ints_n = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
ints_m = jnp.asarray(rng.integers(0, 1 << 30, M).astype(np.int32))
vals_small = jnp.asarray(rng.standard_normal(6400).astype(np.float32))
rows_n16 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
dest_m = jnp.asarray(np.sort(rng.choice(CAP, M, replace=False)).astype(np.int32))
offsets_n = jnp.asarray(np.sort(rng.integers(0, M, N)).astype(np.int32))

bench = {}


def run(name, fn, *args):
    t = loop_bench(fn, *args, iters=8)
    bench[name] = t
    print(f"{name:44s} {t*1e3:8.2f} ms", flush=True)


run("gather_int 4M<-600k (random)", lambda i, x: ints_n[(x + i) % N].sum().astype(jnp.float32), idx_m_n)
run("gather_int 4M<-600k (sorted idx)", lambda i, x: ints_n[jnp.minimum(x + i, N - 1)].sum().astype(jnp.float32), idx_m_n_sorted)
run("gather_int 4M<-6400 (small table)", lambda i, x: (jnp.arange(6400, dtype=jnp.int32)[(x + i) % 6400]).sum().astype(jnp.float32), idx_small)
run("gather_f32 4M<-6400 one-hot-able", lambda i, x: vals_small[(x + i) % 6400].sum(), idx_small)
run("rowgather [4M,16]f32 <- [600k,16]", lambda i, x: rows_n16[(x + i) % N].sum(), idx_m_n)
run("rowgather_int [4M,1] <- [600k,1]", lambda i, x: ints_n[:, None][(x + i) % N].sum().astype(jnp.float32), idx_m_n)
run("scatter_set 4M->6.3M", lambda i, d: jnp.zeros((CAP,), jnp.int32).at[d].set(ints_m + i, mode="drop").sum().astype(jnp.float32), dest_m)
run("scatter_set 4M->4M (perm)", lambda i, d: jnp.zeros((M,), jnp.int32).at[((d * 1664525 + 1013904223) % M).astype(jnp.int32)].set(ints_m + i, mode="drop").sum().astype(jnp.float32), jnp.arange(M, dtype=jnp.int32))
run("scatter_add 600k->4M", lambda i, o: jnp.zeros((M,), jnp.int32).at[o].add(1 + i * 0, mode="drop").sum().astype(jnp.float32), offsets_n)
run("scatter_set 6400->4M", lambda i, o: jnp.zeros((M,), jnp.float32).at[o[:6400]].set(vals_small + i, mode="drop").sum(), offsets_n)
run("cumsum 4M int32", lambda i, x: jnp.cumsum(x + i).sum().astype(jnp.float32), ints_m)
run("cummax 4M int32", lambda i, x: jax.lax.cummax(x + i).sum().astype(jnp.float32), ints_m)
run("cummax 4M int64", lambda i, x: jax.lax.cummax((x + i).astype(jnp.int64) << 20).sum().astype(jnp.float32), ints_m)
run("sort 4M 1key+1payload (stable)", lambda i, x: jax.lax.sort((x + i, jnp.arange(M, dtype=jnp.int32)), num_keys=1, is_stable=True)[0].sum().astype(jnp.float32), idx_small)
run("sort 4M 1key+2payloads (stable)", lambda i, x: jax.lax.sort((x + i, jnp.arange(M, dtype=jnp.int32), ints_m), num_keys=1, is_stable=True)[0].sum().astype(jnp.float32), idx_small)
run("sort 600k 1key+3payloads (stable)", lambda i, x: jax.lax.sort((x + i, ints_n, ints_n, ints_n), num_keys=1, is_stable=True)[0].sum().astype(jnp.float32), vals_n)
run("argsort 600k f32", lambda i, x: jnp.argsort(x + i, stable=True).sum().astype(jnp.float32), vals_n)
run("searchsorted 6401 in 4M sorted", lambda i, x: jnp.searchsorted(x + i, jnp.arange(6401, dtype=jnp.int32)).sum().astype(jnp.float32), jnp.sort(idx_small))

import json

print(json.dumps({k: round(v * 1e3, 2) for k, v in bench.items()}))
