"""Microbenchmark: TPU gather cost vs table layout.

The r4 profile shows per-winner attribute gathers (rows from ~330k-row
tables) dominate frame time.  This tool measures XLA gather throughput for
candidate layouts to pick the replacement design.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.devbench import device_time

T = 331904
N = 262144


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)

    def bench(name, fn, *args):
        f = jax.jit(fn)
        ms = device_time(f, *args, iters=5)
        print(f"{name:44s} {ms:8.3f} ms  ({ms*1e6/N:6.1f} ns/row)")

    for F in (1, 3, 8, 16, 32, 128):
        tab = jnp.zeros((T, F), jnp.float32)
        bench(f"rows ({T},{F})[idx]", lambda t, i: t[i], tab, idx)
    tab16 = jnp.zeros((T, 16), jnp.float32)
    bench("rows (T,16)[idx_sorted]", lambda t, i: t[i], tab16, idx_sorted)
    tab1 = jnp.zeros((T,), jnp.float32)
    bench("scalar (T,)[idx]", lambda t, i: t[i], tab1, idx)
    # lane-dim gather: table transposed (F, T), gather along minor axis
    tabT = jnp.zeros((16, T), jnp.float32)
    bench("lanes (16,T) take_along_axis",
          lambda t, i: jnp.take_along_axis(
              t, jnp.broadcast_to(i[None], (16, N)), axis=1), tabT, idx)
    # gather on reshaped 3D (T//128, 128, F): two-level
    tab3 = jnp.zeros((T // 128, 128, 16), jnp.float32)
    bench("3d (T/128,128,16) [q] then lane-pick",
          lambda t, i: jnp.take_along_axis(
              t[i // 128], (i % 128)[:, None, None], axis=1)[:, 0],
          tab3, idx)
    # one-hot matmul within 512-cluster segments is not generally applicable;
    # skip.  Scatter comparison:
    src = jnp.zeros((N, 4), jnp.float32)
    big = jnp.zeros((T, 4), jnp.float32)
    bench("scatter (T,4).at[idx].set", lambda b, i, s: b.at[i].set(s),
          big, idx, src)
    bench("scatter-add (T,4).at[idx].add", lambda b, i, s: b.at[i].add(s),
          big, idx, src)


if __name__ == "__main__":
    main()
