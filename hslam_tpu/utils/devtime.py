"""Honest device-time measurement through high-latency dispatch paths.

The development setup reaches the TPU through a tunnel with ~20ms dispatch
round-trip, non-blocking `block_until_ready`, and deduplication of repeated
identical executions — so the usual "enqueue N calls, block once" timing
reports garbage. The only reliable method is to chain N data-dependent
iterations of the workload inside ONE jitted `lax.fori_loop`, force a scalar
host read, and difference two loop lengths so the fixed dispatch/read cost
cancels:

    t_per_iter = (T(n2) - T(n1)) / (n2 - n1)

The loop body must feed a result-derived epsilon back into its input —
otherwise XLA hoists the loop-invariant body and measures nothing.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time(
    body: Callable,
    state0,
    n1: int = 5,
    n2: int = 25,
    reps: int = 3,
) -> float:
    """Median per-iteration device time (seconds) of `body`.

    Args:
      body: state -> (state, scalar). The scalar must depend on the
        computation's result; the returned state must keep the workload
        statistically identical (e.g. original input + scalar * 1e-30).
      state0: initial state pytree (device arrays).
      n1, n2: the two chained loop lengths to difference.
      reps: repetitions; the median difference is returned.
    """

    def loop(n):
        def run(state):
            def it(_, carry):
                st, acc = carry
                st2, s = body(st)
                return st2, acc + s
            _, acc = jax.lax.fori_loop(0, n, it, (state, jnp.float32(0.0)))
            return acc
        return jax.jit(run)

    f1, f2 = loop(n1), loop(n2)
    float(f1(state0))  # compile
    float(f2(state0))

    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f1(state0))
        t1 = time.time()
        float(f2(state0))
        t2 = time.time()
        ts.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    ts.sort()
    return max(ts[len(ts) // 2], 0.0)
