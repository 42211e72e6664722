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

    Every timed execution gets a unique input: a fresh device scalar salt
    (~1e-30 relative) is folded into the first floating leaf of the state,
    so tunnel-side deduplication of repeated identical executions can never
    serve a timed call from cache. Non-positive differences mean the
    measurement is broken (deduplication, clock skew) and raise rather than
    silently clamping to zero.
    """

    def loop(n):
        def run(state, salt):
            leaves, treedef = jax.tree.flatten(state)
            salted = []
            done = False
            for lf in leaves:
                if not done and jnp.issubdtype(lf.dtype, jnp.floating):
                    salted.append(lf + salt * 1e-30)
                    done = True
                else:
                    salted.append(lf)
            state = jax.tree.unflatten(treedef, salted)

            def it(_, carry):
                st, acc = carry
                st2, s = body(st)
                return st2, acc + s
            _, acc = jax.lax.fori_loop(0, n, it, (state, jnp.float32(0.0)))
            return acc
        return jax.jit(run)

    f1, f2 = loop(n1), loop(n2)
    salt_i = 0

    def call(f):
        nonlocal salt_i
        salt_i += 1
        return float(f(state0, jnp.float32(salt_i)))

    call(f1)  # compile
    call(f2)

    ts = []
    for _ in range(reps):
        t0 = time.time()
        call(f1)
        t1 = time.time()
        call(f2)
        t2 = time.time()
        ts.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    ts.sort()
    med = ts[len(ts) // 2]
    if med <= 0.0:
        raise RuntimeError(
            f"device_time measured a non-positive per-iteration delta "
            f"({med * 1e3:.3f} ms); the differencing premise is broken "
            f"(deduplicated executions or dispatch jitter dominating)."
        )
    return med
