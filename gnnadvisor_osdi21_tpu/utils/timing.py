"""Device timing that survives high-latency / async dispatch environments.

The reference brackets kernels with ``cuda.synchronize`` (GNNA_main.py:195).
On a tunneled TPU, host↔device roundtrips cost tens of ms and
``block_until_ready`` on an enqueued computation is not a reliable fence —
so per-call host loops mis-measure badly.  Instead we:

1. chain ``iters`` executions of the op inside ONE jitted
   ``lax.fori_loop``, feeding a scalar derived from each output back into
   the next input (a true data dependency: no CSE, no dead-code
   elimination, no overlap tricks),
2. read back a single scalar at the end (forces completion),
3. time multiple repetitions and subtract the calibrated dispatch
   overhead.

Used by bench.py and the studies; also a user-facing profiling utility
(the ``profile_spmm`` analog, unitest.py:65-80).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def chained_device_time(
    op: Callable,
    x: jax.Array,
    aux=None,
    iters: int = 50,
    reps: int = 3,
    warmup: int = 1,
) -> float:
    """Mean seconds per op execution.

    ``op(x, aux)`` maps an array (+ an aux pytree of graph tensors) to an
    array; its output is folded to a scalar and mixed back into the next
    iteration's input, so all ``iters`` executions are serially dependent.
    ``aux`` is passed as a jit *argument* — never close over multi-MB device
    arrays (they get baked into the HLO as constants, exploding compile
    time).
    """

    @jax.jit
    def run(x0, seed, aux_):
        def body(i, carry):
            x_in, acc = carry
            out = op(x_in, aux_) if aux_ is not None else op(x_in)
            s = jnp.sum(out) * 1e-30
            return x_in + s, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (x0 + seed, jnp.float32(0)))
        return acc

    for _ in range(warmup):
        float(run(x, jnp.float32(0), aux))

    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(x, jnp.float32(r + 1), aux))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def chained_marginal_time(
    op: Callable,
    x: jax.Array,
    aux=None,
    iters: int = 200,
    reps: int = 3,
    quad: int = 4,
) -> tuple[float, float]:
    """(marginal seconds per op execution, fixed dispatch seconds).

    Two-point fit: time the chained loop at ``iters`` and ``quad·iters``
    executions and report the slope.  This removes the per-*dispatch* fixed
    cost of this platform (measured ~25 ms through the tunnel — an identity
    chain at iters=50 reads 0.50 ms/iter, at 200 it reads 0.13, and the
    two-point slope reads the true ~5 µs loop body) that a single-point
    measurement smears over the iterations.  The reference's own protocol
    averages 200 rounds on hardware whose launch overhead is ~µs
    (unitest.py:65-80); the slope is the same quantity — marginal cost per
    SpMM — measured in a way that survives a ~25 ms dispatch tunnel.
    Both points take the min over ``reps`` runs (first compile excluded).
    """

    def timed(n: int) -> float:
        @jax.jit
        def run(x0, seed, aux_):
            def body(i, carry):
                x_in, acc = carry
                out = op(x_in, aux_) if aux_ is not None else op(x_in)
                s = jnp.sum(out) * 1e-30
                return x_in + s, acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x0 + seed, jnp.float32(0)))
            return acc

        float(run(x, jnp.float32(0), aux))  # compile + warm
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(run(x, jnp.float32(r + 1), aux))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t2 = timed(quad * iters)
    marginal = (t2 - t1) / ((quad - 1) * iters)
    fixed = max(t1 - marginal * iters, 0.0)
    return marginal, fixed


def dispatch_floor(iters: int = 50, reps: int = 3) -> float:
    """Per-dispatch fixed cost of an async step loop (fence only at the
    end) — what a per-epoch dispatch loop pays per epoch on this tunneled
    platform even for a no-op step.  Used to print dispatch-corrected
    per-epoch times for the ``use_scan=False`` study arms, making them
    comparable to the scan-mode roster rows (the loop structure matches
    train_and_time's: N enqueues, one host fetch at the end)."""

    @jax.jit
    def tiny(s):
        return s + 1.0

    s0 = jnp.float32(0)
    float(tiny(s0))
    best = float("inf")
    for r in range(reps):
        s = jnp.float32(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = tiny(s)
        float(s)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def roundtrip_overhead(reps: int = 5) -> float:
    """Calibrate the host→device→host latency of a trivial computation."""

    @jax.jit
    def tiny(s):
        return s + 1.0

    float(tiny(jnp.float32(0)))
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(r)))
        best = min(best, time.perf_counter() - t0)
    return best
