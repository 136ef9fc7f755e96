"""Training loop + timing protocol (reference GNNA_main.py:177-203).

- Adam, lr=0.01 (GNNA_main.py:177) via optax;
- loss = NLL of log-softmax outputs against labels over **all** nodes
  (train mask is 100%, GNNA_main.py:185, dataset.py:48);
- epoch timing: 10 dry-run epochs, then ``num_epochs`` timed with device
  fences — ``block_until_ready`` standing in for ``cuda.synchronize``
  (GNNA_main.py:189-202).

The step is a single jitted function with donated carry, so XLA fuses the
whole forward+backward+Adam update into one executable — the TPU analog of
the reference's per-layer kernel launches, minus the Python overhead.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from gnnadvisor_osdi21_tpu.models import gcn_apply, gin_apply, init_gcn, init_gin
from gnnadvisor_osdi21_tpu.ops.graph_tensors import GraphTensors

# Max seconds a single device execution may run.  The tunneled TPU worker
# crashes on executions much past ~60 s (kernel-fault watchdog); chunked
# epoch scans stay well under it while keeping dispatch overhead amortized.
_MAX_EXEC_S = 15.0


def nll_loss(
    log_probs: jax.Array,
    labels: jax.Array,
    mask: jax.Array | None = None,
    transposed: bool = False,
) -> jax.Array:
    """Mean negative log-likelihood, matching F.nll_loss(reduction='mean').

    ``mask`` (0/1 per row) excludes padding rows introduced by the hybrid
    layout; the mean is over real rows only.  ``transposed`` means
    log_probs is [classes, N] (the transposed feature layout)."""
    if transposed:
        nll = -jnp.take_along_axis(
            log_probs, labels[None, :].astype(jnp.int32), axis=0
        )[0]
    else:
        nll = -jnp.take_along_axis(
            log_probs, labels[:, None].astype(jnp.int32), axis=1
        )[:, 0]
    if mask is None:
        return nll.mean()
    return jnp.sum(nll * mask) / jnp.sum(mask)


def _gts_transposed(gts) -> bool:
    from gnnadvisor_osdi21_tpu.ops.aggregate import is_transposed

    return is_transposed(gts[0])


def make_train_step(
    apply_fn: Callable,
    gts: Sequence[GraphTensors],
    optimizer: optax.GradientTransformation,
    mask: jax.Array | None = None,
):
    """Build a jitted (params, opt_state, x, y) -> (params, opt_state, loss).

    The graph tensors and mask travel as jit ARGUMENTS, not closure
    captures: closed-over device arrays are baked into the lowered module
    as constants, which at Type II scale (hundreds of MB of adjacency)
    makes tracing and compilation take minutes (see
    utils/timing.py discussion of this platform)."""
    gts = tuple(gts)
    tr = _gts_transposed(gts)

    def loss_fn(params, x, y, gts_, mask_):
        return nll_loss(apply_fn(params, x, gts_), y, mask_, transposed=tr)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y, gts_, mask_):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, gts_, mask_)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def call(params, opt_state, x, y):
        return step(params, opt_state, x, y, gts, mask)

    return call


def build_model(
    model: str,
    key: jax.Array,
    in_dim: int,
    hidden: int,
    num_classes: int,
):
    """(params, apply_fn) for 'gcn' (2-layer) or 'gin' (5-layer)."""
    if model == "gcn":
        return init_gcn(key, in_dim, hidden, num_classes), gcn_apply
    if model == "gin":
        return init_gin(key, in_dim, hidden, num_classes), gin_apply
    raise ValueError(f"unknown model: {model}")


def make_epoch_scan(
    apply_fn: Callable,
    gts: Sequence[GraphTensors],
    optimizer: optax.GradientTransformation,
    num_epochs: int,
    mask: jax.Array | None = None,
):
    """The whole training run as ONE compiled program: a ``lax.scan`` over
    epochs.  TPU-idiomatic — removes per-epoch dispatch overhead entirely
    (the reference pays a Python->C++->CUDA launch per layer per epoch;
    here XLA owns the full loop)."""

    gts = tuple(gts)
    tr = _gts_transposed(gts)

    def loss_fn(params, x, y, gts_, mask_):
        return nll_loss(apply_fn(params, x, gts_), y, mask_, transposed=tr)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, x, y, gts_, mask_):
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, y, gts_, mask_
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=num_epochs
        )
        return params, opt_state, losses[-1]

    class _Runner:
        """Callable + ahead-of-time compile hook (gts/mask pre-bound)."""

        def __call__(self, params, opt_state, x, y):
            return run(params, opt_state, x, y, gts, mask)

        def compile(self, params, opt_state, x, y):
            compiled = run.lower(params, opt_state, x, y, gts, mask).compile()
            return lambda p, o, x_, y_: compiled(p, o, x_, y_, gts, mask)

    return _Runner()


def train_and_time(
    model: str,
    gts: Sequence[GraphTensors],
    x: jax.Array,
    y: jax.Array,
    hidden: int,
    num_classes: int,
    num_epochs: int = 200,
    dry_run: int = 10,
    lr: float = 0.01,
    seed: int = 0,
    mask: jax.Array | None = None,
    use_scan: bool = True,
    save_ckpt: str | None = None,
    resume: str | None = None,
) -> dict:
    """Run the reference timing protocol; returns timings + final loss.

    ``use_scan=True`` (default) compiles the full epoch loop into one
    program; ``False`` uses a per-epoch dispatch loop like the reference.
    Fences are host scalar fetches, not ``block_until_ready`` — on
    tunneled/async platforms the latter is not a reliable completion fence
    (utils/timing.py discussion).

    ``save_ckpt``/``resume`` persist/restore (params, opt_state, step) —
    a new capability over the reference's 200-epoch throwaway runs
    (SURVEY.md §5 'Checkpoint / resume').
    """
    params, apply_fn = build_model(
        model, jax.random.PRNGKey(seed), x.shape[1], hidden, num_classes
    )
    if _gts_transposed(gts):
        # the transposed feature layout wants x as [D, R] — one transpose
        # at setup (x is the full-batch constant), outside the timed loop
        x = x.T
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    start_step = 0
    if resume:
        from gnnadvisor_osdi21_tpu.utils.checkpoint import load_checkpoint

        params, opt_state, start_step = load_checkpoint(
            resume, params, opt_state
        )

    disp_s = 0.0  # per-epoch dispatch correction (use_scan=False only)
    exec_fixed_s = 0.0  # per-execution fixed cost (scan-mode two-point fit)
    if use_scan:
        # the probe re-run below divides by dry_run to estimate epoch time
        # (and sizes the watchdog chunk from it): dry_run=0 would make the
        # estimate dispatch-only and the chunk unbounded
        dry_run = max(dry_run, 1)
        warm = make_epoch_scan(apply_fn, gts, optimizer, dry_run, mask=mask)
        compile_start = time.perf_counter()
        params, opt_state, loss = warm(params, opt_state, x, y)
        float(loss)
        # Re-execute the already-compiled warm program to estimate epoch
        # time (no extra compile; just dry_run more warmup epochs).  The
        # estimate sizes the scan chunk so no single device execution
        # exceeds _MAX_EXEC_S: the tunneled TPU worker kills executions
        # running much longer (observed: a 200-epoch ~96 s GIN program on
        # the 1.9M-node Type II graphs crashes the worker; ~48 s survives).
        probe = time.perf_counter()
        params, opt_state, loss = warm(params, opt_state, x, y)
        float(loss)
        epoch_s_est = (time.perf_counter() - probe) / max(dry_run, 1)
        chunk = max(1, min(num_epochs, int(_MAX_EXEC_S / max(epoch_s_est, 1e-6))))
        timed = make_epoch_scan(apply_fn, gts, optimizer, chunk, mask=mask)
        # compile the timed (chunked) program outside the measured window
        timed_c = timed.compile(params, opt_state, x, y)
        # Drift-proofing (two-point marginal, r5): each chunked execution
        # carries this platform's fixed tunnel dispatch (~25 ms), which a
        # single-point measurement folds into the per-epoch number as
        # fixed/chunk — ~30% of the printed ms at citeseer scale, and the
        # round-over-round "drift" of the Type I roster rows.  Time a
        # SECOND program with a much smaller chunk; the per-execution
        # fixed cost cancels in the slope (same discipline as the kernel
        # benches' chained_marginal_time).  Skipped when chunk is already
        # small (big graphs: the dispatch is <3% of a real epoch there,
        # and the two chunk sizes would not contrast).
        chunk2 = chunk // 8
        timed2_c = None
        if chunk2 >= 1 and chunk >= 8:
            timed2 = make_epoch_scan(
                apply_fn, gts, optimizer, chunk2, mask=mask
            )
            timed2_c = timed2.compile(params, opt_state, x, y)
        warmup_s = time.perf_counter() - compile_start
        n_exec = -(-num_epochs // chunk)  # >= num_epochs epochs total
        # Tiny-graph oversampling: the slope fit differences two medians,
        # and per-execution ambient noise (several ms) swamps a
        # (chunk - chunk2)·epoch signal of ~10 ms at cora scale.  When a
        # full pass costs well under a second, take >= 8 samples per point
        # (more timed epochs than the protocol minimum is harmless).
        if n_exec * (chunk * epoch_s_est + 0.03) < 1.0 and n_exec < 8:
            n_exec *= -(-8 // n_exec)
        final_loss = float(loss)
        times1 = []
        for _ in range(n_exec):
            s1 = time.perf_counter()
            params, opt_state, loss = timed_c(params, opt_state, x, y)
            final_loss = float(loss)  # host fetch: reliable fence per chunk
            times1.append(time.perf_counter() - s1)
        train_s = sum(times1)
        dry_run *= 2  # the probe re-run above trained dry_run extra epochs
        num_epochs = n_exec * chunk  # actual timed epochs (protocol: >= 200)
        exec_fixed_s = 0.0
        if timed2_c is not None:
            n2 = max(3, min(16, n_exec))
            times2 = []
            for _ in range(n2):
                s2 = time.perf_counter()
                params, opt_state, loss = timed2_c(params, opt_state, x, y)
                final_loss = float(loss)
                times2.append(time.perf_counter() - s2)
            num_epochs2 = n2 * chunk2
            # median per-execution times reject ambient spikes (a single
            # ~100 ms hiccup in any one execution otherwise lands in the
            # printed ms wholesale on short-epoch graphs)
            med1 = sorted(times1)[len(times1) // 2]
            med2 = sorted(times2)[len(times2) // 2]
            marg = (med1 - med2) / (chunk - chunk2)
            if marg > 0:  # guard: noise can invert the fit on tiny runs
                exec_fixed_s = max(med1 - chunk * marg, 0.0)
                train_s = marg * num_epochs
            dry_run += num_epochs2  # second-point epochs are extra warmup
    else:
        step = make_train_step(apply_fn, gts, optimizer, mask=mask)
        loss = jnp.zeros(())
        compile_start = time.perf_counter()
        for _ in range(dry_run):
            params, opt_state, loss = step(params, opt_state, x, y)
        float(loss)
        warmup_s = time.perf_counter() - compile_start
        start = time.perf_counter()
        for _ in range(num_epochs):
            params, opt_state, loss = step(params, opt_state, x, y)
        final_loss = float(loss)
        train_s = time.perf_counter() - start
        # The per-epoch dispatch loop carries this platform's fixed tunnel
        # cost once per epoch (measured ~20 ms — a no-op step loop pays
        # it too); calibrate it with the SAME loop structure and subtract,
        # so study arms are comparable to the scan-mode roster rows
        # (round-3 review item 7).  The reference's per-epoch loop pays
        # only ~µs launches, so its numbers never needed this.
        from gnnadvisor_osdi21_tpu.utils.timing import dispatch_floor

        disp_s = dispatch_floor(iters=min(50, max(10, num_epochs)))
        train_s = max(train_s - disp_s * num_epochs, 0.0)

    final_step = start_step + dry_run + num_epochs
    if save_ckpt:
        from gnnadvisor_osdi21_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(save_ckpt, params, opt_state, step=final_step)

    return {
        "epoch_ms": train_s * 1e3 / num_epochs,
        "dispatch_ms": disp_s * 1e3,
        # fixed cost each chunked execution carried, removed from epoch_ms
        # by the scan-mode two-point fit (0.0 when the fit was skipped)
        "exec_fixed_ms": exec_fixed_s * 1e3,
        "warmup_s": warmup_s,
        "final_loss": final_loss,
        "num_epochs": num_epochs,
        "step": final_step,
        "params": params,
        "opt_state": opt_state,
    }


def accuracy(
    log_probs: jax.Array,
    labels: jax.Array,
    mask: jax.Array | None = None,
    transposed: bool = False,
) -> jax.Array:
    """Classification accuracy over (optionally masked) nodes.

    The reference omits accuracy entirely (labels are synthetic all-ones,
    README.md:195); provided here because real datasets have real labels and
    the masks (train 100% / val 30% / test 10%, dataset.py:45-53) exist.
    ``transposed`` means log_probs is [classes, N] (the v3 layout).
    """
    pred = jnp.argmax(log_probs, axis=0 if transposed else 1)
    hit = (pred == labels.astype(pred.dtype)).astype(jnp.float32)
    if mask is None:
        return hit.mean()
    m = mask.astype(jnp.float32)
    return jnp.sum(hit * m) / jnp.maximum(jnp.sum(m), 1.0)
