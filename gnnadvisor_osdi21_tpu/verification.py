"""Kernel verification + single-SpMM profiling (the ``unitest.py`` analog).

Mirrors the reference harness: features are all-ones (unitest.py:27), the
device kernel result is compared against a CPU sparse-matmul oracle
(``torch_sparse.spmm`` there, our COO segment-sum here, unitest.py:33-40),
and the pass criterion is an element mismatch fraction below 1e-4
(unitest.py:54-63).  ``profile_spmm`` reproduces the 10-warmup + N-round
kernel timer (unitest.py:65-80) using the chained-dependency harness that
is reliable over the tunneled device.
"""

from __future__ import annotations

import numpy as np


class Verification:
    def __init__(self, dim: int, prop, gt):
        self.dim = dim
        self.prop = prop
        self.gt = gt
        self.graph = prop.graph
        self.result = None
        self.result_ref = None

    def compute(self):
        """Run the device SAG kernel on all-ones features."""
        import jax
        import jax.numpy as jnp

        from gnnadvisor_osdi21_tpu.ops.aggregate import is_transposed, sag

        n_rows = getattr(self.gt, "num_rows", self.graph.num_nodes)
        tr = is_transposed(self.gt)
        shape = (self.dim, n_rows) if tr else (n_rows, self.dim)
        x = jnp.ones(shape, dtype=jnp.float32)
        out = jax.jit(lambda a, g: sag(a, g))(x, self.gt)
        out = np.asarray(out).T if tr else np.asarray(out)
        self.result = self.prop.unpad_outputs(out)
        return self.result

    def reference(self):
        """CPU oracle: unweighted COO segment-sum (unitest.py:33-40)."""
        import jax.numpy as jnp

        from gnnadvisor_osdi21_tpu.ops import reference as ref

        g = self.graph
        src = ref.csr_to_coo(g.row_pointers, g.column_index)
        x = jnp.ones((g.num_nodes, self.dim), dtype=jnp.float32)
        self.result_ref = np.asarray(
            ref.sag(x, jnp.asarray(src), jnp.asarray(g.column_index), g.num_nodes)
        )
        return self.result_ref

    def compare(self, tolerance: float = 1e-4) -> bool:
        """Pass iff the mismatch fraction is below ``tolerance``
        (unitest.py:54-63).  Closeness is judged per compute dtype:
        float32 kernels must match the oracle at f32 accumulation
        tightness (rtol 1e-4), bfloat16 tier contractions at bf16 rounding
        (rtol 1e-2) — a loose blanket tolerance would hide f32-path bugs."""
        agg_dtype = getattr(self.gt, "agg_dtype", "float32")
        if agg_dtype == "float32":
            rtol, atol = 1e-4, 1e-5
        else:
            rtol, atol = 1e-2, 1e-3
        close = np.isclose(self.result, self.result_ref, rtol=rtol, atol=atol)
        frac = 1.0 - close.mean()
        if frac < tolerance:
            print(f"# Verification PASSED (mismatch fraction {frac:.2e}, "
                  f"agg_dtype={agg_dtype})")
            return True
        print(f"# Verification FAILED (mismatch fraction {frac:.2e}, "
              f"agg_dtype={agg_dtype})")
        return False

    def profile_spmm(self, rounds: int = 200) -> float:
        """Average SpMM kernel ms over ``rounds`` (unitest.py:65-80).

        The reference times 200 individually-launched rounds; here the
        rounds are chained inside one compiled loop (the only reliable
        fence over the tunneled device, utils/timing.py), so 50 chained
        iterations already give a stable per-iteration mean and larger
        ``rounds`` values are capped to bound wall time.
        """
        import jax.numpy as jnp

        from gnnadvisor_osdi21_tpu.ops.aggregate import is_transposed, sag
        from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time

        n_rows = getattr(self.gt, "num_rows", self.graph.num_nodes)
        shape = (
            (self.dim, n_rows) if is_transposed(self.gt) else (n_rows, self.dim)
        )
        x = jnp.ones(shape, dtype=jnp.float32)
        sec = chained_device_time(
            lambda a, g: sag(a, g), x, self.gt, iters=min(rounds, 50)
        )
        return sec * 1e3
