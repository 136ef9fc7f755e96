"""The input-adaptive parameter decider ("Advisor"), re-targeted at TPU.

The reference's ``inputProperty.decider()`` (param.py:51-120) derives CUDA
launch parameters from cheap graph statistics:

- ``partSize = int(avg_degree)``              (param.py:73)
- ``dimWorker = min(dim, 32)``                (param.py:96-106)
- ``warpPerBlock`` from a shared-memory budget (param.py:75-94)
- reorder iff ``sqrt(avgEdgeSpan) > sqrt(N)/100`` (param.py:110)
- per-layer (input vs hidden) parameter sets   (param.py:122-141)

The TPU analog keeps the same decision structure but targets TPU resources:

- **aggregation path** — the biggest lever on TPU is *which kernel shape*
  to use, not launch geometry: dense MXU matmul for small graphs, padded
  neighbor-group (ELL) gather/segment-sum for large ones, per-edge COO for
  extremely skewed degree distributions where ELL padding would waste
  bandwidth.
- ``part_size``       — neighbor-group width, from avg degree, clamped and
  rounded to sublane-friendly sizes (the partSize analog; drives the ELL
  path).
- ``diag_b``/``hot_k`` — the hybrid layout's tier sizes, from the measured
  cost model over the graph's degree/locality structure
  (graphs/hybrid.py:choose_tiers) — the partSize analog for the tuned path.
- ``feature_tile``    — lanes per Pallas grid step ``min(round_up(dim, 8),
  128)`` (the dimWorker analog: 128 lanes instead of 32 threads); drives
  the slab kernels' lane tiling.
- ``block_parts``     — slab rows per Pallas grid step, from the VMEM
  budget (the warpPerBlock/sharedMem analog: VMEM is the shared-memory
  analog); drives the slab kernels' row tiling.
- per-layer configs: the input layer sees ``dim`` features, hidden layers
  see ``hidden`` — same split as set_input/set_hidden.  The hybrid layout
  itself is feature-free, so both layers share the device arrays and only
  the kernel geometry differs.

Manual mode passes user parameters straight through, as in the reference.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR
from gnnadvisor_osdi21_tpu.graphs.partition import build_neighbor_groups
from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors

# TPU resource model (v5e-class defaults).
VMEM_BUDGET_BYTES = 16 * 1024 * 1024  # per-core scoped VMEM (sharedMem analog)
VMEM_FRACTION = 0.9  # headroom fraction (the param.py:45 analog; Mosaic
# already double-buffers inside the accounted budget below)
LANE_WIDTH = 128
SUBLANE = 8
MAX_BLOCK_PARTS = 512  # cap on slab rows per grid step (power of two)
DENSE_MAX_NODES = 4096  # above this, an N×N adjacency stops being a win

# ELL cost law (per-epoch): weighted-least-squares fit over the round-3
# partSize study grid (logs/study_partsize.csv — 5 Type III graphs x
# partSize 2..512, v5e, 2026-08-19).  A slot is one gathered (possibly
# padded) neighbor row; a part is one neighbor group (per-part overhead of
# the two-level masked-sum + segment reduction).
ELL_SLOT_NS = 44.0
ELL_PART_NS = 125.0


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class LayerConfig:
    """Per-layer kernel parameters (the set_input/set_hidden analog)."""

    method: str  # "dense" | "ell" | "coo" | "hybrid"
    part_size: int
    feature_tile: int  # lanes per feature tile (dimWorker analog)
    block_parts: int  # part rows per kernel block (warpPerBlock analog)
    feature_dim: int


class InputProperty:
    """Bundles graph + model dims + perf parameters; owns the decider.

    API parity with ``inputProperty`` (param.py:4-49): constructed with the
    graph and manual parameters, then ``decider()`` fills in the rest.
    """

    def __init__(
        self,
        graph: GraphCSR,
        hidden_dim: int,
        part_size: Optional[int] = None,
        feature_tile: Optional[int] = None,
        block_parts: Optional[int] = None,
        vmem_budget: int = VMEM_BUDGET_BYTES,
        method: Optional[str] = None,
        hot_k: Optional[int] = None,
        diag_b: Optional[int] = None,
        model: str = "gcn",
        enable_reorder: bool = False,
        manual_mode: bool = False,
        verbose: bool = False,
        agg_dtype: str = "bfloat16",
        transposed: Optional[bool] = None,
        probe: Optional[bool] = None,
        gemm_dtype: str = "float32",
    ):
        # gemm_dtype: model-stack GEMM compute dtype (ops.aggregate._gemm).
        # f32 default keeps the reference's cuBLAS contract; "bfloat16" is
        # the opt-in production lever for the dense stack.
        # probe: measured-probe tier autotune (graphs/hybrid.build_hybrid
        # ``probe``) — None auto-gates on TPU; False for correctness-only
        # paths (verification) where tier quality is irrelevant.
        # transposed: feature arrays live [D, R] with graph rows on the
        # 128-lane axis (the v3 layout — exact-bytes streams, measured
        # 3-4x faster slab passes, ops/spmm_pallas.py).  None = on for the
        # hybrid method (models/train/verification all adapt via
        # ops.aggregate.is_transposed); row-major paths ignore it.
        # agg_dtype: compute dtype for the hybrid tier contractions
        # (accumulation is always f32).  "bfloat16" is the TPU-native
        # default — the 0/1 adjacency and all-ones verification fixtures
        # are exact in bf16, features round at ~3e-3 relative — and is
        # ~2.3x faster than "float32", whose MXU contraction runs
        # multi-pass at precision=HIGHEST to honor exact-f32 semantics
        # (measured in bench/levers.py).
        self.graph = graph
        self.input_dim = graph.num_features
        self.hidden_dim = hidden_dim
        self.part_size = part_size
        self.feature_tile = feature_tile
        self.block_parts = block_parts
        self.vmem_budget = int(vmem_budget * VMEM_FRACTION)
        self.method = method
        self.hot_k = hot_k
        self.diag_b = diag_b
        # user-FIXED tier values (None = auto): build_tensors re-runs the
        # tier choice through build_hybrid so the measured-probe autotune
        # can override the model pick in auto mode (r5)
        self._user_hot_k = hot_k
        self._user_diag_b = diag_b
        self.model = model
        self.enable_reorder = enable_reorder
        self.manual_mode = manual_mode
        self.verbose = verbose
        self.agg_dtype = agg_dtype
        self.transposed = transposed
        self.probe = probe
        self.gemm_dtype = gemm_dtype

        self.reorder_status = False
        self.layer_input: Optional[LayerConfig] = None
        self.layer_hidden: Optional[LayerConfig] = None
        self.hybrid_graph = None  # set by build_tensors for method="hybrid"

    def pad_features(self, a):
        """Node-indexed array → the kernel row space (identity unless the
        hybrid layout relabeled/padded rows)."""
        import numpy as np

        return self.hybrid_graph.pad_array(np.asarray(a)) if self.hybrid_graph else a

    def unpad_outputs(self, a):
        import numpy as np

        return (
            self.hybrid_graph.unpad_array(np.asarray(a)) if self.hybrid_graph else a
        )

    # -- decision helpers ---------------------------------------------------

    def _auto_method(self) -> str:
        g = self.graph
        if g.num_nodes <= DENSE_MAX_NODES:
            return "dense"
        return "hybrid"

    def _auto_part_size(self) -> int:
        # Measured ELL cost law replacing the reference's naive
        # partSize = int(avg_degree) rule (param.py:73): one epoch costs
        # ~ELL_SLOT_NS per gathered slot (parts·P rows incl. padding) +
        # ELL_PART_NS per neighbor group (the two-level reduction's
        # per-part overhead).  Constants fitted by weighted least squares
        # over the round-3 partSize study grid (logs/study_partsize.csv,
        # 5 Type III graphs x 9 sizes); the model lands on the measured
        # optimum (P=8) or within one grid step (<=4% time) on all five —
        # the mean-degree rule missed artist's optimum by 35%.
        import numpy as np

        rp = np.asarray(self.graph.row_pointers, dtype=np.int64)
        deg = np.diff(rp)
        best, best_cost = 2, float("inf")
        for p in (2, 4, 8, 16, 32, 64):
            parts = int(-(-deg // p).sum()) if len(deg) else 1
            cost = ELL_SLOT_NS * parts * p + ELL_PART_NS * parts
            if cost < best_cost:
                best, best_cost = p, cost
        return best

    def _auto_feature_tile(self, dim: int) -> int:
        # dimWorker analog: lanes covering the feature dim, capped at the
        # 128-lane width (param.py:96-106 capped at 32 threads).
        return min(_round_up(max(dim, 1), SUBLANE), LANE_WIDTH)

    def _auto_block_parts(self, slab_k: int, dim: int) -> int:
        # warpPerBlock/sharedMem analog: slab rows one Pallas grid step
        # stages in VMEM.  Accounted per step for the v4 (uint16/bf16)
        # kernels: the unpacked 0/1 bf16 matrix (rows·K·2 — the dominant
        # scratch), double-buffered slab bits (2·rows·K/8 — u16 words,
        # same bytes as the old u32), x tile (2·K·td·2 bf16), out tile
        # (2·rows·td·4 f32 accumulator) — the analog of the CUDA kernel's
        # three shared-memory buffers (GNNAdvisor_kernel.cu:345-347).
        # Power of two so it divides both the padded row count and any
        # diagonal block.
        if slab_k <= 0:
            return MAX_BLOCK_PARTS
        td = self._auto_feature_tile(dim)
        budget = self.vmem_budget - 2 * slab_k * td * 2
        per_row = slab_k * 2 + slab_k // 4 + td * 8
        n = max(budget, 0) // per_row
        b = 64
        while b * 2 <= min(n, MAX_BLOCK_PARTS):
            b *= 2
        return b

    def _should_reorder(self) -> bool:
        # Same heuristic as param.py:110.
        g = self.graph
        return math.sqrt(g.avg_edgeSpan) > math.sqrt(g.num_nodes) / 100.0

    # -- public API ---------------------------------------------------------

    def decider(self) -> "InputProperty":
        """Fill per-layer configs; manual mode passes user params through
        (param.py:58-70), auto mode derives them from graph stats.

        Order matters: reorder first (param.py:110), because the hybrid
        tier choice (diag_b) measures post-reorder locality."""
        if self.manual_mode:
            method = self.method or "ell"
            ps = self.part_size or 32
            if self.enable_reorder:
                self.reorder_status = True
        else:
            method = self.method or self._auto_method()
            ps = self.part_size or self._auto_part_size()
            self.part_size = ps
            if self.enable_reorder:
                self.reorder_status = self._should_reorder()

        if self.reorder_status:
            from gnnadvisor_osdi21_tpu.graphs import reorder as reorder_mod

            self.graph = reorder_mod.rabbit_reorder_graph(self.graph)

        slab_k = 0
        if method == "hybrid":
            import numpy as np

            from gnnadvisor_osdi21_tpu.graphs.hybrid import choose_tiers

            g = self.graph
            src = np.repeat(
                np.arange(g.num_nodes, dtype=np.int64),
                np.diff(np.asarray(g.row_pointers, dtype=np.int64)),
            )
            self.diag_b, self.hot_k = choose_tiers(
                src,
                np.asarray(g.column_index, dtype=np.int64),
                g.num_nodes,
                hot_k=self.hot_k,
                diag_b=self.diag_b,
            )
            # the fused slab pass unpacks BOTH slabs per grid step, so the
            # VMEM budget must price their combined width
            slab_k = self.diag_b + self.hot_k

        def layer(dim: int) -> LayerConfig:
            if self.manual_mode:
                ft = self.feature_tile or self._auto_feature_tile(dim)
                bp = self.block_parts or self._auto_block_parts(slab_k, dim)
            else:
                ft = self._auto_feature_tile(dim)
                bp = self._auto_block_parts(slab_k, dim)
            return LayerConfig(
                method=method, part_size=ps, feature_tile=ft,
                block_parts=bp, feature_dim=dim,
            )

        self.layer_input = layer(self.input_dim)
        self.layer_hidden = layer(self.hidden_dim)

        if self.verbose:
            mode = "MANUAL" if self.manual_mode else "AUTO"
            print(f"# {mode} input  layer: {self.layer_input}")
            print(f"# {mode} hidden layer: {self.layer_hidden}")
            if method == "hybrid":
                print(f"# hybrid tiers: diag_b={self.diag_b} hot_k={self.hot_k}")
            print(f"# reorder: {self.reorder_status}")
        return self

    def build_tensors(self, device=None):
        """Materialize device arrays for both layers (shares the neighbor
        groups when the part sizes match, which is the common case).

        For the hybrid method this also builds the padded-row layout; use
        ``pad_features`` / ``unpad_outputs`` to move node data in and out.
        """
        assert self.layer_input is not None, "call decider() first"
        li, lh = self.layer_input, self.layer_hidden
        if li.method == "hybrid":
            from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid
            from gnnadvisor_osdi21_tpu.ops.hybrid_agg import (
                build_hybrid_tensors, with_geometry,
            )

            # The layout is feature-free (tier choice happened in decider);
            # both layers share the device arrays, each with its own kernel
            # geometry (the set_input/set_hidden analog, param.py:122-141).
            # User-fixed tiers pass through; auto tiers go back through
            # build_hybrid so the measured-probe autotune can override the
            # model pick on device (graphs/hybrid.py PROBE_*).
            self.hybrid_graph = build_hybrid(
                self.graph, hot_k=self._user_hot_k, diag_b=self._user_diag_b,
                probe=self.probe,
            )
            hg = self.hybrid_graph
            if (hg.diag_b, hg.hot_k) != (self.diag_b, self.hot_k):
                if self.verbose:
                    print(
                        f"# probe autotune: measured ({hg.diag_b},"
                        f"{hg.hot_k}) over model ({self.diag_b},"
                        f"{self.hot_k})"
                    )
                # the probe overrode the model pick: refresh tier-dependent
                # kernel geometry (the VMEM budget prices the slab width)
                self.diag_b, self.hot_k = hg.diag_b, hg.hot_k
                sk = self.diag_b + self.hot_k
                for attr in ("layer_input", "layer_hidden"):
                    lc = getattr(self, attr)
                    if not (self.manual_mode and self.block_parts):
                        setattr(self, attr, dataclasses.replace(
                            lc,
                            block_parts=self._auto_block_parts(
                                sk, lc.feature_dim
                            ),
                        ))
                li, lh = self.layer_input, self.layer_hidden
            transposed = True if self.transposed is None else self.transposed
            # the width each layer's AGGREGATE runs at: aggregation follows
            # the GEMM in GCN (hidden, then classes) and precedes it in GIN
            # (input, then hidden) — SURVEY §3.1/§3.2.  It gates the
            # residual gather formulation per layer (hybrid_agg
            # ``agg_feature_dim``, RES_SINGLE_MAX_CELLS).
            if self.model == "gin":
                agg_dims = (self.input_dim, self.hidden_dim)
            else:
                agg_dims = (
                    self.hidden_dim,
                    getattr(self.graph, "num_classes", self.hidden_dim),
                )
            gt_in = build_hybrid_tensors(
                hg, device=device,
                block_rows=li.block_parts, feature_tile=li.feature_tile,
                agg_dtype=self.agg_dtype, transposed=transposed,
                agg_feature_dim=agg_dims[0], gemm_dtype=self.gemm_dtype,
            )

            def _single(d):
                from gnnadvisor_osdi21_tpu.graphs.hybrid import (
                    RES_SINGLE_MAX_CELLS,
                )

                return (
                    hg.res_single and hg.res_dst.size > 0
                    and hg.num_res_slots * d <= RES_SINGLE_MAX_CELLS
                )

            if _single(agg_dims[0]) == _single(agg_dims[1]):
                gt_hid = with_geometry(gt_in, lh.block_parts, lh.feature_tile)
            else:
                # layers straddle the width limit: each gets its own
                # gather formulation (only res_dst/res_gather differ)
                gt_hid = build_hybrid_tensors(
                    hg, device=device,
                    block_rows=lh.block_parts, feature_tile=lh.feature_tile,
                    agg_dtype=self.agg_dtype, transposed=transposed,
                    agg_feature_dim=agg_dims[1], gemm_dtype=self.gemm_dtype,
                )
            return gt_in, gt_hid
        groups = None
        if li.method == "ell":
            groups = build_neighbor_groups(
                self.graph.row_pointers, self.graph.column_index, li.part_size
            )
            if self.verbose:
                print(f"# ell padding waste: {groups.padding_waste:.3f}")
        gt_in = build_graph_tensors(
            self.graph, method=li.method, groups=groups, device=device,
            gemm_dtype=self.gemm_dtype,
        )
        if lh.method == li.method and lh.part_size == li.part_size:
            gt_hid = gt_in
        else:
            gt_hid = build_graph_tensors(
                self.graph,
                method=lh.method,
                part_size=lh.part_size,
                device=device,
                gemm_dtype=self.gemm_dtype,
            )
        return gt_in, gt_hid
