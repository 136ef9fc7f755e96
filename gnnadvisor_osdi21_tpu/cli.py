"""Command-line driver — flag-compatible with the reference's ``GNNA_main.py``.

Reference CLI surface reproduced (GNNA_main.py:15-41): dataset selection
(``--dataDir --dataset --dim --hidden --classes --loadFromTxt``), model +
epochs (``--model --num_epoches``), manual performance parameters
(``--partSize --dimWorker --warpPerBlock --sharedMem`` — the latter three
map to the TPU analogs: feature lane tile, block rows, VMEM budget), mode
flags (``--manual_mode --verbose_mode --enable_rabbit``), and the two
special modes ``--single_spmm`` (kernel profiling, unitest.py:65-80) and
``--verify_spmm`` (kernel verification vs the oracle, unitest.py:9-63).
Booleans are string 'True'/'False' exactly like the reference (:34-39).

TPU additions: ``--method`` (auto/dense/ell/coo/hybrid kernel selection),
``--synthetic N:E:kind`` (generate a graph instead of loading a file),
``--num_devices`` (edge-partitioned multi-chip training).

Output contract kept for the log→CSV pipeline: the final line prints
``Time (ms): <epoch ms>`` (GNNA_main.py:202, scraped by 1_log2csv.py:12-26).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GNNAdvisor-TPU main driver")
    p.add_argument("--dataDir", type=str, default="./data", help="the path to graphs")
    p.add_argument("--dataset", type=str, default="synthetic", help="dataset name")
    p.add_argument("--dim", type=int, default=96, help="input embedding dimension")
    p.add_argument("--hidden", type=int, default=16, help="hidden dimension")
    p.add_argument("--classes", type=int, default=22, help="output classes")
    p.add_argument("--model", type=str, default="gcn", choices=["gcn", "gin"])
    p.add_argument("--num_epoches", type=int, default=200)
    # manual performance parameters (TPU analogs in parentheses)
    p.add_argument("--partSize", type=int, default=32, help="neighbor-group size")
    p.add_argument("--dimWorker", type=int, default=32, help="feature lane tile")
    p.add_argument("--warpPerBlock", type=int, default=8,
                   help="slab rows per grid step, in units of 64 rows")
    p.add_argument("--sharedMem", type=int, default=16384, help="VMEM budget (KB)")
    # string booleans, reference-style
    for name, default, hlp in (
        ("manual_mode", "True", "manual vs auto parameter selection"),
        ("verbose_mode", "False", "verbose prints"),
        ("enable_rabbit", "False", "community reordering"),
        ("loadFromTxt", "False", "load TXT edge list instead of .npz"),
        ("single_spmm", "False", "profile the single SpMM kernel"),
        ("verify_spmm", "False", "verify SpMM against the CPU reference"),
        ("use_scan", "True", "compile the full epoch loop as one lax.scan"),
    ):
        p.add_argument(
            f"--{name}", type=str, choices=["True", "False"], default=default, help=hlp
        )
    # TPU-native additions
    p.add_argument(
        "--method",
        type=str,
        default="auto",
        choices=["auto", "dense", "ell", "coo", "hybrid"],
        help="aggregation kernel selection (auto = decider chooses)",
    )
    p.add_argument(
        "--synthetic",
        type=str,
        default="",
        help="generate a graph: 'N:E:kind' (e.g. 410236:4878874:powerlaw)",
    )
    p.add_argument("--num_devices", type=int, default=1, help="graph-mesh size")
    p.add_argument("--diagB", type=int, default=-1,
                   help="hybrid diagonal-tier block rows (-1 = cost model, 0 = off)")
    p.add_argument("--hotK", type=int, default=-1,
                   help="hybrid hot-tier slab columns (-1 = cost model, 0 = off)")
    p.add_argument("--gemm_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="model-stack GEMM compute dtype (f32 = reference "
                        "contract; bfloat16 = opt-in dense-stack lever)")
    p.add_argument("--agg_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="hybrid-tier compute dtype (f32 accumulate either "
                        "way; float32 = exact multi-pass MXU)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_ckpt", type=str, default="",
                   help="save (params, opt_state, step) to this path after training")
    p.add_argument("--resume", type=str, default="",
                   help="restore (params, opt_state, step) from this path first")
    p.add_argument("--platform", type=str, default="default",
                   choices=["default", "cpu"],
                   help="force the JAX platform (cpu = run without the TPU)")
    return p


def load_dataset(args):
    from gnnadvisor_osdi21_tpu.graphs.loader import load_graph, synthesize_graph

    verbose = args.verbose_mode == "True"
    if args.synthetic:
        n, e, kind = args.synthetic.split(":")
        return synthesize_graph(
            int(n), int(e), num_features=args.dim, num_classes=args.classes,
            kind=kind, seed=args.seed,
        )
    if args.loadFromTxt == "True":
        path = osp.join(args.dataDir, args.dataset)
        return load_graph(
            path, num_features=args.dim, num_classes=args.classes,
            load_from_txt=True, verbose=verbose,
        )
    path = osp.join(args.dataDir, args.dataset + ".npz")
    if not osp.exists(path):
        # Roster datasets synthesize (and cache) a matching topology when
        # the real .npz isn't present (no-egress environments).
        from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, get_dataset

        if args.dataset in DATASETS:
            return get_dataset(
                args.dataset, data_dir=args.dataDir,
                dim=args.dim, classes=args.classes,
            )
    return load_graph(
        path, num_features=args.dim, num_classes=args.classes, verbose=verbose
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(args)
    if args.platform == "cpu":
        # Must happen before any backend init; the env var alone is
        # re-overridden by the container's sitecustomize.
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnnadvisor_osdi21_tpu.tuner.decider import InputProperty
    from gnnadvisor_osdi21_tpu.train import train_and_time

    graph = load_dataset(args)
    verbose = args.verbose_mode == "True"

    prop = InputProperty(
        graph,
        hidden_dim=args.hidden,
        part_size=args.partSize if args.manual_mode == "True" else None,
        feature_tile=args.dimWorker if args.manual_mode == "True" else None,
        block_parts=args.warpPerBlock * 64 if args.manual_mode == "True" else None,
        vmem_budget=args.sharedMem * 1024,
        method=None if args.method == "auto" else args.method,
        diag_b=None if args.diagB < 0 else args.diagB,
        hot_k=None if args.hotK < 0 else args.hotK,
        model=args.model,
        enable_reorder=args.enable_rabbit == "True",
        manual_mode=args.manual_mode == "True",
        verbose=verbose,
        agg_dtype=args.agg_dtype,
        gemm_dtype=args.gemm_dtype,
        # verification checks correctness, not tier quality — skip the
        # on-device probe autotune there
        probe=False if args.verify_spmm == "True" else None,
    ).decider()

    # -- multi-chip path --------------------------------------------------
    if args.num_devices > 1:
        from gnnadvisor_osdi21_tpu.parallel.mesh import make_mesh

        graph = prop.graph
        mesh = make_mesh(args.num_devices)
        if args.method in ("auto", "hybrid"):
            # the tuned hybrid layout, sharded (parallel/hybrid_partition.py)
            from gnnadvisor_osdi21_tpu.parallel.dist_hybrid import (
                make_dist_train_step,
            )
            from gnnadvisor_osdi21_tpu.parallel.hybrid_partition import (
                shard_graph_hybrid,
            )

            # widest aggregate dim the model's layers run (the sharded
            # plan's gather formulation is fleet-global — hybrid_partition)
            agg_dim = (
                max(args.dim, args.hidden) if args.model == "gin"
                else max(args.hidden, args.classes)
            )
            sg = shard_graph_hybrid(
                graph, num_devices=args.num_devices,
                diag_b=None if args.diagB < 0 else args.diagB,
                hot_k=None if args.hotK < 0 else args.hotK,
                agg_feature_dim=agg_dim,
            )
            # the hybrid dist kernels honor the tier compute dtype
            from functools import partial as _partial

            make_dist_train_step = _partial(
                make_dist_train_step, agg_dtype=args.agg_dtype
            )
        else:
            from gnnadvisor_osdi21_tpu.parallel.dist_ops import (
                make_dist_train_step,
            )
            from gnnadvisor_osdi21_tpu.parallel.partition import shard_graph

            sg = shard_graph(graph, num_devices=args.num_devices)
        step, init = make_dist_train_step(mesh, sg, args.model)
        params, opt_state, garr, x, y = init(
            jax.random.PRNGKey(args.seed), args.dim, args.hidden,
            graph.num_classes,
            graph.init_embedding(args.dim, seed=args.seed),
            graph.init_labels(graph.num_classes),
        )
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state, garr, x, y)
        float(loss)  # host fetch = reliable fence (see train.py)
        start = time.perf_counter()
        for _ in range(args.num_epoches):
            params, opt_state, loss = step(params, opt_state, garr, x, y)
        float(loss)
        ms = (time.perf_counter() - start) * 1e3 / args.num_epoches
        print(f"Time (ms): {ms:.3f}")
        return 0

    gts = prop.build_tensors()
    graph = prop.graph

    # -- kernel verification / profiling modes ----------------------------
    if args.verify_spmm == "True":
        from gnnadvisor_osdi21_tpu.verification import Verification

        valid = Verification(args.hidden, prop, gts[0])
        valid.compute()
        valid.reference()
        ok = valid.compare()
        return 0 if ok else 1
    if args.single_spmm == "True":
        from gnnadvisor_osdi21_tpu.verification import Verification

        valid = Verification(args.hidden, prop, gts[0])
        ms = valid.profile_spmm(rounds=args.num_epoches)
        print(f"Time (ms): {ms:.3f}")
        return 0

    # -- training ---------------------------------------------------------
    # Features are synthetic randn (dataset.py:129) and labels all-ones
    # (dataset.py:136): generate them ON DEVICE — shipping a [N, dim] host
    # array through the tunneled device costs minutes at Type II scale.
    n_rows = (
        prop.hybrid_graph.num_rows if prop.hybrid_graph is not None
        else graph.num_nodes
    )
    x = jax.random.normal(
        jax.random.PRNGKey(args.seed), (n_rows, args.dim), jnp.float32
    )
    y = jnp.ones((n_rows,), jnp.int32)
    mask = None
    if prop.hybrid_graph is not None:
        mask = jnp.asarray(prop.hybrid_graph.row_mask)
    res = train_and_time(
        args.model, gts, x, y,
        hidden=args.hidden, num_classes=graph.num_classes,
        num_epochs=args.num_epoches, mask=mask, seed=args.seed,
        use_scan=args.use_scan == "True",
        save_ckpt=args.save_ckpt or None, resume=args.resume or None,
    )
    if verbose:
        print(f"# warmup (s): {res['warmup_s']:.2f}  final loss: {res['final_loss']:.4f}")
    print(f"Time (ms): {res['epoch_ms']:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
