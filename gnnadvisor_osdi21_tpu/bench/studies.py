"""Parameter studies (reference s7-4_*.py / s7-5_1.py).

- ``partsize``: neighbor-group size 2..512 on Type III graphs
  (s7-4_1_neighbor_partitioning.py:5-13)
- ``dimtile``:  feature/lane tiling — the dimWorker study re-targeted at
  TPU pack widths (s7-4_2_dimension_partitiong.py)
- ``reorder``:  rabbit on/off (s7-4_3_node_renumbering.py)
- ``hidden``:   hidden dim 16..1024 on ogbn-arxiv-scale input
  (s7-5_1_hidden_dimension.py)

Each run prints the reference's ``Time (ms)`` contract so
bench/study2csv.py can pivot param x dataset.

Usage: python -m gnnadvisor_osdi21_tpu.bench.studies <study> [--quick]
"""

from __future__ import annotations

import subprocess
import sys

from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, TYPE_III

PARTSIZES = [2, 4, 8, 16, 32, 64, 128, 256, 512]
DIM_TILES = [8, 16, 32, 64, 128]  # dimWorker grid (s7-4_2:5), lane tiles
HIDDEN = [16, 32, 64, 128, 256, 512, 1024]  # s7-5_1:5


def _run(dataset, extra, quick):
    _, _, dim, classes, _, _ = DATASETS[dataset]
    cmd = [
        sys.executable, "-m", "gnnadvisor_osdi21_tpu",
        "--dataset", dataset, "--dim", str(dim), "--classes", str(classes),
        "--num_epoches", "50" if quick else "200",
        # per-epoch dispatch loop: each study config is a fresh program and
        # the full-scan variant's first compile is very slow through this
        # environment's remote compiler (see DESIGN.md §6)
        "--use_scan", "False",
    ] + extra
    subprocess.run(cmd)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    study = argv[0] if argv else "partsize"
    quick = "--quick" in argv
    graphs = TYPE_III[:1] if quick else TYPE_III

    if study == "partsize":
        for ps in PARTSIZES[:3] if quick else PARTSIZES:
            print("******************************")
            print(f"++ Part-size: {ps}")
            print("******************************")
            for ds in graphs:
                print(f"{ds}---partsize: {ps}")
                _run(ds, ["--manual_mode", "True", "--method", "ell",
                          "--partSize", str(ps), "--hidden", "16"], quick)
    elif study == "dimtile":
        # dimension-partitioning study (s7-4_2): on TPU the adaptable
        # feature-axis parameter is the slab kernels' lane tile (lanes per
        # Pallas grid step), not a thread count.
        for dw in DIM_TILES[:3] if quick else DIM_TILES:
            print("******************************")
            print(f"++ dimWorker: {dw}")
            print("******************************")
            for ds in graphs:
                print(f"{ds}---dimWorker: {dw}")
                _run(ds, ["--manual_mode", "True", "--method", "hybrid",
                          "--dimWorker", str(dw), "--hidden", "16"], quick)
    elif study == "reorder":
        # Reference protocol (s7-4_3_node_renumbering.py:10-17): GIN
        # hidden=64, manual mode (so enable_rabbit on/off is forced rather
        # than left to the heuristic), first three Type III graphs.
        for flag in ("False", "True"):
            print("******************************")
            print(f"++ rabbit: {flag}")
            print("******************************")
            for ds in TYPE_III[:1] if quick else TYPE_III[:3]:
                print(f"{ds}---rabbit: {flag}")
                _run(ds, ["--manual_mode", "True", "--method", "hybrid",
                          "--model", "gin",
                          "--enable_rabbit", flag, "--hidden", "64"], quick)
    elif study == "hidden":
        for h in HIDDEN[:3] if quick else HIDDEN:
            print("******************************")
            print(f"++ hidden: {h}")
            print("******************************")
            for ds in graphs:
                print(f"{ds}---hidden: {h}")
                _run(ds, ["--manual_mode", "False", "--hidden", str(h)], quick)
    else:
        raise ValueError(f"unknown study: {study}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
