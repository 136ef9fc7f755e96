"""Model benchmark grids (reference 0_bench_GNNA_GCN.py / 0_bench_GNNA_GIN.py).

Sweeps the dataset roster with the reference's protocol constants — GCN:
2 layers hidden=16; GIN: 5 layers hidden=64; auto decider + rabbit enabled;
200 epochs timed after 10 dry runs — spawning one CLI process per config
exactly like the reference's ``os.system`` fan-out (0_bench_GNNA_GCN.py:44-53)
so every measurement gets a clean compile cache.

Usage: python -m gnnadvisor_osdi21_tpu.bench.bench_models [gcn|gin] [--quick]
Pipe stdout to a log and feed it to bench/log2csv.py.
"""

from __future__ import annotations

import subprocess
import sys

from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, QUICK


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    model = argv[0] if argv and not argv[0].startswith("-") else "gcn"
    quick = "--quick" in argv
    epochs = "50" if quick else "200"
    hidden = "16" if model == "gcn" else "64"
    roster = QUICK if quick else list(DATASETS)
    for name in roster:
        _, _, dim, classes, _, _ = DATASETS[name]
        cmd = [
            sys.executable, "-m", "gnnadvisor_osdi21_tpu",
            "--dataset", name, "--dim", str(dim), "--hidden", hidden,
            "--classes", str(classes), "--model", model,
            "--num_epoches", epochs,
            "--manual_mode", "False", "--enable_rabbit", "True",
        ]
        print(f"=> {name}", flush=True)
        subprocess.run(cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
