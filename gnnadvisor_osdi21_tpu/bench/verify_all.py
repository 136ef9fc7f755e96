"""Kernel verification across the dataset roster (reference 4_verifying.py).

Runs the unitest-style SAG verification (``--verify_spmm True``) for every
dataset; any mismatch fails the sweep.

Usage: python -m gnnadvisor_osdi21_tpu.bench.verify_all [--quick] [--platform cpu]
"""

from __future__ import annotations

import subprocess
import sys

from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, QUICK


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    quick = "--quick" in argv
    extra = (
        ["--platform", argv[argv.index("--platform") + 1]]
        if "--platform" in argv else []
    )
    roster = QUICK if quick else list(DATASETS)
    failed = []
    for name in roster:
        _, _, dim, classes, _, _ = DATASETS[name]
        cmd = [
            sys.executable, "-m", "gnnadvisor_osdi21_tpu",
            "--dataset", name, "--dim", str(dim), "--classes", str(classes),
            "--hidden", "16", "--manual_mode", "False",
            "--verify_spmm", "True",
        ] + extra
        print(f"=> verifying {name}", flush=True)
        if subprocess.run(cmd).returncode != 0:
            failed.append(name)
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("All kernel verifications passed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
