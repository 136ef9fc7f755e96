"""Baseline roster campaign: the three-way comparison table.

The reference's evaluation headline is a GNNAdvisor-vs-DGL-vs-PyG epoch-time
table over 15 datasets x {GCN, GIN} (dgl_baseline/dgl_main.py:66-88,
pyg_baseline/pyg_main.py, assembled by 1_log2csv.py).  This driver produces
the TPU analog: for each of the 30 roster configs it measures

- ``jax_naive`` (the DGL role): per-edge COO gather + segment_sum, default
  XLA autodiff, same TPU chip as the tuned stack;
- ``torch`` (the PyG role): torch-CPU index_select/index_add_ message
  passing — a genuinely independent framework, but DIFFERENT hardware
  (this container's 4-core CPU; torch has no TPU backend here), so its
  column is labeled with the hardware and read as a cross-framework
  sanity anchor, not a same-silicon comparison.

Protocol: 10 warmup + 50 timed epochs per config (deliberate deviation
from the reference's 200: these are per-epoch *means*, stable by epoch 50,
and the naive stacks run 5-40x slower than the tuned one — 200 epochs
would spend hours of chip time re-measuring known-slow arms).  Resumable
exactly like bench/campaign.py: one log per config under
``logs/baseline_runs/``, skipped when it already holds a ``Time (ms)``
line.  Output: ``logs/baselines.csv`` (long form) and
``logs/speedups.csv`` (tuned vs naive vs torch + speedup columns, joined
against ``logs/roster.csv``).

Usage: python -m gnnadvisor_osdi21_tpu.bench.baseline_campaign
           [--only torch|naive] [--assemble-only] [--quick]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, QUICK

LOG_DIR = "logs"
RUN_DIR = os.path.join("logs", "baseline_runs")
TIMEOUT_S = 2400
EPOCHS = 50


def configs(quick: bool, only: str | None):
    names = QUICK if quick else list(DATASETS)
    for baseline, module in (
        ("torch", "gnnadvisor_osdi21_tpu.baselines.torch_baseline"),
        ("naive", "gnnadvisor_osdi21_tpu.baselines.jax_naive"),
    ):
        if only and baseline != only:
            continue
        for model in ("gcn", "gin"):
            for name in names:
                tag = f"{baseline}_{model}_{name}"
                yield tag, baseline, model, name, [
                    sys.executable, "-m", module, model,
                    "--dataset", name, "--epochs", str(EPOCHS),
                ]


def _done(path: str) -> bool:
    if not os.path.exists(path):
        return False
    with open(path) as fp:
        return "Time (ms):" in fp.read()


def _run_one(tag: str, cmd: list[str]) -> None:
    path = os.path.join(RUN_DIR, f"{tag}.log")
    if _done(path):
        print(f"[skip] {tag}", flush=True)
        return
    t0 = time.time()
    print(f"[run ] {tag}", flush=True)
    with open(path, "w") as fp:
        try:
            subprocess.run(cmd, stdout=fp, stderr=subprocess.STDOUT,
                           timeout=TIMEOUT_S)
        except subprocess.TimeoutExpired:
            fp.write(f"\nCAMPAIGN: timeout after {TIMEOUT_S}s\n")
    status = "ok" if _done(path) else "FAILED"
    print(f"[{status:4}] {tag} ({time.time() - t0:.0f}s)", flush=True)


def _scrape_ms(path: str) -> float | None:
    if not os.path.exists(path):
        return None
    with open(path) as fp:
        m = re.findall(r"Time \(ms\):\s*([0-9.]+)", fp.read())
    return float(m[-1]) if m else None


def assemble(quick: bool) -> None:
    rows = {}
    for tag, baseline, model, name, _cmd in configs(quick, None):
        ms = _scrape_ms(os.path.join(RUN_DIR, f"{tag}.log"))
        rows[(model, name, baseline)] = ms
    with open(os.path.join(LOG_DIR, "baselines.csv"), "w") as fp:
        fp.write("baseline,model,dataset,Avg.Epoch (ms)\n")
        for (model, name, baseline), ms in sorted(rows.items()):
            if ms is not None:
                fp.write(f"{baseline},{model},{name},{ms:.3f}\n")

    tuned = {}
    roster = os.path.join(LOG_DIR, "roster.csv")
    if os.path.exists(roster):
        with open(roster) as fp:
            next(fp)
            for line in fp:
                model, name, ms = line.strip().split(",")
                tuned[(model, name)] = float(ms)
    with open(os.path.join(LOG_DIR, "speedups.csv"), "w") as fp:
        fp.write(
            "model,dataset,tuned_tpu_ms,naive_jax_tpu_ms,torch_cpu_ms,"
            "speedup_vs_naive,speedup_vs_torch\n"
        )
        for model in ("gcn", "gin"):
            for name in DATASETS:
                t = tuned.get((model, name))
                nv = rows.get((model, name, "naive"))
                th = rows.get((model, name, "torch"))
                if t is None:
                    continue
                sn = f"{nv / t:.2f}" if nv else ""
                st = f"{th / t:.2f}" if th else ""
                fp.write(
                    f"{model},{name},{t:.3f},"
                    f"{nv if nv is not None else ''},"
                    f"{th if th is not None else ''},{sn},{st}\n"
                )
    print("assembled logs/baselines.csv + logs/speedups.csv", flush=True)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    quick = "--quick" in argv
    only = None
    if "--only" in argv:
        idx = argv.index("--only") + 1
        if idx >= len(argv) or argv[idx] not in ("torch", "naive"):
            print("usage: baseline_campaign [--quick] [--only torch|naive]"
                  " [--assemble-only]")
            return 2
        only = argv[idx]
    os.makedirs(RUN_DIR, exist_ok=True)
    if "--assemble-only" not in argv:
        # same quiesce handshake as bench/campaign.py: record our PID at
        # the repo root so bench.py can stop this driver before taking
        # the chip (the jax_naive arm runs on the TPU)
        pidfile = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "campaign.pid",
        )
        with open(pidfile, "w") as fp:
            fp.write(f"campaign:{os.getpid()}\n")
        try:
            for tag, _b, _m, _n, cmd in configs(quick, only):
                _run_one(tag, cmd)
        finally:
            try:
                os.remove(pidfile)
            except OSError:
                pass
    assemble(quick)
    return 0


if __name__ == "__main__":
    sys.exit(main())
