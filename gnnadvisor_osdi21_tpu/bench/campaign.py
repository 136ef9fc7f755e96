"""Full measurement campaign: 30-row roster + the 4 parameter studies.

Drives every measurement the reference's evaluation protocol produces —
the 15-dataset × {GCN, GIN} roster (0_bench_GNNA_GCN.py / 0_bench_GNNA_GIN.py)
and the four studies (s7-4_1 partsize, s7-4_2 dimtile, s7-4_3 reorder,
s7-5_1 hidden) — as one **resumable** sequential run: each config gets its
own log under ``logs/runs/<tag>.log`` and is skipped when that log already
contains a ``Time (ms)`` line, so an interrupted campaign continues where
it stopped.  After the sweep, the per-run logs are assembled into the
protocol logs (``logs/gcn.log``, ``logs/gin.log``, ``logs/study_*.log``)
and pivoted to CSV with the stock log2csv/study2csv scrapers.

Usage: python -m gnnadvisor_osdi21_tpu.bench.campaign [--quick] [--only roster|studies]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, QUICK, TYPE_III
from gnnadvisor_osdi21_tpu.bench.studies import DIM_TILES, HIDDEN, PARTSIZES

LOG_DIR = "logs"
RUN_DIR = os.path.join("logs", "runs")
TIMEOUT_S = 2400  # generous: Type II first compiles go through the tunnel

# extra flags appended to every config (e.g. ["--platform", "cpu"] in
# --smoke mode, which validates the whole sweep+assemble pipeline off-TPU)
SMOKE_ARGS: list[str] = []


def _config_cmd(dataset: str, extra: list[str], epochs: int) -> list[str]:
    _, _, dim, classes, _, _ = DATASETS[dataset]
    return [
        sys.executable, "-m", "gnnadvisor_osdi21_tpu",
        "--dataset", dataset, "--dim", str(dim), "--classes", str(classes),
        "--num_epoches", str(epochs),
    ] + extra + SMOKE_ARGS


def roster_configs(quick: bool):
    """15 datasets × GCN(h16)/GIN(h64), auto decider + rabbit (reference
    0_bench_GNNA_GCN.py:44-53 grid)."""
    epochs = 50 if quick else 200
    names = QUICK if quick else list(DATASETS)
    for model, hidden in (("gcn", 16), ("gin", 64)):
        for name in names:
            tag = f"roster_{model}_{name}"
            yield tag, model, _config_cmd(name, [
                "--model", model, "--hidden", str(hidden),
                "--manual_mode", "False", "--enable_rabbit", "True",
            ], epochs)


def study_configs(quick: bool):
    """The four reference studies; every run uses the per-epoch dispatch
    loop (fresh program per config; the scan variant's first compile is
    slow through the remote compiler).

    Deliberate protocol deviation: study arms run 50 timed epochs, not the
    roster's 200 (reference: 200 everywhere, GNNA_main.py:197).  Studies
    measure *relative* curves across a parameter grid — the per-epoch mean
    is stable by epoch 50 — and the grids contain deliberately pathological
    arms (partSize=2 on the ELL path runs ~770 ms/epoch) where 200 epochs
    would spend hours re-measuring a point nothing uses."""
    epochs = 50
    graphs = TYPE_III[:1] if quick else TYPE_III

    # s7-4_3 first: the reordering thesis is the headline claim, so its
    # data lands even if the sweep is interrupted.
    for flag in ("False", "True"):
        for ds in TYPE_III[:1] if quick else TYPE_III[:3]:
            yield f"reorder_{flag}_{ds}", "reorder", _config_cmd(ds, [
                "--manual_mode", "True", "--method", "hybrid",
                "--model", "gin", "--hidden", "64",
                "--enable_rabbit", flag, "--use_scan", "False",
            ], epochs), f"++ rabbit: {flag}\n{ds}---rabbit: {flag}"

    for ps in PARTSIZES[:3] if quick else PARTSIZES:
        # partSize >= 256 pads the gather volume ~20-30x (deliberately
        # pathological reference arms, s7-4_1:5) and runs 15-30 s/epoch;
        # 10 timed epochs give the same stable per-epoch mean without
        # spending hours of chip time on a point nothing uses
        arm_epochs = 10 if ps >= 256 else epochs
        for ds in graphs:
            yield f"partsize_{ps}_{ds}", "partsize", _config_cmd(ds, [
                "--manual_mode", "True", "--method", "ell",
                "--partSize", str(ps), "--hidden", "16",
                "--use_scan", "False",
            ], arm_epochs), f"++ Part-size: {ps}\n{ds}---partsize: {ps}"

    for dw in DIM_TILES[:3] if quick else DIM_TILES:
        for ds in graphs:
            yield f"dimtile_{dw}_{ds}", "dimtile", _config_cmd(ds, [
                "--manual_mode", "True", "--method", "hybrid",
                "--dimWorker", str(dw), "--hidden", "16",
                "--use_scan", "False",
            ], epochs), f"++ dimWorker: {dw}\n{ds}---dimWorker: {dw}"

    for h in HIDDEN[:3] if quick else HIDDEN:
        for ds in graphs:
            yield f"hidden_{h}_{ds}", "hidden", _config_cmd(ds, [
                "--manual_mode", "False", "--hidden", str(h),
                "--use_scan", "False",
            ], epochs), f"++ hidden: {h}\n{ds}---hidden: {h}"


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


def _assemble(quick: bool) -> None:
    """Per-run logs -> protocol logs -> CSVs (stock scrapers)."""
    from gnnadvisor_osdi21_tpu.bench import log2csv, study2csv

    def cat(paths, out, headers=None):
        with open(out, "w") as fp:
            for i, p in enumerate(paths):
                if headers:
                    fp.write(headers[i] + "\n")
                # only splice in *completed* runs: log2csv pairs dataset
                # names with "Time (ms)" lines by order, so a failed log
                # (Namespace echo, no timing) would shift every subsequent
                # time onto the wrong dataset
                if _done(p):
                    with open(p) as rp:
                        fp.write(rp.read())
                elif os.path.exists(p):
                    print(f"[assemble] skipping incomplete {p}", flush=True)
        return out

    for model in ("gcn", "gin"):
        tags = [t for t, m, _ in roster_configs(quick) if m == model]
        paths = [os.path.join(RUN_DIR, f"{t}.log") for t in tags]
        log2csv.main([cat(paths, os.path.join(LOG_DIR, f"{model}.log"))])

    by_study: dict[str, list[tuple[str, str]]] = {}
    for tag, study, _, header in study_configs(quick):
        by_study.setdefault(study, []).append(
            (os.path.join(RUN_DIR, f"{tag}.log"), header)
        )
    for study, entries in by_study.items():
        if not any(_done(p) for p, _ in entries):
            # no completed runs for this grid in the current sweep: keep
            # whatever assembled artifact already exists (a filtered
            # campaign must not clobber a previous round's grid)
            print(f"[assemble] no runs for study '{study}', keeping "
                  "existing artifacts", flush=True)
            continue
        out = os.path.join(LOG_DIR, f"study_{study}.log")
        cat([p for p, _ in entries], out, headers=[h for _, h in entries])
        study2csv.main([out])

    # roster.csv: model,dataset,Avg.Epoch (ms)
    with open(os.path.join(LOG_DIR, "roster.csv"), "w") as fp:
        fp.write("model,dataset,Avg.Epoch (ms)\n")
        for model in ("gcn", "gin"):
            csv = os.path.join(LOG_DIR, f"{model}.csv")
            if os.path.exists(csv):
                with open(csv) as rp:
                    next(rp)
                    for line in rp:
                        fp.write(f"{model},{line}")


def main(argv=None) -> int:
    global LOG_DIR, RUN_DIR
    argv = list(sys.argv[1:] if argv is None else argv)
    quick = "--quick" in argv
    if "--smoke" in argv:
        # Off-TPU validation of the full sweep + assembly pipeline; kept
        # fully separate from the real campaign's logs and resume state.
        quick = True
        LOG_DIR = os.path.join("logs", "smoke")
        RUN_DIR = os.path.join(LOG_DIR, "runs")
        os.makedirs(LOG_DIR, exist_ok=True)
        # appended last, so it overrides the per-config epoch count
        SMOKE_ARGS.extend(["--platform", "cpu", "--num_epoches", "3"])
    if "--assemble-only" in argv:
        # rebuild the CSVs from whatever per-run logs exist (idempotent;
        # lets an interrupted sweep still publish its completed points)
        _assemble(quick)
        return 0
    only = None
    study_filter = None
    if "--only" in argv:
        idx = argv.index("--only") + 1
        ok = idx < len(argv) and (
            argv[idx] in ("roster", "studies")
            or argv[idx].startswith("studies:")
        )
        if not ok:
            print("usage: campaign [--quick] [--smoke] [--only roster|"
                  "studies[:name,name]] [--assemble-only]")
            return 2
        only = argv[idx]
        if only.startswith("studies:"):
            # e.g. --only studies:partsize,reorder — run a subset of the
            # study grids (chip-time budgeting on slow-compile days)
            study_filter = set(only.split(":", 1)[1].split(","))
            only = "studies"
    os.makedirs(RUN_DIR, exist_ok=True)
    # record our PID so bench.py's _quiesce_campaign can stop exactly this
    # driver (never a pattern match) before taking the chip; anchored at
    # the repo root (where bench.py reads it), not the CWD
    pidfile = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "campaign.pid",
    )
    with open(pidfile, "w") as fp:
        fp.write(f"campaign:{os.getpid()}\n")
    try:
        if only in (None, "roster"):
            for tag, _model, cmd in roster_configs(quick):
                _run_one(tag, cmd)
        if only in (None, "studies"):
            for tag, study, cmd, _hdr in study_configs(quick):
                if study_filter and study not in study_filter:
                    continue
                _run_one(tag, cmd)
    finally:
        try:
            os.remove(pidfile)
        except OSError:
            pass
    _assemble(quick)
    print("campaign done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
