"""CLI driver tests (GNNA_main.py-compatible surface)."""

import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.cli import main


def test_cli_train_gcn_auto(capsys):
    rc = main([
        "--synthetic", "800:6000:community", "--dim", "16", "--hidden", "8",
        "--classes", "4", "--num_epoches", "5", "--manual_mode", "False",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Time (ms):" in out


def test_cli_train_gin_manual_ell(capsys):
    rc = main([
        "--synthetic", "500:4000:powerlaw", "--dim", "16", "--hidden", "8",
        "--classes", "4", "--model", "gin", "--num_epoches", "3",
        "--manual_mode", "True", "--method", "ell", "--partSize", "8",
    ])
    assert rc == 0
    assert "Time (ms):" in capsys.readouterr().out


def test_cli_verify_spmm(capsys):
    rc = main([
        "--synthetic", "600:5000:community", "--dim", "16", "--hidden", "16",
        "--classes", "4", "--manual_mode", "False", "--verify_spmm", "True",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Verification PASSED" in out


def test_cli_single_spmm(capsys):
    rc = main([
        "--synthetic", "600:5000:community", "--dim", "16", "--hidden", "16",
        "--classes", "4", "--manual_mode", "False", "--single_spmm", "True",
        "--num_epoches", "5",
    ])
    assert rc == 0
    assert "Time (ms):" in capsys.readouterr().out


def test_cli_multichip(capsys):
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    rc = main([
        "--synthetic", "400:3000:community", "--dim", "16", "--hidden", "8",
        "--classes", "4", "--num_epoches", "3", "--manual_mode", "False",
        "--num_devices", "4",
    ])
    assert rc == 0
    assert "Time (ms):" in capsys.readouterr().out


def test_cli_rabbit_flag(capsys):
    rc = main([
        "--synthetic", "800:8000:community", "--dim", "16", "--hidden", "8",
        "--classes", "4", "--num_epoches", "3", "--manual_mode", "False",
        "--enable_rabbit", "True",
    ])
    assert rc == 0
    assert "Time (ms):" in capsys.readouterr().out


def test_log2csv_roundtrip(tmp_path):
    from gnnadvisor_osdi21_tpu.bench.log2csv import parse_log

    log = [
        "Namespace(dataDir='./d', dataset='cora', dim=96)\n",
        "Time (ms): 1.234\n",
        "Namespace(dataDir='./d', dataset='pubmed', dim=96)\n",
        "Time (ms): 5.678\n",
    ]
    rows = parse_log(log)
    assert rows == [("cora", "1.234"), ("pubmed", "5.678")]


def test_study2csv_pivot(tmp_path):
    from gnnadvisor_osdi21_tpu.bench.study2csv import parse

    log = [
        "++ Part-size: 2\n",
        "cora---partsize: 2\n",
        "Time (ms): 1.0\n",
        "pubmed---partsize: 2\n",
        "Time (ms): 2.0\n",
        "++ Part-size: 4\n",
        "cora---partsize: 4\n",
        "Time (ms): 0.5\n",
    ]
    table = parse(log)
    assert table["2"]["cora"] == "1.0"
    assert table["2"]["pubmed"] == "2.0"
    assert table["4"]["cora"] == "0.5"


def test_cli_forced_hybrid_method(capsys):
    rc = main([
        "--synthetic", "900:9000:powerlaw", "--dim", "16", "--hidden", "8",
        "--classes", "4", "--num_epoches", "3", "--manual_mode", "False",
        "--method", "hybrid",
    ])
    assert rc == 0
    assert "Time (ms):" in capsys.readouterr().out


def test_reorder_tool(tmp_path, capsys):
    from gnnadvisor_osdi21_tpu.tools.reorder import main as reorder_main

    p = tmp_path / "g.txt"
    lines = []
    rng = __import__("numpy").random.default_rng(0)
    for _ in range(200):
        a, b = rng.integers(0, 40, 2)
        lines.append(f"{a} {b}")
    p.write_text("\n".join(lines) + "\n")
    rc = reorder_main([str(p)])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert sorted(int(v) for v in out) == list(range(40))

    rc = reorder_main(["-c", str(p)])
    cap = capsys.readouterr()
    assert rc == 0
    comm = [int(v) for v in cap.out.strip().splitlines()]
    assert len(comm) == 40
    assert "modularity:" in cap.err
