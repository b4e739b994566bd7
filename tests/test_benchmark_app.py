"""benchmark_app (tools/benchmark_app.py) smoke: each mode produces the
OpenVINO-style summary block with a positive throughput."""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*extra):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "benchmark_app.py"),
         "-m", "mnist", "-d", "cpu", "-niter", "3", "-t", "20", *extra],
        capture_output=True, text=True, timeout=180, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"Throughput:\s+([0-9.]+) FPS", out.stdout)
    assert m, out.stdout
    assert float(m.group(1)) > 0
    assert "Median" in out.stdout and "Count:" in out.stdout
    return out.stdout


def test_latency_hint():
    s = _run("-hint", "latency")
    assert "batch=1" in s


def test_throughput_hint():
    s = _run("-hint", "throughput", "-b", "8")
    assert "batch=8" in s and "24 samples" in s


def test_async_api():
    _run("-api", "async", "-nireq", "2")


def test_device_only_latency():
    s = _run("-hint", "latency", "--device-only", "--inner", "4")
    assert "device-only (on-device chain, inner=4)" in s
    assert "12 samples" in s  # 3 outer iterations x inner=4
