"""End-to-end CLI integration over the on-disk nuScenes fixture."""
import subprocess
import sys
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess CLIs: full pipeline + jit per test

from tests.test_data_pipeline import _write_fixture


def _run(args, timeout=1200):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m"] + args, capture_output=True, text=True,
        timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_train_cli_on_fixture(tmp_path):
    pkl = _write_fixture(str(tmp_path))
    r = _run(["dhd_tpu.cli.train", "--preset", "dhd_tiny",
              "--ann-file", pkl, "--steps", "2", "--batch-size", "2",
              "--log-interval", "1",
              "--work-dir", str(tmp_path / "wd")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss_total" in r.stdout
    assert (tmp_path / "wd" / "metrics.jsonl").exists()


def test_test_cli_on_fixture(tmp_path):
    pkl = _write_fixture(str(tmp_path))
    r = _run(["dhd_tpu.cli.test", "--preset", "dhd_tiny",
              "--ann-file", pkl, "--limit", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mIoU" in r.stdout


def test_test_cli_rayiou_on_fixture(tmp_path):
    pkl = _write_fixture(str(tmp_path))
    r = _run(["dhd_tpu.cli.test", "--preset", "dhd_tiny",
              "--ann-file", pkl, "--limit", "1", "--eval", "ray-iou"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RayIoU@1" in r.stdout


def test_export_cli_int8_real_data_calibration(tmp_path):
    """--int8 --ann-file calibrates on REAL pipeline batches (the analogue
    of convert_bevdet_to_TRT.py's HDF5 calibration set, :42-120) and still
    produces a loadable artifact."""
    pkl = _write_fixture(str(tmp_path))
    out = tmp_path / "tiny_int8.stablehlo"
    r = _run(["dhd_tpu.cli.export", "--preset", "dhd_tiny",
              "--out", str(out), "--int8", "--ann-file", pkl,
              "--calib-batches", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "real (" in r.stdout, r.stdout
    assert out.exists() and out.stat().st_size > 0


def test_benchmark_cli_stream_mode():
    """--what stream (the benchmark_sequential.py equivalent): steady-state
    streaming step of the temporal model, cache threaded between iters."""
    r = _run(["dhd_tpu.cli.benchmark", "--preset", "dhd_tiny_stereo",
              "--what", "stream", "--iters", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "streaming inference" in r.stdout


def test_test_cli_evaluates_every_sample_once(tmp_path):
    """Regression: (a) the first batch used to be consumed by the example
    peek and never scored, (b) ray-iou origins were misaligned by one batch,
    (c) the tail (len % batch_size) samples were silently dropped."""
    pkl = _write_fixture(str(tmp_path))
    # 3 samples at batch_size 2 -> one full batch + a tail batch of 1
    r = _run(["dhd_tpu.cli.test", "--preset", "dhd_tiny",
              "--ann-file", pkl, "--limit", "3", "--batch-size", "2",
              "--eval", "ray-iou"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "evaluated 3 samples" in r.stdout
    # origins follow evaluation order exactly, starting at sample 0
    assert "rayiou-samples: tok0 tok1 tok2" in r.stdout
