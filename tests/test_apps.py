"""End-to-end CLI smoke tests for the app entry points.

The reference exercises its entry points only by hand (``__main__`` blocks in
``model_train_inference.py`` / ``model_train_sh_inference_cond.py`` /
``model_inference_experiments.py`` / ``tensorprocessor.py``); here each CLI
surface is pinned by CI at the 8³ tiny preset, run as a real subprocess on
the forced-CPU backend (``--device cpu`` / ``--train-devices cpu`` — the
supported escape hatch documented in ``conftest.py``).

These are deliberately *shallow* assertions (exit code + expected artifacts
on disk): numeric behaviour is covered by the unit pyramid; what these pin
is the wiring — arg parsing, directory setup, checkpoint resolution, and the
train→inference hand-off each app performs.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess e2e app drives (~6 min total); fast tier = -m "not slow"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
APPS = os.path.join(REPO, "apps")


def _run_app(script: str, args: list[str], device_count: int = 4,
             timeout: int = 900) -> subprocess.CompletedProcess:
    """Run an app as a subprocess with a small virtual CPU device count
    (4 divides the tiny preset's batch of 4; the conftest's 8 would not)."""
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split() if
             "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={device_count}")
    env["XLA_FLAGS"] = " ".join(flags)
    proc = subprocess.run(
        [sys.executable, os.path.join(APPS, script), *args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )
    return proc


def test_unconditional_app_train_then_inference(tmp_path):
    """``--mode both``: train 3 steps at the tiny preset, then sample from
    the run's own checkpoint dir and write decoded volumes + stats."""
    proc = _run_app("unconditional.py", [
        "--preset", "tiny", "--mode", "both", "--steps", "3",
        "--n-samples", "2", "--batch-size", "2", "--seed", "7",
        "--train-devices", "cpu", "--infer-device", "cpu",
        "--no-save-images", "--no-pretrain-smoke",
        "--root-dir", str(tmp_path),
    ])
    assert "samples/min" in proc.stdout
    samples = os.path.join(tmp_path, "samples", "tiny-smoke")
    decoded = sorted(f for f in os.listdir(samples) if f.startswith("decoded_"))
    assert len(decoded) == 2
    vol = np.load(os.path.join(samples, decoded[0]))
    assert vol.shape == (8, 8, 8)
    # decoded categories use the GeoGen convention: air = -1
    assert vol.min() >= -1 and vol.max() <= 13


def test_conditional_app_train(tmp_path):
    """Conditional tiny training: 2 steps through the masked-loss objective,
    metrics CSV written, losses reported."""
    proc = _run_app("conditional.py", [
        "--preset", "tiny", "--steps", "2", "--device", "cpu",
        "--root-dir", str(tmp_path),
    ])
    assert "final loss" in proc.stdout
    metrics = os.path.join(tmp_path, "metrics", "tiny-smoke-cond")
    assert any(f.endswith(".csv") for f in os.listdir(metrics))


def test_inference_experiments_full_chain(tmp_path):
    """``--stage all`` at the tiny preset: scenario creation → ensemble
    populate (random-init weights; the chain's wiring is what's under test)
    → vote/entropy analysis artifacts."""
    _run_app("inference_experiments.py", [
        "--preset", "tiny", "--stage", "all", "--device", "cpu",
        "--n-scenarios", "1", "--n-samples", "2", "--batch-size", "2",
        "--save-dir", str(tmp_path),
    ])
    # stage-specific artifacts (ADVICE r3: create-data alone writes
    # true_model/boreholes — assert populate and analyze actually produced):
    scen = os.path.join(tmp_path, "scenario_0")
    for stage, name in [
        ("create-data", "true_model.npy"), ("create-data", "boreholes.npy"),
        ("populate", "sol_0.npy"), ("populate", "sol_1.npy"),
        ("analyze", "probability_tensor.npy"), ("analyze", "entropy.npy"),
        ("analyze", "most_probable.npy"),
    ]:
        path = os.path.join(scen, name)
        assert os.path.exists(path), (
            f"{stage} stage artifact missing: {name} "
            f"(have: {sorted(os.listdir(scen)) if os.path.isdir(scen) else 'no scenario dir'})"
        )


def test_toy2d_app(tmp_path):
    out = os.path.join(tmp_path, "toy.png")
    _run_app("toy2d.py", [
        "--steps", "30", "--batch-size", "64", "--device", "cpu", "--out", out,
    ], timeout=600)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_tensorprocessor_renders_folder(tmp_path):
    folder = tmp_path / "vols"
    folder.mkdir()
    rng = np.random.default_rng(0)
    np.save(folder / "decoded_s0_0.npy",
            rng.integers(-1, 14, size=(8, 8, 8)).astype(np.int8))
    _run_app("tensorprocessor.py", [str(folder), "--device", "cpu"],
             timeout=600)
    rendered = folder / "rendered"
    assert rendered.is_dir() and len(list(rendered.iterdir())) > 0
