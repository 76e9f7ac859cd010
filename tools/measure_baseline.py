"""Measure the reference PyTorch pipeline's throughput on this host (CPU).

The reference publishes no numbers (BASELINE.md); this tool produces the
comparison row by timing the reference's own Unet3D forward pass (imported
from /root/reference, never copied) at the published flagship config
(``model_train_inference.py:77-97``) and extrapolating samples/min at the
benchmark's fixed NFE.  CPU is the only hardware the reference can use here
(torch is CPU-only in this image), matching its ``--infer-device cpu`` path.

Writes the result into bench.py's BASELINE_SAMPLES_PER_MIN and prints JSON.
"""

from __future__ import annotations

import importlib.util
import json
import time

import torch

NFE = 120


def load_ref_unet3d():
    path = "/root/reference/src/flowtrain/models/unet_attn_3d.py"
    spec = importlib.util.spec_from_file_location("ref_unet3d", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Unet3D


@torch.no_grad()
def main():
    Unet3D = load_ref_unet3d()
    model = Unet3D(
        dim=48, dim_mults=(1, 1, 2, 3, 4), data_channels=18, dropout=0.1,
        time_resolution=1024, time_bandwidth=1000.0, time_learned_emb=True,
        attn_enabled=True, attn_dim_head=32, attn_heads=4,
        full_attn=None, flash_attn=False,
    ).eval()
    n_params = sum(p.numel() for p in model.parameters())

    x = torch.randn(1, 18, 64, 64, 64)
    t = torch.tensor([0.5])

    # warmup
    model(x, t)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        model(x, t)
        times.append(time.perf_counter() - t0)
    fwd = min(times)
    samples_per_min = 60.0 / (fwd * NFE)
    print(json.dumps({
        "reference_forward_s": round(fwd, 3),
        "params": n_params,
        "nfe": NFE,
        "reference_samples_per_min_cpu": round(samples_per_min, 4),
    }))


if __name__ == "__main__":
    main()
