"""In-training callbacks: periodic sampling with uncertainty maps.

Rebuilds the reference ``InferenceCallback``
(``project/geodata-3d-unconditional/callbacks.py:15-169``): every N epochs,
generate a few samples from the current (EMA-preferred) weights with a seeded
X0, decode, compute prominence (top1−top2 softmax margin) uncertainty, save
slice grids + heatmaps, and record ``time_to_solve``.

Plugs into ``train.loop.train(callback=...)``.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig
from flowtrain_stochastic_interpolation_tpu.inference import make_sampler
from flowtrain_stochastic_interpolation_tpu.train.state import TrainState


class InferenceCallback:
    def __init__(
        self,
        config: ExperimentConfig,
        model,
        save_dir: str,
        *,
        every_n_epochs: int = 5,
        n_samples: int = 4,
        n_frames: int = 32,
        tf: float = 0.999,
        seed: int = 42,
        use_ema: bool = True,
        writer=None,
    ):
        self.config = config
        self.model = model
        self.save_dir = save_dir
        self.every_n_epochs = every_n_epochs
        self.n_samples = n_samples
        self.n_frames = n_frames
        self.tf = tf
        self.seed = seed
        self.use_ema = use_ema
        self.writer = writer  # optional MetricsWriter for time_to_solve + images
        os.makedirs(save_dir, exist_ok=True)
        self._steps_per_epoch = max(
            config.data.epoch_size // config.data.batch_size, 1
        )
        self._last_epoch_done = -1

    def __call__(self, step: int, state: TrainState, metrics: dict) -> None:
        epoch = step // self._steps_per_epoch
        if epoch == self._last_epoch_done or epoch % self.every_n_epochs:
            return
        if step % self._steps_per_epoch:  # only at epoch boundaries
            return
        self._last_epoch_done = epoch
        self.run_inference(state, tag=f"epoch{epoch:04d}")

    def run_inference(self, state: TrainState, tag: str = "manual") -> dict:
        cfg = self.config
        use_ema = self.use_ema and cfg.ema.enabled and state.ema_params is not None
        params = state.ema_params if use_ema else state.params
        variables = {"params": params}
        if state.constants.get("model"):
            variables["constants"] = state.constants["model"]
        table = state.constants["embedding"]

        shape = cfg.data.shape
        e = cfg.data.embedding_dim
        conditional = cfg.model.conditional

        if getattr(self, "_sampler", None) is None:
            # params are a runtime argument: ONE compiled program serves the
            # whole run (a closure over the current weights would embed them
            # as constants and recompile at every periodic inference)
            self._sampler = make_sampler(
                self.model, None, table, conditional=conditional,
                t0=cfg.inference.t0, tf=self.tf, n_frames=self.n_frames,
                substeps=cfg.inference.substeps, method=cfg.inference.method,
                with_prominence=True, variables_as_arg=True,
            )
        x0 = jax.random.normal(
            jax.random.PRNGKey(self.seed), (self.n_samples, *shape, e)
        )
        t_start = time.perf_counter()
        if conditional:
            atb = jnp.zeros((self.n_samples, *shape, e))
            out = jax.block_until_ready(self._sampler(variables, x0, atb))
        else:
            out = jax.block_until_ready(self._sampler(variables, x0))
        time_to_solve = time.perf_counter() - t_start

        decoded = np.asarray(out["decoded"]) - 1
        prom = np.asarray(out["prominence"])
        step = int(state.step)
        image_paths = []
        try:
            from flowtrain_stochastic_interpolation_tpu.utils.plotting import (
                plot_2d_slices,
                plot_prominence_maps,
            )

            for i in range(min(self.n_samples, 2)):
                sample_png = os.path.join(self.save_dir, f"{tag}_sample{i}.png")
                prom_png = os.path.join(self.save_dir, f"{tag}_prominence{i}.png")
                plot_2d_slices(decoded[i], save_path=sample_png)
                plot_prominence_maps(prom[i], save_path=prom_png)
                image_paths += [(f"samples/{tag}_{i}", sample_png),
                                (f"prominence/{tag}_{i}", prom_png)]
        except Exception as exc:  # rendering must never kill training
            print(f"[InferenceCallback] rendering failed: {exc}")
        if self.writer is not None:
            # ref logs time_to_solve + image artifacts w/ retry (callbacks.py:72-167)
            self.writer.write(step, {"time_to_solve": time_to_solve})
            for name, path in image_paths:
                self.writer.log_image(step, name, path)
        print(f"[InferenceCallback] {tag}: {self.n_samples} samples in {time_to_solve:.2f}s")
        return {"time_to_solve": time_to_solve, "decoded": decoded, "prominence": prom}
