"""Offline renderer for saved sample tensors.

Rebuilds ``project/*/tensorprocessor.py`` from the reference (``:40-208``):
batch-process a folder of saved volumes on a workstation — standalone
decoding with a saved embedding table, slice grids, static views, and
rotating-camera GIFs (PyVista/imageio when installed, matplotlib fallback).

Works on ``.npy`` volumes saved by ``apps/unconditional.py`` /
``apps/inference_experiments.py`` (decoded int volumes or raw ``[..., E]``
embedding tensors).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from flowtrain_stochastic_interpolation_tpu.ops.embedding import (
    decode,
    simplex_embedding,
)
from flowtrain_stochastic_interpolation_tpu.utils.plotting import (
    plot_2d_slices,
    plot_volume,
    pyvista_available,
)


def load_embedding(path: str | None, n_cats: int = 15, dim: int = 18) -> np.ndarray:
    """Load a saved embedding table, or rebuild the frozen simplex table
    (reference ``load_embedding``, ``tensorprocessor.py:40-56``)."""
    if path and os.path.exists(path):
        return np.load(path)
    return simplex_embedding(n_cats, dim)


def decode_with_loaded_embedding(tensor: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Standalone decode of a raw ``[..., E]`` tensor (ref ``:58-73``)."""
    import jax.numpy as jnp

    return np.asarray(decode(jnp.asarray(tensor), jnp.asarray(table))) - 1


def animate_tensor_to_gif(volume: np.ndarray, save_path: str, n_frames: int = 36) -> bool:
    """Rotating-camera GIF via PyVista+imageio (ref ``:142-188``)."""
    if not pyvista_available():
        return False
    try:
        import imageio
        import pyvista as pv
    except ImportError:
        return False
    grid = pv.ImageData(dimensions=np.asarray(volume.shape) + 1)
    grid.cell_data["values"] = volume.flatten(order="F")
    plotter = pv.Plotter(off_screen=True)
    plotter.add_volume(grid, scalars="values")
    frames = []
    for i in range(n_frames):
        plotter.camera.azimuth = 360.0 * i / n_frames
        frames.append(plotter.screenshot(return_img=True))
    plotter.close()
    imageio.mimsave(save_path, frames, fps=12)
    return True


def process_folder_of_tensors(folder: str, out_dir: str, table: np.ndarray, gif: bool) -> None:
    """Render every saved volume in a folder (ref ``:75-85``)."""
    os.makedirs(out_dir, exist_ok=True)
    for fname in sorted(os.listdir(folder)):
        if not fname.endswith(".npy"):
            continue
        vol = np.load(os.path.join(folder, fname))
        stem = os.path.splitext(fname)[0]
        if vol.ndim == 4:  # raw embedding tensor [..., E]
            vol = decode_with_loaded_embedding(vol, table)
        if vol.ndim != 3:
            continue
        plot_2d_slices(vol, save_path=os.path.join(out_dir, f"{stem}_slices.png"))
        plot_volume(vol, save_path=os.path.join(out_dir, f"{stem}_view.png"))
        if gif:
            ok = animate_tensor_to_gif(vol, os.path.join(out_dir, f"{stem}.gif"))
            if not ok:
                print(f"{stem}: GIF skipped (pyvista/imageio not installed)")
        print(f"rendered {stem}")


def main():
    p = argparse.ArgumentParser(description="Render saved sample tensors")
    p.add_argument("folder", help="folder of .npy volumes")
    p.add_argument("--out", default=None, help="output dir (default <folder>/rendered)")
    p.add_argument("--embedding", default=None, help="saved embedding table .npy")
    p.add_argument("--gif", action="store_true", help="also write rotating GIFs")
    p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                   help="'cpu' forces the CPU backend before XLA init "
                        "(decode uses jax; workstations may lack the TPU grant)")
    args = p.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = args.out or os.path.join(args.folder, "rendered")
    table = load_embedding(args.embedding)
    process_folder_of_tensors(args.folder, out, table, args.gif)


if __name__ == "__main__":
    main()
