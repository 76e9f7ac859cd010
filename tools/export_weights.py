"""Export an orbax training checkpoint to the compact release-weights format.

Orbax checkpoint dirs are gitignored (full f32 optimizer state, machine-local
paths); this tool distills one into ``weights.msgpack`` (+config/meta) at
~2 bytes/param so trained demo weights can be committed and survive machine
churn — the same role the reference's GitHub-release ``.ckpt`` files play
(``readme.md:27-33``).

    python tools/export_weights.py --ckpt artifacts/train_demo/ckpt \
        --out artifacts/weights/uncond_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="release-weights output dir")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--note", default="")
    args = p.parse_args()

    # pure host-side reshuffle — keep off the TPU (env JAX_PLATFORMS is
    # ignored once the axon plugin registers; the config update is not)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from flowtrain_stochastic_interpolation_tpu.models.persistence import (
        save_release_weights,
    )
    from flowtrain_stochastic_interpolation_tpu.train.checkpoint import (
        CheckpointManager,
    )
    from flowtrain_stochastic_interpolation_tpu.train.loop import init_train_state

    mgr = CheckpointManager(args.ckpt)
    config = mgr.load_config()
    assert config is not None, f"{args.ckpt}/config.json missing"
    _, _, state = init_train_state(config, host_init=True)
    state = mgr.restore(state)
    mgr.close()
    print(f"restored step {int(state.step)} from {args.ckpt}")

    save_release_weights(
        args.out,
        params=state.params,
        ema_params=state.ema_params,
        model_constants=state.constants.get("model", {}),
        config_json=config.to_json(),
        step=int(state.step),
        dtype=args.dtype,
        note=args.note,
    )
    size = sum(
        os.path.getsize(os.path.join(args.out, f)) for f in os.listdir(args.out)
    )
    print(f"wrote {args.out} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
