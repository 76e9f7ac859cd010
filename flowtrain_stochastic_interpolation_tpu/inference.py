"""Sampling pipelines: noise → ODE/SDE integration → categorical decode.

The inference layer of the reference apps rebuilt as compiled pipelines:

* unconditional: ``run_inference`` (``model_train_inference.py:575-711``) —
  seeded X0, flow ODE solve t0=0.001→1.0, cosine decode;
* conditional: ``run_inference``/``populate_solutions``
  (``model_inference_experiments.py:171-317``) — ATb-conditioned velocity
  wrapper, batched seeds, decode−1;
* in-training callback sampling with prominence maps
  (``callbacks.py:60-169``).

Everything inside :func:`sample_unconditional` / :func:`sample_conditional`
is one jitted program per batch (integration + decode fused); the reference's
host-callback-per-stage dopri5 pattern is available via ``adaptive=True``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from flowtrain_stochastic_interpolation_tpu.config import ExperimentConfig
from flowtrain_stochastic_interpolation_tpu.ops.embedding import (
    decode,
    decode_logits,
    embed,
    prominence,
)
from flowtrain_stochastic_interpolation_tpu.interpolants import LinearInterpolant
from flowtrain_stochastic_interpolation_tpu.solvers import (
    eps_schedule,
    frame_grid,
    make_frame_advancer,
    solve_ode,
    solve_ode_adaptive,
    solve_ode_final,
    solve_velocity_sde,
)


@dataclass
class SampleResult:
    decoded: np.ndarray        # [N, X, Y, Z] int32 (0-based table rows)
    trajectory: Optional[np.ndarray]  # [n_frames, N, X, Y, Z, E] or None
    prominence: Optional[np.ndarray]  # [N, X, Y, Z] float or None
    seconds_per_batch: list = None
    nfe: Optional[int] = None


def make_sampler(
    model,
    variables: Dict[str, Any],
    table: Array,
    *,
    atb: Optional[Array] = None,
    conditional: Optional[bool] = None,
    t0: float = 0.001,
    tf: float = 1.0,
    n_frames: int = 16,
    substeps: int = 2,
    method: str = "rk4",
    adaptive: bool = False,
    atol: float = 1e-6,
    rtol: float = 1e-6,
    keep_trajectory: bool = False,
    with_prominence: bool = False,
    variables_as_arg: bool = False,
    donate_x0: bool = False,
    frame_dispatch: bool = False,
    sde_epsilon: float = 0.5,
    sde_eps_schedule: str = "linear_decay",
):
    """Build a jitted ``sampler(x0[, atb]) -> outputs`` closure.

    When ``atb`` is given (or ``conditional=True``) the velocity is the
    conditional net ``net(x, ATb, t)`` (reference ``dxdt_cond`` wrapper,
    ``model_inference_experiments.py:201-202``).  With ``conditional=True``
    and no baked ``atb``, the returned callable takes ``(x0, atb_batch)`` —
    one compiled program serves every scenario (ATb is a runtime argument).

    ``variables_as_arg=True`` returns ``sampler(variables, x0[, atb_batch])``
    instead: the params are a runtime argument, so one compiled program
    serves *changing* weights — required for in-training periodic sampling,
    where a closure over the current params would recompile every epoch.

    ``donate_x0=True`` donates the noise buffer into the program.  NOTE:
    XLA donation is strict input→output aliasing — it only saves HBM when an
    output matches the donated buffer's size/dtype (e.g. ``keep_trajectory``
    state outputs).  For the default decode pipeline the outputs are int32
    maps, nothing aliases, and TPU compiles warn "donated buffers were not
    usable" (measured: identical temp size in
    ``tools/memcheck_sampler.py --donate``).  Kept for callers whose output
    shapes do alias.  Callers must not reuse ``x0`` after the call
    (``sample_unconditional`` draws a fresh one per batch, so the default
    pipelines are safe).

    ``frame_dispatch=True`` splits the solve into one jitted program per
    saved frame, host-looped: at 128³ the fully fused sampler is a single
    ~60 s device dispatch, which this environment's TPU tunnel can kill with
    an opaque "UNAVAILABLE: TPU device error" (measured NOT to be memory —
    buffer peak 4.3–5.2 GB of 16 GB, ``tools/memcheck_sampler.py``); 15
    frame-sized dispatches of a few seconds each sidestep any per-dispatch
    ceiling at ~50 ms/dispatch overhead.  NFE and the visited time grid are
    identical (shared ``make_frame_advancer`` body); states agree to float
    tolerance — the fused program bakes the step size as a constant XLA may
    fold differently from the per-frame program's runtime argument
    (tests/test_inference.py pins >99.9% decode agreement).  Not combinable
    with ``adaptive`` or ``variables_as_arg``.
    """
    if conditional is None:
        conditional = atb is not None

    sde = method == "sde"
    if sde:
        if adaptive or frame_dispatch or variables_as_arg:
            raise ValueError("method='sde' is incompatible with "
                             "adaptive/frame_dispatch/variables_as_arg")
        # the flagship checkpoints are velocity models trained on the linear
        # one-sided interpolant (train/steps.py); the SDE drift recovers the
        # score through velocity_to_denoiser (solvers/__init__.py)
        sde_interp = LinearInterpolant(one_sided=True)
        sde_eps_fn = eps_schedule(sde_eps_schedule, sde_epsilon)

    if frame_dispatch:
        if adaptive or variables_as_arg:
            raise ValueError("frame_dispatch is incompatible with "
                             "adaptive/variables_as_arg")
        return _make_frame_dispatch_sampler(
            model, variables, table, atb=atb, conditional=conditional,
            t0=t0, tf=tf, n_frames=n_frames, substeps=substeps,
            method=method, keep_trajectory=keep_trajectory,
            with_prominence=with_prominence,
        )

    def run_with(vars_, x0, atb_batch=None, key=None):
        if conditional or atb_batch is not None:
            velocity = lambda x, t: model.apply(vars_, x, atb_batch, t)
        else:
            velocity = lambda x, t: model.apply(vars_, x, t)

        if sde:
            if key is None:
                raise ValueError("method='sde' samplers take a PRNG key: "
                                 "sampler(x0[, atb], key=...)")
            if keep_trajectory:
                traj = solve_velocity_sde(
                    velocity, sde_interp, x0, key, epsilon=sde_eps_fn,
                    t0=t0, tf=tf, n_frames=n_frames, substeps=substeps,
                    keep_trajectory=True,
                )
                final = traj[-1]
            else:
                final = solve_velocity_sde(
                    velocity, sde_interp, x0, key, epsilon=sde_eps_fn,
                    t0=t0, tf=tf, n_frames=n_frames, substeps=substeps,
                    keep_trajectory=False,
                )
                traj = None
            nfe = jnp.int32(0)
            out = {"decoded": decode(final, table), "nfe": nfe}
            if with_prominence:
                out["prominence"] = prominence(decode_logits(final, table))
            if keep_trajectory:
                out["trajectory"] = traj
            return out

        if adaptive:
            traj, nfe = solve_ode_adaptive(
                velocity, x0, t0=t0, tf=tf, n_frames=n_frames, atol=atol, rtol=rtol
            )
            final = traj[-1]
        elif keep_trajectory:
            traj = solve_ode(
                velocity, x0, t0=t0, tf=tf, n_frames=n_frames,
                substeps=substeps, method=method,
            )
            nfe = jnp.int32(0)
            final = traj[-1]
        else:
            # final-state-only scan: no [n_frames, B, ...] trajectory buffer
            # in the program (2.4 GB at 128³ — exceeded device memory)
            final = solve_ode_final(
                velocity, x0, t0=t0, tf=tf, n_frames=n_frames,
                substeps=substeps, method=method,
            )
            traj = None
            nfe = jnp.int32(0)
        out = {"decoded": decode(final, table), "nfe": nfe}
        if with_prominence:
            out["prominence"] = prominence(decode_logits(final, table))
        if keep_trajectory:
            out["trajectory"] = traj
        return out

    if variables_as_arg:
        jitted_v = jax.jit(run_with, donate_argnums=(1,) if donate_x0 else ())
        if conditional:
            return jitted_v  # (variables, x0, atb_batch)
        return lambda vars_, x0: jitted_v(vars_, x0)

    run = lambda x0, atb_batch=None, key=None: run_with(
        variables, x0, atb_batch, key
    )
    donate = (0,) if donate_x0 else ()
    if conditional:
        # ATb must be a runtime argument: a closed-over concrete array would
        # be baked into the compiled program as a (batch×64³×E ≈ 100 MB)
        # constant — bloating the executable and, in this environment,
        # exceeding the remote-compile request size limit.
        jitted = jax.jit(run, donate_argnums=donate)
        if atb is None:
            return jitted  # caller passes (x0, atb_batch[, key=])
        return lambda x0, atb_batch=None, key=None: jitted(
            x0, atb if atb_batch is None else atb_batch, key=key
        )
    return jax.jit(run, donate_argnums=donate)


def _make_frame_dispatch_sampler(
    model,
    variables: Dict[str, Any],
    table: Array,
    *,
    atb: Optional[Array],
    conditional: bool,
    t0: float,
    tf: float,
    n_frames: int,
    substeps: int,
    method: str,
    keep_trajectory: bool,
    with_prominence: bool,
):
    """Host-looped per-frame sampler (see ``make_sampler(frame_dispatch=True)``)."""

    def velocity_of(atb_batch):
        if conditional or atb_batch is not None:
            return lambda x, t: model.apply(variables, x, atb_batch, t)
        return lambda x, t: model.apply(variables, x, t)

    @partial(jax.jit, static_argnames=("has_atb",), donate_argnums=(0,))
    def advance_frame(x, t_start, h, atb_batch=None, *, has_atb=False):
        adv = make_frame_advancer(
            velocity_of(atb_batch if has_atb else None),
            substeps=substeps, method=method,
        )
        return adv(x, t_start, h)

    @jax.jit
    def finish(x):
        out = {"decoded": decode(x, table), "nfe": jnp.int32(0)}
        if with_prominence:
            out["prominence"] = prominence(decode_logits(x, table))
        return out

    def sampler(x0, atb_batch=None):
        if atb_batch is None:
            atb_batch = atb
        frame_ts, h = frame_grid(x0.dtype, t0, tf, n_frames, substeps)
        has_atb = atb_batch is not None
        x = jnp.asarray(x0)
        # the state is donated into each frame program (exact-shape output
        # aliasing — this is the case where donation DOES free HBM), so
        # trajectory frames are copied to host before the buffer dies
        frames = [np.asarray(x0)] if keep_trajectory else None
        for t_start in frame_ts[:-1]:
            x = advance_frame(
                x, jnp.asarray(t_start), jnp.asarray(h),
                atb_batch if has_atb else None, has_atb=has_atb,
            )
            if keep_trajectory:
                frames.append(np.asarray(x))
        out = dict(finish(x))
        if keep_trajectory:
            out["trajectory"] = np.stack(frames, axis=0)
        return out

    return sampler


def make_spatial_sampler(
    model,
    variables: Dict[str, Any],
    table: Array,
    mesh,
    *,
    conditional: bool = False,
    t0: float = 0.001,
    tf: float = 1.0,
    n_frames: int = 16,
    substeps: int = 2,
    method: str = "rk4",
    with_prominence: bool = False,
    variables_as_arg: bool = False,
):
    """Sampler for volumes too large for one chip: X axis sharded over a mesh.

    The spatial analogue of :func:`make_sampler` — the whole pipeline (ODE
    integration + decode) runs under ``shard_map`` on ``mesh`` with the voxel
    grid's X axis split over the ``spatial`` mesh axis and the batch over
    ``data``.  Convolution halos, ring attention and the collective linear
    attention inside the model are the explicit primitives in
    ``parallel/spatial.py``; ``model`` must therefore be constructed with
    ``spatial_axis="spatial"`` (see ``models.UNet3D``).  This is capability
    the reference does not have — its only >64³ strategy is capping token
    counts (``unet_attn_3d.py:284-341,559-560``); here a 128³+ volume is
    integrated across chips without ever materialising it on one.

    Inputs to the returned callable must already be sharded
    ``P("data", "spatial")`` on (batch, X) — use
    ``parallel.mesh.batch_sharding(mesh, 5)`` when placing ``x0`` (and
    ``atb``).  Returns ``sampler(x0[, atb])`` or, with
    ``variables_as_arg=True``, ``sampler(variables, x0[, atb])``.
    """
    from jax.sharding import PartitionSpec as P

    if "spatial" not in mesh.axis_names:
        raise ValueError(
            f"mesh has axes {mesh.axis_names}; a 'spatial' axis is required "
            "(parallel.mesh.create_mesh(n_data, n_spatial))"
        )

    def per_device(vars_, x0, atb):
        if conditional:
            velocity = lambda x, t: model.apply(vars_, x, atb, t)
        else:
            velocity = lambda x, t: model.apply(vars_, x, t)
        final = solve_ode_final(
            velocity, x0, t0=t0, tf=tf, n_frames=n_frames,
            substeps=substeps, method=method,
        )
        out = {"decoded": decode(final, table)}
        if with_prominence:
            out["prominence"] = prominence(decode_logits(final, table))
        return out

    vol = P("data", "spatial")  # [B, X, Y, Z, (C)] → batch on data, X on spatial
    out_specs = {"decoded": vol}
    if with_prominence:
        out_specs["prominence"] = vol

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), vol, vol),
        out_specs=out_specs,
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    if variables_as_arg:
        if conditional:
            return jitted
        return lambda vars_, x0: jitted(vars_, x0, x0)
    if conditional:
        return lambda x0, atb_batch: jitted(variables, x0, atb_batch)
    return lambda x0: jitted(variables, x0, x0)


def sample_unconditional(
    model,
    variables: Dict[str, Any],
    table: Array,
    *,
    n_samples: int,
    batch_size: int,
    data_shape: Tuple[int, int, int],
    embedding_dim: int,
    seed: Optional[int] = 100,
    verbose: bool = True,
    state_dtype=jnp.float32,
    **sampler_kwargs,
) -> SampleResult:
    """Batched unconditional generation (reference ``run_inference`` :575-711).

    ``state_dtype``: dtype of the integrated state ``x``.  ``bfloat16``
    halves the persistent state buffers (x/k/acc ≈ 150 MB each in f32 at
    128³×18ch) — the lever that fits RK4 at 128³ on one chip; categorical
    argmax decode is robust to the reduced mantissa (the velocity net already
    computes in bf16 regardless).
    """
    sampler = make_sampler(model, variables, table, **sampler_kwargs)
    is_sde = sampler_kwargs.get("method") == "sde"
    key = jax.random.PRNGKey(seed if seed is not None else 0)

    decoded, trajs, proms, times = [], [], [], []
    n_batches = (n_samples - 1) // batch_size + 1
    nfe = None
    for b in range(n_batches):
        bs = min(batch_size, n_samples - b * batch_size)
        k = jax.random.fold_in(key, b)
        x0 = jax.random.normal(k, (bs, *data_shape, embedding_dim), state_dtype)
        t_start = time.perf_counter()
        out = jax.block_until_ready(
            sampler(x0, key=jax.random.fold_in(k, 7919)) if is_sde
            else sampler(x0)
        )
        dt = time.perf_counter() - t_start
        times.append(dt)
        if verbose:
            print(f"batch {b + 1}/{n_batches}: solved in {dt:.2f}s")
        decoded.append(np.asarray(out["decoded"]))
        if "trajectory" in out:
            trajs.append(np.asarray(out["trajectory"]))
        if "prominence" in out:
            proms.append(np.asarray(out["prominence"]))
        nfe = int(out["nfe"])

    return SampleResult(
        decoded=np.concatenate(decoded, axis=0),
        trajectory=np.concatenate(trajs, axis=1) if trajs else None,
        prominence=np.concatenate(proms, axis=0) if proms else None,
        seconds_per_batch=times,
        nfe=nfe or None,
    )


def sample_conditional(
    model,
    variables: Dict[str, Any],
    table: Array,
    atb: Array,
    *,
    n_samples: int,
    batch_size: int,
    seed: int = 42,
    verbose: bool = True,
    sampler: Optional[Callable] = None,
    **sampler_kwargs,
) -> SampleResult:
    """Ensemble generation conditioned on one observation volume ATb.

    ``atb``: ``[X, Y, Z, E]`` (single scenario); it is batch-expanded like the
    reference (``model_inference_experiments.py:230-239``), and per-batch seeds
    follow the reference's ``seed + i`` convention (``:294-308``).

    Pass ``sampler`` (from ``make_sampler(..., conditional=True)``) to reuse
    one compiled program across scenarios — a fresh closure per scenario
    re-traces and re-queries the compile cache (~minutes on the axon tunnel).
    """
    data_shape = atb.shape[:-1]
    e = atb.shape[-1]
    is_sde = sampler_kwargs.get("method") == "sde"
    if sampler is None:
        sampler = make_sampler(
            model, variables, table, conditional=True, **sampler_kwargs
        )
    decoded, times = [], []
    n_batches = (n_samples - 1) // batch_size + 1
    for b in range(n_batches):
        bs = min(batch_size, n_samples - b * batch_size)
        atb_b = jnp.broadcast_to(atb[None], (bs, *data_shape, e))
        key = jax.random.PRNGKey(seed + b)
        x0 = jax.random.normal(key, (bs, *data_shape, e), jnp.float32)
        t_start = time.perf_counter()
        out = jax.block_until_ready(
            sampler(x0, atb_b, key=jax.random.fold_in(key, 7919)) if is_sde
            else sampler(x0, atb_b)
        )
        times.append(time.perf_counter() - t_start)
        if verbose:
            print(f"batch {b + 1}/{n_batches}: solved in {times[-1]:.2f}s")
        decoded.append(np.asarray(out["decoded"]))

    return SampleResult(
        decoded=np.concatenate(decoded, axis=0),
        trajectory=None,
        prominence=None,
        seconds_per_batch=times,
    )


def build_atb(
    true_model: Array, mask: Array, table: Array
) -> Array:
    """Conditioning volume from a true model + observation mask.

    ``ATb = embed(true) * mask`` (reference ``populate_solutions`` :287-291).
    """
    x1 = embed(true_model[None], table)[0]  # [X, Y, Z, E]
    return x1 * mask[..., None]
