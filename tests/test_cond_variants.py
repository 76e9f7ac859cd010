"""Conditional UNet variant (v1/v2/v3) structural and gradient checks.

v3 has full forward parity vs torch (test_model_parity); v1/v2 are inventory
variants (reference ``unet_attn_3d_cond.py`` / ``_v2.py``) checked here for
shape, conditioning-sensitivity, and trainability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowtrain_stochastic_interpolation_tpu.models import UNet3DCond

TINY = dict(
    dim=8, dim_mults=(1, 2), data_channels=4, dropout=0.0,
    time_resolution=16, time_bandwidth=10.0, time_learned_emb=True,
    attn_dim_head=4, attn_heads=2,
)


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
def test_variant_forward_and_grad(variant):
    model = UNet3DCond(**TINY, variant=variant)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 4))
    atb = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 4))
    t = jnp.array([0.3, 0.7])
    variables = model.init(jax.random.PRNGKey(2), x, atb, t)
    out = model.apply(variables, x, atb, t)
    assert out.shape == x.shape

    # output depends on the conditioning volume
    out2 = model.apply(variables, x, jnp.zeros_like(atb), t)
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    # gradients flow through every parameter group
    def loss(p):
        return jnp.mean(jnp.square(model.apply({"params": p}, x, atb, t)))

    grads = jax.grad(loss)(variables["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert np.isfinite(norms).all()
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_v1_conditions_down_path_only():
    """v1 has no up-path conditioning modules (ref cond v1 forward :744-747,
    up-path EmbedATb commented out at :701)."""
    model = UNet3DCond(**TINY, variant="v1")
    x = jnp.zeros((1, 8, 8, 8, 4))
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, x, t)["params"]
    names = set(params.keys())
    assert any(n.startswith("downs_0_atb") for n in names)
    assert not any(n.startswith("ups_") and "_atb" in n for n in names)
    # additive injection: no mix blocks in v1
    assert not any("atb_mix" in n for n in names)


def test_v2_has_mix_without_time_film():
    model = UNet3DCond(**TINY, variant="v2")
    x = jnp.zeros((1, 8, 8, 8, 4))
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, x, t)["params"]
    mix = params["downs_0_atb_mix"]
    assert "time_mlp" not in mix  # v2 mixes without FiLM (ref v2 :142-169)
    v3 = UNet3DCond(**TINY, variant="v3")
    params3 = v3.init(jax.random.PRNGKey(0), x, x, t)["params"]
    assert "time_mlp" in params3["downs_0_atb_mix"]
