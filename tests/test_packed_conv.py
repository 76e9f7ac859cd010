"""z2-packed 3³ conv (ops/packed_conv.py): numerics + gradients vs direct conv.

The packed form must be exactly the same linear map as
``lax.conv_general_dilated`` (stride 1, SAME) — including at the z
boundaries, where packed SAME padding has to reproduce original SAME
padding through the phase structure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowtrain_stochastic_interpolation_tpu.ops.packed_conv import (

    pack_weights_z2,
    packed_conv3d,
    use_packed_conv,
)

pytestmark = pytest.mark.smoke  # <5-min unit/numeric tier (VERDICT r4 #8)


def _direct(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y if b is None else y + b


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("shape,cin,cout", [
    ((6, 6, 8), 5, 7),     # odd channels, non-cubic grid
    ((4, 8, 4), 3, 3),
    ((8, 8, 8), 4, 2),
])
def test_packed_matches_direct(shape, cin, cout, k):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (2, *shape, cin), jnp.float32)
    w = jax.random.normal(kw, (k, k, k, cin, cout), jnp.float32)
    b = jax.random.normal(kb, (cout,), jnp.float32)
    y_ref = _direct(x, w, b)
    y_pk = packed_conv3d(x, w, b)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)


def test_packed_weights_structure():
    """Half the packed-weight entries are structurally zero (k=3); k=5 packs
    5 z-taps into 3 packed taps ⇒ 5/6 of entries are live (1.2× FLOPs)."""
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 6), jnp.float32)
    w2 = pack_weights_z2(w)
    assert w2.shape == (3, 3, 3, 8, 12)
    total = w2.size
    nonzero = int(jnp.sum(w2 != 0))
    assert nonzero == total // 2  # 27·(2·4)·(2·6) / 2, no accidental zeros in w
    # every original tap appears exactly twice (once per output phase)
    np.testing.assert_allclose(float(jnp.sum(w2 ** 2)),
                               2 * float(jnp.sum(w ** 2)), rtol=1e-4)

    w5 = jax.random.normal(jax.random.PRNGKey(3), (5, 5, 5, 4, 6), jnp.float32)
    w5p = pack_weights_z2(w5)
    assert w5p.shape == (5, 5, 3, 8, 12)  # 3 packed z-taps cover k=5
    assert int(jnp.sum(w5p != 0)) == w5p.size * 5 // 6
    np.testing.assert_allclose(float(jnp.sum(w5p ** 2)),
                               2 * float(jnp.sum(w5 ** 2)), rtol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_packed_gradients_match_direct(k):
    """d/dx and d/dw through the packed form equal the direct conv's."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 4, 4, 6, 3), jnp.float32)
    w = jax.random.normal(kw, (k, k, k, 3, 5), jnp.float32)

    def loss(conv, x, w):
        y = conv(x, w)
        return jnp.sum(jnp.sin(y) * y)

    gd = jax.grad(lambda x, w: loss(_direct, x, w), argnums=(0, 1))(x, w)
    gp = jax.grad(lambda x, w: loss(packed_conv3d, x, w), argnums=(0, 1))(x, w)
    # Exactness was pinned in float64 (max rel diff ~1e-15); in f32 the two
    # programs differ only by accumulation order, so compare relative to the
    # gradient's own magnitude scale.
    for a, b in zip(gp, gd):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=5e-6)


def test_dispatch_rule():
    # measured winners: 48→48 on ≥64³ grids at every batch; 96→48 at 128³ b1
    assert use_packed_conv((8, 64, 64, 64), 48, 48, 3)
    assert use_packed_conv((4, 64, 64, 64), 48, 48, 3)          # 1.25× f+b
    assert use_packed_conv((2, 64, 64, 64), 48, 48, 3)          # 1.43× f+b
    assert use_packed_conv((16, 64, 64, 64), 48, 48, 3)         # 1.21× fwd
    assert use_packed_conv((1, 128, 128, 128), 48, 48, 3)
    assert use_packed_conv((1, 128, 128, 128), 96, 48, 3)
    # measured losers stay direct
    assert not use_packed_conv((8, 32, 32, 32), 48, 48, 3)      # 0.68× fwd
    assert not use_packed_conv((8, 64, 64, 64), 96, 48, 3)      # 0.65× f+b
    assert not use_packed_conv((1, 64, 64, 64), 96, 48, 3)      # 96-class needs 128³
    assert not use_packed_conv((8, 32, 32, 32), 96, 96, 3)      # lane-filled
    # k=5 EmbedATb classes win at 64³ (15→48 b8: 20.3× fwd — direct
    # collapses to 2.1 TF/s); 32³ loses fwd+bwd (0.81×)
    assert use_packed_conv((2, 64, 64, 64), 15, 48, 5)
    assert use_packed_conv((8, 64, 64, 64), 15, 48, 5)
    assert use_packed_conv((2, 64, 64, 64), 48, 48, 5)
    assert not use_packed_conv((2, 32, 32, 32), 48, 48, 5)
    assert not use_packed_conv((2, 32, 32, 32), 15, 96, 5)   # ≥96-ch classes
    assert not use_packed_conv((2, 64, 64, 64), 48, 96, 5)
    # odd z and unmeasured kernels stay direct
    assert not use_packed_conv((8, 64, 64, 63), 48, 48, 3)
    assert not use_packed_conv((8, 64, 64, 64), 48, 48, 7)
