"""Exactness of the space-to-depth stem reparametrization (tools/stem_probe).

The probe's s2d twin must be numerically identical (up to conv reduction
order) to the regular 7x7/stride-2 SAME stem before any timing of it means
anything — same contract as the int8/Pallas experiment tests.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tools.stem_probe import s2d_weights, space_to_depth, stem_regular, \
    stem_s2d  # noqa: E402


@pytest.mark.parametrize("hw", [224, 64, 30])
def test_s2d_stem_matches_regular(hw):
    """7x7/2 SAME conv == 4x4/1 s2d conv on even input sizes (f32)."""
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (3, hw, hw, 3), jnp.float32)
    w7 = jax.random.normal(k2, (7, 7, 3, 16), jnp.float32) * 0.1
    ref = np.asarray(stem_regular(w7, x))
    s2d = np.asarray(stem_s2d(s2d_weights(w7), x))
    assert ref.shape == s2d.shape == (3, hw // 2, hw // 2, 16)
    np.testing.assert_allclose(ref, s2d, rtol=1e-5, atol=1e-5)


def test_space_to_depth_layout():
    """Channel order is dr*2C + dc*C + c (the order s2d_weights assumes)."""
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = space_to_depth(x)
    assert y.shape == (2, 2, 2, 12)
    for dr in range(2):
        for dc in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    np.asarray(y[:, :, :, dr * 6 + dc * 3 + c]),
                    np.asarray(x[:, dr::2, dc::2, c]))
