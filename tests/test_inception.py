"""Structure and numerics tests for the Inception-V1 encoder.

Mirrors the intent of the vendored slim tests
(reference common/nets/inception_v1_test.py): endpoint shapes, parameter
count, plus conv/pool golden checks against TF's NHWC ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.models import inception_v1 as iv1
from comic_tpu.models.encoders import encode_images, encoder_init, get_encoder
from comic_tpu.models.layers import count_params


@pytest.fixture(scope="module")
def params():
    return iv1.init_params(jax.random.PRNGKey(0))


class TestStructure:
    def test_endpoint_shapes_224(self, params):
        x = jnp.zeros((2, 224, 224, 3))
        net, ep = iv1.apply(params, x)
        assert ep["Conv2d_1a_7x7"].shape == (2, 112, 112, 64)
        assert ep["MaxPool_3a_3x3"].shape == (2, 28, 28, 192)
        assert ep["Mixed_3b"].shape == (2, 28, 28, 256)
        assert ep["Mixed_3c"].shape == (2, 28, 28, 480)
        assert ep["Mixed_4b"].shape == (2, 14, 14, 512)
        assert ep["Mixed_4e"].shape == (2, 14, 14, 528)
        assert ep["Mixed_4f"].shape == (2, 14, 14, 832)
        assert ep["Mixed_5b"].shape == (2, 7, 7, 832)
        assert ep["Mixed_5c"].shape == (2, 7, 7, 1024)
        assert net.shape == (2, 7, 7, 1024)
        assert iv1.pooled_features(net).shape == (2, 1024)

    def test_early_final_endpoint(self, params):
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = iv1.apply(params, x, final_endpoint="Mixed_4f")
        assert net.shape == (1, 14, 14, 832)
        assert "Mixed_5b" not in ep

    def test_param_count_matches_googlenet(self, params):
        # Inception-V1 base (no logits) is ~5.6M params
        n = count_params(params)
        assert 5.4e6 < n < 6.1e6, n

    def test_encoder_wrapper(self):
        p = encoder_init(jax.random.PRNGKey(1), "inception_v1")
        im = jnp.zeros((2, 224, 224, 3))
        emb, fm = encode_images(p, im, "inception_v1", "Mixed_4f")
        assert emb.shape == (2, 1024)
        assert fm.shape == (2, 196, 832)

    def test_legacy_head(self):
        p = encoder_init(jax.random.PRNGKey(1), "inception_v1", legacy=True)
        im = jnp.zeros((1, 224, 224, 3))
        emb, _ = encode_images(p, im, "inception_v1", "Mixed_4f", legacy=True)
        assert emb.shape == (1, 1024)

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError):
            get_encoder("resnet_v9000")


class TestNumerics:
    def test_conv_same_padding_matches_tf(self, rng):
        tf = pytest.importorskip("tensorflow")
        x = rng.normal(size=(1, 9, 9, 3)).astype(np.float32)
        w = rng.normal(size=(3, 3, 3, 4)).astype(np.float32)
        p = {"weights": jnp.asarray(w),
             "BatchNorm": {"beta": jnp.zeros(4), "moving_mean": jnp.zeros(4),
                           "moving_variance": jnp.ones(4)}}
        got = iv1._conv_bn_relu(p, jnp.asarray(x), stride=2)
        want = tf.nn.relu(
            (tf.nn.conv2d(x, w, strides=2, padding="SAME")
             - 0.0) / np.sqrt(1.0 + iv1.BN_EPS))
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)

    def test_maxpool_same_matches_tf(self, rng):
        tf = pytest.importorskip("tensorflow")
        x = rng.normal(size=(1, 7, 7, 2)).astype(np.float32)
        got = iv1._max_pool(jnp.asarray(x), 3, 2)
        want = tf.nn.max_pool2d(x, ksize=3, strides=2, padding="SAME")
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5)

    def test_bn_inference_affine(self, rng):
        x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
        w = np.zeros((1, 1, 2, 2), np.float32)
        w[0, 0, 0, 0] = 1.0
        w[0, 0, 1, 1] = 1.0  # identity conv
        p = {"weights": jnp.asarray(w),
             "BatchNorm": {"beta": jnp.asarray([1.0, -1.0]),
                           "moving_mean": jnp.asarray([0.5, 0.0]),
                           "moving_variance": jnp.asarray([4.0, 1.0])}}
        got = iv1._conv_bn_relu(p, jnp.asarray(x), stride=1)
        want = np.maximum(
            (x - [0.5, 0.0]) / np.sqrt(np.array([4.0, 1.0]) + iv1.BN_EPS)
            + [1.0, -1.0], 0.0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestComposedGolden:
    def test_stem_through_mixed_3b_matches_tf(self, rng):
        """COMPOSED-network golden: the stem + first inception block built
        from raw tf.nn ops with OUR weights must match our apply() — checks
        the SAME-padding chains, pool placement, and branch concat order
        end to end, beyond the per-op goldens above."""
        tf = pytest.importorskip("tensorflow")

        p = iv1.init_params(jax.random.PRNGKey(0))
        x = (rng.normal(size=(1, 64, 64, 3)) * 0.5).astype(np.float32)
        pn = jax.tree_util.tree_map(lambda a: np.asarray(a), p)

        def conv_bn_relu(pp, y, stride):
            y = tf.nn.conv2d(y, pp["weights"], strides=stride,
                             padding="SAME")
            bn = pp["BatchNorm"]
            y = ((y - bn["moving_mean"])
                 / np.sqrt(bn["moving_variance"] + iv1.BN_EPS)
                 + bn["beta"])
            return tf.nn.relu(y)

        y = conv_bn_relu(pn["Conv2d_1a_7x7"], x, 2)
        y = tf.nn.max_pool2d(y, 3, 2, "SAME")
        y = conv_bn_relu(pn["Conv2d_2b_1x1"], y, 1)
        y = conv_bn_relu(pn["Conv2d_2c_3x3"], y, 1)
        y = tf.nn.max_pool2d(y, 3, 2, "SAME")
        m = pn["Mixed_3b"]
        b0 = conv_bn_relu(m["Branch_0"]["Conv2d_0a_1x1"], y, 1)
        b1 = conv_bn_relu(m["Branch_1"]["Conv2d_0a_1x1"], y, 1)
        b1 = conv_bn_relu(m["Branch_1"]["Conv2d_0b_3x3"], b1, 1)
        b2 = conv_bn_relu(m["Branch_2"]["Conv2d_0a_1x1"], y, 1)
        b2 = conv_bn_relu(m["Branch_2"]["Conv2d_0b_3x3"], b2, 1)
        b3 = tf.nn.max_pool2d(y, 3, 1, "SAME")
        b3 = conv_bn_relu(m["Branch_3"]["Conv2d_0b_1x1"], b3, 1)
        want = tf.concat([b0, b1, b2, b3], axis=3).numpy()

        _, ep = iv1.apply(p, jnp.asarray(x), final_endpoint="Mixed_3b")
        np.testing.assert_allclose(np.asarray(ep["Mixed_3b"]), want,
                                   rtol=1e-4, atol=5e-5)
