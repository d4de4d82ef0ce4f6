"""Encoder zoo tests: resnet/vgg/mobilenet structure + registry wiring."""

import jax
import jax.numpy as jnp
import pytest

from comic_tpu.models import mobilenet_v1 as mb
from comic_tpu.models import resnet, vgg
from comic_tpu.models.encoders import available_encoders, encode_images, encoder_init, get_encoder
from comic_tpu.models.layers import count_params


class TestResnet:
    @pytest.fixture(scope="class")
    def params(self):
        return resnet.init_params(jax.random.PRNGKey(0), "resnet_v1_50")

    def test_endpoint_shapes(self, params):
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = resnet.apply(params, x, "resnet_v1_50")
        assert ep["conv1"].shape == (1, 112, 112, 64)
        assert ep["block1"].shape == (1, 28, 28, 256)
        assert ep["block2"].shape == (1, 14, 14, 512)
        assert ep["block3"].shape == (1, 7, 7, 1024)
        assert ep["block4"].shape == (1, 7, 7, 2048)
        assert resnet.pooled_features(net).shape == (1, 2048)

    def test_param_count_r50(self, params):
        # ResNet-50 backbone (no fc) ~23.5M
        n = count_params(params)
        assert 23e6 < n < 24.5e6, n

    def test_r101_unit_count(self):
        p = resnet.init_params(jax.random.PRNGKey(0), "resnet_v1_101")
        assert len(p["block3"]) == 23


class TestVgg:
    def test_endpoint_shapes(self):
        p = vgg.init_params(jax.random.PRNGKey(0), "vgg_16")
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = vgg.apply(p, x, "vgg_16")
        assert ep["conv5_3"].shape == (1, 14, 14, 512)
        assert ep["fc7"].shape == (1, 1, 1, 4096)
        assert vgg.pooled_features(net).shape == (1, 4096)

    def test_param_count(self):
        p = vgg.init_params(jax.random.PRNGKey(0), "vgg_16")
        n = count_params(p)
        # 14.7M convs + 102.8M fc6 + 16.8M fc7
        assert 130e6 < n < 140e6, n


class TestMobilenet:
    def test_endpoint_shapes(self):
        p = mb.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = mb.apply(p, x)
        assert ep["Conv2d_11_pointwise"].shape == (1, 14, 14, 512)
        assert ep["Conv2d_13_pointwise"].shape == (1, 7, 7, 1024)
        assert mb.pooled_features(net).shape == (1, 1024)

    def test_param_count(self):
        n = count_params(mb.init_params(jax.random.PRNGKey(0)))
        # MobileNet-V1 1.0 backbone ~3.2M
        assert 3.0e6 < n < 3.5e6, n


class TestRegistry:
    def test_zoo_contents(self):
        names = available_encoders()
        for want in ("inception_v1", "resnet_v1_50", "resnet_v1_101",
                     "resnet_v1_152", "vgg_16", "vgg_19", "mobilenet_v1"):
            assert want in names

    def test_encode_images_resnet(self):
        p = encoder_init(jax.random.PRNGKey(0), "resnet_v1_50")
        emb, fm = encode_images(p, jnp.zeros((1, 224, 224, 3)),
                                "resnet_v1_50", "block3")
        assert emb.shape == (1, 2048)
        assert fm.shape == (1, 49, 1024)

    def test_preprocessing_dispatch(self):
        from comic_tpu.data.preprocessing import (
            preprocess_batch,
            preprocess_batch_vgg,
            preprocess_for,
        )

        assert preprocess_for("inception_v1") is preprocess_batch
        assert preprocess_for("mobilenet_v1") is preprocess_batch
        assert preprocess_for("resnet_v1_50") is preprocess_batch_vgg
        assert preprocess_for("vgg_16") is preprocess_batch_vgg


class TestInceptionV3:
    def test_endpoint_shapes_299(self):
        from comic_tpu.models import inception_v3 as iv3
        p = iv3.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 299, 299, 3))
        net, ep = iv3.apply(p, x)
        assert ep["Conv2d_4a_3x3"].shape == (1, 71, 71, 192)
        assert ep["Mixed_5b"].shape == (1, 35, 35, 256)
        assert ep["Mixed_5c"].shape == (1, 35, 35, 288)
        assert ep["Mixed_6a"].shape == (1, 17, 17, 768)
        assert ep["Mixed_6e"].shape == (1, 17, 17, 768)
        assert ep["Mixed_7a"].shape == (1, 8, 8, 1280)
        assert ep["Mixed_7c"].shape == (1, 8, 8, 2048)
        assert iv3.pooled_features(net).shape == (1, 2048)

    def test_param_count(self):
        from comic_tpu.models import inception_v3 as iv3
        n = count_params(iv3.init_params(jax.random.PRNGKey(0)))
        # Inception-V3 base (no logits/aux) ~21.8M
        assert 21e6 < n < 22.5e6, n

    def test_slim_quirk_scopes_present(self):
        from comic_tpu.models import inception_v3 as iv3
        p = iv3.init_params(jax.random.PRNGKey(0))
        assert "Conv_1_0c_5x5" in p["Mixed_5c"]["Branch_1"]
        assert "Conv2d_0b_1x1" in p["Mixed_5c"]["Branch_1"]

    def test_registered(self):
        assert "inception_v3" in available_encoders()
        spec = get_encoder("inception_v3")
        assert spec.default_image_size == 299


class TestInceptionV2:
    def test_endpoint_shapes_224(self):
        from comic_tpu.models import inception_v2 as iv2
        p = iv2.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = iv2.apply(p, x)
        assert ep["Conv2d_1a_7x7"].shape == (1, 112, 112, 64)
        assert ep["MaxPool_3a_3x3"].shape == (1, 28, 28, 192)
        assert ep["Mixed_3b"].shape == (1, 28, 28, 256)
        assert ep["Mixed_3c"].shape == (1, 28, 28, 320)
        assert ep["Mixed_4a"].shape == (1, 14, 14, 576)
        assert ep["Mixed_4e"].shape == (1, 14, 14, 576)
        assert ep["Mixed_5a"].shape == (1, 7, 7, 1024)
        assert ep["Mixed_5c"].shape == (1, 7, 7, 1024)
        assert iv2.pooled_features(net).shape == (1, 1024)

    def test_param_count(self):
        from comic_tpu.models import inception_v2 as iv2
        n = count_params(iv2.init_params(jax.random.PRNGKey(0)))
        # Inception-V2 base ~10.2M
        assert 9.5e6 < n < 11e6, n

    def test_registered(self):
        assert "inception_v2" in available_encoders()


class TestResnetV2:
    def test_shapes_and_registration(self):
        from comic_tpu.models import resnet_v2 as r2
        p = r2.init_params(jax.random.PRNGKey(0), "resnet_v2_50")
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = r2.apply(p, x, "resnet_v2_50")
        assert ep["block3"].shape == (1, 7, 7, 1024)
        assert ep["postnorm"].shape == (1, 7, 7, 2048)
        assert r2.pooled_features(net).shape == (1, 2048)
        n = count_params(p)
        assert 23e6 < n < 24.5e6, n
        assert "resnet_v2_50" in available_encoders()
        assert "resnet_v2_152" in available_encoders()

    def test_preact_unit_structure(self):
        from comic_tpu.models import resnet_v2 as r2
        p = r2.init_params(jax.random.PRNGKey(0), "resnet_v2_50")
        u = p["block1"]["unit_1"]["bottleneck_v2"]
        assert "preact" in u and "biases" in u["conv3"]


class TestMobilenetV2:
    def test_shapes_and_registration(self):
        from comic_tpu.models import mobilenet_v2 as m2
        p = m2.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = m2.apply(p, x)
        assert ep["expanded_conv_12"].shape == (1, 14, 14, 96)
        assert ep["expanded_conv_16"].shape == (1, 7, 7, 320)
        assert ep["Conv_1"].shape == (1, 7, 7, 1280)
        assert m2.pooled_features(net).shape == (1, 1280)
        n = count_params(p)
        # MobileNet-V2 backbone ~2.2M
        assert 2.0e6 < n < 2.5e6, n
        assert "mobilenet_v2" in available_encoders()

    def test_140_variant_shapes(self):
        """mobilenet_v2_140 (net_params.py:85-90): every channel through
        make_divisible(c * 1.4, 8) — published 1.4_224 widths."""
        from comic_tpu.models import mobilenet_v2 as m2
        assert m2.make_divisible(32 * 1.4) == 48
        assert m2.make_divisible(96 * 1.4) == 136
        assert m2.feature_dim(1.4) == 1792
        p = m2.init_params(jax.random.PRNGKey(0), depth_multiplier=1.4)
        assert p["Conv"]["weights"].shape == (3, 3, 3, 48)
        x = jnp.zeros((1, 224, 224, 3))
        net, ep = m2.apply(p, x)
        assert ep["expanded_conv_12"].shape == (1, 14, 14, 136)
        assert ep["expanded_conv_16"].shape == (1, 7, 7, 448)
        assert ep["Conv_1"].shape == (1, 7, 7, 1792)
        n = count_params(p)
        # published 1.4 backbone ~4.3M params
        assert 3.9e6 < n < 4.8e6, n
        assert "mobilenet_v2_140" in available_encoders()
        from comic_tpu.models.encoders import get_encoder
        spec = get_encoder("mobilenet_v2_140")
        assert spec.feature_dim == 1792
        assert spec.fm_channels["expanded_conv_12"] == 136


class TestInceptionV4:
    def test_shapes_299(self):
        from comic_tpu.models import inception_v4 as iv4
        p = iv4.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 299, 299, 3))
        net, ep = iv4.apply(p, x)
        assert ep["Mixed_3a"].shape == (1, 73, 73, 160)
        assert ep["Mixed_4a"].shape == (1, 71, 71, 192)
        assert ep["Mixed_5a"].shape == (1, 35, 35, 384)
        assert ep["Mixed_5e"].shape == (1, 35, 35, 384)
        assert ep["Mixed_6a"].shape == (1, 17, 17, 1024)
        assert ep["Mixed_6h"].shape == (1, 17, 17, 1024)
        assert ep["Mixed_7a"].shape == (1, 8, 8, 1536)
        assert ep["Mixed_7d"].shape == (1, 8, 8, 1536)
        assert iv4.pooled_features(net).shape == (1, 1536)

    def test_param_count(self):
        from comic_tpu.models import inception_v4 as iv4
        n = count_params(iv4.init_params(jax.random.PRNGKey(0)))
        # Inception-V4 base ~41M
        assert 39e6 < n < 43e6, n

    def test_registered(self):
        assert "inception_v4" in available_encoders()


class TestInceptionResnetV2:
    def test_shapes_299(self):
        from comic_tpu.models import inception_resnet_v2 as irv2
        p = irv2.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 299, 299, 3))
        net, ep = irv2.apply(p, x)
        # slim endpoint shapes (inception_resnet_v2_test.py expectations)
        assert ep["Conv2d_1a_3x3"].shape == (1, 149, 149, 32)
        assert ep["Conv2d_2a_3x3"].shape == (1, 147, 147, 32)
        assert ep["Conv2d_2b_3x3"].shape == (1, 147, 147, 64)
        assert ep["MaxPool_3a_3x3"].shape == (1, 73, 73, 64)
        assert ep["Conv2d_3b_1x1"].shape == (1, 73, 73, 80)
        assert ep["Conv2d_4a_3x3"].shape == (1, 71, 71, 192)
        assert ep["MaxPool_5a_3x3"].shape == (1, 35, 35, 192)
        assert ep["Mixed_5b"].shape == (1, 35, 35, 320)
        assert ep["Mixed_6a"].shape == (1, 17, 17, 1088)
        assert ep["PreAuxLogits"].shape == (1, 17, 17, 1088)
        assert ep["Mixed_7a"].shape == (1, 8, 8, 2080)
        assert ep["Conv2d_7b_1x1"].shape == (1, 8, 8, 1536)
        assert irv2.pooled_features(net).shape == (1, 1536)

    def test_early_final_endpoint(self):
        from comic_tpu.models import inception_resnet_v2 as irv2
        p = irv2.init_params(jax.random.PRNGKey(0))
        net, ep = irv2.apply(p, jnp.zeros((1, 299, 299, 3)),
                             final_endpoint="PreAuxLogits")
        assert net.shape == (1, 17, 17, 1088)
        assert "Mixed_7a" not in ep

    def test_param_count(self):
        from comic_tpu.models import inception_resnet_v2 as irv2
        n = count_params(irv2.init_params(jax.random.PRNGKey(0)))
        # IR-v2 base (no aux/logits) ~54.3M
        assert 52e6 < n < 56e6, n

    def test_registered_and_encodes(self):
        assert "inception_resnet_v2" in available_encoders()
        p = encoder_init(jax.random.PRNGKey(0), "inception_resnet_v2")
        emb, fm = encode_images(p, jnp.zeros((1, 299, 299, 3)),
                                "inception_resnet_v2", "PreAuxLogits")
        assert emb.shape == (1, 1536)
        assert fm.shape == (1, 289, 1088)


class TestNasNet:
    """Endpoint shapes from the vendored slim tests
    (nasnet_test.py:127-260, pnasnet_test.py:118-176)."""

    def test_nasnet_mobile_endpoints_224(self):
        from comic_tpu.models import nasnet as nn
        p = nn.init_params(jax.random.PRNGKey(0), "nasnet_mobile")
        net, ep = jax.jit(lambda x: nn.apply(p, x, "nasnet_mobile"))(
            jnp.zeros((1, 224, 224, 3)))
        assert ep["Stem"].shape == (1, 28, 28, 88)
        assert ep["Cell_0"].shape == (1, 28, 28, 264)
        assert ep["Cell_3"].shape == (1, 28, 28, 264)
        assert ep["Cell_4"].shape == (1, 14, 14, 528)
        assert ep["Cell_7"].shape == (1, 14, 14, 528)
        assert ep["Cell_8"].shape == (1, 7, 7, 1056)
        assert ep["Cell_11"].shape == (1, 7, 7, 1056)
        assert ep["Reduction_Cell_0"].shape == (1, 14, 14, 352)
        assert ep["Reduction_Cell_1"].shape == (1, 7, 7, 704)
        assert nn.pooled_features(net).shape == (1, 1056)
        n = count_params(p)
        # NASNet-A mobile base ~4.2M (5.3M with the 1000-way classifier)
        assert 4.0e6 < n < 4.6e6, n

    def test_pnasnet_mobile_endpoints_224(self):
        from comic_tpu.models import nasnet as nn
        p = nn.init_params(jax.random.PRNGKey(0), "pnasnet_mobile")
        net, ep = jax.jit(lambda x: nn.apply(p, x, "pnasnet_mobile"))(
            jnp.zeros((1, 224, 224, 3)))
        assert ep["Stem"].shape == (1, 28, 28, 135)
        assert ep["Cell_0"].shape == (1, 28, 28, 270)
        assert ep["Cell_3"].shape == (1, 14, 14, 540)
        assert ep["Cell_6"].shape == (1, 7, 7, 1080)
        assert ep["Cell_8"].shape == (1, 7, 7, 1080)
        assert nn.pooled_features(net).shape == (1, 1080)

    @pytest.mark.slow
    def test_nasnet_large_endpoints_331(self):
        from comic_tpu.models import nasnet as nn
        p = nn.init_params(jax.random.PRNGKey(0), "nasnet_large")
        net, ep = jax.jit(lambda x: nn.apply(p, x, "nasnet_large"))(
            jnp.zeros((1, 331, 331, 3)))
        assert ep["Stem"].shape == (1, 42, 42, 336)
        assert ep["Cell_0"].shape == (1, 42, 42, 1008)
        assert ep["Cell_6"].shape == (1, 21, 21, 2016)
        assert ep["Cell_12"].shape == (1, 11, 11, 4032)
        assert ep["Cell_17"].shape == (1, 11, 11, 4032)
        assert ep["Reduction_Cell_0"].shape == (1, 21, 21, 1344)
        assert ep["Reduction_Cell_1"].shape == (1, 11, 11, 2688)
        assert nn.pooled_features(net).shape == (1, 4032)
        n = count_params(p)
        # NASNet-A large base ~85M (88.9M with classifier)
        assert 82e6 < n < 89e6, n

    @pytest.mark.slow
    def test_pnasnet_large_endpoints_331(self):
        from comic_tpu.models import nasnet as nn
        p = nn.init_params(jax.random.PRNGKey(0), "pnasnet_large")
        net, ep = jax.jit(lambda x: nn.apply(p, x, "pnasnet_large"))(
            jnp.zeros((1, 331, 331, 3)))
        assert ep["Stem"].shape == (1, 42, 42, 540)
        assert ep["Cell_0"].shape == (1, 42, 42, 1080)
        assert ep["Cell_4"].shape == (1, 21, 21, 2160)
        assert ep["Cell_8"].shape == (1, 11, 11, 4320)
        assert ep["Cell_11"].shape == (1, 11, 11, 4320)
        assert nn.pooled_features(net).shape == (1, 4320)

    def test_registered_and_encodes(self):
        for name in ("nasnet_mobile", "nasnet_large", "pnasnet_mobile",
                     "pnasnet_large"):
            assert name in available_encoders()
        p = encoder_init(jax.random.PRNGKey(0), "nasnet_mobile")
        emb, fm = encode_images(p, jnp.zeros((1, 224, 224, 3)),
                                "nasnet_mobile", "Cell_7")
        assert emb.shape == (1, 1056)
        assert fm.shape == (1, 196, 528)


class TestMerged1x1:
    """layers.merged_1x1_bn_relu vs independent per-branch convs.

    The merge claims exactness (each merged output channel is the same
    dot as its per-branch original; frozen BN affines concatenate
    along) — checked here against a plain per-part conv+BN+relu loop
    in f32 and bf16. Integration through the real encoders is covered
    by the composed TF goldens (inception v1 full, v2/v3/v4 slices)
    and the before/after equivalence run recorded in STATUS.md.
    """

    def _parts(self, rng, cin, couts):
        parts = []
        for cout in couts:
            parts.append({
                "weights": jnp.asarray(
                    rng.normal(size=(1, 1, cin, cout)).astype("float32")),
                "BatchNorm": {
                    "moving_mean": jnp.asarray(
                        rng.normal(size=(cout,)).astype("float32")),
                    "moving_variance": jnp.asarray(
                        rng.uniform(0.5, 2.0, (cout,)).astype("float32")),
                    "beta": jnp.asarray(
                        rng.normal(size=(cout,)).astype("float32")),
                }})
        return parts

    @pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
    def test_matches_per_branch(self, dtype):
        import numpy as np
        from comic_tpu.models import layers

        rng = np.random.default_rng(0)
        eps = 1e-3
        x = jnp.asarray(rng.normal(size=(2, 7, 7, 13)).astype("float32"))
        parts = self._parts(rng, 13, (3, 5, 8))
        got = layers.merged_1x1_bn_relu(parts, x, eps, dtype)
        assert [g.shape[-1] for g in got] == [3, 5, 8]
        for q, g in zip(parts, got):
            w = q["weights"]
            xin = x if dtype is None else x.astype(dtype)
            y = jax.lax.conv_general_dilated(
                xin, w.astype(xin.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ).astype(jnp.float32)
            bn = q["BatchNorm"]
            want = jax.nn.relu(
                (y - bn["moving_mean"])
                * jax.lax.rsqrt(bn["moving_variance"] + eps) + bn["beta"])
            tol = 1e-6 if dtype is None else 5e-2
            np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                       rtol=tol, atol=tol)
