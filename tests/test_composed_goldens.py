"""Composed-network TF goldens for the non-inception-v1 encoder families.

Each test rebuilds a multi-layer slice of one of our encoders from raw
tf.nn ops using OUR randomized weights and checks the jax apply() matches
end to end. This goes beyond the per-op goldens (tests/test_inception.py)
and the shape/param-count tests (tests/test_encoders.py): it pins the
SAME/VALID padding chains, slim's ``conv2d_same`` fixed padding
(reference resnet_utils.py:77-122), pool placement/count semantics,
depthwise kernel layout, residual wiring, and branch concat order —
the exact places where a converted slim ImageNet checkpoint would
silently produce wrong features.

All BN statistics and weights are randomized so an identity-BN bug can't
hide. Skipped when tensorflow is unavailable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comic_tpu.models import (inception_resnet_v2 as irv2, inception_v2 as
                              iv2, inception_v3 as iv3, inception_v4 as
                              iv4, mobilenet_v1 as mnv1, mobilenet_v2 as
                              mnv2, resnet as rv1, resnet_v2 as rv2,
                              vgg)

tf = pytest.importorskip("tensorflow")


def _randomize(params, rng, w_std=0.15):
    """Random weights + NON-identity BN stats for every leaf. Deep slices
    pass a smaller w_std so activations stay in fp32's comfortable range
    (randomized BN amplifies ~exponentially with depth)."""

    def f(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        # nasnet's scope-path store keys leaves as 'conv0_bn/moving_mean'
        # (slash inside ONE key) — match on the last component
        name = name.rsplit("/", 1)[-1]
        if name == "moving_variance":
            return jnp.asarray(rng.uniform(0.5, 2.0, leaf.shape), jnp.float32)
        if name in ("moving_mean", "beta", "gamma", "biases"):
            return jnp.asarray(rng.normal(0.0, 0.5, leaf.shape), jnp.float32)
        return jnp.asarray(rng.normal(0.0, w_std, leaf.shape), jnp.float32)

    return jax.tree_util.tree_map_with_path(f, params)


def _np(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def _bn(p, y, eps):
    bn = p["BatchNorm"]
    gamma = bn.get("gamma", np.float32(1.0))
    return ((y - bn["moving_mean"])
            / np.sqrt(bn["moving_variance"] + eps) * gamma + bn["beta"])


def _conv_same(p, y, k, stride, eps, relu=True):
    """slim conv2d_same twin: fixed (k-1)//2 pad + VALID when strided."""
    if stride > 1:
        lo = (k - 1) // 2
        y = tf.pad(y, [[0, 0], [lo, k - 1 - lo], [lo, k - 1 - lo], [0, 0]])
        y = tf.nn.conv2d(y, p["weights"], strides=stride, padding="VALID")
    else:
        y = tf.nn.conv2d(y, p["weights"], strides=1, padding="SAME")
    y = _bn(p, y, eps)
    return tf.nn.relu(y) if relu else y


class TestResnetV1Golden:
    def test_root_and_block1_matches_tf(self, rng):
        """conv2d_same root (pad 3,3 — NOT plain SAME on the even input),
        SAME pool1, three bottlenecks incl. the stride-2 last unit whose
        conv2 uses conv2d_same pad (1,1)."""
        p = _randomize(rv1.init_params(jax.random.PRNGKey(0),
                                       "resnet_v1_50"), rng)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        pn = _np(p)
        eps = rv1.BN_EPS

        def bottleneck(u, y, stride):
            if "shortcut" in u:
                sc = tf.nn.conv2d(y, u["shortcut"]["weights"],
                                  strides=stride, padding="SAME")
                sc = _bn(u["shortcut"], sc, eps)
            elif stride > 1:
                sc = y[:, ::stride, ::stride, :]
            else:
                sc = y
            r = tf.nn.relu(_bn(u["conv1"], tf.nn.conv2d(
                y, u["conv1"]["weights"], strides=1, padding="SAME"), eps))
            r = _conv_same(u["conv2"], r, 3, stride, eps)
            r = _bn(u["conv3"], tf.nn.conv2d(
                r, u["conv3"]["weights"], strides=1, padding="SAME"), eps)
            return tf.nn.relu(sc + r)

        y = _conv_same(pn["conv1"], x, 7, 2, eps)
        y = tf.nn.max_pool2d(y, 3, 2, "SAME")
        for ui in (1, 2, 3):
            y = bottleneck(pn["block1"][f"unit_{ui}"]["bottleneck_v1"], y,
                           2 if ui == 3 else 1)
        want = y.numpy()

        _, ep = rv1.apply(p, jnp.asarray(x), "resnet_v1_50",
                          final_endpoint="block1")
        np.testing.assert_allclose(np.asarray(ep["block1"]), want,
                                   rtol=2e-4, atol=1e-4)


class TestResnetV1FullGolden:
    def test_full_network_matches_tf(self, rng):
        """All four blocks with slim's hand-specified unit counts
        (3, 4, 6, 3) and the subsampling stride on each block's LAST unit
        (resnet_utils.stack_blocks_dense convention — torchvision puts it
        on the first), through to the pooled (B, 2048) feature."""
        p = _randomize(rv1.init_params(jax.random.PRNGKey(10),
                                       "resnet_v1_50"), rng, w_std=0.05)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        pn = _np(p)
        eps = rv1.BN_EPS

        def bottleneck(u, y, stride):
            if "shortcut" in u:
                sc = _bn(u["shortcut"], tf.nn.conv2d(
                    y, u["shortcut"]["weights"], strides=stride,
                    padding="SAME"), eps)
            elif stride > 1:
                sc = y[:, ::stride, ::stride, :]
            else:
                sc = y
            r = tf.nn.relu(_bn(u["conv1"], tf.nn.conv2d(
                y, u["conv1"]["weights"], strides=1, padding="SAME"), eps))
            r = _conv_same(u["conv2"], r, 3, stride, eps)
            r = _bn(u["conv3"], tf.nn.conv2d(
                r, u["conv3"]["weights"], strides=1, padding="SAME"), eps)
            return tf.nn.relu(sc + r)

        y = _conv_same(pn["conv1"], x, 7, 2, eps)
        y = tf.nn.max_pool2d(y, 3, 2, "SAME")
        for bi, n_units in enumerate((3, 4, 6, 3), 1):
            for ui in range(1, n_units + 1):
                stride = 2 if (ui == n_units and bi < 4) else 1
                y = bottleneck(
                    pn[f"block{bi}"][f"unit_{ui}"]["bottleneck_v1"], y,
                    stride)
        want = y.numpy()
        assert want.shape == (1, 2, 2, 2048)

        net, _ = rv1.apply(p, jnp.asarray(x), "resnet_v1_50")
        np.testing.assert_allclose(np.asarray(net), want,
                                   rtol=2e-3, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(rv1.pooled_features(net)),
            tf.reduce_mean(y, axis=[1, 2]).numpy(), rtol=2e-3, atol=5e-3)


class TestResnetV2Golden:
    def test_root_and_block1_matches_tf(self, rng):
        """Preact bottlenecks: biased unnormalized root, shortcut taken
        from the PREACTIVATED tensor, biased conv3, stride-2 conv2 via
        conv2d_same."""
        p = _randomize(rv2.init_params(jax.random.PRNGKey(1),
                                       "resnet_v2_50"), rng)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        pn = _np(p)
        eps = rv2.BN_EPS

        def bn_relu(bn, y):
            return tf.nn.relu((y - bn["moving_mean"])
                              / np.sqrt(bn["moving_variance"] + eps)
                              * bn["gamma"] + bn["beta"])

        def unit(u, y, stride):
            pre = bn_relu(u["preact"], y)
            if "shortcut" in u:
                sc = tf.nn.conv2d(pre, u["shortcut"]["weights"],
                                  strides=stride, padding="SAME")
                sc = sc + u["shortcut"]["biases"]
            elif stride > 1:
                sc = y[:, ::stride, ::stride, :]
            else:
                sc = y
            r = tf.nn.relu(_bn(u["conv1"], tf.nn.conv2d(
                pre, u["conv1"]["weights"], strides=1, padding="SAME"), eps))
            r = _conv_same(u["conv2"], r, 3, stride, eps)
            r = tf.nn.conv2d(r, u["conv3"]["weights"], strides=1,
                             padding="SAME") + u["conv3"]["biases"]
            return sc + r

        lo = 3  # conv2d_same pad for k=7
        y = tf.pad(x, [[0, 0], [lo, lo], [lo, lo], [0, 0]])
        y = tf.nn.conv2d(y, pn["conv1"]["weights"], strides=2,
                         padding="VALID") + pn["conv1"]["biases"]
        y = tf.nn.max_pool2d(y, 3, 2, "SAME")
        for ui in (1, 2, 3):
            y = unit(pn["block1"][f"unit_{ui}"]["bottleneck_v2"], y,
                     2 if ui == 3 else 1)
        want = y.numpy()

        _, ep = rv2.apply(p, jnp.asarray(x), "resnet_v2_50",
                          final_endpoint="block1")
        np.testing.assert_allclose(np.asarray(ep["block1"]), want,
                                   rtol=2e-4, atol=1e-4)


class TestVggGolden:
    def test_blocks_1_2_match_tf(self, rng):
        p = _randomize(vgg.init_params(jax.random.PRNGKey(2), "vgg_16"), rng)
        x = rng.normal(size=(1, 48, 48, 3)).astype(np.float32)
        pn = _np(p)

        def conv(pp, y):
            return tf.nn.relu(tf.nn.conv2d(y, pp["weights"], strides=1,
                                           padding="SAME") + pp["biases"])

        y = conv(pn["conv1"]["conv1_1"], x)
        y = conv(pn["conv1"]["conv1_2"], y)
        y = tf.nn.max_pool2d(y, 2, 2, "VALID")
        y = conv(pn["conv2"]["conv2_1"], y)
        y = conv(pn["conv2"]["conv2_2"], y)
        want = y.numpy()

        _, ep = vgg.apply(p, jnp.asarray(x), "vgg_16",
                          final_endpoint="conv2_2")
        np.testing.assert_allclose(np.asarray(ep["conv2_2"]), want,
                                   rtol=2e-4, atol=1e-4)


class TestMobilenetV1Golden:
    def test_through_block4_matches_tf(self, rng):
        """Depthwise kernels feed tf.nn.depthwise_conv2d in slim's native
        (H, W, C, 1) layout — pins our transpose+feature_group_count
        mapping. Covers the stride-2 blocks 2 and 4."""
        p = _randomize(mnv1.init_params(jax.random.PRNGKey(3)), rng)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        pn = _np(p)
        eps = mnv1.BN_EPS

        def bn_relu6(pp, y):
            return tf.nn.relu6(_bn(pp, y, eps))

        strides = {1: 1, 2: 2, 3: 1, 4: 2}
        y = bn_relu6(pn["Conv2d_0"], tf.nn.conv2d(
            x, pn["Conv2d_0"]["weights"], strides=2, padding="SAME"))
        for i in (1, 2, 3, 4):
            dw = pn[f"Conv2d_{i}_depthwise"]
            y = bn_relu6(dw, tf.nn.depthwise_conv2d(
                y, dw["depthwise_weights"],
                strides=[1, strides[i], strides[i], 1], padding="SAME"))
            pw = pn[f"Conv2d_{i}_pointwise"]
            y = bn_relu6(pw, tf.nn.conv2d(y, pw["weights"], strides=1,
                                          padding="SAME"))
        want = y.numpy()

        _, ep = mnv1.apply(p, jnp.asarray(x),
                           final_endpoint="Conv2d_4_pointwise")
        np.testing.assert_allclose(np.asarray(ep["Conv2d_4_pointwise"]),
                                   want, rtol=2e-4, atol=1e-4)


class TestMobilenetV2Golden:
    @pytest.mark.parametrize("multiplier", [1.0, 1.4])
    def test_through_expanded_conv_2_matches_tf(self, rng, multiplier):
        """Covers the t=1 first block (no expand), a stride-2 expanded
        block, and a residual-add block. The 1.4 variant reuses the same
        raw-tf twin (it reads channel counts from the param shapes), so
        the make_divisible widths are pinned against tf.nn too."""
        p = _randomize(mnv2.init_params(jax.random.PRNGKey(4),
                                        depth_multiplier=multiplier), rng)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        pn = _np(p)
        eps = mnv2.BN_EPS

        def cbn(pp, y, stride, relu6=True):
            y = _bn(pp, tf.nn.conv2d(y, pp["weights"], strides=stride,
                                     padding="SAME"), eps)
            return tf.nn.relu6(y) if relu6 else y

        def dwbn(pp, y, stride):
            y = _bn(pp, tf.nn.depthwise_conv2d(
                y, pp["depthwise_weights"], strides=[1, stride, stride, 1],
                padding="SAME"), eps)
            return tf.nn.relu6(y)

        y = cbn(pn["Conv"], x, 2)
        # expanded_conv: t=1, no expand, stride 1, no residual (16 != 32)
        b = pn["expanded_conv"]
        y = cbn(b["project"], dwbn(b["depthwise"], y, 1), 1, relu6=False)
        # expanded_conv_1: t=6, stride 2
        b = pn["expanded_conv_1"]
        y = cbn(b["project"], dwbn(b["depthwise"], cbn(b["expand"], y, 1),
                                   2), 1, relu6=False)
        # expanded_conv_2: t=6, stride 1, residual add (24 == 24)
        b = pn["expanded_conv_2"]
        y = y + cbn(b["project"],
                    dwbn(b["depthwise"], cbn(b["expand"], y, 1), 1),
                    1, relu6=False)
        want = y.numpy()

        _, ep = mnv2.apply(p, jnp.asarray(x),
                           final_endpoint="expanded_conv_2")
        np.testing.assert_allclose(np.asarray(ep["expanded_conv_2"]), want,
                                   rtol=2e-4, atol=1e-4)


class TestInceptionV3Golden:
    def test_stem_and_mixed_5b_match_tf(self, rng):
        """VALID stem chain + the first SAME inception block, including
        the count-corrected SAME average pool (tf.nn.avg_pool2d excludes
        padding from the divisor, as does slim)."""
        p = _randomize(iv3.init_params(jax.random.PRNGKey(5)), rng)
        x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
        pn = _np(p)
        eps = iv3.BN_EPS

        def conv(pp, y, stride, padding):
            return tf.nn.relu(_bn(pp, tf.nn.conv2d(
                y, pp["weights"], strides=stride, padding=padding), eps))

        y = conv(pn["Conv2d_1a_3x3"], x, 2, "VALID")
        y = conv(pn["Conv2d_2a_3x3"], y, 1, "VALID")
        y = conv(pn["Conv2d_2b_3x3"], y, 1, "SAME")
        y = tf.nn.max_pool2d(y, 3, 2, "VALID")
        y = conv(pn["Conv2d_3b_1x1"], y, 1, "VALID")
        y = conv(pn["Conv2d_4a_3x3"], y, 1, "VALID")
        y = tf.nn.max_pool2d(y, 3, 2, "VALID")
        m = pn["Mixed_5b"]
        b0 = conv(m["Branch_0"]["Conv2d_0a_1x1"], y, 1, "SAME")
        b1 = conv(m["Branch_1"]["Conv2d_0a_1x1"], y, 1, "SAME")
        b1 = conv(m["Branch_1"]["Conv2d_0b_5x5"], b1, 1, "SAME")
        b2 = conv(m["Branch_2"]["Conv2d_0a_1x1"], y, 1, "SAME")
        b2 = conv(m["Branch_2"]["Conv2d_0b_3x3"], b2, 1, "SAME")
        b2 = conv(m["Branch_2"]["Conv2d_0c_3x3"], b2, 1, "SAME")
        b3 = tf.nn.avg_pool2d(y, 3, 1, "SAME")
        b3 = conv(m["Branch_3"]["Conv2d_0b_1x1"], b3, 1, "SAME")
        want = tf.concat([b0, b1, b2, b3], axis=3).numpy()

        _, ep = iv3.apply(p, jnp.asarray(x), final_endpoint="Mixed_5b")
        # 9 randomized conv+BN layers deep: activations reach ~370, so
        # accumulated fp reassociation error needs a scaled tolerance
        np.testing.assert_allclose(np.asarray(ep["Mixed_5b"]), want,
                                   rtol=1e-3, atol=2e-3)


class TestInceptionV2Golden:
    def test_separable_stem_and_mixed_3b_match_tf(self, rng):
        """The 7x7/2 separable stem runs through tf.nn.separable_conv2d
        with slim's native (H, W, Cin, mult) depthwise layout — pins our
        grouped-conv kernel mapping and the c*M+m channel interleave."""
        p = _randomize(iv2.init_params(jax.random.PRNGKey(7)), rng)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        pn = _np(p)
        eps = iv2.BN_EPS

        def conv(pp, y, stride=1):
            return tf.nn.relu(_bn(pp, tf.nn.conv2d(
                y, pp["weights"], strides=stride, padding="SAME"), eps))

        stem = pn["Conv2d_1a_7x7"]
        y = tf.nn.separable_conv2d(x, stem["depthwise_weights"],
                                   stem["pointwise_weights"],
                                   strides=[1, 2, 2, 1], padding="SAME")
        y = tf.nn.relu(_bn(stem, y, eps))
        y = tf.nn.max_pool2d(y, 3, 2, "SAME")
        y = conv(pn["Conv2d_2b_1x1"], y)
        y = conv(pn["Conv2d_2c_3x3"], y)
        y = tf.nn.max_pool2d(y, 3, 2, "SAME")
        m = pn["Mixed_3b"]
        b0 = conv(m["Branch_0"]["Conv2d_0a_1x1"], y)
        b1 = conv(m["Branch_1"]["Conv2d_0a_1x1"], y)
        b1 = conv(m["Branch_1"]["Conv2d_0b_3x3"], b1)
        b2 = conv(m["Branch_2"]["Conv2d_0a_1x1"], y)
        b2 = conv(m["Branch_2"]["Conv2d_0b_3x3"], b2)
        b2 = conv(m["Branch_2"]["Conv2d_0c_3x3"], b2)
        b3 = tf.nn.avg_pool2d(y, 3, 1, "SAME")
        b3 = conv(m["Branch_3"]["Conv2d_0b_1x1"], b3)
        want = tf.concat([b0, b1, b2, b3], axis=3).numpy()

        _, ep = iv2.apply(p, jnp.asarray(x), final_endpoint="Mixed_3b")
        np.testing.assert_allclose(np.asarray(ep["Mixed_3b"]), want,
                                   rtol=1e-3, atol=2e-3)


class TestInceptionV4Golden:
    def test_stem_through_mixed_4a_matches_tf(self, rng):
        """VALID stem + the Mixed_3a pool/conv reduction + Mixed_4a's
        asymmetric 1x7/7x1 chain ending in a VALID 3x3."""
        p = _randomize(iv4.init_params(jax.random.PRNGKey(8)), rng)
        x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
        pn = _np(p)
        eps = iv3.BN_EPS  # v4 reuses v3's conv+BN primitive

        def conv(pp, y, stride, padding):
            return tf.nn.relu(_bn(pp, tf.nn.conv2d(
                y, pp["weights"], strides=stride, padding=padding), eps))

        y = conv(pn["Conv2d_1a_3x3"], x, 2, "VALID")
        y = conv(pn["Conv2d_2a_3x3"], y, 1, "VALID")
        y = conv(pn["Conv2d_2b_3x3"], y, 1, "SAME")
        m3 = pn["Mixed_3a"]
        y = tf.concat([tf.nn.max_pool2d(y, 3, 2, "VALID"),
                       conv(m3["Branch_1"]["Conv2d_0a_3x3"], y, 2,
                            "VALID")], axis=3)
        m4 = pn["Mixed_4a"]
        b0 = conv(m4["Branch_0"]["Conv2d_0a_1x1"], y, 1, "SAME")
        b0 = conv(m4["Branch_0"]["Conv2d_1a_3x3"], b0, 1, "VALID")
        b1 = conv(m4["Branch_1"]["Conv2d_0a_1x1"], y, 1, "SAME")
        b1 = conv(m4["Branch_1"]["Conv2d_0b_1x7"], b1, 1, "SAME")
        b1 = conv(m4["Branch_1"]["Conv2d_0c_7x1"], b1, 1, "SAME")
        b1 = conv(m4["Branch_1"]["Conv2d_1a_3x3"], b1, 1, "VALID")
        want = tf.concat([b0, b1], axis=3).numpy()

        _, ep = iv4.apply(p, jnp.asarray(x), final_endpoint="Mixed_4a")
        np.testing.assert_allclose(np.asarray(ep["Mixed_4a"]), want,
                                   rtol=1e-3, atol=2e-3)


def inception_v1_twin_endpoints(pn, x):
    """Raw tf.nn twin of the WHOLE inception_v1 (stem, all 9 mixed
    blocks, both mid-network pools), built from a hand-transcribed slim
    filter table (slim inception_v1.py:66-208). Returns {Mixed_*: tensor}.

    Shared by the full-network golden below and the full-pipeline
    encoder+decoder twin in tests/test_full_pipeline_twin.py.
    """
    from comic_tpu.models import inception_v1 as iv1

    eps = iv1.BN_EPS

    def conv(pp, y, stride=1):
        return tf.nn.relu(_bn(pp, tf.nn.conv2d(
            y, pp["weights"], strides=stride, padding="SAME"), eps))

    # hand-copied slim inception_v1 mixed-block filter table:
    # (name, b0, (b1a, b1b), (b2a, b2b), b3)
    table = [
        ("Mixed_3b", 64, (96, 128), (16, 32), 32),
        ("Mixed_3c", 128, (128, 192), (32, 96), 64),
        ("MaxPool_4a_3x3", None, None, None, None),
        ("Mixed_4b", 192, (96, 208), (16, 48), 64),
        ("Mixed_4c", 160, (112, 224), (24, 64), 64),
        ("Mixed_4d", 128, (128, 256), (24, 64), 64),
        ("Mixed_4e", 112, (144, 288), (32, 64), 64),
        ("Mixed_4f", 256, (160, 320), (32, 128), 128),
        ("MaxPool_5a_2x2", None, None, None, None),
        ("Mixed_5b", 256, (160, 320), (32, 128), 128),
        ("Mixed_5c", 384, (192, 384), (48, 128), 128),
    ]

    y = conv(pn["Conv2d_1a_7x7"], x, 2)
    y = tf.nn.max_pool2d(y, 3, 2, "SAME")
    y = conv(pn["Conv2d_2b_1x1"], y)
    y = conv(pn["Conv2d_2c_3x3"], y)
    y = tf.nn.max_pool2d(y, 3, 2, "SAME")
    want = {}
    for name, b0c, b1c, b2c, b3c in table:
        if name.startswith("MaxPool"):
            k = 2 if "2x2" in name else 3
            y = tf.nn.max_pool2d(y, k, 2, "SAME")
            continue
        m = pn[name]
        b0 = conv(m["Branch_0"]["Conv2d_0a_1x1"], y)
        b1 = conv(m["Branch_1"]["Conv2d_0a_1x1"], y)
        b1 = conv(m["Branch_1"]["Conv2d_0b_3x3"], b1)
        b2 = conv(m["Branch_2"]["Conv2d_0a_1x1"], y)
        b2 = conv(m["Branch_2"]["Conv2d_0b_3x3"], b2)
        b3 = tf.nn.max_pool2d(y, 3, 1, "SAME")
        b3 = conv(m["Branch_3"]["Conv2d_0b_1x1"], b3)
        assert b0.shape[-1] == b0c and b1.shape[-1] == b1c[1]
        assert b2.shape[-1] == b2c[1] and b3.shape[-1] == b3c
        y = tf.concat([b0, b1, b2, b3], axis=3)
        want[name] = y
    return want


class TestInceptionV1FullGolden:
    def test_full_network_through_mixed_5c_matches_tf(self, rng):
        """The WHOLE inception_v1 against the raw tf.nn twin above.
        Covers both captioning endpoints: Mixed_4f (attention memory) and
        the pooled Mixed_5c (im_embed)."""
        from comic_tpu.models import inception_v1 as iv1

        p = _randomize(iv1.init_params(jax.random.PRNGKey(9)), rng,
                       w_std=0.05)
        x = (rng.normal(size=(1, 96, 96, 3)) * 0.5).astype(np.float32)
        pn = _np(p)
        want = inception_v1_twin_endpoints(pn, x)

        _, ep = iv1.apply(p, jnp.asarray(x))
        for name in ("Mixed_4f", "Mixed_5c"):
            np.testing.assert_allclose(np.asarray(ep[name]),
                                       want[name].numpy(),
                                       rtol=2e-3, atol=5e-3, err_msg=name)
        # pooled im_embed source
        np.testing.assert_allclose(
            np.asarray(iv1.pooled_features(ep["Mixed_5c"])),
            tf.reduce_mean(want["Mixed_5c"], axis=[1, 2]).numpy(),
            rtol=2e-3, atol=5e-3)


def _flat(tree):
    """Nested param dict -> {'a/b/c': np.ndarray} (nasnet scope paths)."""
    out = {}

    def walk(d, pre=""):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, pre + k + "/")
            else:
                out[pre + k] = np.asarray(v)

    walk(tree)
    return out


class _NasTwin:
    """Raw tf.nn twin of slim's NASNet cell stack, transcribed from the
    reference sources (NOT from our jax code): factorized_reduction
    nasnet_utils.py:90-129, _stacked_separable_conv :178-206, _pooling
    :232-246, _reduce_prev_layer/_cell_base :274-306, NasNetABaseCell
    __call__ :307-355, _apply_conv_operation :357-395,
    _combine_unused_states :397-425, _imagenet_stem nasnet.py:252-278.
    Convs are bias-free with separate BN (arg scope nasnet.py:185-187),
    eps=1e-3. Params are fetched from OUR converted-layout tree by slim
    scope path, so this also pins the checkpoint-conversion layout."""

    EPS = 1e-3

    def __init__(self, flat_params):
        self.p = flat_params

    def bn(self, scope, y):
        return ((y - self.p[scope + "/moving_mean"])
                / np.sqrt(self.p[scope + "/moving_variance"] + self.EPS)
                * self.p[scope + "/gamma"] + self.p[scope + "/beta"])

    def conv(self, scope, y, stride=1, padding="SAME"):
        return tf.nn.conv2d(y, self.p[scope + "/weights"], strides=stride,
                            padding=padding)

    def sep_stack(self, scope, y, operation, stride):
        # _operation_to_info (nasnet_utils.py:147-175): e.g.
        # 'separable_5x5_2' -> kernel 5, 2 stacked layers
        k = int(operation.split("x")[0][-1])
        tail = operation.split("_")[-1]
        num_layers = 1 if "x" in tail else int(tail)
        for i in range(1, num_layers + 1):
            y = tf.nn.relu(y)
            y = tf.nn.depthwise_conv2d(
                y, self.p[f"{scope}/separable_{k}x{k}_{i}/depthwise_weights"],
                [1, stride, stride, 1], "SAME")
            y = tf.nn.conv2d(
                y, self.p[f"{scope}/separable_{k}x{k}_{i}/pointwise_weights"],
                strides=1, padding="SAME")
            y = self.bn(f"{scope}/bn_sep_{k}x{k}_{i}", y)
            stride = 1  # stride only on the first layer (:191-193)
        return y

    def fact_red(self, prefix, y, stride):
        """factorized_reduction; `prefix` '' puts vars at the tree root
        (the _reduce_prev_layer call site uses the bare cell scope)."""
        pre = prefix + "/" if prefix else ""
        if stride == 1:
            return self.bn(pre + "path_bn", self.conv(pre + "path_conv", y))
        path1 = tf.nn.avg_pool2d(y, 1, [1, stride, stride, 1], "VALID")
        path1 = self.conv(pre + "path1_conv", path1)
        # pad bottom/right then shift one pixel (:108-117)
        path2 = tf.pad(y, [[0, 0], [0, 1], [0, 1], [0, 0]])[:, 1:, 1:, :]
        path2 = tf.nn.avg_pool2d(path2, 1, [1, stride, stride, 1], "VALID")
        path2 = self.conv(pre + "path2_conv", path2)
        return self.bn(pre + "final_path_bn",
                       tf.concat([path1, path2], axis=3))

    def apply_op(self, scope, y, operation, filters, stride, from_original):
        if stride > 1 and not from_original:
            stride = 1  # :361-362
        cin = int(y.shape[-1])
        if "separable" in operation:
            return self.sep_stack(scope, y, operation, stride)
        if operation == "none":
            if stride > 1 or cin != filters:
                y = tf.nn.relu(y)
                y = self.conv(scope + "/1x1", y, stride)
                y = self.bn(scope + "/bn_1", y)
            return y
        assert "pool" in operation, operation
        k = int(operation.split("_")[-1].split("x")[0])
        pool = (tf.nn.avg_pool2d if operation.startswith("avg")
                else tf.nn.max_pool2d)
        y = pool(y, k, stride, "SAME")
        if cin != filters:
            y = self.bn(scope + "/bn_1", self.conv(scope + "/1x1", y))
        return y

    def cell(self, scope, program, net, prev, filters, stride):
        ops, used, indices = program
        # _reduce_prev_layer (:274-291): width mismatch -> factorized
        # reduction (vars in the bare cell scope), channel mismatch ->
        # prev_1x1 + prev_bn
        if prev is None:
            prev = net
        elif int(net.shape[2]) != int(prev.shape[2]):
            prev = self.fact_red(scope, tf.nn.relu(prev), 2)
        elif filters != int(prev.shape[-1]):
            prev = tf.nn.relu(prev)
            prev = self.bn(scope + "/prev_bn",
                           self.conv(scope + "/prev_1x1", prev))
        h = tf.nn.relu(net)
        h = self.bn(scope + "/beginning_bn", self.conv(scope + "/1x1", h))
        states = [h, prev]
        for it in range(5):
            li, ri = indices[2 * it], indices[2 * it + 1]
            h1 = self.apply_op(f"{scope}/comb_iter_{it}/left", states[li],
                               ops[2 * it], filters, stride, li < 2)
            h2 = self.apply_op(f"{scope}/comb_iter_{it}/right", states[ri],
                               ops[2 * it + 1], filters, stride, ri < 2)
            states.append(h1 + h2)
        # _combine_unused_states (:397-425)
        final_h, final_c = int(states[-1].shape[2]), int(states[-1].shape[-1])
        outs = []
        for idx, (s, is_used) in enumerate(zip(states, used)):
            mismatch = (final_c != int(s.shape[-1])
                        or final_h != int(s.shape[2]))
            if mismatch and not is_used:
                st = 2 if final_h != int(s.shape[2]) else 1
                s = self.fact_red(f"{scope}/cell_output/reduction_{idx}",
                                  s, st)
            if not is_used:
                outs.append(s)
        return tf.concat(outs, axis=3)

    def stem(self, x, stem_cell, num_filters, rate):
        """_imagenet_stem (nasnet.py:252-278): VALID conv0 + two stride-2
        stem cells at filter scalings 1/rate^2, 1/rate."""
        net = self.bn("conv0_bn", self.conv("conv0", x, 2, "VALID"))
        outputs = [None, net]
        scaling = 1.0 / rate ** 2
        for i in range(2):
            net = self.cell(f"cell_stem_{i}", stem_cell, net, outputs[-2],
                            int(num_filters * scaling), 2)
            outputs.append(net)
            scaling *= rate
        return net, outputs

    def nasnet_body(self, net, outputs, normal_cell, reduction_cell,
                    num_filters, rate, reductions, skip_input, last_cell):
        """_build_nasnet_base body loop (nasnet.py:517-560): explicit
        Reduction cells interleaved at `reductions`; prev_layer read
        BEFORE the reduction when skip_reduction_layer_input, AFTER its
        append otherwise (so a post-reduction cell's prev is the last
        pre-reduction normal cell — width mismatch -> factorized
        reduction inside _reduce_prev_layer)."""
        scaling = 1.0
        prev = None
        for cell_num in range(last_cell + 1):
            if skip_input:
                prev = outputs[-2]
            if cell_num in reductions:
                scaling *= rate
                net = self.cell(
                    f"reduction_cell_{reductions.index(cell_num)}",
                    reduction_cell, net, outputs[-2],
                    int(num_filters * scaling), 2)
                outputs.append(net)
            if not skip_input:
                prev = outputs[-2]
            net = self.cell(f"cell_{cell_num}", normal_cell, net, prev,
                            int(num_filters * scaling), 1)
            outputs.append(net)
        return net

    def pnas_body(self, net, outputs, normal_cell, num_filters, rate,
                  reductions, last_cell):
        """_build_pnasnet_base body (pnasnet.py:117-137): stride-2 NORMAL
        cells at the reduction positions, prev always cell_outputs[-2]
        (skip_reduction_layer_input=1 in both pnasnet configs)."""
        scaling = 1.0
        for cell_num in range(last_cell + 1):
            is_red = cell_num in reductions
            if is_red:
                scaling *= rate
            prev = outputs[-2]
            net = self.cell(f"cell_{cell_num}", normal_cell, net, prev,
                            int(num_filters * scaling), 2 if is_red else 1)
            outputs.append(net)
        return net


class TestNasnetGolden:
    def test_stem_through_first_reduction_matches_tf(self, rng):
        """nasnet_mobile conv0 stem, both stride-2 Reduction stem cells,
        normal cells 0-3, Reduction_Cell_0 (placed at index 4 by
        calc_reduction_layers(12, 2)) and the post-reduction Cell_4 —
        covering stacked separable convs (5x5/7x7/3x3), SAME avg/max
        pools, 'none' with channel fixup, factorized reduction in BOTH
        call sites (prev-layer and cell-output), the unused-state concat
        order, the scaling *= rate ordering, and the
        skip_reduction_layer_input=False prev selection (Cell_4's prev
        is pre-reduction Cell_3 -> width-mismatch reduction)."""
        from comic_tpu.models import nasnet

        p = _randomize(nasnet.init_params(jax.random.PRNGKey(10),
                                          "nasnet_mobile", image_size=64),
                       rng, w_std=0.05)
        x = (rng.normal(size=(2, 64, 64, 3)) * 0.5).astype(np.float32)

        twin = _NasTwin(_flat(_np(p)))
        net, outputs = twin.stem(x, nasnet.REDUCTION_CELL, 44, 2.0)
        want = twin.nasnet_body(
            net, outputs, nasnet.NORMAL_CELL, nasnet.REDUCTION_CELL, 44,
            2.0, reductions=[4, 8], skip_input=False, last_cell=4).numpy()

        _, ep = nasnet.apply(p, jnp.asarray(x), "nasnet_mobile",
                             final_endpoint="Cell_4")
        got = np.asarray(ep["Cell_4"])
        assert got.shape == want.shape == (2, 4, 4, 88 * 6)
        # NaNs would compare equal under assert_allclose — forbid them
        # (a mis-randomized moving_variance once NaN-poisoned both sides)
        assert np.isfinite(got).all() and np.isfinite(want).all()
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-3)


class TestPnasnetGolden:
    def test_stem_through_first_reduction_matches_tf(self, rng):
        """pnasnet_mobile: PNAS Normal cells in the stem (stride 2) and
        body, through the stride-2 reduction-position Cell_3
        (calc_reduction_layers(9, 2) = [3, 6]) — filters 13 -> 27 -> 54
        -> 108, prev always cell_outputs[-2]
        (skip_reduction_layer_input=1, pnasnet.py:117-137)."""
        from comic_tpu.models import nasnet

        p = _randomize(nasnet.init_params(jax.random.PRNGKey(11),
                                          "pnasnet_mobile", image_size=64),
                       rng, w_std=0.05)
        x = (rng.normal(size=(2, 64, 64, 3)) * 0.5).astype(np.float32)

        twin = _NasTwin(_flat(_np(p)))
        net, outputs = twin.stem(x, nasnet.PNAS_NORMAL_CELL, 54, 2.0)
        want = twin.pnas_body(net, outputs, nasnet.PNAS_NORMAL_CELL, 54,
                              2.0, reductions=[3, 6], last_cell=3).numpy()

        _, ep = nasnet.apply(p, jnp.asarray(x), "pnasnet_mobile",
                             final_endpoint="Cell_3")
        got = np.asarray(ep["Cell_3"])
        assert got.shape == want.shape == (2, 4, 4, 108 * 5)
        assert np.isfinite(got).all() and np.isfinite(want).all()
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-3)


class TestInceptionResnetV2Golden:
    def test_stem_matches_tf(self, rng):
        p = _randomize(irv2.init_params(jax.random.PRNGKey(6)), rng)
        x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32)
        pn = _np(p)
        eps = irv2.BN_EPS

        def conv(pp, y, stride, padding):
            return tf.nn.relu(_bn(pp, tf.nn.conv2d(
                y, pp["weights"], strides=stride, padding=padding), eps))

        y = conv(pn["Conv2d_1a_3x3"], x, 2, "VALID")
        y = conv(pn["Conv2d_2a_3x3"], y, 1, "VALID")
        y = conv(pn["Conv2d_2b_3x3"], y, 1, "SAME")
        y = tf.nn.max_pool2d(y, 3, 2, "VALID")
        y = conv(pn["Conv2d_3b_1x1"], y, 1, "VALID")
        y = conv(pn["Conv2d_4a_3x3"], y, 1, "VALID")
        y = tf.nn.max_pool2d(y, 3, 2, "VALID")
        want = y.numpy()

        _, ep = irv2.apply(p, jnp.asarray(x),
                           final_endpoint="MaxPool_5a_3x3")
        np.testing.assert_allclose(np.asarray(ep["MaxPool_5a_3x3"]), want,
                                   rtol=2e-4, atol=1e-4)
