"""CNN encoder registry.

Functional replacement for the slim nets_factory
(/root/reference/common/nets/nets_factory.py:116-159) plus the reference's
`_encoder` wrapper (/root/reference/src/model_base.py:56-104): produces the
pooled image embedding and the flattened attention feature map.

Round-1 scope: Inception-V1 (the default and the one used for every
published number). The registry is data-driven so further slim-zoo encoders
(inception_v2/v3, resnet, mobilenet, ...) plug in as (init, apply, meta)
triples.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import inception_v1
from .layers import dense_apply, dense_init, layer_norm_apply, layer_norm_init

Params = Dict[str, Any]


@dataclass(frozen=True)
class EncoderSpec:
    name: str
    init: Callable[[jax.Array], Params]
    apply: Callable[..., Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]
    pooled: Callable[[jnp.ndarray], jnp.ndarray]
    default_image_size: int
    feature_dim: int  # pooled embedding size
    default_fm_endpoint: str
    fm_channels: Dict[str, int]  # endpoint -> channel count
    preprocessing: str  # 'inception' | 'vgg' (see data/preprocessing.py)


_REGISTRY: Dict[str, EncoderSpec] = {}


def register(spec: EncoderSpec) -> None:
    _REGISTRY[spec.name] = spec


def get_encoder(name: str) -> EncoderSpec:
    if name not in _REGISTRY:
        raise ValueError(
            f"Name of network unknown {name}. Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available_encoders():
    return sorted(_REGISTRY)


register(EncoderSpec(
    name="inception_v1",
    init=inception_v1.init_params,
    apply=inception_v1.apply,
    pooled=inception_v1.pooled_features,
    default_image_size=inception_v1.DEFAULT_IMAGE_SIZE,
    feature_dim=inception_v1.FEATURE_DIM,
    default_fm_endpoint="Mixed_4f",
    fm_channels={
        "Mixed_3c": 480, "Mixed_4b": 512, "Mixed_4c": 512, "Mixed_4d": 512,
        "Mixed_4e": 528, "Mixed_4f": 832, "Mixed_5b": 832, "Mixed_5c": 1024,
    },
    preprocessing="inception",
))


def _register_inception_v4():
    from . import inception_v4 as iv4

    register(EncoderSpec(
        name="inception_v4",
        init=iv4.init_params,
        apply=iv4.apply,
        pooled=iv4.pooled_features,
        default_image_size=iv4.DEFAULT_IMAGE_SIZE,
        feature_dim=iv4.FEATURE_DIM,
        default_fm_endpoint="Mixed_6h",
        fm_channels={"Mixed_5e": 384, "Mixed_6h": 1024, "Mixed_7d": 1536},
        preprocessing="inception",
    ))


def _register_resnets():
    from . import resnet

    for name in resnet.RESNET_V1_UNITS:
        register(EncoderSpec(
            name=name,
            init=(lambda key, n=name: resnet.init_params(key, n)),
            apply=(lambda p, x, final_endpoint="block4", dtype=None, n=name:
                   resnet.apply(p, x, n, final_endpoint, dtype)),
            pooled=resnet.pooled_features,
            default_image_size=resnet.DEFAULT_IMAGE_SIZE,
            feature_dim=resnet.FEATURE_DIM,
            default_fm_endpoint="block3",
            fm_channels={"block1": 256, "block2": 512, "block3": 1024,
                         "block4": 2048},
            preprocessing="vgg",
        ))


def _register_vggs():
    from . import vgg

    for name in vgg.VGG_LAYERS:
        register(EncoderSpec(
            name=name,
            init=(lambda key, n=name: vgg.init_params(key, n)),
            apply=(lambda p, x, final_endpoint="fc7", dtype=None, n=name:
                   vgg.apply(p, x, n, final_endpoint, dtype)),
            pooled=vgg.pooled_features,
            default_image_size=vgg.DEFAULT_IMAGE_SIZE,
            feature_dim=vgg.FEATURE_DIM,
            default_fm_endpoint="conv5_3" if name == "vgg_16" else "conv5_4",
            # per-net: vgg_16 has 3 convs per block-5 (no conv5_4) — a
            # shared dict would pass build_model_spec's endpoint check and
            # KeyError later inside encode_images
            fm_channels=({"conv4_3": 512, "conv5_3": 512}
                         if name == "vgg_16" else
                         {"conv4_3": 512, "conv4_4": 512,
                          "conv5_3": 512, "conv5_4": 512}),
            preprocessing="vgg",
        ))


def _register_mobilenet():
    from . import mobilenet_v1 as mb

    register(EncoderSpec(
        name="mobilenet_v1",
        init=mb.init_params,
        apply=mb.apply,
        pooled=mb.pooled_features,
        default_image_size=mb.DEFAULT_IMAGE_SIZE,
        feature_dim=mb.FEATURE_DIM,
        default_fm_endpoint="Conv2d_11_pointwise",
        fm_channels={"Conv2d_11_pointwise": 512, "Conv2d_13_pointwise": 1024},
        preprocessing="inception",
    ))


def _register_inception_v2():
    from . import inception_v2 as iv2

    register(EncoderSpec(
        name="inception_v2",
        init=iv2.init_params,
        apply=iv2.apply,
        pooled=iv2.pooled_features,
        default_image_size=iv2.DEFAULT_IMAGE_SIZE,
        feature_dim=iv2.FEATURE_DIM,
        default_fm_endpoint="Mixed_4e",
        fm_channels={"Mixed_3c": 320, "Mixed_4e": 576, "Mixed_5c": 1024},
        preprocessing="inception",
    ))


def _register_inception_v3():
    from . import inception_v3 as iv3

    register(EncoderSpec(
        name="inception_v3",
        init=iv3.init_params,
        apply=iv3.apply,
        pooled=iv3.pooled_features,
        default_image_size=iv3.DEFAULT_IMAGE_SIZE,
        feature_dim=iv3.FEATURE_DIM,
        default_fm_endpoint="Mixed_6e",
        fm_channels={"Mixed_5d": 288, "Mixed_6e": 768, "Mixed_7c": 2048},
        preprocessing="inception",
    ))


def _register_resnet_v2():
    from . import resnet_v2 as r2

    for name in r2.RESNET_V2_UNITS:
        register(EncoderSpec(
            name=name,
            init=(lambda key, n=name: r2.init_params(key, n)),
            apply=(lambda p, x, final_endpoint="postnorm", dtype=None,
                   n=name: r2.apply(p, x, n, final_endpoint, dtype)),
            pooled=r2.pooled_features,
            default_image_size=r2.DEFAULT_IMAGE_SIZE,
            feature_dim=r2.FEATURE_DIM,
            default_fm_endpoint="block3",
            fm_channels={"block1": 256, "block2": 512, "block3": 1024,
                         "block4": 2048, "postnorm": 2048},
            preprocessing="vgg",
        ))


def _register_inception_resnet_v2():
    from . import inception_resnet_v2 as irv2

    register(EncoderSpec(
        name="inception_resnet_v2",
        init=irv2.init_params,
        apply=irv2.apply,
        pooled=irv2.pooled_features,
        default_image_size=irv2.DEFAULT_IMAGE_SIZE,
        feature_dim=irv2.FEATURE_DIM,
        default_fm_endpoint="PreAuxLogits",
        fm_channels={"Mixed_5b": 320, "Mixed_6a": 1088,
                     "PreAuxLogits": 1088, "Mixed_7a": 2080,
                     "Conv2d_7b_1x1": 1536},
        preprocessing="inception",
    ))


def _register_mobilenet_v2():
    from . import mobilenet_v2 as m2

    register(EncoderSpec(
        name="mobilenet_v2",
        init=m2.init_params,
        apply=m2.apply,
        pooled=m2.pooled_features,
        default_image_size=m2.DEFAULT_IMAGE_SIZE,
        feature_dim=m2.FEATURE_DIM,
        default_fm_endpoint="expanded_conv_12",
        fm_channels={"expanded_conv_12": 96, "expanded_conv_16": 320,
                     "Conv_1": 1280},
        preprocessing="inception",
    ))
    # depth-multiplier 1.4 registry variant
    # (/root/reference/common/net_params.py:85-90): every channel count
    # through make_divisible(c * 1.4, 8) -> 96->136, 320->448, 1280->1792
    register(EncoderSpec(
        name="mobilenet_v2_140",
        init=lambda key: m2.init_params(key, depth_multiplier=1.4),
        apply=m2.apply,
        pooled=m2.pooled_features,
        default_image_size=m2.DEFAULT_IMAGE_SIZE,
        feature_dim=m2.feature_dim(1.4),
        default_fm_endpoint="expanded_conv_12",
        fm_channels={"expanded_conv_12": 136, "expanded_conv_16": 448,
                     "Conv_1": 1792},
        preprocessing="inception",
    ))


_register_inception_v4()
_register_resnets()
_register_vggs()
_register_mobilenet()
_register_inception_v3()
_register_inception_v2()
def _register_nasnets():
    from . import nasnet as nn

    # default attention endpoints pick the stride-16 (14x14 / 21x21) map,
    # matching the Mixed_4f altitude of the flagship
    fm = {
        "nasnet_mobile": ("Cell_7", {"Cell_3": 264, "Cell_7": 528,
                                     "Cell_11": 1056}),
        "nasnet_large": ("Cell_11", {"Cell_5": 1008, "Cell_11": 2016,
                                     "Cell_17": 4032}),
        "pnasnet_mobile": ("Cell_5", {"Cell_2": 270, "Cell_5": 540,
                                      "Cell_8": 1080}),
        "pnasnet_large": ("Cell_7", {"Cell_3": 1080, "Cell_7": 2160,
                                     "Cell_11": 4320}),
    }
    for name, (default_ep, channels) in fm.items():
        register(EncoderSpec(
            name=name,
            init=(lambda key, n=name: nn.init_params(key, n)),
            apply=(lambda p, x, final_endpoint=None, dtype=None, n=name:
                   nn.apply(p, x, n, final_endpoint, dtype)),
            pooled=nn.pooled_features,
            default_image_size=nn.DEFAULT_IMAGE_SIZES[name],
            feature_dim=nn.FEATURE_DIMS[name],
            default_fm_endpoint=default_ep,
            fm_channels=channels,
            preprocessing="inception",
        ))


_register_resnet_v2()
_register_mobilenet_v2()
_register_inception_resnet_v2()
_register_nasnets()


# --- the reference's `_encoder` (model_base.py:56-104) ---------------------

def encoder_init(key, cnn_name: str, legacy: bool = False) -> Params:
    """CNN params (+ legacy LN-tanh/linear image-embed head, :80-91)."""
    spec = get_encoder(cnn_name)
    k1, k2 = jax.random.split(key)
    p: Params = {"cnn": spec.init(k1)}
    if legacy:
        p["LN_tanh"] = layer_norm_init(spec.feature_dim)
        p["im_embed"] = dense_init(k2, spec.feature_dim, 1024, use_bias=False)
    return p


def encode_images(
    params: Params,
    images: jnp.ndarray,
    cnn_name: str,
    fm_endpoint: Optional[str] = None,
    legacy: bool = False,
    dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images (B, H, W, 3) -> (im_embed (B, E), fmaps (B, H'*W', C)).

    The attention memory is the chosen endpoint reshaped NHWC -> (B, L, C)
    (model_base.py:93-104). BN always runs in inference mode regardless of
    training stage (model_base.py:72-76).
    """
    spec = get_encoder(cnn_name)
    fm_endpoint = fm_endpoint or spec.default_fm_endpoint
    net, end_points = spec.apply(params["cnn"], images, dtype=dtype)
    im_embed = spec.pooled(net)
    if legacy:
        im_embed = layer_norm_apply(params["LN_tanh"], im_embed,
                                    activation=jnp.tanh)
        im_embed = dense_apply(params["im_embed"], im_embed, dtype=dtype)
    fm = end_points[fm_endpoint]
    b, h, w, c = fm.shape
    return im_embed, fm.reshape(b, h * w, c)
