"""Image preprocessing: host decode/resize + fused on-device augmentation.

Behavioral contract (the reference's actual preprocessing for every
inception/mobilenet/nasnet encoder —
/root/reference/common/inputs/preprocessing/inception_preprocessing_radix.py:
240-278 entry, :158-201 train, :204-237 eval):

  float [0,1] -> bilinear resize 256x256 ->
    train: random horizontal flip -> random HxW crop -> (x - .5) * 2
    eval:  central crop-or-pad to HxW          -> (x - .5) * 2

TPU-first split: JPEG decode and the variable-shape resize happen on the
host (cv2/PIL, threaded loader); everything from the fixed 256x256 uint8
image onward is ONE jitted batched function on device, so the host->device
transfer is 3 uint8 channels and XLA fuses flip+crop+scale into a single
pass. Per-image randomness comes from a single JAX key via vmap.

`resize_bilinear_tf1` reproduces TF1's `tf.image.resize_bilinear`
(align_corners=False, asymmetric coordinate mapping) for checkpoint-parity
work; the host loader's cv2 resize (half-pixel centers) differs by <1 LSB on
natural images and is the default for speed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RESIZE_SIZE = 256
# ImageNet RGB means used by the reference's vgg_preprocessing for
# ResNet/VGG encoders (vgg_preprocessing.py:39-41).
VGG_MEANS_RGB = (123.68, 116.78, 103.94)
# train-time scale-jitter bounds for the smallest side
# (vgg_preprocessing.py:43-44)
VGG_RESIZE_SIDE_MIN = 256
VGG_RESIZE_SIDE_MAX = 512


# --------------------------------------------------------------------------
# Device-side ops
# --------------------------------------------------------------------------

def resize_bilinear_tf1(image: jnp.ndarray, out_h: int, out_w: int
                        ) -> jnp.ndarray:
    """Bilinear resize with TF1 align_corners=False semantics.

    src = dst * (in / out); edge clamped. Operates on (H, W, C) float.
    """
    in_h, in_w = image.shape[0], image.shape[1]

    def axis_coords(out_n, in_n):
        scale = in_n / out_n
        src = jnp.arange(out_n, dtype=jnp.float32) * scale
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        frac = src - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_coords(out_h, in_h)
    xlo, xhi, xf = axis_coords(out_w, in_w)
    img = image.astype(jnp.float32)
    top = img[ylo][:, xlo] * (1 - xf)[None, :, None] \
        + img[ylo][:, xhi] * xf[None, :, None]
    bot = img[yhi][:, xlo] * (1 - xf)[None, :, None] \
        + img[yhi][:, xhi] * xf[None, :, None]
    return top * (1 - yf)[:, None, None] + bot * yf[:, None, None]


def central_crop_or_pad(image: jnp.ndarray, out_h: int, out_w: int
                        ) -> jnp.ndarray:
    """tf.image.resize_image_with_crop_or_pad: center crop, pad with zeros."""
    h, w, c = image.shape
    # crop
    off_h = max((h - out_h) // 2, 0)
    off_w = max((w - out_w) // 2, 0)
    cropped = jax.lax.dynamic_slice(
        image, (off_h, off_w, 0),
        (min(h, out_h), min(w, out_w), c))
    # pad
    pad_h = out_h - cropped.shape[0]
    pad_w = out_w - cropped.shape[1]
    if pad_h > 0 or pad_w > 0:
        cropped = jnp.pad(
            cropped,
            ((pad_h // 2, pad_h - pad_h // 2),
             (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    return cropped


def _augment_one(image01: jnp.ndarray, key: jax.Array, out_h: int, out_w: int
                 ) -> jnp.ndarray:
    """Random flip + random crop for one [0,1] float image (train path)."""
    k_flip, k_y, k_x = jax.random.split(key, 3)
    image01 = jnp.where(
        jax.random.bernoulli(k_flip), image01[:, ::-1, :], image01)
    h, w = image01.shape[0], image01.shape[1]
    off_y = jax.random.randint(k_y, (), 0, h - out_h + 1)
    off_x = jax.random.randint(k_x, (), 0, w - out_w + 1)
    return jax.lax.dynamic_slice(image01, (off_y, off_x, 0),
                                 (out_h, out_w, 3))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def preprocess_batch(images_u8: jnp.ndarray, key: jax.Array,
                     out_h: int, out_w: int, training: bool) -> jnp.ndarray:
    """(B, 256, 256, 3) uint8 -> (B, out_h, out_w, 3) float32 in [-1, 1].

    The single fused device kernel of the input pipeline.
    """
    in_h, in_w = images_u8.shape[1], images_u8.shape[2]
    if out_h > in_h or out_w > in_w:
        # fail EARLY and clearly: the reference resizes to a fixed 256
        # then CROPS to cnn_input_size (inception_preprocessing_radix.py:
        # 271 + tf.random_crop), so >256 inputs (inception_v3/v4 299,
        # nasnet_large 331 defaults) cannot run through this pipeline —
        # the reference errors identically at train time and silently
        # zero-pads a dead border at eval. Pick cnn_input_size <= the
        # host resize (224 is the reference's operating point).
        raise ValueError(
            f"cnn_input_size ({out_h},{out_w}) exceeds the host-resized "
            f"image ({in_h},{in_w}); the reference-faithful pipeline "
            f"crops, never upsamples. Use cnn_input_size <= {in_h}.")
    imgs = images_u8.astype(jnp.float32) / 255.0
    if training:
        keys = jax.random.split(key, images_u8.shape[0])
        imgs = jax.vmap(_augment_one, in_axes=(0, 0, None, None))(
            imgs, keys, out_h, out_w)
    else:
        imgs = jax.vmap(central_crop_or_pad, in_axes=(0, None, None))(
            imgs, out_h, out_w)
    return (imgs - 0.5) * 2.0


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def preprocess_batch_vgg(images_u8: jnp.ndarray, key: jax.Array,
                         out_h: int, out_w: int, training: bool
                         ) -> jnp.ndarray:
    """VGG/ResNet path: 0-255 scale, RGB mean subtraction
    (vgg_preprocessing.py:286-365); train adds random flip + crop, eval
    central-crops."""
    in_h, in_w = images_u8.shape[1], images_u8.shape[2]
    if out_h > in_h or out_w > in_w:
        # same crop-never-upsample contract as preprocess_batch
        raise ValueError(
            f"cnn_input_size ({out_h},{out_w}) exceeds the host-resized "
            f"image ({in_h},{in_w}); the reference-faithful pipeline "
            f"crops, never upsamples. Use cnn_input_size <= {in_h}.")
    imgs = images_u8.astype(jnp.float32)
    if training:
        keys = jax.random.split(key, images_u8.shape[0])
        imgs = jax.vmap(_augment_one, in_axes=(0, 0, None, None))(
            imgs, keys, out_h, out_w)
    else:
        imgs = jax.vmap(central_crop_or_pad, in_axes=(0, None, None))(
            imgs, out_h, out_w)
    return imgs - jnp.asarray(VGG_MEANS_RGB)


def preprocess_for(cnn_name: str):
    """Encoder name -> batched preprocessing fn
    (preprocessing_factory.py:31-84 dispatch: inception/mobilenet/nasnet ->
    inception-style, resnet/vgg -> vgg-style)."""
    from ..models.encoders import get_encoder

    kind = get_encoder(cnn_name).preprocessing
    return preprocess_batch_vgg if kind == "vgg" else preprocess_batch


# --------------------------------------------------------------------------
# Host-side decode/resize
# --------------------------------------------------------------------------

def decode_image_host(path: str) -> np.ndarray:
    """Decode an image file to (H, W, 3) uint8 RGB (cv2, PIL fallback)."""
    try:
        import cv2

        data = np.fromfile(path, np.uint8)
        img = cv2.imdecode(data, cv2.IMREAD_COLOR)  # BGR
        if img is None:
            raise ValueError(f"Could not decode image: {path}")
        return img[:, :, ::-1].copy()  # BGR -> RGB
    except ImportError:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.uint8)


def resize_bilinear_tf1_np(img: np.ndarray, out_h: int, out_w: int
                           ) -> np.ndarray:
    """Numpy port of TF1 ``tf.image.resize_bilinear`` (align_corners=False):
    src = dst * (in / out), asymmetric mapping, edge-clamped. The device-side
    twin `resize_bilinear_tf1` is golden-tested against TF
    (tests/test_data.py); this host version shares its coordinate math
    (inception_preprocessing_radix.py:240-278, vgg_preprocessing.py:280).
    Residual inexactness: the loader contract is uint8, so the bilinear
    output is rounded back to uint8 here while the reference resizes in
    float [0,1] and feeds the fractional values onward — up to 0.5/255
    per-pixel skew survives even with tf1_exact=True. Account for it in
    parity analyses; eliminating it would need a float image path through
    the whole loader/device contract.
    """
    in_h, in_w = img.shape[:2]

    def axis(out_n, in_n):
        src = np.arange(out_n, dtype=np.float64) * (in_n / out_n)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_n - 1)
        return lo, hi, (src - lo).astype(np.float32)

    ylo, yhi, yf = axis(out_h, in_h)
    xlo, xhi, xf = axis(out_w, in_w)
    im = img.astype(np.float32)
    top = im[ylo][:, xlo] * (1 - xf)[None, :, None] \
        + im[ylo][:, xhi] * xf[None, :, None]
    bot = im[yhi][:, xlo] * (1 - xf)[None, :, None] \
        + im[yhi][:, xhi] * xf[None, :, None]
    out = top * (1 - yf)[:, None, None] + bot * yf[:, None, None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _resize_host(img: np.ndarray, out_h: int, out_w: int,
                 tf1_exact: bool = False) -> np.ndarray:
    if tf1_exact:
        return resize_bilinear_tf1_np(img, out_h, out_w)
    try:
        import cv2

        # cv2 wants BGR-agnostic (w, h); half-pixel centers (<1 LSB drift
        # from TF1 on natural images), SIMD-fast
        return cv2.resize(img, (out_w, out_h),
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((out_w, out_h), Image.BILINEAR),
            np.uint8)


def _aspect_resize_host(img: np.ndarray, smallest_side: int,
                        tf1_exact: bool = False) -> np.ndarray:
    """Aspect-preserving resize: smallest side -> `smallest_side`
    (vgg_preprocessing.py:233-283, _smallest_size_at_least truncation)."""
    h, w = img.shape[:2]
    scale = smallest_side / (w if h > w else h)
    new_h, new_w = int(h * scale), int(w * scale)
    return _resize_host(img, new_h, new_w, tf1_exact)


def _center_crop_host(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    off_h, off_w = max((h - size) // 2, 0), max((w - size) // 2, 0)
    out = img[off_h: off_h + size, off_w: off_w + size]
    if out.shape[0] < size or out.shape[1] < size:  # pad (tiny sources)
        pad_h, pad_w = size - out.shape[0], size - out.shape[1]
        out = np.pad(out, ((pad_h // 2, pad_h - pad_h // 2),
                           (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    return out


def load_and_resize_host(path: str, size: int = RESIZE_SIZE,
                         mode: str = "square", tf1_exact: bool = False,
                         rng: Optional[np.random.Generator] = None
                         ) -> np.ndarray:
    """Decode + resize to a FIXED (size, size, 3) uint8 RGB for the device.

    Modes (static output shape keeps one compiled device graph):
      - 'square' (inception-style): plain bilinear resize to size x size
        (inception_preprocessing_radix.py:240-278).
      - 'aspect_eval' (vgg/resnet eval): aspect-preserving smallest-side ->
        size, central crop. Composed with the device's central 224-crop this
        equals the reference's resize-256 + central-crop-224 exactly
        (central crop of a central crop).
      - 'aspect_train' (vgg/resnet train): smallest side jittered in
        [256, 512] (vgg_preprocessing.py:308-311), aspect resize, RANDOM
        size x size crop. DIVERGENCE: the reference random-crops 224
        directly from the jittered image; the composite host-256-crop +
        device-224-crop covers the same support with a slightly different
        (non-uniform) offset distribution.
    """
    img = decode_image_host(path)
    if mode == "square":
        return _resize_host(img, size, size, tf1_exact)
    if mode == "aspect_eval":
        return _center_crop_host(
            _aspect_resize_host(img, size, tf1_exact), size)
    if mode == "aspect_train":
        rng = rng or np.random.default_rng()
        side = int(rng.integers(VGG_RESIZE_SIDE_MIN,
                                VGG_RESIZE_SIDE_MAX + 1))
        side = max(side, size)
        img = _aspect_resize_host(img, side, tf1_exact)
        h, w = img.shape[:2]
        # the reference's _smallest_size_at_least truncates (int(h*scale)),
        # so the non-smallest side can land 1 px BELOW `side` (e.g. a
        # 237-px side scaled to 256 yields 255) — clamp the crop range and
        # center-pad the sub-size case rather than raising inside a loader
        # thread
        if h < size or w < size:
            return _center_crop_host(img, size)
        off_h = int(rng.integers(0, h - size + 1))
        off_w = int(rng.integers(0, w - size + 1))
        return img[off_h: off_h + size, off_w: off_w + size]
    raise ValueError(f"Unknown host resize mode: {mode}")
