"""Host input-loader throughput: can a real host keep the chip fed?

The serving headline (BENCH captions/s) is measured with device-resident
image pools — honest for this 35-41 MB/s axon tunnel (CLAUDE.md), but on a
real DMA-attached v5e host the input loader must decode+resize that many
JPEGs per second on CPUs. The reference feeds its GPU from a tf.data C++
pipeline (manager_image_caption.py:169-175, num_parallel_calls +
prefetch 15*B); our replacement is `data/pipeline.py _ImageLoaderPool`
(cv2 decode + resize in a thread pool — cv2 releases the GIL, so workers
scale with cores) plus the packed-HDF5 fast path
(`data/pipeline.py PackedImageSource`: images pre-decoded at prepro time,
reads are chunk-cache memcpys).

Measures, on photo-entropy synthetic JPEGs at COCO-ish dimensions
(640x480, quality 90, ~90 KB):

  file loader     images/s vs worker count (square + aspect_eval modes)
  packed source   images/s reading the packed h5

and extrapolates cores needed to sustain the serving headline.

Run: python tools/loader_bench.py [target_captions_per_s]
(host-only, no TPU; default target 5716 = BENCH_r04 headline)

Measured 2026-08-19 (this 1-core axon host — per-core rates are the
transferable number, wall rates scale with cores):
  see BENCH_r05 host_loader fields / docstring update after run.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

# repo root by file location — this tool is also run as a bench.py
# subprocess, whose cwd must not matter
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_jpegs(root: str, n: int = 96, h: int = 480, w: int = 640):
    """Photo-like JPEGs: smoothed noise + gradient, COCO-ish size."""
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        base = (
            128
            + 60 * np.sin(xx / (20 + i % 7) + i)
            + 40 * np.cos(yy / (25 + i % 5))
        )[..., None] + rng.normal(0, 18, (h, w, 3))
        # mild blur via 2x2 box to approximate photo spectrum
        arr = np.clip(base, 0, 255).astype(np.uint8)
        arr = ((arr[::2, ::2].astype(np.uint16)
                + arr[1::2, ::2] + arr[::2, 1::2] + arr[1::2, 1::2]) // 4
               ).astype(np.uint8).repeat(2, 0).repeat(2, 1)
        p = os.path.join(root, f"img_{i:04d}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def rate(load, paths, batch: int = 32, min_s: float = 2.0):
    """images/s over repeated batch loads (first call warms the pool)."""
    load(paths[:batch])
    n, t0 = 0, time.time()
    while time.time() - t0 < min_s:
        lo = (n * batch) % (len(paths) - batch + 1)
        load(paths[lo:lo + batch])
        n += 1
    return n * batch / (time.time() - t0)


def main():
    target = float(sys.argv[1]) if len(sys.argv) > 1 else 5716.0
    from comic_tpu.data.pipeline import _ImageLoaderPool

    ncores = os.cpu_count() or 1
    out = {"host_cores": ncores, "target_images_per_s": target}
    with tempfile.TemporaryDirectory() as root:
        paths = make_jpegs(root)
        sz = np.mean([os.path.getsize(p) for p in paths]) / 1e3
        out["jpeg_kb_mean"] = round(sz, 1)
        print(f"{len(paths)} synthetic JPEGs, mean {sz:.0f} KB "
              f"({ncores}-core host)", file=sys.stderr)

        for workers in (1, 2, 4, 8):
            r = rate(_ImageLoaderPool(workers, mode="square").load, paths)
            out[f"file_loader_square_w{workers}"] = round(r, 1)
            print(f"square  w={workers:<2} {r:8.1f} images/s",
                  file=sys.stderr, flush=True)
        r = rate(_ImageLoaderPool(8, mode="aspect_eval").load, paths)
        out["file_loader_aspect_w8"] = round(r, 1)
        print(f"aspect  w=8  {r:8.1f} images/s", file=sys.stderr)

        # per-core rate: best single-worker number (thread workers on a
        # 1-core host timeshare, so w=1 IS the per-core rate)
        per_core = out["file_loader_square_w1"]
        out["file_loader_images_per_s_per_core"] = per_core
        out["cores_to_sustain_target"] = round(target / per_core, 1)

        # packed-h5 fast path on the same images
        try:
            import h5py  # noqa: F401

            from comic_tpu.data.pipeline import PackedImageSource
            from comic_tpu.data.preprocessing import (RESIZE_SIZE,
                                                      _resize_host,
                                                      decode_image_host)

            h5p = os.path.join(root, "packed.h5")
            with h5py.File(h5p, "w") as f:
                for k in ("train", "valid"):
                    f.create_dataset(
                        k, (0,), dtype=h5py.special_dtype(vlen=str))
                rel = [os.path.basename(p) for p in paths]
                lines = [f"{i},{r},x" for i, r in enumerate(rel)]
                d = f.create_dataset(
                    "test", (len(lines),),
                    dtype=h5py.special_dtype(vlen=str))
                d[:] = lines
                imgs = f.create_dataset(
                    "images", (len(paths), RESIZE_SIZE, RESIZE_SIZE, 3),
                    chunks=(4, RESIZE_SIZE, RESIZE_SIZE, 3), dtype="uint8")
                for i, p in enumerate(paths):
                    imgs[i] = _resize_host(decode_image_host(p),
                                           RESIZE_SIZE, RESIZE_SIZE)
            src = PackedImageSource(h5p)
            r = rate(src.load, [os.path.basename(p) for p in paths])
            out["packed_h5_images_per_s"] = round(r, 1)
            print(f"packed  h5  {r:8.1f} images/s", file=sys.stderr)
        except ImportError:
            print("h5py unavailable — packed path skipped", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
