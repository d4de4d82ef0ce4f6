"""Batched input pipelines with static-shape bucketing and threaded prefetch.

Re-design of the reference InputManager family
(/root/reference/common/inputs/manager_image_caption.py:27-509) for XLA:

  - `bucket_by_sequence_length` with dynamic padding becomes PAD-TO-BUCKET
    static shapes: each batch is padded to one of a fixed set of bucket
    widths, so the whole training job compiles a handful of graphs instead
    of one per sequence length.
  - the tf.data generator/prefetch stack becomes a plain Python loader with
    a worker pool decoding+resizing images on the host and a bounded queue
    (prefetch) in front of the device step; images cross to the device as
    uint8 and are augmented on device (data/preprocessing.py).
  - epoch shuffling, eval-batch divisibility, `max_step` derivation, and
    bucket boundaries ([11,13,15] COCO words, [7,10,13] Insta, char
    [45,55,70]/[29,42,61], radix x digit width) match the reference
    (:83-86, :141-145, :231-357).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..configuration import Config
from ..tokenization import RadixCodec, Vocabulary, build_char_vocab, encode_caption_tokens
from . import captions as cap_io
from .preprocessing import RESIZE_SIZE, load_and_resize_host

PAD_ID = -1


def bucket_boundaries(config: Config, vocab: Vocabulary,
                      caption_len_thres: int = 20,
                      max_encoded_len: Optional[int] = None) -> List[int]:
    """Sequence-length bucket upper bounds, plus a static overflow bucket.

    The first three bounds are the reference's bucket boundaries
    (COCO word [11,13,15], Insta [7,10,13], char [45,55,70]/[29,42,61],
    radix = word bounds x digit width — manager_image_caption.py:83-86,
    :246-247, :293-296). The reference dynamic-pads within each bucket; XLA
    wants static shapes, so each batch pads UP to its bucket bound, and the
    overflow bucket is capped at the longest possible caption
    (caption_len_thres words + GO/EOS).

    ``max_encoded_len``: length of the longest encoded caption actually in
    the dataset. The static heuristic caps are exact for word/radix at the
    default prepro threshold, but a dataset prepped with a larger
    --caption_len_thres, or char captions whose words average > 5 chars,
    would silently be TRUNCATED by pad_rows (dropping <EOS>) — the
    reference's bucket_by_sequence_length dynamic-pads and never truncates,
    so the overflow bound is raised to cover the real data. Callers must
    derive it from the GLOBAL (pre-host-sharding) records so every host
    compiles identical bucket shapes.
    """
    pattern = config.dataset_file_pattern or ""
    is_insta = "insta" in pattern
    if config.token_type == "char":
        bounds = [29, 42, 61] if is_insta else [45, 55, 70]
        cap = caption_len_thres * 6 + 2
    elif config.token_type == "radix":
        width = RadixCodec(len(vocab), config.radix_base).word_len
        words = [7, 10, 13] if is_insta else [11, 13, 15]
        bounds = [b * width for b in words]
        cap = caption_len_thres * width + 2
    else:
        bounds = [7, 10, 13] if is_insta else [11, 13, 15]
        cap = caption_len_thres + 2
    if max_encoded_len is not None:
        cap = max(cap, int(max_encoded_len))
    return bounds + [cap]


def pick_bucket(length: int, bounds: Sequence[int]) -> int:
    for i, b in enumerate(bounds):
        if length <= b:
            return i
    return len(bounds) - 1


def pad_rows(rows: Sequence[np.ndarray], width: int) -> np.ndarray:
    out = np.full((len(rows), width), PAD_ID, np.int32)
    for i, r in enumerate(rows):
        out[i, : min(len(r), width)] = r[:width]
    return out


def host_resize_mode(config: Config, is_training: bool) -> str:
    """Host resize policy per encoder preprocessing family: inception-style
    nets use a square 256 resize; vgg/resnet use the reference's
    aspect-preserving resize (+ train-time scale jitter)
    (preprocessing_factory.py:31-84, vgg_preprocessing.py:286-365)."""
    from ..models.encoders import get_encoder

    # an unknown cnn_name raises here (same as preprocess_for) rather than
    # silently building a square-resize loader for a typo'd config
    kind = get_encoder(config.cnn_name).preprocessing
    if kind != "vgg":
        return "square"
    return "aspect_train" if is_training else "aspect_eval"


class _ImageLoaderPool:
    """Thread pool turning filepaths into fixed-shape uint8 images."""

    def __init__(self, num_workers: int = 8, mode: str = "square",
                 tf1_exact: bool = False, seed: Optional[int] = None):
        self.num_workers = num_workers
        self.mode = mode
        self.tf1_exact = tf1_exact
        self._rng = np.random.default_rng(seed)
        self._pool: Optional[ThreadPoolExecutor] = None  # lazy, persistent
        self._closed = False

    def load(self, paths: Sequence[str]) -> np.ndarray:
        if self._closed:
            # use-after-close must fail loudly: the lazy `_pool is None`
            # state is otherwise indistinguishable from never-opened, and
            # load() would silently spawn a fresh executor nothing shuts
            # down (PackedImageSource's post-close load raises too)
            raise ValueError("load() on a closed _ImageLoaderPool")
        out = np.empty((len(paths), RESIZE_SIZE, RESIZE_SIZE, 3), np.uint8)
        # per-image independent RNG streams (thread-safe scale jitter)
        seeds = (self._rng.integers(0, 2**63, len(paths))
                 if self.mode == "aspect_train" else None)

        def load_one(i):
            rng = (np.random.default_rng(int(seeds[i]))
                   if seeds is not None else None)
            out[i] = load_and_resize_host(
                paths[i], mode=self.mode, tf1_exact=self.tf1_exact, rng=rng)

        if len(paths) == 1:
            load_one(0)
            return out
        # persistent executor: per-batch thread spawn/teardown on the hot
        # input path costs more than the decode on small batches, and the
        # old ceil-division chunking could exceed num_workers threads
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        # a raising worker must fail load(), not leave its slice of the
        # np.empty batch as uninitialized garbage — result() re-raises
        for f in [self._pool.submit(load_one, i) for i in range(len(paths))]:
            f.result()
        return out

    def close(self):
        self._closed = True
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None


def _path_suffix_match(query: str, packed: str) -> bool:
    """True when one path's components are a trailing suffix of the other's.

    Accepts the legitimate basename-fallback cases ('x.jpg' vs packed
    'train2014/x.jpg'; absolute '/data/coco/train2014/x.jpg' vs packed
    'train2014/x.jpg') while rejecting a directory MISMATCH
    ('val_subset/x.jpg' vs packed 'train2014/x.jpg'), which previously
    served the wrong image silently when the basename was unique."""
    q = [c for c in query.replace(os.sep, "/").split("/") if c]
    f = [c for c in packed.split("/") if c]
    return q[-len(f):] == f or f[-len(q):] == q


class PackedImageSource:
    """Fixed-shape uint8 images served from a packed HDF5 dataset.

    The pack (`prepro/base.py serialise_everything`; reference
    prepro_base.py:288-360) stores every image already decoded and
    square-resized to the loader contract shape, so a batch read here is a
    chunk-cache memcpy instead of a per-image JPEG decode + resize. This is
    the documented high-throughput host feed for inference/eval: a real
    v5e host must source thousands of images/s to keep the chip fed, and
    JPEG decode is the dominant per-image cost (measured rates:
    tools/loader_bench.py, BENCH host_loader fields).

    Same `.load(paths)` contract as `_ImageLoaderPool`; rows are looked up
    by the relative filepath recorded in the pack's caption lines, falling
    back to basename (infer file lists may carry bare filenames).
    """

    def __init__(self, h5_path: str, mode: str = "square",
                 tf1_exact: bool = False):
        import h5py

        if mode != "square":
            raise ValueError(
                "packed_dataset images are square-resized at pack time; "
                f"this config's encoder needs host resize mode '{mode}' "
                "(vgg-family aspect preprocessing) — use the file loader.")
        if tf1_exact:
            raise ValueError(
                "packed_dataset images were packed with the default host "
                "bilinear; host_resize_tf1 would silently not apply — "
                "unset it or use the file loader.")
        self._f = h5py.File(h5_path, "r")
        try:
            images = self._f["images"]
            if images.shape[1:] != (RESIZE_SIZE, RESIZE_SIZE, 3):
                raise ValueError(
                    f"packed images are {images.shape[1:]}, loader "
                    f"contract is ({RESIZE_SIZE}, {RESIZE_SIZE}, 3) — "
                    f"repack with image_size=({RESIZE_SIZE}, "
                    f"{RESIZE_SIZE}).")
            # filename -> row, from the '<row>,<filepath>,<caption>' lines
            # (one line per caption; first occurrence of a filepath wins,
            # as in `serialise_everything` row assignment). `_by_base`
            # keeps (row, fpath) candidates for the basename fallback in
            # load(); the whole index build stays inside this try — a pack
            # missing a split key or carrying a malformed caption line
            # must not leak the open handle (a retry loop over candidate
            # packs would accumulate descriptors).
            self._index: dict = {}
            self._by_base: dict = {}
            for split in ("train", "valid", "test"):
                for line in self._f[split][:]:
                    line = (line.decode() if isinstance(line, bytes)
                            else line)
                    row_s, fpath = line.split(",", 2)[:2]
                    if fpath in self._index:
                        continue
                    self._index[fpath] = int(row_s)
                    self._by_base.setdefault(
                        os.path.basename(fpath), []).append(
                            (int(row_s), fpath))
        except Exception:
            self._f.close()
            raise
        self._images = images

    def load(self, paths: Sequence[str]) -> np.ndarray:
        out = np.empty((len(paths), RESIZE_SIZE, RESIZE_SIZE, 3), np.uint8)
        for i, p in enumerate(paths):
            row = self._index.get(p)
            if row is None:
                # basename fallback (infer file lists may carry bare
                # filenames, or absolute paths against a pack of relative
                # ones) — but only where the directory components AGREE
                # (_path_suffix_match): a unique basename in a DIFFERENT
                # directory must refuse, not silently serve that image.
                cands = self._by_base.get(os.path.basename(p), ())
                hits = [(r, f) for r, f in cands if _path_suffix_match(p, f)]
                if len(hits) > 1:
                    raise KeyError(
                        f"{p!r} matches multiple packed images by basename "
                        "— pass the relative filepath recorded in the "
                        "pack's caption lines instead.")
                if len(hits) == 1:
                    row = hits[0][0]
                elif cands:
                    raise KeyError(
                        f"{p!r} is not in the packed dataset; entries "
                        "sharing its basename exist but in different "
                        f"directories ({[f for _, f in cands]!r}) — "
                        "refusing the basename fallback.")
            if row is None:
                raise KeyError(f"{p!r} is not in the packed dataset")
            self._images.read_direct(out, np.s_[row], np.s_[i])
        return out

    def close(self):
        self._f.close()


def _prefetch(gen: Iterator, depth: int,
              registry: Optional[list] = None) -> Iterator:
    """Run `gen` in a background thread with a bounded queue.

    A worker exception is re-raised in the consumer (a corrupt image must
    fail the epoch loudly, not silently truncate it).

    Abandonment safety: the worker's queue puts poll a stop event, the
    consumer generator signals it and joins the thread in its `finally`
    (so dropping the iterator mid-epoch doesn't leave a thread blocked on
    q.put holding the loader), and callers may pass `registry` to receive
    the (stop_event, thread) pair — a pipeline's close() sets/joins those
    BEFORE closing its loader, because an exception propagating out of a
    consumer keeps the generator alive in the traceback, so the finally
    may not have run yet when close() is called (and closing an HDF5
    loader under a worker mid-read is not thread-safe)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    _ERR = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not put(item):
                    return
            put(_END)
        except BaseException as e:  # re-raised on the consumer side
            put((_ERR, e))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    if registry is not None:
        registry.append((stop, t))

    def consume():
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] is _ERR:
                    raise item[1]
                yield item
        finally:
            stop.set()
            # unblock a worker waiting on a full queue, then wait out any
            # in-flight loader read (ms-scale) so the loader can be closed
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=10.0)

    return consume()


class TrainPipeline:
    """Training/eval batches of (images_u8, caption_ids).

    One instance per split. Mirrors InputManager/_Radix/_Char semantics and
    mutates the config with derived fields (split_sizes, max_step) the same
    way the reference does (manager_image_caption.py:55,132,141).
    """

    def __init__(self, config: Config, vocab: Vocabulary, split: str,
                 records: Optional[List[Tuple[str, List[str]]]] = None,
                 num_workers: int = 8, seed: Optional[int] = None,
                 shard_by_process: bool = True):
        self.config = config
        self.split = split
        self.is_training = "train" in split
        if config.token_type == "char":
            vocab = build_char_vocab()
            config.wtoi, config.itow = vocab.wtoi, dict(vocab.itow)
            config.vocab_size = len(vocab.itow)
        self.vocab = vocab
        if records is None:
            records = cap_io.read_caption_file(cap_io.caption_file_path(
                config.dataset_dir, config.dataset_file_pattern, split))

        # Pre-encode captions once (cheap, avoids per-epoch
        # re-tokenization). Records/encoded stay GLOBAL on every host: the
        # data-derived overflow bucket bound, the shuffled batch order
        # (same rand_seed) and every bucket width are then identical
        # across hosts, and each host materializes only its contiguous
        # BLOCK of every batch (_make_batch) — the layout
        # jax.make_array_from_process_local_data / mesh.global_batch
        # expects for the train step's batch-sharded inputs.
        encoded: List[np.ndarray] = [
            encode_caption_tokens(toks, config.token_type, vocab,
                                  config.radix_base)
            for _, toks in records
        ]
        self.global_size = len(records)
        max_len = max((len(r) for r in encoded), default=0)
        self._n_proc, self._pid = 1, 0
        if shard_by_process and self.is_training:
            import jax

            if jax.process_count() > 1:
                self._n_proc = jax.process_count()
                self._pid = jax.process_index()
        self.records = records
        self._encoded = encoded
        self.bounds = bucket_boundaries(config, vocab,
                                        max_encoded_len=max_len)
        self.batch_size = (config.batch_size_train if self.is_training
                           else config.batch_size_eval)
        self.loader = _ImageLoaderPool(
            num_workers, mode=host_resize_mode(config, self.is_training),
            tf1_exact=bool(config.get("host_resize_tf1")),
            seed=config.rand_seed)
        self.rng = random.Random(
            seed if seed is not None else config.rand_seed)

        if config.split_sizes is None:
            config.split_sizes = {}
        # Global quantities, identical on every host (anything else would
        # desynchronize the lockstep train loop and deadlock the final
        # collective). One step consumes a GLOBAL batch of
        # batch_size * n_proc rows (each host contributes batch_size).
        # split_sizes records the full split like the reference
        # (manager_image_caption.py:55).
        config.split_sizes[split] = self.global_size
        if self.is_training:
            config.max_step = int(
                self.global_size / (self.batch_size * self._n_proc)
                * config.max_epoch)
        else:
            # eval split must tile exactly (manager:123,145; train_fn.py:326)
            if len(records) % self.batch_size != 0:
                raise ValueError(
                    f"Eval batch size {self.batch_size} must divide eval "
                    f"split size {len(records)}")

    @property
    def steps_per_epoch(self) -> int:
        # global-count based so every host derives the same logging /
        # checkpoint cadence (see the max_step note in __init__)
        return self.global_size // (self.batch_size * self._n_proc)

    def _epoch_order(self) -> List[int]:
        order = list(range(len(self.records)))
        if self.is_training:
            self.rng.shuffle(order)
        return order

    def _batches_of_indices(self) -> Iterator[List[int]]:
        """Yield bucket-homogeneous index batches covering one epoch.

        Training batches are GLOBAL (batch_size * n_proc indices; each
        host later takes its block in _make_batch)."""
        group = (self.batch_size * self._n_proc if self.is_training
                 else self.batch_size)
        buckets: List[List[int]] = [[] for _ in self.bounds]
        for idx in self._epoch_order():
            b = pick_bucket(len(self._encoded[idx]), self.bounds)
            buckets[b].append(idx)
            if len(buckets[b]) == group:
                yield buckets[b]
                buckets[b] = []
        if not self.is_training:
            # eval: flush per-bucket leftovers as mixed batches (each padded
            # to the widest member's bound). Mixing buckets is numerically
            # safe — padding is loss-masked — and needed for full coverage.
            # The constructor enforces batch_size | split size, and every
            # bucket batch above is full, so leftovers always tile exactly.
            rest = [i for b in buckets for i in b]
            assert len(rest) % self.batch_size == 0, (
                "eval leftovers must tile the batch size "
                f"({len(rest)} % {self.batch_size})")
            for lo in range(0, len(rest), self.batch_size):
                yield rest[lo: lo + self.batch_size]

    def _make_batch(self, idxs: List[int]) -> Tuple[np.ndarray, np.ndarray]:
        rows = [self._encoded[i] for i in idxs]
        # width from the FULL (global) batch, BEFORE the per-process block
        # slice: every host must pad to the same compiled shape
        width = self.bounds[max(pick_bucket(len(r), self.bounds) for r in rows)]
        if self._n_proc > 1:
            # multi-host: idxs is a GLOBAL batch of batch_size * n_proc
            # rows; this host materializes (and decodes images for) only
            # its contiguous block — the layout mesh.global_batch expects
            blk = len(idxs) // self._n_proc
            idxs = idxs[self._pid * blk: (self._pid + 1) * blk]
            rows = rows[self._pid * blk: (self._pid + 1) * blk]
        caps = pad_rows(rows, width)
        paths = [cap_io.pjoin(self.config.dataset_dir, self.records[i][0])
                 for i in idxs]
        images = self.loader.load(paths)
        return images, caps

    def epoch(self, prefetch_depth: int = 4
              ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """One pass over the split.

        Eval splits get FULL coverage (leftover flush above). On a training
        split this is a one-epoch SAMPLE: per-bucket leftovers (< batch_size
        rows each) are dropped and bucket state resets — fine for tests and
        probes, but the training loop must use ``iter(pipe)``, whose bucket
        state persists across epochs (see __iter__)."""
        gen = (self._make_batch(idxs) for idxs in self._batches_of_indices())
        return _prefetch(gen, prefetch_depth)

    def __iter__(self):
        if not self.is_training:
            def eval_gen():
                while True:
                    yield from self.epoch()

            return eval_gen()
        # Training: bucket state persists ACROSS epoch boundaries, like the
        # reference's repeated tf.data + bucket_by_sequence_length
        # (manager_image_caption.py:132-145). Resetting buckets per epoch
        # starves forever when no single bucket fills a batch within one
        # epoch (tiny datasets / large batches).

        group = self.batch_size * self._n_proc  # global rows per step

        def gen():
            buckets: List[List[int]] = [[] for _ in self.bounds]
            while True:
                for idx in self._epoch_order():
                    b = pick_bucket(len(self._encoded[idx]), self.bounds)
                    buckets[b].append(idx)
                    if len(buckets[b]) == group:
                        yield self._make_batch(buckets[b])
                        buckets[b] = []

        return _prefetch(gen(), 4)


class ScstPipeline:
    """SCST batches: (images_u8, list of per-image reference strings).

    No bucketing, remainder dropped (manager_image_caption.py:360-474).
    """

    def __init__(self, config: Config, vocab: Vocabulary,
                 records: Optional[List[Tuple[str, List[str]]]] = None,
                 num_workers: int = 8, seed: Optional[int] = None):
        self.config = config
        self.vocab = vocab
        if records is None:
            raw = cap_io.read_caption_file(cap_io.caption_file_path(
                config.dataset_dir, config.dataset_file_pattern, "train"))
            records = cap_io.group_by_image(raw)
        self.records = records
        self.batch_size = config.batch_size_train
        self.loader = _ImageLoaderPool(
            num_workers, mode=host_resize_mode(config, True),
            tf1_exact=bool(config.get("host_resize_tf1")),
            seed=config.rand_seed)
        self.rng = random.Random(
            seed if seed is not None else config.rand_seed)
        if config.split_sizes is None:
            config.split_sizes = {}
        config.split_sizes["train"] = len(records)
        config.max_step = int(
            len(records) / self.batch_size * config.max_epoch)

    def epoch(self, prefetch_depth: int = 4):
        order = list(range(len(self.records)))
        self.rng.shuffle(order)

        def gen():
            for lo in range(0, len(order) - self.batch_size + 1,
                            self.batch_size):
                idxs = order[lo: lo + self.batch_size]
                paths = [cap_io.pjoin(self.config.dataset_dir,
                                      self.records[i][0]) for i in idxs]
                refs = [self.records[i][1] for i in idxs]
                yield self.loader.load(paths), refs

        return _prefetch(gen(), prefetch_depth)

    def __iter__(self):
        while True:
            yield from self.epoch()


class InferencePipeline:
    """Inference batches: (images_u8, filepaths). Requires the file count to
    tile the batch size exactly (manager_image_caption.py:64-80)."""

    def __init__(self, config: Config, files: Optional[List[str]] = None,
                 num_workers: int = 8):
        self.config = config
        if files is None:
            files = cap_io.infer_file_list(
                config.dataset_dir, config.infer_set,
                config.dataset_file_pattern)
        self.files = files
        self.batch_size = config.batch_size_infer
        if len(files) % self.batch_size != 0:
            raise ValueError(
                f"Infer batch size {self.batch_size} must divide file "
                f"count {len(files)}")
        packed = config.get("packed_dataset")
        if packed:
            self.loader = PackedImageSource(
                packed, mode=host_resize_mode(config, False),
                tf1_exact=bool(config.get("host_resize_tf1")))
        else:
            self.loader = _ImageLoaderPool(
                num_workers, mode=host_resize_mode(config, False),
                tf1_exact=bool(config.get("host_resize_tf1")))
        self._join_dataset_dir = not packed  # packed rows key on rel paths
        self._prefetchers: list = []

    def __iter__(self):
        def gen():
            for lo in range(0, len(self.files), self.batch_size):
                chunk = self.files[lo: lo + self.batch_size]
                paths = (
                    [cap_io.pjoin(self.config.dataset_dir, f)
                     for f in chunk]
                    if self._join_dataset_dir else chunk)
                yield self.loader.load(paths), chunk

        return _prefetch(gen(), 4, registry=self._prefetchers)

    def __len__(self):
        return len(self.files) // self.batch_size

    def close(self):
        """Release the loader (h5 file handle / thread pool). A long
        checkpoint sweep builds one pipeline and must not pin the pack
        or leak descriptors across repeated constructions. Prefetch
        workers are stopped and joined FIRST: when an exception is
        unwinding, the epoch generator's own cleanup may not have run yet
        (it is pinned alive by the traceback), and closing the HDF5
        handle under a worker mid-read is not thread-safe."""
        for stop, _ in self._prefetchers:
            stop.set()
        for _, t in self._prefetchers:
            t.join(timeout=10.0)
        self._prefetchers.clear()
        self.loader.close()
