"""Input pipeline, preprocessing, and synthetic fixture tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.configuration import Config
from comic_tpu.data import captions as cap_io
from comic_tpu.data.pipeline import (
    InferencePipeline,
    ScstPipeline,
    TrainPipeline,
    bucket_boundaries,
    pad_rows,
    pick_bucket,
)
from comic_tpu.data.preprocessing import (
    central_crop_or_pad,
    preprocess_batch,
    resize_bilinear_tf1,
)
from comic_tpu.data.synthetic import make_synthetic_dataset
from comic_tpu.tokenization import Vocabulary


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_dataset(str(root), num_train=12, num_valid=4,
                                  num_test=4)


class TestPreprocessing:
    def test_resize_bilinear_tf1_matches_tf(self, rng):
        tf = pytest.importorskip("tensorflow")
        x = rng.random((5, 7, 3)).astype(np.float32)
        got = resize_bilinear_tf1(jnp.asarray(x), 8, 10)
        want = tf.compat.v1.image.resize_bilinear(x[None], (8, 10))[0]
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)

    def test_central_crop(self):
        x = jnp.arange(6 * 6 * 1, dtype=jnp.float32).reshape(6, 6, 1)
        y = central_crop_or_pad(x, 4, 4)
        np.testing.assert_allclose(y[0, 0, 0], x[1, 1, 0])

    def test_central_pad(self):
        x = jnp.ones((2, 2, 3))
        y = central_crop_or_pad(x, 4, 4)
        assert y.shape == (4, 4, 3)
        assert float(y[0, 0, 0]) == 0.0 and float(y[1, 1, 0]) == 1.0

    def test_eval_batch_range_and_shape(self):
        u8 = jnp.full((2, 256, 256, 3), 255, jnp.uint8)
        out = preprocess_batch(u8, jax.random.PRNGKey(0), 224, 224, False)
        assert out.shape == (2, 224, 224, 3)
        np.testing.assert_allclose(out, 1.0, atol=1e-6)
        u8z = jnp.zeros((1, 256, 256, 3), jnp.uint8)
        out = preprocess_batch(u8z, jax.random.PRNGKey(0), 224, 224, False)
        np.testing.assert_allclose(out, -1.0, atol=1e-6)

    def test_train_batch_is_random_crop(self):
        u8 = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (3, 256, 256, 3),
                                              dtype=np.uint8))
        a = preprocess_batch(u8, jax.random.PRNGKey(1), 224, 224, True)
        b = preprocess_batch(u8, jax.random.PRNGKey(2), 224, 224, True)
        assert a.shape == (3, 224, 224, 3)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        arr = np.asarray(a)
        assert arr.min() >= -1.0 - 1e-5 and arr.max() <= 1.0 + 1e-5


class TestBuckets:
    def test_word_coco(self):
        v = Vocabulary({"<PAD>": -1, "a": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3})
        c = Config(token_type="word",
                   dataset_file_pattern="mscoco_{}_w5_s20_include_restval")
        assert bucket_boundaries(c, v) == [11, 13, 15, 22]

    def test_word_insta(self):
        v = Vocabulary({"<PAD>": -1, "a": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3})
        c = Config(token_type="word", dataset_file_pattern="insta_{}_v25595")
        assert bucket_boundaries(c, v) == [7, 10, 13, 22]

    def test_radix_scaling(self):
        # vocab of 300 entries, base 16 -> width 3
        wtoi = {"<PAD>": -1, "<UNK>": 296, "<GO>": 297, "<EOS>": 298}
        for i in range(296):
            wtoi[f"w{i}"] = i
        v = Vocabulary(wtoi)
        c = Config(token_type="radix", radix_base=16,
                   dataset_file_pattern="mscoco_{}")
        assert bucket_boundaries(c, v) == [33, 39, 45, 62]

    def test_char(self):
        v = Vocabulary({"<PAD>": -1, "<UNK>": 0, "<GO>": 1, "<EOS>": 2})
        c = Config(token_type="char", dataset_file_pattern="mscoco_{}")
        assert bucket_boundaries(c, v)[:3] == [45, 55, 70]

    def test_overflow_bound_raised_to_real_data(self):
        # the static overflow cap underestimates e.g. char captions whose
        # words average > 5 chars, or datasets prepped with a larger
        # --caption_len_thres; pad_rows would then TRUNCATE (dropping
        # <EOS>) where the reference's dynamic padding never does — the
        # bound must stretch to the longest encoded caption
        v = Vocabulary({"<PAD>": -1, "<UNK>": 0, "<GO>": 1, "<EOS>": 2})
        c = Config(token_type="char", dataset_file_pattern="mscoco_{}")
        assert bucket_boundaries(c, v, max_encoded_len=161)[-1] == 161
        # ...and is left alone when the data fits the static cap
        assert bucket_boundaries(c, v, max_encoded_len=60)[-1] == 122

    def test_long_captions_never_truncated(self, synth):
        # pipeline-level: a caption longer than the static overflow cap
        # keeps its <EOS> (bound derived from the data, not the heuristic)
        root, vocab = synth
        import comic_tpu.data.captions as cap_io
        c = Config(token_type="radix", radix_base=16, dataset_dir=root,
                   dataset_file_pattern="synth_{}", batch_size_train=4,
                   batch_size_eval=4, max_epoch=2)
        records = cap_io.read_caption_file(cap_io.caption_file_path(
            root, "synth_{}", "train"))
        # graft one extra-long caption, well past the s20-derived cap
        fname, toks = records[0]
        records[0] = (fname, [toks[0]] + toks[1:-1] * 12 + [toks[-1]])
        pipe = TrainPipeline(c, vocab, "train", records=records, seed=0)
        enc = pipe._encoded[0]
        assert pipe.bounds[-1] >= len(enc)
        _, caps = pipe._make_batch([0, 1, 2, 3])
        np.testing.assert_array_equal(caps[0][: len(enc)], enc)
        assert (caps[0][len(enc):] == -1).all()

    def test_pick_and_pad(self):
        bounds = [4, 8]
        assert pick_bucket(3, bounds) == 0
        assert pick_bucket(5, bounds) == 1
        assert pick_bucket(99, bounds) == 1
        out = pad_rows([np.asarray([1, 2]), np.asarray([3])], 4)
        np.testing.assert_array_equal(out, [[1, 2, -1, -1], [3, -1, -1, -1]])


class TestCaptionIO:
    def test_roundtrip(self, synth):
        root, vocab = synth
        recs = cap_io.read_caption_file(
            cap_io.caption_file_path(root, "synth_{}", "train"))
        assert len(recs) == 24  # 12 images x 2 captions
        fp, toks = recs[0]
        assert toks[0] == "<GO>" and toks[-1] == "<EOS>"
        v2 = cap_io.load_vocab(root, "synth_{}")
        assert v2.wtoi == vocab.wtoi

    def test_group_by_image(self, synth):
        root, _ = synth
        recs = cap_io.read_caption_file(
            cap_io.caption_file_path(root, "synth_{}", "train"))
        grouped = cap_io.group_by_image(recs)
        assert len(grouped) == 12
        fp, refs = grouped[0]
        assert len(refs) == 2
        assert "<GO>" not in refs[0] and "<EOS>" not in refs[0]

    def test_infer_file_list(self, synth):
        root, _ = synth
        files = cap_io.infer_file_list(root, "test", "synth_{}")
        assert len(files) == 4

    def test_coco_image_id(self):
        assert cap_io.coco_image_id("val/COCO_val2014_000000123456.jpg") == 123456


class TestPipelines:
    def _config(self, root, **kw):
        d = dict(token_type="radix", radix_base=16, dataset_dir=root,
                 dataset_file_pattern="synth_{}", batch_size_train=4,
                 batch_size_eval=4, max_epoch=2, batch_size_infer=2)
        d.update(kw)
        return Config(**d)

    def test_train_pipeline(self, synth):
        root, vocab = synth
        c = self._config(root)
        pipe = TrainPipeline(c, vocab, "train", seed=0)
        assert c.split_sizes["train"] == 24
        assert c.max_step == 12
        batches = list(pipe.epoch())
        assert len(batches) >= 5  # 24/4 = 6 minus bucket remainders
        images, caps = batches[0]
        assert images.shape == (4, 256, 256, 3) and images.dtype == np.uint8
        assert caps.shape[0] == 4 and caps.dtype == np.int32
        bounds = bucket_boundaries(c, vocab)
        assert caps.shape[1] in bounds
        # captions start with radix GO digit
        assert (caps[:, 0] == 16).all()

    def test_train_shuffles_between_epochs(self, synth):
        root, vocab = synth
        c = self._config(root)
        pipe = TrainPipeline(c, vocab, "train", seed=0)
        e1 = [tuple(b[1][:, 0].tolist()) and b[1].shape for b in pipe.epoch()]
        it = iter(pipe)
        next(it)  # consumes through epochs without error
        assert len(e1) > 0

    def test_train_buckets_persist_across_epochs(self, synth):
        """Batch sizes larger than any single epoch's per-bucket count must
        still yield batches: bucket state carries across epoch boundaries
        like the reference's repeated tf.data bucketing (regression for an
        infinite-spin starvation with batch 8 over mixed-length captions)."""
        root, vocab = synth
        c = self._config(root, batch_size_train=23)  # > any bucket/epoch
        pipe = TrainPipeline(c, vocab, "train", seed=0)
        it = iter(pipe)
        images, caps = next(it)  # must not spin forever
        assert images.shape[0] == 23 and caps.shape[0] == 23

    def test_eval_divisibility_enforced(self, synth):
        root, vocab = synth
        c = self._config(root, batch_size_eval=3)
        with pytest.raises(ValueError):
            TrainPipeline(c, vocab, "valid")

    def test_scst_pipeline(self, synth):
        root, vocab = synth
        c = self._config(root, batch_size_train=4)
        pipe = ScstPipeline(c, vocab)
        images, refs = next(iter(pipe.epoch()))
        assert images.shape == (4, 256, 256, 3)
        assert len(refs) == 4 and isinstance(refs[0][0], str)

    def test_infer_pipeline(self, synth):
        root, vocab = synth
        c = self._config(root, infer_set="test")
        pipe = InferencePipeline(c)
        assert len(pipe) == 2
        images, files = next(iter(pipe))
        assert images.shape == (2, 256, 256, 3)
        assert files[0].startswith("images/")

    def _pack_synth(self, root, vocab, tmp_path):
        import os

        from comic_tpu.prepro.base import serialise_everything

        txt = {}
        for split in ("train", "valid", "test"):
            p = os.path.join(root, "captions", f"synth_{split}.txt")
            with open(p) as f:
                txt[split] = [ln.strip() for ln in f if ln.strip()]
        return serialise_everything(
            str(tmp_path / "packed"), root, (256, 256), 2, txt,
            vocab.wtoi, vocab.itow)

    def test_infer_pipeline_packed_matches_file_loader(self, synth,
                                                       tmp_path):
        """The packed-h5 image source yields byte-identical batches to the
        per-file JPEG loader (both run decode_image_host + _resize_host;
        the pack just does it at prepro time)."""
        pytest.importorskip("h5py")
        root, vocab = synth
        h5_path = self._pack_synth(root, vocab, tmp_path)

        c1 = self._config(root, infer_set="test")
        c2 = self._config(root, infer_set="test", packed_dataset=h5_path)
        for (im1, f1), (im2, f2) in zip(InferencePipeline(c1),
                                        InferencePipeline(c2)):
            assert list(f1) == list(f2)
            np.testing.assert_array_equal(im1, im2)

    def test_packed_refuses_aspect_and_tf1(self, synth, tmp_path):
        """Packed images are square-resized at pack time: a vgg-family
        (aspect-preserving) config or host_resize_tf1 would silently get
        different pixels — both must refuse."""
        pytest.importorskip("h5py")
        root, vocab = synth
        h5_path = self._pack_synth(root, vocab, tmp_path)
        c = self._config(root, infer_set="test", packed_dataset=h5_path,
                         cnn_name="vgg_16")
        with pytest.raises(ValueError, match="aspect|square"):
            InferencePipeline(c)
        c = self._config(root, infer_set="test", packed_dataset=h5_path,
                         host_resize_tf1=True)
        with pytest.raises(ValueError, match="host_resize_tf1"):
            InferencePipeline(c)

    def test_close_joins_abandoned_prefetch_worker(self, synth, tmp_path):
        """Dropping a pipeline iterator mid-epoch leaves its prefetch
        worker blocked on the bounded queue (6 batches vs the depth-4
        queue); close() must stop and JOIN it BEFORE closing the loader —
        closing the h5 handle under a worker mid-read is not thread-safe
        — and the handle must actually close."""
        pytest.importorskip("h5py")
        from comic_tpu.data.pipeline import InferencePipeline
        root, vocab = synth
        h5_path = self._pack_synth(root, vocab, tmp_path)
        c = self._config(root, infer_set="test", packed_dataset=h5_path)
        pipe = InferencePipeline(c)
        it = iter(pipe)
        next(it)  # consume one batch; the worker stays blocked mid-epoch
        assert len(pipe._prefetchers) == 1
        _, worker = pipe._prefetchers[0]
        pipe.close()
        assert not worker.is_alive()
        with pytest.raises(Exception):  # h5 handle really closed
            pipe.loader.load([pipe.files[0]])

    def test_packed_basename_collision_refuses_bare_lookup(self, synth,
                                                           tmp_path):
        """Two packed filepaths sharing a basename (train2014/x.jpg +
        val2014/x.jpg) must poison the bare-filename fallback: serving
        whichever row happened to be indexed first would silently caption
        the wrong image. Full relative paths still resolve."""
        h5py = pytest.importorskip("h5py")
        from comic_tpu.data.pipeline import PackedImageSource
        root, vocab = synth
        h5_path = self._pack_synth(root, vocab, tmp_path)
        with h5py.File(h5_path, "r+") as f:
            lines = [ln.decode() if isinstance(ln, bytes) else ln
                     for ln in f["test"][:]]
            row0, path0 = lines[0].split(",", 2)[:2]
            row1 = next(ln.split(",", 2)[0] for ln in lines
                        if ln.split(",", 2)[0] != row0)
            base = path0.rsplit("/", 1)[-1]
            clash = f"{row1},other_dir/{base},a clashing caption"
            del f["test"]
            f.create_dataset(
                "test", data=np.asarray(lines + [clash], dtype=object),
                dtype=h5py.string_dtype())
        src = PackedImageSource(h5_path)
        try:
            # full relative paths remain unambiguous
            assert src.load([path0]).shape == (1, 256, 256, 3)
            with pytest.raises(KeyError, match="multiple packed images"):
                src.load([base])
        finally:
            src.close()

    def test_packed_basename_fallback_checks_directory(self, synth,
                                                       tmp_path):
        """The bare-basename fallback only fires when the query's
        directory components AGREE with the packed path's (trailing-suffix
        match): a unique basename in a DIFFERENT directory must refuse —
        it previously served that other directory's image silently. An
        absolute query whose tail matches the packed relative path still
        resolves."""
        pytest.importorskip("h5py")
        from comic_tpu.data.pipeline import PackedImageSource
        root, vocab = synth
        h5_path = self._pack_synth(root, vocab, tmp_path)
        src = PackedImageSource(h5_path)
        try:
            path0 = next(iter(src._index))
            base = path0.rsplit("/", 1)[-1]
            want = src.load([path0])
            # bare unique basename -> resolves (the documented use case)
            np.testing.assert_array_equal(src.load([base]), want)
            # absolute path with a matching component tail -> resolves
            np.testing.assert_array_equal(
                src.load(["/abs/data/" + path0]), want)
            # same basename, WRONG directory -> refuses loudly
            with pytest.raises(KeyError, match="different directories"):
                src.load(["elsewhere/" + base])
        finally:
            src.close()

    def test_rejected_pack_closes_handle(self, synth, tmp_path,
                                         monkeypatch):
        """A pack whose index build fails (malformed caption line) must
        close the just-opened h5 handle — a retry loop over candidate
        packs would otherwise accumulate descriptors. The index build
        runs inside the constructor's close-on-error guard."""
        h5py = pytest.importorskip("h5py")
        from comic_tpu.data.pipeline import PackedImageSource
        root, vocab = synth
        h5_path = self._pack_synth(root, vocab, tmp_path)
        with h5py.File(h5_path, "r+") as f:
            lines = [ln.decode() if isinstance(ln, bytes) else ln
                     for ln in f["test"][:]]
            del f["test"]
            f.create_dataset(
                "test", data=np.asarray(lines + ["no-comma-line"],
                                        dtype=object),
                dtype=h5py.string_dtype())
        opened = []
        real_file = h5py.File

        def spy(*a, **k):
            fh = real_file(*a, **k)
            opened.append(fh)
            return fh

        monkeypatch.setattr(h5py, "File", spy)
        with pytest.raises(ValueError):
            PackedImageSource(h5_path)
        assert opened and all(not fh.id.valid for fh in opened)

    def test_loader_pool_refuses_load_after_close(self):
        """Use-after-close must fail loudly: the lazy `_pool is None`
        state is indistinguishable from never-opened, so load() after
        close() would silently spawn a fresh executor nothing shuts
        down."""
        from comic_tpu.data.pipeline import _ImageLoaderPool
        pool = _ImageLoaderPool(num_workers=2)
        pool.close()
        with pytest.raises(ValueError, match="closed"):
            pool.load(["whatever.jpg"])


class TestHostResize:
    def test_tf1_np_matches_tf(self, rng):
        tf = pytest.importorskip("tensorflow")
        from comic_tpu.data.preprocessing import resize_bilinear_tf1_np

        img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        got = resize_bilinear_tf1_np(img, 24, 31).astype(np.float32)
        want = tf.compat.v1.image.resize_bilinear(
            img[None].astype(np.float32), (24, 31),
            align_corners=False).numpy()[0]
        # both rounded to uint8 semantics: compare pre-rounding to 0.5 LSB
        np.testing.assert_allclose(got, np.clip(np.rint(want), 0, 255),
                                   atol=1.0)

    def test_aspect_resize_shape_math(self, rng):
        """Matches _smallest_size_at_least's int truncation
        (vgg_preprocessing.py:233-258)."""
        from comic_tpu.data.preprocessing import _aspect_resize_host

        img = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
        out = _aspect_resize_host(img, 256)
        assert out.shape[:2] == (256, int(400 * (256 / 300)))
        img = rng.integers(0, 256, (500, 200, 3), dtype=np.uint8)
        out = _aspect_resize_host(img, 256)
        assert out.shape[:2] == (int(500 * (256 / 200)), 256)

    def test_modes_fixed_output_shape(self, rng, tmp_path):
        from comic_tpu.data.preprocessing import load_and_resize_host

        try:
            import cv2
            img = rng.integers(0, 256, (300, 460, 3), dtype=np.uint8)
            path = str(tmp_path / "x.png")
            cv2.imwrite(path, img[:, :, ::-1])
        except ImportError:
            from PIL import Image
            img = rng.integers(0, 256, (300, 460, 3), dtype=np.uint8)
            path = str(tmp_path / "x.png")
            Image.fromarray(img).save(path)
        for mode in ("square", "aspect_eval", "aspect_train"):
            out = load_and_resize_host(path, mode=mode,
                                       rng=np.random.default_rng(0))
            assert out.shape == (256, 256, 3) and out.dtype == np.uint8

    def test_mode_dispatch(self, synth):
        from comic_tpu.data.pipeline import host_resize_mode

        root, _ = synth
        c = Config(cnn_name="resnet_v1_50")
        assert host_resize_mode(c, True) == "aspect_train"
        assert host_resize_mode(c, False) == "aspect_eval"
        c = Config(cnn_name="inception_v1")
        assert host_resize_mode(c, True) == "square"
        c = Config(cnn_name="vgg_19")
        assert host_resize_mode(c, False) == "aspect_eval"
