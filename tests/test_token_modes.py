"""End-to-end smokes for the word/char token types and legacy mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comic_tpu.configuration import Config
from comic_tpu.data.synthetic import make_synthetic_dataset
from comic_tpu.models.captioner import build_model_spec, init_params, xe_forward
from comic_tpu.tokenization import Vocabulary, build_char_vocab
from comic_tpu.training.xe import train_fn


def _base_config(root, **kw):
    d = dict(dataset_dir=root, dataset_file_pattern="synth_{}",
             batch_size_train=4, batch_size_eval=4, max_epoch=1, rnn_size=32,
             rnn_word_size=16, attn_num_heads=2, compute_dtype="float32",
             cnn_input_size=(64, 64), dropout_rnn_in=0.0, dropout_rnn_out=0.0,
             attn_keep_prob=1.0, freeze_scopes="", rand_seed=0,
             lr_start=1e-3, lr_end=1e-4)
    d.update(kw)
    return Config(**d)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("modes")
    return make_synthetic_dataset(str(root), num_train=8, num_valid=4,
                                  num_test=4, captions_per_image=1)


@pytest.mark.slow
class TestTokenModes:
    def test_word_training_step(self, synth, tmp_path):
        root, _ = synth
        c = _base_config(root, token_type="word",
                         log_path=str(tmp_path / "w"))
        m = train_fn(c, max_steps_override=2)
        assert np.isfinite(m["total_loss"])

    def test_char_training_step(self, synth, tmp_path):
        root, _ = synth
        c = _base_config(root, token_type="char",
                         log_path=str(tmp_path / "c"))
        m = train_fn(c, max_steps_override=2)
        assert np.isfinite(m["total_loss"])
        # char vocab was injected into the config (manager behavior)
        assert c.wtoi["<GO>"] == 38

    def test_legacy_training_smoke(self, synth, tmp_path):
        """Legacy mode through the full XE driver: halving LR schedule,
        project_hidden init, LN-tanh head (train.py:178-200)."""
        root, _ = synth
        c = _base_config(root, token_type="radix", radix_base=8,
                         legacy=True, rnn_init_method="project_hidden",
                         adam_epsilon=1e-6, lr_reduce_every_n_epochs=4,
                         log_path=str(tmp_path / "l"))
        m = train_fn(c, max_steps_override=2)
        assert np.isfinite(m["total_loss"])

    def test_legacy_forward(self):
        """Legacy mode: project_hidden init + LN-tanh/linear image head
        (train.py:178-200, model_base.py:80-91,657-672)."""
        wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
        c = Config(legacy=True, token_type="radix", radix_base=8,
                   rnn_size=16, rnn_word_size=8, attn_num_heads=2,
                   rnn_init_method="project_hidden", attn_keep_prob=1.0,
                   dropout_rnn_in=0.0, dropout_rnn_out=0.0,
                   compute_dtype="float32")
        spec = build_model_spec(c, Vocabulary(wtoi))
        assert spec.legacy and spec.decoder.init_method == "project_hidden"
        assert spec.decoder.image_embed_size == 1024
        params = init_params(jax.random.PRNGKey(0), spec)
        assert "LN_tanh" in params["encoder"] and "im_embed" in params["encoder"]
        assert "rnn_initial_state" in params["decoder"]
        images = jnp.zeros((2, 64, 64, 3))
        caps = jnp.asarray([[8, 0, 9, -1], [8, 1, 1, 9]])
        loss, aux = xe_forward(params, spec, images, caps)
        assert np.isfinite(float(loss))

    def test_gru_and_ln_lstm_forward(self):
        wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
        for rnn in ("GRU", "LN_LSTM"):
            c = Config(token_type="radix", radix_base=8, rnn_size=16,
                       rnn_word_size=8, attn_num_heads=2, rnn_name=rnn,
                       compute_dtype="float32", dropout_rnn_in=0.0,
                       dropout_rnn_out=0.0, attn_keep_prob=1.0)
            spec = build_model_spec(c, Vocabulary(wtoi))
            params = init_params(jax.random.PRNGKey(0), spec)
            loss, _ = xe_forward(params, spec, jnp.zeros((1, 64, 64, 3)),
                                 jnp.asarray([[8, 0, 9, -1]]))
            assert np.isfinite(float(loss)), rnn

    def test_gru_beam_decode(self):
        from comic_tpu.decoding import beam_search

        wtoi = {"<PAD>": -1, "w": 0, "<UNK>": 1, "<GO>": 2, "<EOS>": 3}
        c = Config(token_type="radix", radix_base=8, rnn_size=16,
                   rnn_word_size=8, attn_num_heads=2, rnn_name="GRU",
                   compute_dtype="float32")
        spec = build_model_spec(c, Vocabulary(wtoi))
        params = init_params(jax.random.PRNGKey(0), spec)
        top, _ = beam_search(params, spec, jnp.zeros((2, 64, 64, 3)),
                             beam_size=3, max_steps=6)
        assert top.ids.shape == (2, 6)
