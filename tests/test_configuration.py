import os
import pickle

import pytest

from comic_tpu.configuration import RUN_SEEDS, Config, load_config


def test_defaults_match_reference():
    c = Config()
    assert c.token_type == "radix"
    assert c.radix_base == 256
    assert c.attn_num_heads == 8
    assert c.cnn_fm_projection == "tied"
    assert c.rnn_size == 512
    assert c.rnn_word_size == 256
    assert c.adam_epsilon == 1e-2
    assert c.lr_start == 1e-2 and c.lr_end == 1e-5
    assert c.batch_size_train == 32 and c.batch_size_eval == 61
    assert c.infer_beam_size == 3 and c.batch_size_infer == 25
    assert c.dropout_rnn_in == 0.35
    assert c.rnn_map_loss_scale == 1.0
    assert c.l2_decay == 1e-5


def test_none_string_coercion():
    c = Config(cnn_fm_projection="none")
    assert c.cnn_fm_projection is None


def test_cnn_input_size_string():
    c = Config(cnn_input_size="299,299")
    assert c.cnn_input_size == (299, 299)


def test_run_seeds():
    assert RUN_SEEDS == {1: 48964896, 2: 88888888, 3: 123456789}


def test_save_load_roundtrip(tmp_path):
    c = Config(name="t", log_path=str(tmp_path), rnn_size=123)
    pkl = c.save()
    assert os.path.exists(pkl)
    c2 = load_config(str(tmp_path))
    assert c2.rnn_size == 123 and c2.name == "t"


def test_load_py2_style_pickle(tmp_path):
    # protocol-2 dict with bytes values, as a py2 writer would produce
    d = {"token_type": b"radix".decode(), "rnn_size": 77}
    p = tmp_path / "config.pkl"
    with open(p, "wb") as f:
        pickle.dump(d, f, protocol=2)
    c = load_config(str(p))
    assert c.rnn_size == 77


def test_load_migrates_inert_num_data_shards(tmp_path):
    """Old config.pkls carry num_data_shards=1 (the pre-wiring default);
    loading must treat it as unset (0), not as a 1-device mesh cap."""
    p = tmp_path / "config.pkl"
    with open(p, "wb") as f:
        pickle.dump({"num_data_shards": 1, "rnn_size": 5}, f, protocol=2)
    assert load_config(str(p)).num_data_shards == 0
    # a deliberate cap of 2 survives
    with open(p, "wb") as f:
        pickle.dump({"num_data_shards": 2}, f, protocol=2)
    assert load_config(str(p)).num_data_shards == 2
    # records written by CURRENT code carry a version marker, so a
    # deliberate cap of 1 saved today round-trips unmolested
    c = Config(num_data_shards=1, log_path=str(tmp_path))
    c.save()
    loaded = load_config(str(tmp_path))
    assert loaded.num_data_shards == 1
    assert "_comic_tpu_config_version" not in loaded


def test_overwrite_safety(tmp_path):
    c = Config(log_path=str(tmp_path))
    c.save()
    with pytest.raises(FileExistsError):
        Config(log_path=str(tmp_path)).overwrite_safety_check(overwrite=False)
    Config(log_path=str(tmp_path), resume_training=True).overwrite_safety_check(
        overwrite=False
    )
