"""Reference trained-model (`model_compact-N`) checkpoint conversion.

The reference publishes pretrained COMIC models as TF1 checkpoints holding
every variable under the `Model/` scope (/root/reference/src/train_fn.py:66-70,
README.md:22-23). No real pretrained models ship in this image, so these
tests manufacture genuine TF1-format checkpoints carrying every
reference-named decoder + CNN variable (full scope chains derived from
/root/reference/src/model.py:50-55, model_base.py:109-184,531-757 and
/root/reference/common/ops_rnn.py:403-565,735-739 — documented in
comic_tpu/utils/tf_checkpoint.py), then drive the full conversion path:

    TF ckpt on disk -> tf.train.load_checkpoint -> convert_reference_tree
    -> model_compact-N.msgpack -> restore_model (mode 'model')

and check the restored params are bit-identical to the planted arrays.
Optimizer slots and TF-uniquified eval-graph duplicate scopes
('decoder_1/...', 'output_projection_1/...') are planted with junk values
to verify they are skipped.
"""

import os

import numpy as np
import pytest

import jax

from comic_tpu.configuration import Config
from comic_tpu.models.captioner import build_model_spec, init_params
from comic_tpu.tokenization import PAD, UNK, GO, EOS, Vocabulary
from comic_tpu.training import checkpoints as ckpt
from comic_tpu.utils import tf_checkpoint as tfc

tf = pytest.importorskip("tensorflow")

WRAP = "Model/decoder/rnn_decoder/decoder/multi_head_attention_wrapper_v3"
RNN_DEC = "Model/decoder/rnn_decoder"


def _vocab(n_words=6):
    wtoi = {PAD: -1}
    for i in range(n_words):
        wtoi[f"w{i}"] = i
    wtoi[UNK] = n_words
    wtoi[GO] = n_words + 1
    wtoi[EOS] = n_words + 2
    return Vocabulary(wtoi)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def _rand_like(rng, tree):
    return jax.tree_util.tree_map(
        lambda x: rng.standard_normal(np.shape(x)).astype(np.float32), tree)


def _reference_var_names(config, dec_tpl):
    """comic_tpu decoder param path -> full reference TF1 variable name.

    These are the exact names a reference train graph creates (see
    tf_checkpoint.py's scope-chain derivation). The cell's variables live
    under rnn_init_input/ for the default first_input init (the first cell
    call happens there, model_base.py:673-685) and under the decode-loop
    wrapper scope for project_hidden (first call is inside the wrapper).
    """
    cell_scope = (f"{RNN_DEC}/rnn_init_input"
                  if config.rnn_init_method == "first_input" else WRAP)
    names = {
        ("embedding",): f"{RNN_DEC}/embedding_map",
        ("output_projection", "kernel"): f"{RNN_DEC}/output_projection/kernel",
        ("output_projection", "bias"): f"{RNN_DEC}/output_projection/bias",
        ("attention", "memory_layer", "kernel"):
            f"{RNN_DEC}/memory_layer/kernel",
        ("attention", "query_layer", "kernel"):
            f"{WRAP}/multi_add_attention/query_layer/kernel",
        ("attention", "v"): f"{WRAP}/multi_add_attention/attention_v",
        ("attention", "ln", "scale"):
            f"{WRAP}/multi_add_attention/LN_tanh/gamma",
        ("attention", "ln", "bias"):
            f"{WRAP}/multi_add_attention/LN_tanh/beta",
        ("attention", "softmax_temperature"): f"{WRAP}/softmax_temperature",
        ("attention", "value_layer", "kernel"):
            f"{RNN_DEC}/value_layer/kernel",
        ("attention", "a_layer", "kernel"): f"{WRAP}/a_layer/kernel",
        ("rnn_init_input", "kernel"):
            f"{RNN_DEC}/rnn_init_input/projection/weight",
        ("rnn_initial_state", "kernel"):
            f"{RNN_DEC}/rnn_initial_state/weight",
        ("cell", "kernel"): f"{cell_scope}/basic_lstm_cell/kernel",
        ("cell", "bias"): f"{cell_scope}/basic_lstm_cell/bias",
        ("cell", "gate_kernel"): f"{cell_scope}/gru_cell/gates/kernel",
        ("cell", "gate_bias"): f"{cell_scope}/gru_cell/gates/bias",
        ("cell", "cand_kernel"): f"{cell_scope}/gru_cell/candidate/kernel",
        ("cell", "cand_bias"): f"{cell_scope}/gru_cell/candidate/bias",
    }
    out = {}
    for path, _ in _flat_paths(dec_tpl):
        if path not in names:
            raise AssertionError(f"No reference name for {path}")
        out[path] = names[path]
    return out


def _flat_paths(tree, prefix=()):
    for k, v in tree.items():
        path = prefix + (k,)
        if isinstance(v, dict):
            yield from _flat_paths(v, path)
        else:
            yield path, v


def _write_tf1_checkpoint(directory, name_to_array, step=777):
    v1 = tf.compat.v1
    g = v1.Graph()
    with g.as_default():
        for name, arr in name_to_array.items():
            v1.get_variable(name, initializer=tf.constant(np.asarray(arr)))
        saver = v1.train.Saver()
        with v1.Session(graph=g) as sess:
            sess.run(v1.global_variables_initializer())
            return saver.save(
                sess, os.path.join(directory, f"model_compact-{step}"),
                write_meta_graph=False)


def _manufacture(config, rng, tmp_path, plant_junk=True):
    """Build (source arrays dict, ckpt path, template, spec) for a config."""
    vocab = _vocab()
    spec = build_model_spec(config, vocab)
    template = init_params(jax.random.PRNGKey(0), spec)
    source = _rand_like(rng, template)

    tf_vars = {}
    # CNN under Model/encoder/cnn/<RootScope>/
    root = tfc.ROOT_SCOPES[config.cnn_name]
    prefix = f"Model/encoder/cnn/{root}" if root else "Model/encoder/cnn"
    tf_vars.update(_flatten(source["encoder"]["cnn"], prefix))
    if "LN_tanh" in source["encoder"]:
        tf_vars["Model/encoder/LN_tanh/gamma"] = \
            source["encoder"]["LN_tanh"]["scale"]
        tf_vars["Model/encoder/LN_tanh/beta"] = \
            source["encoder"]["LN_tanh"]["bias"]
        tf_vars["Model/encoder/im_embed/weight"] = \
            source["encoder"]["im_embed"]["kernel"]
    names = _reference_var_names(config, template["decoder"])
    for path, leaf in _flat_paths(source["decoder"]):
        tf_vars[names[path]] = np.asarray(leaf)

    if plant_junk:
        # optimizer slots + eval-graph TF-uniquified duplicates: junk
        # values that MUST NOT survive conversion
        k = f"{RNN_DEC}/output_projection/kernel"
        tf_vars[k + "/Adam"] = np.full_like(tf_vars[k], 7.0)
        tf_vars[k + "/Adam_1"] = np.full_like(tf_vars[k], 8.0)
        tf_vars["global_step"] = np.int64(123)
        tf_vars[f"{RNN_DEC}/output_projection_1/kernel"] = \
            np.full_like(tf_vars[k], 9.0)
        dup = ("Model/decoder/rnn_decoder/decoder_1/"
               "multi_head_attention_wrapper_v3/multi_add_attention/"
               "query_layer/kernel")
        tf_vars[dup] = np.full_like(
            tf_vars[f"{WRAP}/multi_add_attention/query_layer/kernel"], 5.0)

    path = _write_tf1_checkpoint(tmp_path, tf_vars)
    return source, path, template, spec, vocab


def _assert_trees_equal(got, want, path=""):
    assert set(got) == set(want), f"key drift at {path or '<root>'}"
    for k in want:
        sub = f"{path}/{k}" if path else k
        if isinstance(want[k], dict):
            _assert_trees_equal(got[k], want[k], sub)
        else:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=sub)


class TestReferenceCheckpointConversion:
    def test_default_comic_roundtrip(self, rng, tmp_path):
        """Default COMIC config (LSTM, first_input, add_LN tied) converts
        bit-exactly and restores end to end via restore_model."""
        config = Config(token_type="radix", radix_base=32, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4)
        source, path, template, spec, vocab = _manufacture(
            config, rng, tmp_path)
        out = tfc.convert_reference_checkpoint(path, config, vocab)
        assert os.path.basename(out) == "model_compact-777.msgpack"

        params, _, step, mode = ckpt.restore_model(template, out)
        assert mode == "model" and step == 0
        _assert_trees_equal(
            jax.tree_util.tree_map(np.asarray, params), source)

    def test_gru_project_hidden_independent_context(self, rng, tmp_path):
        """Exotic combo: GRU cell (variables under the decode-loop wrapper
        scope), project_hidden init, independent values, context layer."""
        config = Config(token_type="radix", radix_base=32, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4,
                        rnn_name="GRU", rnn_init_method="project_hidden",
                        cnn_fm_projection="independent",
                        attn_context_layer=True)
        source, path, template, spec, vocab = _manufacture(
            config, rng, tmp_path)
        out = tfc.convert_reference_checkpoint(path, config, vocab)
        params, _, _, mode = ckpt.restore_model(template, out)
        assert mode == "model"
        _assert_trees_equal(
            jax.tree_util.tree_map(np.asarray, params), source)

    def test_legacy_head_word_tokens(self, rng, tmp_path):
        """Legacy mode adds the encoder LN_tanh + im_embed head
        (model_base.py:80-91); word tokens size the softmax from itow."""
        config = Config(token_type="word", legacy=True, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4)
        source, path, template, spec, vocab = _manufacture(
            config, rng, tmp_path)
        out = tfc.convert_reference_checkpoint(path, config, vocab)
        params, _, _, mode = ckpt.restore_model(template, out)
        assert mode == "model"
        _assert_trees_equal(
            jax.tree_util.tree_map(np.asarray, params), source)

    def test_missing_decoder_variable_fails_loudly(self, rng, tmp_path):
        config = Config(token_type="radix", radix_base=32, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4)
        vocab = _vocab()
        spec = build_model_spec(config, vocab)
        template = init_params(jax.random.PRNGKey(0), spec)
        source = _rand_like(rng, template)
        tf_vars = _flatten(source["encoder"]["cnn"],
                           "Model/encoder/cnn/InceptionV1")
        names = _reference_var_names(config, template["decoder"])
        for p, leaf in _flat_paths(source["decoder"]):
            tf_vars[names[p]] = np.asarray(leaf)
        del tf_vars[f"{RNN_DEC}/embedding_map"]
        path = _write_tf1_checkpoint(tmp_path, tf_vars)
        with pytest.raises(KeyError, match="embedding_map"):
            tfc.convert_reference_checkpoint(path, config, vocab)

    def test_shape_mismatch_fails_loudly(self, rng, tmp_path):
        """A wrong config/checkpoint pairing (e.g. different rnn_size)
        must raise, not silently mis-restore."""
        config = Config(token_type="radix", radix_base=32, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4)
        _, path, _, _, vocab = _manufacture(config, rng, tmp_path,
                                            plant_junk=False)
        bad = Config(token_type="radix", radix_base=32, rnn_size=32,
                     rnn_word_size=16, attn_num_heads=4)
        with pytest.raises(ValueError, match="[Ss]hape"):
            tfc.convert_reference_checkpoint(path, bad, vocab)


class TestTransparentTFRestore:
    """The load path dispatches on the on-disk artifact: a reference TF
    checkpoint restores without explicit pre-conversion (the parity
    playbook: point infer at a reference experiment dir and go)."""

    def test_restore_model_directly_from_tf_checkpoint(self, rng, tmp_path):
        config = Config(token_type="radix", radix_base=32, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4)
        source, path, template, spec, vocab = _manufacture(
            config, rng, tmp_path)
        # suffixless path, exactly what sweep_checkpoints builds
        params, _, _, mode = ckpt.restore_model(template, path)
        assert mode == "model"
        _assert_trees_equal(
            jax.tree_util.tree_map(np.asarray, params), source)

    def test_discovery_lists_tf_checkpoints(self, rng, tmp_path):
        config = Config(token_type="radix", radix_base=32, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4)
        _manufacture(config, rng, tmp_path)
        names = ckpt.select_eval_checkpoints(str(tmp_path))
        assert names == ["model_compact-777"]
        assert ckpt.list_checkpoints(str(tmp_path)) == ["model_compact-777"]

    def test_restore_model_from_raw_slim_tf_checkpoint(self, rng, tmp_path):
        """A vanilla slim ImageNet ckpt (no Model/ scope) hits the 3-way
        restore's CNN branch (model_base.py:471-484) with auto root."""
        from comic_tpu.models.encoders import get_encoder

        config = Config(token_type="radix", radix_base=32, rnn_size=64,
                        rnn_word_size=16, attn_num_heads=4)
        vocab = _vocab()
        spec = build_model_spec(config, vocab)
        template = init_params(jax.random.PRNGKey(0), spec)
        cnn_src = _rand_like(rng, template["encoder"]["cnn"])
        tf_vars = _flatten(cnn_src, "InceptionV1")
        v1 = tf.compat.v1
        g = v1.Graph()
        with g.as_default():
            for name, arr in tf_vars.items():
                v1.get_variable(name, initializer=tf.constant(arr))
            saver = v1.train.Saver()
            with v1.Session(graph=g) as sess:
                sess.run(v1.global_variables_initializer())
                path = saver.save(
                    sess, os.path.join(tmp_path, "inception_v1.ckpt"),
                    write_meta_graph=False)
        params, _, _, mode = ckpt.restore_model(template, path)
        assert mode == "cnn"
        _assert_trees_equal(
            jax.tree_util.tree_map(np.asarray,
                                   params["encoder"]["cnn"]), cnn_src)
        # decoder untouched (fresh init)
        np.testing.assert_array_equal(
            np.asarray(params["decoder"]["embedding"]),
            np.asarray(template["decoder"]["embedding"]))


@pytest.mark.slow
def test_infer_sweep_on_reference_style_experiment_dir(rng, tmp_path):
    """The parity playbook end to end: an experiment dir that looks
    exactly like a reference one — config.pkl + TF `model_compact-N`
    checkpoints, NO msgpack artifacts — sweeps through the infer driver
    with in-memory conversion (infer.py:90-107 contract)."""
    from comic_tpu.data.synthetic import make_synthetic_dataset
    from comic_tpu.inference import sweep_checkpoints
    from comic_tpu.tokenization import Vocabulary as V

    root, _ = make_synthetic_dataset(
        str(tmp_path / "d"), num_train=4, num_valid=2, num_test=4,
        captions_per_image=1)
    config = Config(
        token_type="radix", radix_base=32, dataset_dir=root,
        dataset_file_pattern="synth_{}", rnn_size=64, rnn_word_size=16,
        attn_num_heads=4, compute_dtype="float32", cnn_input_size=(64, 64),
        log_path=str(tmp_path / "ref_exp"), batch_size_infer=2,
        infer_beam_size=2, infer_max_length=8, infer_set="test")
    # vocab fields the way a finished training run records them
    from comic_tpu.data import captions as cap_io
    vv = cap_io.load_vocab(root, "synth_{}")
    config.wtoi = vv.wtoi
    config.itow = {str(k): w for k, w in vv.itow.items()}
    config.vocab_size = len(vv.itow)
    os.makedirs(config.log_path, exist_ok=True)
    config.save(config.log_path)

    # manufacture a reference-named TF checkpoint holding a full model
    vocab = V.from_str_itow(config.wtoi, config.itow)
    spec = build_model_spec(config, vocab)
    template = init_params(jax.random.PRNGKey(1), spec)
    source = _rand_like(rng, template)
    tf_vars = _flatten(source["encoder"]["cnn"],
                       "Model/encoder/cnn/InceptionV1")
    names = _reference_var_names(config, template["decoder"])
    for p, leaf in _flat_paths(source["decoder"]):
        tf_vars[names[p]] = np.asarray(leaf)
    _write_tf1_checkpoint(config.log_path, tf_vars, step=50)
    assert not any(f.endswith(".msgpack")
                   for f in os.listdir(config.log_path))

    results = sweep_checkpoints(config, get_metric_score=False)
    save_dir = [d for d in os.listdir(config.log_path)
                if d.startswith("infer_")][0]
    json_path = os.path.join(config.log_path, save_dir,
                             "captions___model_compact-50.json")
    assert os.path.exists(json_path)
    import json as _json
    with open(json_path) as f:
        caps = _json.load(f)
    assert len(caps) == 4 and {"image_id", "caption"} <= set(caps[0])

    # and the infer CLI itself (reference infer.py surface) over the same
    # dir: config.pkl reload + flag merge + TF conversion + artifacts,
    # with the fixed-length decode escape hatch exercised
    from comic_tpu.cli import infer as cli_infer

    cli_infer.main([
        "--infer_checkpoints_dir", config.log_path,
        "--dataset_dir", root,
        "--infer_set", "valid",
        "--batch_size_infer", "2",
        "--infer_beam_size", "2",
        "--infer_max_length", "8",
        "--infer_early_exit", "0",
        "--get_metric_score", "",
    ])
    valid_dirs = [d for d in os.listdir(config.log_path)
                  if d.startswith("infer_valid")]
    assert valid_dirs
    vjson = os.path.join(config.log_path, valid_dirs[0],
                         "captions___model_compact-50.json")
    with open(vjson) as f:
        assert len(_json.load(f)) == 2


@pytest.mark.slow
def test_cnn_finetune_stage_from_reference_decoder_dir(rng, tmp_path,
                                                       capsys):
    """Stage chaining off a PUBLISHED model: cnn_finetune restores the
    decoder-stage checkpoint from a reference-style dir (TF checkpoint,
    train.py:241-250 semantics) and trains."""
    from comic_tpu.data.synthetic import make_synthetic_dataset
    from comic_tpu.data import captions as cap_io
    from comic_tpu.tokenization import Vocabulary as V
    from comic_tpu.training.xe import train_fn

    root, _ = make_synthetic_dataset(
        str(tmp_path / "d"), num_train=4, num_valid=2, num_test=2,
        captions_per_image=1)
    base = dict(
        token_type="radix", radix_base=32, dataset_dir=root,
        dataset_file_pattern="synth_{}", rnn_size=32, rnn_word_size=16,
        attn_num_heads=2, compute_dtype="float32", cnn_input_size=(64, 64),
        batch_size_train=2, batch_size_eval=2, max_epoch=1,
        dropout_rnn_in=0.0, dropout_rnn_out=0.0, attn_keep_prob=1.0)

    # reference-style decoder-stage dir: TF ckpt only
    ref_dir = str(tmp_path / "ref_decoder_run")
    os.makedirs(ref_dir)
    cfg_tpl = Config(**base)
    vv = cap_io.load_vocab(root, "synth_{}")
    cfg_tpl.wtoi = vv.wtoi
    cfg_tpl.itow = {str(k): w for k, w in vv.itow.items()}
    vocab = V.from_str_itow(cfg_tpl.wtoi, cfg_tpl.itow)
    spec = build_model_spec(cfg_tpl, vocab)
    template = init_params(jax.random.PRNGKey(2), spec)
    source = _rand_like(rng, template)
    tf_vars = _flatten(source["encoder"]["cnn"],
                       "Model/encoder/cnn/InceptionV1")
    names = _reference_var_names(cfg_tpl, template["decoder"])
    for p, leaf in _flat_paths(source["decoder"]):
        tf_vars[names[p]] = np.asarray(leaf)
    _write_tf1_checkpoint(ref_dir, tf_vars, step=100)

    # cnn_finetune: restore the whole Model from the decoder dir,
    # unfreeze the CNN (train.py:241-250)
    c = Config(**base, log_path=str(tmp_path / "ft"),
               checkpoint_path=ref_dir, freeze_scopes="",
               train_mode="cnn_finetune", lr_start=1e-3)
    train_fn(c, max_steps_override=2)
    out = capsys.readouterr().out
    assert "restore mode = model" in out
    assert ckpt.list_checkpoints(c.log_path)


class TestReferenceDirCoexistence:
    """Fresh training artifacts must coexist safely with reference TF
    checkpoints in the same experiment dir (the fine-tune-from-published-
    model workflow)."""

    def test_prune_never_touches_or_counts_tf_checkpoints(self, tmp_path):
        import flax.serialization as ser

        # 12 reference TF checkpoints at high step numbers
        tf_vars = {"Model/decoder/rnn_decoder/embedding_map":
                   np.zeros((4, 2), np.float32)}
        v1 = tf.compat.v1
        g = v1.Graph()
        with g.as_default():
            for name, arr in tf_vars.items():
                v1.get_variable(name, initializer=tf.constant(arr))
            saver = v1.train.Saver(max_to_keep=None)
            with v1.Session(graph=g) as sess:
                sess.run(v1.global_variables_initializer())
                for step in range(100000, 100012):
                    saver.save(sess, str(tmp_path / f"model_compact-{step}"),
                               write_meta_graph=False)
        # a fresh run saves low-step msgpack checkpoints with keep=3
        for step in (1, 2, 3):
            ckpt.save_checkpoint(str(tmp_path), step,
                                 {"w": np.float32(step)}, max_saves=3)
        names = os.listdir(str(tmp_path))
        # all 12 TF ckpts intact
        assert sum(1 for n in names if n.endswith(".index")) == 12
        # the new msgpack checkpoints survived their own retention
        kept = sorted(n for n in names
                      if n.startswith("model_compact") and
                      n.endswith(".msgpack"))
        assert kept == ["model_compact-1.msgpack",
                        "model_compact-2.msgpack",
                        "model_compact-3.msgpack"]
        with open(tmp_path / "model_compact-3.msgpack", "rb") as f:
            got = ser.from_bytes({"w": np.float32(0)}, f.read())
        assert got["w"] == 3.0

    def test_resume_from_reference_full_ckpt_fails_clearly(self, tmp_path):
        v1 = tf.compat.v1
        g = v1.Graph()
        with g.as_default():
            v1.get_variable("Model/x", initializer=tf.constant(
                np.zeros((2,), np.float32)))
            saver = v1.train.Saver()
            with v1.Session(graph=g) as sess:
                sess.run(v1.global_variables_initializer())
                saver.save(sess, str(tmp_path / "model-7"),
                           write_meta_graph=False)
        with pytest.raises(ValueError, match="model_compact"):
            ckpt.load_full(str(tmp_path), {"params": {}})


def test_mobilenet_v2_feature_dim_finegrain_mode():
    """Sub-1.0 multipliers keep Conv_1 at 1280 (slim
    finegrain_classification_mode) — only >1 scales the head."""
    from comic_tpu.models import mobilenet_v2 as m2

    assert m2.feature_dim(0.75) == 1280
    assert m2.feature_dim(0.5) == 1280
    assert m2.feature_dim(1.0) == 1280
    assert m2.feature_dim(1.4) == 1792


class TestSuffixMatching:
    """Pure (no-TF-checkpoint) converter mechanics."""

    def test_pick_prefers_non_uniquified_scope(self):
        names = ["Model/decoder/rnn_decoder/decoder_1/w/query_layer/kernel",
                 "Model/decoder/rnn_decoder/decoder/w/query_layer/kernel"]
        assert tfc._pick_by_suffix(names, "query_layer/kernel") == names[1]

    def test_pick_ambiguous_raises(self):
        names = ["Model/decoder/a/query_layer/kernel",
                 "Model/decoder/b/query_layer/kernel"]
        with pytest.raises(ValueError, match="Ambiguous"):
            tfc._pick_by_suffix(names, "query_layer/kernel")

    def test_slot_filter(self):
        assert tfc._is_slot_var("x/kernel/Adam")
        assert tfc._is_slot_var("x/kernel/Adam_1")
        assert tfc._is_slot_var("global_step")
        assert tfc._is_slot_var("x/kernel/Momentum")
        assert not tfc._is_slot_var(
            "Model/decoder/rnn_decoder/embedding_map")
        # 'adam'/'ema' only match as path segments, not substrings
        assert not tfc._is_slot_var("Model/adamant/embedding_map")

    def test_suffix_map_tracks_template_options(self):
        base = {
            "embedding": np.zeros((4, 2)),
            "output_projection": {"kernel": np.zeros((3, 4)),
                                  "bias": np.zeros((4,))},
            "cell": {"kernel": np.zeros((5, 12)), "bias": np.zeros((12,))},
            "attention": {"query_layer": {"kernel": np.zeros((3, 3))},
                          "memory_layer": {"kernel": np.zeros((6, 3))},
                          "v": np.zeros((3,)),
                          "ln": {"scale": np.ones((3,)),
                                 "bias": np.zeros((3,))},
                          "softmax_temperature": np.float32(5.0)},
            "rnn_init_input": {"kernel": np.zeros((7, 5))},
        }
        suffixes = dict(tfc.decoder_suffix_map(base))
        assert "basic_lstm_cell/kernel" in suffixes
        assert "value_layer/kernel" not in suffixes
        assert "a_layer/kernel" not in suffixes
        assert "rnn_initial_state/weight" not in suffixes
