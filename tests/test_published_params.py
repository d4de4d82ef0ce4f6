"""Published decoder-size parity: the ONE structural number the reference
publishes for the captioning model itself.

/root/reference/README.md:218-233 lists "Decoder params." for four rows
(counted by ops.get_model_size over scope Model/decoder/rnn_decoder,
common/ops.py:62-91, called at src/train_fn.py:82-84):

    default Baseline  (word,  1 head)   12.7 M
    default COMIC-256 (radix 256, 8 h)   4.3 M
    legacy  Baseline  (word,  1 head)   12.2 M
    legacy  COMIC-256 (radix 256, 8 h)   4.0 M

Row configs per the README training commands (:93-101: baseline is the
defaults + --token_type word --cnn_fm_projection none --attn_num_heads 1)
and the legacy override block (src/train.py:178-200: structurally,
rnn_init_method 'project_hidden' instead of 'first_input'). Vocabulary:
the MS-COCO v25 threshold-5 vocab (9,962 words + 4 specials — bench.py's
real operating point). Measured here: 12.746 / 4.298 / 12.157 / 4.036 M
— every row inside the README's 0.1 M rounding half-interval.

Matching all four to the published 0.1 M rounding is strong evidence that
every decoder dimension (embedding, LSTM, 8-head add_LN attention,
init projection, softmax sizing incl. the radix/word split) matches the
reference's — without needing its checkpoints.
"""

import jax
import pytest

from comic_tpu.configuration import Config
from comic_tpu.models.captioner import build_model_spec, init_params

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import real_vocab  # noqa: E402  (9,962-word COCO vocab)


def _decoder_param_count(config: Config) -> float:
    """Millions of params under the decoder subtree (the reference's
    Model/decoder/rnn_decoder scope), from traced shapes only."""
    spec = build_model_spec(config, real_vocab())
    shapes = jax.eval_shape(
        lambda key: init_params(key, spec), jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(shapes["decoder"])
    n = sum(int(__import__("math").prod(l.shape)) for l in leaves)
    return n / 1e6


@pytest.mark.parametrize(
    "name,published,overrides",
    [
        ("baseline", 12.7, dict(token_type="word", attn_num_heads=1,
                                cnn_fm_projection="none")),
        ("comic256", 4.3, dict()),
        ("legacy_baseline", 12.2,
         dict(token_type="word", attn_num_heads=1,
              cnn_fm_projection="none",
              rnn_init_method="project_hidden", legacy=True)),
        ("legacy_comic256", 4.0,
         dict(rnn_init_method="project_hidden", legacy=True)),
    ])
def test_decoder_params_match_readme(name, published, overrides):
    config = Config(**overrides)
    millions = _decoder_param_count(config)
    # README rounds to 0.1 M — allow the rounding half-interval
    assert abs(millions - published) < 0.05, (
        f"{name}: decoder has {millions:.3f} M params, "
        f"README.md publishes {published} M")
