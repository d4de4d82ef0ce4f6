"""comic_tpu: a TPU-native (JAX/XLA/Pallas/pjit) compact image captioning framework.

From-scratch re-design of the capabilities of COMIC ("Towards a Compact Image
Captioning Model with Attention", TMM 2019): Inception-V1 encoder, multi-head
additive-attention LSTM decoder with radix/word/char compact token
vocabularies, three-stage training (XE decoder, CNN fine-tune, SCST
REINFORCE), on-device batched beam search, and COCO caption metrics.

The hot path is pure-functional JAX: the per-token decode step is a
`lax.scan`/`lax.while_loop` body, beam search keeps all hypothesis state on
device, and data parallelism is expressed with `jax.sharding` over a device
mesh. See SURVEY.md at the repo root for the structural map of the reference
this framework is built to match.
"""

__version__ = "0.1.0"
