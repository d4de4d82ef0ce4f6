from . import attention, captioner, cells, decoder, encoders, inception_v1, layers

__all__ = [
    "attention", "captioner", "cells", "decoder", "encoders",
    "inception_v1", "layers",
]
