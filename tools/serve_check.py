"""Quick end-to-end serve measurement at the b128 headline point.

Used to confirm encoder-phase changes (e.g. the r5 inception 1x1
horizontal merge) land in the full serving number. Same methodology as
bench.bench_serving, single batch point, 60 forced steps.

Run: python tools/serve_check.py [batch]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from bench import _make_serve, _pipelined_ms

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    config, spec, params = _flagship()
    # the SAME production serving program every bench leg measures —
    # a hand-inlined copy here would silently go stale when the serve
    # closure changes (as it did twice in r5)
    serve = _make_serve(config, spec, steps=60)

    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8))
    ms = _pipelined_ms(jax.jit(serve), (params, images_u8), iters=50,
                       sync=lambda o: np.asarray(o))
    print(f"serve b{batch}, 60 steps: {ms:.2f} ms  "
          f"({batch / (ms / 1e3):.0f} captions/s)")


if __name__ == "__main__":
    main()
