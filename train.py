#!/usr/bin/env python
"""Training entry point (CLI surface of the reference src/train.py)."""
from comic_tpu.cli.train import main

if __name__ == "__main__":
    main()
