#!/usr/bin/env python
"""Inference entry point (CLI surface of the reference src/infer.py)."""
from comic_tpu.cli.infer import main

if __name__ == "__main__":
    main()
