#!/usr/bin/env python
"""Training entry point (reference CLI contract: /root/reference/train_fit.py).

Thin wrapper over multimodaltopicsegmentation_tpu.cli.train_fit.
"""
from multimodaltopicsegmentation_tpu.core.jax_setup import setup as _jax_setup
_jax_setup()
from multimodaltopicsegmentation_tpu.cli.train_fit import cli_main

if __name__ == "__main__":
    cli_main()
