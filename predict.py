#!/usr/bin/env python
"""Inference entry point (reference CLI contract: /root/reference/predict.py)."""
from multimodaltopicsegmentation_tpu.core.jax_setup import setup as _jax_setup
_jax_setup()
from multimodaltopicsegmentation_tpu.cli.predict import cli_main

if __name__ == "__main__":
    cli_main()
