#!/usr/bin/env python
"""Inference-time extraction entry point (reference CLI contract:
/root/reference/extract_embeddings_inference.py)."""
from multimodaltopicsegmentation_tpu.core.jax_setup import setup as _jax_setup
_jax_setup()
from multimodaltopicsegmentation_tpu.cli.extract_embeddings_inference import cli_main

if __name__ == "__main__":
    cli_main()
