#!/usr/bin/env python
"""Training-time extraction entry point (reference CLI contract:
/root/reference/extract_embeddings.py)."""
from multimodaltopicsegmentation_tpu.core.jax_setup import setup as _jax_setup
_jax_setup()
from multimodaltopicsegmentation_tpu.cli.extract_embeddings import cli_main

if __name__ == "__main__":
    cli_main()
