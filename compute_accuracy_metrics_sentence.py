#!/usr/bin/env python
"""Post-hoc metrics entry point (reference CLI contract:
/root/reference/compute_accuracy_metrics_sentence.py)."""
from multimodaltopicsegmentation_tpu.core.jax_setup import setup as _jax_setup
_jax_setup()
from multimodaltopicsegmentation_tpu.cli.compute_accuracy_metrics_sentence import cli_main

if __name__ == "__main__":
    cli_main()
