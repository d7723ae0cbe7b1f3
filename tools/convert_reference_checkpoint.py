#!/usr/bin/env python
"""Shim kept at the historical location; the implementation lives in the
package so installed deployments resolve it without path juggling."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from multimodaltopicsegmentation_tpu.tools.convert_reference_checkpoint import (  # noqa: F401,E402
    convert_checkpoint,
    convert_state_dict,
    infer_architecture,
    load_torch_checkpoint,
    main,
)

if __name__ == "__main__":
    main()
