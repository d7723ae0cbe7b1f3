"""Inference-time feature extraction (no transcripts, no labels).

Reference contract (/root/reference/extract_embeddings_inference.py): only
uniform or adaptive-uniform (total/100) unitization, same encoder zoo, same
pooling-variant output dirs; called in-process by predict.py via a mock
namespace (predict.py:45-86). The reference's serial joblib loop
(:406-408) becomes one batched device encode per document — the core of
the predict-path speedup.

Replicated quirk: each unit is exactly ONE second long starting at
`interval * i` (extract_embeddings_inference.py:245-248), including under
adaptive intervals, since predict.py's `segment_audio` depends on that
stride contract.
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

from ..dsp.unitize import inference_uniform_units, to_sample, to_time
from ..encoders.engine import build_encoder
from .extract_embeddings import write_frame_level


def main(args):
    verbose = args.verbose
    os.makedirs(args.out_directory, exist_ok=True)
    # frame-level encoders write into pooling subdirs; scan those too so
    # --continue_from_check (default-on from predict) resumes for them
    existent_files = [
        f for f in os.listdir(args.out_directory) if f.endswith(".npy")
    ]
    mean_dir = os.path.join(args.out_directory, "_mean")
    if os.path.exists(mean_dir):
        existent_files += os.listdir(mean_dir)

    # inference uses the mel256/music OpenL3 variant (reference quirk)
    args._inference_variant = True
    encoder = build_encoder(args)

    audio_paths, filenames = [], []
    for root, _dirs, files in os.walk(args.audio_directory):
        for file in sorted(files):
            if file.endswith("mp3") or file.endswith("wav"):
                filenames.append(re.findall(r"(.+)\.\w+$", file)[-1])
                audio_paths.append(os.path.join(root, file))

    def _skipped(i):
        return bool(
            args.continue_from_check
            and existent_files
            and re.findall(re.escape(filenames[i]), " ".join(existent_files))
        )

    from ..utils.audio import prefetch_audio

    loader = prefetch_audio(
        [p for i, p in enumerate(audio_paths) if not _skipped(i)], target_sr=16000
    )

    for index, path in enumerate(audio_paths):
        if _skipped(index):
            print(f"File {filenames[index]} exists in target directory: skipping")
            continue

        _path, audio, sr = next(loader)
        audio_length = to_time(16000, len(audio))

        interval = (
            audio_length / 100
            if args.adaptive_uniform_segmentation
            else args.uniform_interval
        )
        units = inference_uniform_units(audio_length, interval)
        bounds = [
            (to_sample(16000, s), min(to_sample(16000, e), len(audio)))
            for s, e in units
        ]
        if not bounds:
            print(f"Warning: {path} shorter than one unit interval, skipping")
            continue

        if verbose:
            print(f"Encoding {len(bounds)} units of {path}")
        unit_embs = encoder.encode_document(audio, bounds)

        if encoder.frame_level:
            write_frame_level(args.out_directory, filenames[index], unit_embs)
        else:
            np.save(os.path.join(args.out_directory, filenames[index]), np.stack(unit_embs))


class MyParser(argparse.ArgumentParser):
    def error(self, message):
        sys.stderr.write("error: %s\n" % message)
        self.print_help()
        sys.exit(2)


def build_parser():
    parser = MyParser(description="Compute audio embeddings for inference")
    parser.add_argument("--audio_directory", "-audio", type=str)
    parser.add_argument("--out_directory", "-od", default="results", type=str)
    parser.add_argument("--ecapa", "-e", action="store_true")
    parser.add_argument("--verbose", "-vb", action="store_true")
    parser.add_argument("--vad", "-vd", action="store_false")
    parser.add_argument("--speechbrain", "-sb", action="store_true")
    parser.add_argument("--uniform_interval", "-ui", type=float, default=1.0)
    parser.add_argument("--openl3", action="store_true")
    parser.add_argument("--wav2vec", action="store_true")
    parser.add_argument("--CREPE", action="store_true")
    parser.add_argument("--prosodic_feats", action="store_true")
    parser.add_argument("--mfcc", action="store_true")
    parser.add_argument("--continue_from_check", "-cont", action="store_true")
    parser.add_argument("--adaptive_uniform_segmentation", "-aus", action="store_true")
    return parser


def cli_main(argv=None):
    main(build_parser().parse_args(argv))


if __name__ == "__main__":
    cli_main()
