"""Training-time feature + label extraction CLI.

Reference contract (/root/reference/extract_embeddings.py): walks an audio
directory, pairs each wav with its timestamped-sentence transcript by
filename, unitizes (VAD spans / ASR sentence times / uniform windows),
aligns topic labels to units, encodes every unit, and writes:

- `{doc}.npy` per document ([n_units, dim]) — or, for frame-level encoders
  (wav2vec/openl3/CREPE), the 7 pooling-variant subdirs `_mean/_max/
  _mean_std/_max_std/_last/_delta_gap/_no_reduction`
- `segments.pkl`, `labs_dict.pkl`, `labels.npy` label artifacts

TPU redesign vs the reference's serial per-unit loop
(extract_embeddings.py:504-584): all units of a document are encoded in a
few batched jitted calls (encoders/engine.py) and the pooling variants are
segment reductions on device (ops/pooling.py).

Divergence (fix, not copied): `labs_dict.pkl` is keyed by the document stem
— which is what the training loader actually looks up
(utils/load_datasets_precomputed.py:160: labs[file_name]) — where the
reference keys by full audio path and relies on the shipped corpora having
been post-processed.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import re
import sys

import numpy as np

from ..dsp.unitize import create_uniform_segments, create_vad_segments, to_sample
from ..encoders.engine import build_encoder

EXCLUDE_RE = "(24580|25539|25684|26071|26214|26321|26427)"
POOL_DIRS = ("_mean", "_max", "_no_reduction", "_mean_std", "_max_std", "_last", "_delta_gap")


def write_frame_level(out_directory: str, doc_name: str, unit_frames: list):
    """Write the 7 pooling variants for a document (device segment-reduce)."""
    import jax.numpy as jnp

    from ..ops.pooling import pool

    for d in POOL_DIRS:
        os.makedirs(os.path.join(out_directory, d), exist_ok=True)

    with open(os.path.join(out_directory, "_no_reduction", doc_name) + ".pkl", "wb") as f:
        pickle.dump(unit_frames, f)

    frames = jnp.asarray(np.concatenate(unit_frames, axis=0))
    seg_ids = jnp.asarray(
        np.repeat(np.arange(len(unit_frames)), [len(u) for u in unit_frames])
    )
    n = len(unit_frames)
    for variant in ("_mean", "_max", "_mean_std", "_max_std", "_last", "_delta_gap"):
        arr = np.asarray(pool(frames, seg_ids, n, variant))
        np.save(os.path.join(out_directory, variant, doc_name), arr)


def main(args):
    verbose = args.verbose
    os.makedirs(args.out_directory, exist_ok=True)
    # --continue_from_check probe: frame-level encoders (wav2vec/openl3/
    # CREPE) write documents into the pooling subdirs, plain encoders into
    # the out dir itself — scan both so resumption works for every encoder
    existent_files = [
        f for f in os.listdir(args.out_directory) if f.endswith(".npy")
    ]
    mean_dir = os.path.join(args.out_directory, "_mean")
    if os.path.exists(mean_dir):
        existent_files += os.listdir(mean_dir)

    # rough corpus-size hint (drives the wav2vec2 param-storage
    # auto-selection): 16 kHz 16-bit mono for wav, ~128 kbps for mp3 —
    # the break-even is ~8e5 audio-minutes so precision is irrelevant.
    # Only wav2vec consumes the hint (engine.build_encoder), so skip the
    # stat walk for every other encoder; an unstattable entry (dangling
    # symlink, permission hole) counts as 0 rather than aborting the run —
    # the pairing walk below has never stat()ed files.
    if getattr(args, "wav2vec", False):
        total_bytes = {"wav": 0, "mp3": 0}
        for root, _dirs, files in os.walk(args.audio_directory):
            for file in files:
                ext = file[-3:]
                if ext in total_bytes:
                    try:
                        total_bytes[ext] += os.path.getsize(
                            os.path.join(root, file)
                        )
                    except OSError:
                        pass
        args._expected_audio_min = (
            total_bytes["wav"] / (16000 * 2) + total_bytes["mp3"] * 8 / 128000
        ) / 60.0

    encoder = build_encoder(args)

    # pair audio files with transcripts (reference regex pairing,
    # extract_embeddings.py:207-224)
    file_paths, audio_paths, filenames = [], [], []
    for root, _dirs, files in os.walk(args.audio_directory):
        for file in sorted(files):
            if not (file.endswith("mp3") or file.endswith("wav")):
                continue
            filename = re.findall(r"(.+)\.\w+$", file)[-1]
            filenames.append(filename)
            if args.data_directory:
                file_pattern = r"\s?({}\S*)".format(re.escape(filename))
                transcript = re.findall(
                    file_pattern, " ".join(os.listdir(args.data_directory))
                )[-1]
                file_paths.append(os.path.join(args.data_directory, transcript))
            audio_paths.append(os.path.join(root, file))

    # load the flat sentence-level boundary labels
    lab_file = None
    if args.extract_labels:
        if args.BMAT:
            with open(args.lab_file) as f:
                lab_file = json.load(f)
        else:
            lab_file = np.load(args.lab_file)

    # load transcripts
    times = []
    if args.BMAT:
        for _k, v in lab_file.items():
            times.append(v)
    else:
        for file_path in file_paths:
            with open(file_path, "rb" if file_path.endswith("pkl") else "r") as f:
                if file_path.endswith("pkl"):
                    tss = pickle.load(f)
                elif file_path.endswith("json"):
                    tss = json.load(f)
                else:
                    raise ValueError(
                        "The timestamped sentences must be in json or pkl format!"
                    )
            times.append([(t["start"], t["end"]) for t in tss])

    all_segments, all_labs = [], []
    all_labs_dictionary = {}
    lab_index = 0

    # decode of upcoming documents overlaps with on-device encoding of the
    # current one; skip decisions don't depend on audio so they're made first
    def _skipped(i):
        if args.continue_from_check and existent_files:
            current = os.path.basename(audio_paths[i])[:-4]
            if re.findall(re.escape(current), " ".join(existent_files)):
                return "exists"
        if re.findall(EXCLUDE_RE, audio_paths[i]):
            return "excluded"
        return None

    from ..utils.audio import prefetch_audio

    loader = prefetch_audio(
        [audio_paths[i] for i in range(len(times)) if _skipped(i) is None],
        target_sr=16000,
    )

    for index, timestamps in enumerate(times):
        if args.BMAT:
            timestamps = lab_file[os.path.basename(audio_paths[index])[:-4]]
        skip = _skipped(index)
        if skip == "exists":
            lab_index += len(timestamps)
            print(
                f"File {os.path.basename(audio_paths[index])[:-4]}.npy exists "
                "in target directory: skipping"
            )
            continue
        if skip == "excluded":
            if not args.BMAT:
                lab_index += len(timestamps)
            continue

        _path, audio, sr = next(loader)

        # ---- unitization + labels ----------------------------------------
        def collect_lab_times():
            nonlocal lab_index
            lab_time = []
            if args.BMAT:
                for time in timestamps:
                    if lab_time:
                        lab_time.append((lab_time[-1][1], lab_time[-1][1] + time))
                    else:
                        lab_time.append((0, time))
            else:
                for time in timestamps:
                    if lab_file is not None and lab_file[lab_index]:
                        lab_time.append(time)
                    lab_index += 1
            return lab_time

        if args.vad:
            from ..dsp.vad import get_speech_segments, get_speech_segments_quartered

            if verbose:
                print("Segmenting with the built-in VAD pipeline...")
            # reference structure (extract_embeddings.py:297-369): postprocess
            # (energy double-check) with a RuntimeError fallback to the plain
            # pass, and a MemoryError fallback that quarters the audio
            try:
                try:
                    segmentation = get_speech_segments(
                        audio, 16000, apply_energy_VAD=args.postprocess
                    )
                except RuntimeError:
                    if verbose:
                        print("Warning: Postprocessing failed... trying with just neural VAD.")
                    segmentation = get_speech_segments(audio, 16000, apply_energy_VAD=False)
            except MemoryError:
                segmentation = get_speech_segments_quartered(
                    audio, 16000, apply_energy_VAD=args.postprocess
                )
            lab_time = collect_lab_times()
            segments, labs = create_vad_segments(
                segmentation, lab_time, speechbrain=True
            )
            assert len(segmentation) == len(labs), "Labs and segmentation lengths differ!"
            start_index = 0
        elif args.use_sentence_time:
            if verbose:
                print("Using sentence-level times from the ASR transcript...")
            labs = []
            for _time in timestamps:
                labs.append(1 if (lab_file is not None and lab_file[lab_index]) else 0)
                lab_index += 1
            segmentation = timestamps
            segments = timestamps
            start_index = 0
        else:
            lab_time = collect_lab_times()
            if args.adaptive_uniform_segmentation:
                segment_duration = float(lab_time[-1][1]) / 100
            else:
                segment_duration = args.uniform_interval
            if verbose:
                print(f"Uniform segmentation, duration={segment_duration}s")
            segmentation, labs = create_uniform_segments(
                lab_time,
                segment_duration=segment_duration,
                append_labs=args.concatenate_labels,
            )
            segments = segmentation
            assert len(segmentation) == len(labs), (
                "Segmentation must be the same length as labels!"
            )
            start_index = 0

        all_segments.append(segments)
        if args.concatenate_labels:
            all_labs.extend(labs)
        else:
            all_labs.append(labs)
        all_labs_dictionary[filenames[index]] = labs

        # ---- unit sample bounds (each unit runs to the next unit's start,
        # the last to its own end — extract_embeddings.py:504-513) ----------
        end_index = start_index + 1
        bounds = []
        for i2, time in enumerate(segmentation):
            start = to_sample(16000, float(time[start_index]))
            if i2 + 1 < len(segmentation):
                end = to_sample(16000, float(segmentation[i2 + 1][start_index]))
            else:
                end = to_sample(16000, float(time[end_index]))
            bounds.append((start, min(end, len(audio))))

        if verbose:
            print(f"Encoding {len(bounds)} units of {audio_paths[index]}")
        from ..utils import profiling

        with profiling.stage("encode_document"):
            unit_embs = encoder.encode_document(audio, bounds)
        assert len(unit_embs) == len(segmentation), "Something went wrong!"

        if encoder.frame_level:
            write_frame_level(args.out_directory, filenames[index], unit_embs)
        else:
            np.save(
                os.path.join(args.out_directory, filenames[index]),
                np.stack(unit_embs),
            )

    if args.extract_labels:
        os.makedirs(args.lab_out_dir, exist_ok=True)
        with open(os.path.join(args.lab_out_dir, "segments.pkl"), "wb") as fp:
            pickle.dump(all_segments, fp)
        with open(os.path.join(args.lab_out_dir, "labs_dict.pkl"), "wb") as fp:
            pickle.dump(all_labs_dictionary, fp)
        np.save(os.path.join(args.lab_out_dir, "labels"), np.array(all_labs, dtype=object))


class MyParser(argparse.ArgumentParser):
    def error(self, message):
        sys.stderr.write("error: %s\n" % message)
        self.print_help()
        sys.exit(2)


def build_parser():
    parser = MyParser(
        description="Compute audio embeddings and store them in the specified directory"
    )
    parser.add_argument("--data_directory", "-data", type=str)
    parser.add_argument("--audio_directory", "-audio", type=str)
    parser.add_argument("--out_directory", "-od", default="results", type=str)
    parser.add_argument("--ecapa", "-e", action="store_true")
    parser.add_argument("--verbose", "-vb", action="store_true")
    parser.add_argument("--just_speakers", "-js", action="store_false")
    parser.add_argument("--extract_labels", "-exl", action="store_false")
    parser.add_argument("--lab_file", "-lab", default="nltk_podcast_labs.npy", type=str)
    parser.add_argument("--lab_out_dir", "-lod", default="INA_podcast_segments", type=str)
    parser.add_argument("--vad", "-vd", action="store_false")
    parser.add_argument("--speechbrain", "-sb", action="store_true")
    parser.add_argument("--concatenate_labels", "-cl", action="store_true")
    parser.add_argument("--postprocess", "-pp", action="store_false")
    parser.add_argument("--uniform_interval", "-ui", type=float, default=1.0)
    parser.add_argument("--use_sentence_time", "-ust", action="store_true")
    parser.add_argument("--openl3", action="store_true")
    parser.add_argument("--wav2vec", action="store_true")
    parser.add_argument("--CREPE", action="store_true")
    parser.add_argument("--prosodic_feats", action="store_true")
    parser.add_argument("--mfcc", action="store_true")
    parser.add_argument("--max", action="store_true")
    parser.add_argument("--add_std", action="store_true")
    parser.add_argument("--gap_sentence", "-gs", action="store_true")
    parser.add_argument("--continue_from_check", "-cont", action="store_true")
    parser.add_argument("--BMAT", action="store_true")
    parser.add_argument("--adaptive_uniform_segmentation", "-aus", action="store_true")
    return parser


def cli_main(argv=None):
    main(build_parser().parse_args(argv))


if __name__ == "__main__":
    cli_main()
