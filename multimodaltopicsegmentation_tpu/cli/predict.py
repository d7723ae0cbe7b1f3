"""End-to-end raw-audio -> topic-segments inference CLI.

Reference contract (/root/reference/predict.py): parse architecture /
encoder / hidden-units / layers out of a training `results.txt`
(predict.py:168-177), load the trained checkpoint, optionally extract
embeddings from an audio folder in-process (uniform units), run the tagger
over every document, convert boundary vectors to sample spans
(`segment_audio`, :92-129) and write per-segment wavs with +-1s overlap
(:313-347). The `LogReg_Predictor` pickled-sklearn baseline is kept
(:352-424).

The embedding extraction and tagger decode are batched jitted TPU calls —
this path is the >=10x wall-clock target in BASELINE.md.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
import sys
from types import SimpleNamespace

import numpy as np

from ..train import checkpoints as ckpt_lib
from ..models import registry
from ..models.base import TaggerConfig
from ..train.data import load_dataset_for_inference, pad_batch
from ..train.loop import BoundedDrain
from ..utils.audio import load_audio, save_wav

ENCODER_DIMS = [
    ("prosodic", 167),
    ("openl3_std", 1024),
    ("wav2vec_std", 1536),
    ("x-vector", 512),
    ("openl3", 512),
    ("crepe_std", 512),
    ("crepe", 256),
    ("mfcc", 200),
    ("ecapa", 192),
    ("wav2vec", 768),
]


def encoder_dim(encoder: str) -> int:
    for prefix, dim in ENCODER_DIMS:
        if encoder.startswith(prefix):
            return dim
    raise ValueError(
        "Encoder not recognised, use one of the available options "
        "(x-vectors, openl3, mfcc, prosodic, crepe, ecapa or wav2vec)"
    )


def load_dataset_for_inference_with_names(embedding_directory):
    files = sorted(os.listdir(embedding_directory))
    data = load_dataset_for_inference(embedding_directory)
    return data, files


class BasePredictor:
    def create_embeddings(
        self,
        encoder,
        audio_directory,
        out_directory,
        uniform_interval=1,
        adaptive_uniform=False,
        verbose=False,
        continue_from_check=True,
    ):
        from . import extract_embeddings_inference as eei

        args = SimpleNamespace(
            vad=False,
            speechbrain=True,
            ecapa=encoder.lower().startswith("ecapa"),
            openl3=encoder.lower().startswith("openl3"),
            wav2vec=encoder.lower().startswith("wav2vec"),
            CREPE=encoder.lower().startswith("crepe"),
            prosodic_feats=encoder.lower().startswith("prosodic"),
            mfcc=encoder.lower().startswith("mfcc"),
            audio_directory=audio_directory,
            out_directory=out_directory,
            uniform_interval=uniform_interval,
            adaptive_uniform_segmentation=adaptive_uniform,
            verbose=verbose,
            continue_from_check=continue_from_check,
        )
        eei.main(args)

    def segment_audio(self, audio_file, segmentation, mock_audio=None, mock_sr=None):
        """Boundary vector -> [(start_sample, end_sample)] spans
        (reference predict.py:92-129)."""
        if mock_audio is not None:
            assert mock_sr is not None, "Provide a mock sample rate to debug..."
            x, sr = mock_audio, mock_sr
        else:
            x, sr = load_audio(audio_file, target_sr=self.sr)

        audio_segs = []
        prev_time = 0
        counter = 0
        if self.adapt:
            for i in range(len(x) // 100, len(x) + 1, len(x) // 100):
                if counter >= len(segmentation):
                    break
                if segmentation[counter]:
                    audio_segs.append((prev_time, i))
                    prev_time = i
                counter += 1
        else:
            for i in range(self.sr * int(self.interval), len(x) + 1, self.sr * int(self.interval)):
                try:
                    if segmentation[counter]:
                        audio_segs.append((prev_time, i))
                        prev_time = i
                    counter += 1
                except IndexError:
                    break
            audio_segs.append((prev_time, len(x)))
        return audio_segs, x


class Predictor(BasePredictor):
    """Neural predictor driven by a training results.txt + checkpoint."""

    def __init__(
        self,
        hyperparameter_file,
        best_model_path,
        pca_reduce=False,
        pca_value=167,
        adaptive_uniform_interval=False,
        uniform_interval=1,
        original_audio_extension=".wav",
        threshold=0.5,
        sr=16000,
    ):
        encoder = encoder2 = architecture = None
        hu = nl = None
        with open(hyperparameter_file) as f:
            for line in f.readlines():
                if line.startswith("Sentence encoder"):
                    encoder = line.split()[2]
                elif line.startswith("Second sentence encoder"):
                    # written by this framework's train_fit for -enc2 runs
                    # (additive vs the reference results.txt contract)
                    encoder2 = line.split()[3]
                elif line.startswith("Neural architecture"):
                    architecture = line.split()[2]
                elif line.startswith("Hidden units"):
                    hu = int(line.split()[2])
                elif line.startswith("Number of layers"):
                    nl = int(line.split()[3])
        self.encoder = encoder
        self.encoder2 = encoder2
        self.architecture = architecture

        # our checkpoints carry the full config; rebuild only if absent
        try:
            params, cfg, arch_name, _ = ckpt_lib.load(best_model_path)
        except Exception:
            params = None
        if params is None:
            # reference-trained torch/Lightning checkpoint? convert in place
            # (the reference's own BCE->CE fallback, predict.py:227-256, is
            # resolved from the classifier shape inside the converter)
            try:
                from ..tools.convert_reference_checkpoint import load_torch_checkpoint

                params, cfg, arch_name = load_torch_checkpoint(
                    best_model_path, architecture
                )
                cfg = dataclasses.replace(cfg, threshold=threshold)
            except Exception as e:
                raise RuntimeError(
                    f"could not load checkpoint {best_model_path!r} — neither a "
                    "framework checkpoint nor a convertible reference torch "
                    "checkpoint (see tools/convert_reference_checkpoint.py): "
                    f"{e}"
                ) from e
        # the reference's predict cannot drive late fusion at all
        # (predict.py:218-225 has no BiLSTMLateFusion branch); here it works
        # when the training results.txt recorded the second encoder — both
        # modalities are extracted from the same units and decoded together.
        # Domain adaptation stays unsupported (predict has no domain ids).
        self.double = registry.is_double_input(arch_name)
        if registry.is_domain_adapt(arch_name):
            raise NotImplementedError(
                f"predict does not support architecture {arch_name!r}: it "
                "needs per-document domain ids that the raw-audio predict "
                "pipeline cannot provide"
            )
        if self.double and encoder2 is None:
            raise ValueError(
                f"architecture {arch_name!r} needs a second modality but "
                f"{hyperparameter_file!r} has no 'Second sentence encoder' "
                "line (train with this framework's train_fit -enc2 to "
                "record it)"
            )
        self.params = params
        self.cfg = cfg
        self.arch = registry.build(arch_name, cfg)

        self.adapt = bool(adaptive_uniform_interval)
        self.interval = uniform_interval
        self.ext = original_audio_extension
        self.th = threshold
        self.sr = sr

    def predict(
        self,
        embedding_folder,
        experiment_name,
        write_audio_segments=True,
        audio_directory=None,
        batch_size=8,
        num_gpus=0,
        verbose=False,
        add_overlap=1,
        embedding_folder2=None,
    ):
        import jax
        import jax.numpy as jnp

        # user-input checks raise (not assert: `python -O` strips asserts,
        # and a silently mismatched folder would produce wrong segmentations)
        if os.path.exists(experiment_name):
            raise ValueError(
                "The name of this experiment has already been used: please "
                f"change experiment name or delete {experiment_name}"
            )
        os.makedirs(experiment_name)

        embeddings, file_names = load_dataset_for_inference_with_names(embedding_folder)
        if verbose:
            print(f"Segmenting the following files:\n{file_names}")
        embeddings2 = None
        if self.double:
            if embedding_folder2 is None:
                raise ValueError(
                    "late-fusion predict needs the second modality's embedding "
                    "folder (-ef2)"
                )
            embeddings2, names2 = load_dataset_for_inference_with_names(
                embedding_folder2
            )
            if names2 != file_names:
                raise ValueError(
                    f"second-modality folder {embedding_folder2!r} does not hold "
                    f"the same documents as {embedding_folder!r}"
                )
            # unit counts must agree per document: the two streams share one
            # length vector in the fused decode, so a mismatch would silently
            # truncate/mask modality-2 units (or crash in a shape error)
            for e1, e2, name in zip(embeddings, embeddings2, file_names):
                if len(e1) != len(e2):
                    raise ValueError(
                        f"{name}: {len(e1)} units in {embedding_folder!r} vs "
                        f"{len(e2)} in {embedding_folder2!r} — extract both "
                        "modalities with the same unitization"
                    )

        if len(jax.devices()) > 1 and not self.double:
            # shard documents over the 'data' mesh axis (ICI data parallelism)
            from ..parallel.mesh import make_mesh
            from ..parallel.train_step import make_sharded_decode

            mesh = make_mesh(model_parallel=1)
            batch_size = max(batch_size, mesh.shape["data"])
            batch_size -= batch_size % mesh.shape["data"]
            sharded = make_sharded_decode(self.arch, mesh, self.params, self.th)

            def decode(p, x, l):
                with mesh:
                    return sharded(p, x, l)
        elif self.double:
            decode = jax.jit(
                lambda p, x, l, x2: self.arch.decode(p, x, l, self.th, x2=x2)
            )
        else:
            decode = jax.jit(lambda p, x, l: self.arch.decode(p, x, l, self.th))
        # decode dispatches run AHEAD of the tag pulls (each np.asarray is
        # a ~30 ms tunnel round trip that would otherwise idle the device
        # between chunks), with the in-flight window bounded so queued
        # chunks' input buffers cannot crowd HBM (train/loop.BoundedDrain)
        results = []
        q = BoundedDrain(lambda it: (it[0], it[1], np.asarray(it[2])))
        docs = [(e, [0] * len(e), n) for e, n in zip(embeddings, file_names)]
        multi = len(jax.devices()) > 1 and not self.double
        for i in range(0, len(docs), batch_size):
            chunk = docs[i : i + batch_size]
            batch = pad_batch(
                chunk,
                crf=False,
                bucket=True,
                pad_batch_to=batch_size if (multi and len(chunk) < batch_size) else None,
            )
            if self.double:
                chunk2 = [
                    (e, [0] * len(e), n)
                    for e, n in zip(
                        embeddings2[i : i + batch_size],
                        file_names[i : i + batch_size],
                    )
                ]
                # identical pad_batch arguments to `chunk` above so both
                # modalities bucket to the same padded length (unit counts
                # are validated equal per document; `multi` is always False
                # here — the sharded path excludes double-input mode — so
                # neither chunk gets batch-axis padding)
                batch2 = pad_batch(chunk2, crf=False, bucket=True,
                                   pad_batch_to=None)
                scores, tags = decode(
                    self.params,
                    jnp.asarray(batch["src_tokens"]),
                    jnp.asarray(batch["src_lengths"]),
                    jnp.asarray(batch2["src_tokens"]),
                )
            else:
                scores, tags = decode(
                    self.params,
                    jnp.asarray(batch["src_tokens"]),
                    jnp.asarray(batch["src_lengths"]),
                )
            q.add((chunk, batch, tags))
        for chunk, batch, tags in q.finish():
            for j in range(len(chunk)):
                L = int(batch["src_lengths"][j])
                results.append(tags[j][:L].astype(int).tolist())

        if write_audio_segments:
            assert audio_directory is not None, (
                "If segmenting the input audio, provide the audio directory"
            )
            seg_dir = os.path.join(experiment_name, "audio_segments")
            os.makedirs(seg_dir)
            for index, file in enumerate(file_names):
                audio_file = os.path.join(audio_directory, file[:-4] + self.ext)
                assert os.path.exists(audio_file), (
                    f"Could not find the audio file for embedding {file}"
                )
                if sum(results[index]) == 0:
                    print(
                        f"Warning: no segment identified in {file}! "
                        "No audio segments written for this file."
                    )
                    continue
                audio_segments, audio = self.segment_audio(audio_file, results[index])
                for index_seg, seg in enumerate(audio_segments):
                    offset_start = offset_end = 0
                    if add_overlap:
                        offset = add_overlap * self.sr
                        offset_start, offset_end = (
                            (offset, offset) if index_seg else (0, offset)
                        )
                    save_wav(
                        os.path.join(seg_dir, file[:-4] + str(index_seg) + ".wav"),
                        audio[max(seg[0] - offset_start, 0) : seg[1] + offset_end],
                        self.sr,
                    )
        with open(os.path.join(experiment_name, "results.pkl"), "wb") as f:
            pickle.dump(dict(zip(file_names, results)), f)
        return results


class LogReg_Predictor(BasePredictor):
    """Pickled-sklearn baseline (reference predict.py:352-424)."""

    def __init__(
        self,
        best_model_path,
        adaptive_uniform_interval=False,
        uniform_interval=1,
        original_audio_extension=".wav",
        threshold=0.5,
        sr=16000,
    ):
        with open(best_model_path, "rb") as f:
            self.model = pickle.load(f)
        self.encoder = "prosodic"
        self.adapt = bool(adaptive_uniform_interval)
        self.interval = uniform_interval
        self.ext = original_audio_extension
        self.th = threshold
        self.sr = sr

    def predict(
        self,
        embedding_folder,
        experiment_name,
        write_audio_segments=True,
        audio_directory=None,
        batch_size=1,
        num_gpus=0,
        verbose=False,
    ):
        assert not os.path.exists(experiment_name)
        os.makedirs(experiment_name)
        results = {}
        for file in sorted(os.listdir(embedding_folder)):
            emb = np.load(os.path.join(embedding_folder, file))
            pred = self.model.predict(emb) > self.th
            results[file] = pred.astype(int).tolist()
            if write_audio_segments:
                audio_segs, audio = self.segment_audio(
                    os.path.join(audio_directory, file[:-4] + self.ext), results[file]
                )
                for i, seg in enumerate(audio_segs):
                    save_wav(
                        os.path.join(experiment_name, file[:-4] + str(i) + ".wav"),
                        audio[seg[0] : seg[1]],
                        self.sr,
                    )
        with open(os.path.join(experiment_name, "results.pkl"), "wb") as f:
            pickle.dump(results, f)
        return results


class MyParser(argparse.ArgumentParser):
    def error(self, message):
        sys.stderr.write("error: %s\n" % message)
        self.print_help()
        sys.exit(2)


def build_parser():
    parser = MyParser(description="Raw audio -> topic segments inference")
    parser.add_argument("--extract_embeddings", "-ee", action="store_true")
    parser.add_argument("--embedding_folder", "-ef", type=str, required=True)
    # second modality for late-fusion checkpoints (beyond the reference,
    # whose predict has no BiLSTMLateFusion support); defaults to
    # <embedding_folder>_enc2 when the checkpoint is double-input
    parser.add_argument("--embedding_folder2", "-ef2", type=str, default=None)
    parser.add_argument("--hyperparameter_file", "-hyp", type=str)
    parser.add_argument("--best_model_path", "-model", type=str)
    parser.add_argument("--experiment_name", "-exp", default="new_experiment", type=str)
    parser.add_argument("--batch_size", "-bs", default=8, type=int)
    parser.add_argument("--num_gpus", "-gpus", default=0, type=int)
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument("--audio_folder", "-af", type=str)
    parser.add_argument("--pca_reduce", "-pca", action="store_true")
    parser.add_argument("--pca_value", "-pca_v", default=167, type=int)
    parser.add_argument("--logistic_regression_baseline", "-lgr", action="store_true")
    parser.add_argument("--uniform_interval", "-ui", default=1, type=float)
    parser.add_argument("--adaptive_uniform", "-aus", action="store_true")
    parser.add_argument("--threshold", "-th", default=0.5, type=float)
    parser.add_argument("--return_just_segmentation", "-rjs", action="store_false")
    # source-audio extension for the segment-writing step (the reference
    # hardcodes '.wav' in its Predictor; with mp3 decode supported the
    # corpus may be .mp3 end to end)
    parser.add_argument("--audio_extension", "-ext", default=".wav",
                        choices=[".wav", ".mp3"])
    return parser


def cli_main(argv=None):
    args = build_parser().parse_args(argv)
    if args.logistic_regression_baseline:
        predictor = LogReg_Predictor(
            args.best_model_path,
            adaptive_uniform_interval=args.adaptive_uniform,
            uniform_interval=args.uniform_interval,
            original_audio_extension=getattr(args, "audio_extension", ".wav"),
        )
    else:
        predictor = Predictor(
            args.hyperparameter_file,
            args.best_model_path,
            args.pca_reduce,
            args.pca_value,
            adaptive_uniform_interval=args.adaptive_uniform,
            uniform_interval=args.uniform_interval,
            threshold=args.threshold,
            original_audio_extension=getattr(args, "audio_extension", ".wav"),
        )

    double = getattr(predictor, "double", False)
    if double and args.embedding_folder2 is None:
        args.embedding_folder2 = args.embedding_folder.rstrip("/\\") + "_enc2"

    if args.extract_embeddings:
        streams = [(predictor.encoder, "embedding_folder")]
        if double:
            streams.append((predictor.encoder2, "embedding_folder2"))
        for enc, attr in streams:
            folder = getattr(args, attr)
            predictor.create_embeddings(
                enc,
                args.audio_folder,
                folder,
                args.uniform_interval,
                args.adaptive_uniform,
                args.verbose,
                True,
            )
            pooling_idx = enc.find("_")
            if pooling_idx > -1:
                setattr(args, attr, os.path.join(folder, enc[pooling_idx:]))

    kw = {}
    if double:
        kw["embedding_folder2"] = args.embedding_folder2
    return predictor.predict(
        args.embedding_folder,
        args.experiment_name,
        write_audio_segments=args.return_just_segmentation,
        audio_directory=args.audio_folder,
        batch_size=args.batch_size,
        num_gpus=args.num_gpus,
        verbose=args.verbose,
        **kw,
    )


if __name__ == "__main__":
    cli_main()
