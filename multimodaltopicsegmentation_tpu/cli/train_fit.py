"""Training CLI with the reference's flag surface and on-disk outputs.

Mirrors /root/reference/train_fit.py: same argparse flags (including the
inverted-name store_false flags --NoLSTM / --unidirectional /
--positional_encoding / --batch_second / --write_results), same experiment
folder layout (`logs`, `checkpoints/`, `results.txt`, `all_results.json`,
`all_scores.json`, `*_fit_results.csv`), same encoder->dim table
(train_fit.py:245-250), same grid-search / fold orchestration and
best-configuration selection on monitored validation loss
(train_fit.py:430-538).

Divergence from the reference (fixed defect, train_fit.py:169-198): running
without -hs uses the single (-hu, -nl, -d_in, -d_out) configuration instead
of crashing on an undefined variable.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import re
import sys

import numpy as np

from ..models.base import TaggerConfig
from ..models import registry
from ..train import checkpoints as ckpt_lib
from ..train.data import (
    add_dataset,
    batches,
    load_dataset_from_precomputed,
)
from ..train.loop import Trainer

EMBEDDING_SIZES = {
    "prosodic": 167,
    "openl3_std": 1024,
    "openl3/_mean_std": 1024,
    "wav2vec_std": 1536,
    "wav2vec/_mean_std": 1536,
    "x-vectors": 512,
    "openl3": 512,
    "crepe_std": 512,
    "crepe/mean_std": 512,
    "crepe": 256,
    "mfcc": 200,
    "ecapa": 192,
    "wav2vec": 768,
    "radio_news_topseg": 768,
    "non_news_topseg": 768,
    "radio_news_roberta": 768,
    "non_news_roberta": 768,
    "CNN": 30,
}


def _resolve_monitored(val_loss: float) -> float:
    """Resolve parse_checkpoint_name's NaN sentinel for `final=` checkpoints.

    A `final=` save carries no monitored loss in its filename; selection
    still needs a comparable number, so fall back to the reference's 0.5 —
    but record in the logs that the value was synthesized rather than
    letting it masquerade as a real monitored loss."""
    if np.isnan(val_loss):
        with open("logs", "a") as f:
            f.write(
                "Monitored loss synthesized: final= checkpoint carries no "
                "val loss; using 0.5 for config selection\n"
            )
        return 0.5
    return val_loss


def infer_embedding_dim(encoder: str, encoder2=None, timing_file=None, pca=False, pca_value=167):
    """Reference dim inference incl. '+' early-fusion sums (train_fit.py:252-276)."""
    if pca:
        dim = pca_value
    else:
        def one(enc_string):
            if re.findall("sentence", enc_string.lower()):
                encs = ["/".join(e.split("/")[1:]) for e in enc_string.split("+")]
            else:
                encs = enc_string.split("+")
            try:
                return sum(EMBEDDING_SIZES[e] for e in encs)
            except KeyError:
                raise ValueError(
                    "Encoder not recognised, use one of the available options "
                    "(x-vectors, openl3, mfcc, prosodic, CREPE, ecapa or wav2vec)"
                )

        if encoder2 is not None:
            dim = [one(encoder), one(encoder2)]
        else:
            dim = one(encoder)
    if timing_file is not None:
        if isinstance(dim, list):
            dim = [d + 2 for d in dim]
        else:
            dim += 2
    return dim


def apply_pca(train_docs, other_doc_lists, n_components: int):
    """PCA fit on train embeddings, reused on valid/test (EncoderDataset.py:51-70,
    with its index-accumulation defect fixed)."""
    from sklearn.decomposition import PCA

    reducer = PCA(n_components=n_components)
    concat = np.concatenate([d[0] for d in train_docs], axis=0)
    reducer.fit(concat)

    def project(docs):
        return [
            (reducer.transform(d[0]).astype(np.float32), d[1], d[2]) for d in docs
        ]

    return project(train_docs), [project(docs) for docs in other_doc_lists]


def main(args):
    if args.infer:
        assert os.path.exists(args.experiment_name), (
            "If using pre-trained model to infer only, the given folder must "
            "exist and include the checkpoint subfolder with trained weights"
        )
    else:
        assert not os.path.exists(args.experiment_name), (
            "The name of this experiment has already been used: please change "
            "experiment name or delete {} to use this name".format(args.experiment_name)
        )
        os.makedirs(args.experiment_name)

    test = args.dataset == "BBC" or args.standard_split is not None

    folds = load_dataset_from_precomputed(
        args.embedding_folder,
        args.lab_folder,
        delete_last_sentence=args.delete_last_sentence,
        k_folds=args.k_folds,
        mask_inner_sentences=args.mask_inner_sentences,
        mask_probability=args.mask_probability,
        split=args.standard_split,
        timing_info=args.timing_file,
    )

    if args.architecture == "BiLSTMLateFusion":
        folds2 = load_dataset_from_precomputed(
            args.embedding_folder2,
            args.lab_folder,
            delete_last_sentence=args.delete_last_sentence,
            k_folds=args.k_folds,
            mask_inner_sentences=args.mask_inner_sentences,
            mask_probability=args.mask_probability,
            split=args.standard_split,
        )
        if args.both_datasets:
            folds2 = add_dataset(args, folds2, fold2=True)
    else:
        folds2 = [[None, None, None] for _ in folds]

    if args.both_datasets:
        folds = add_dataset(args, folds)

    val_folder = args.standard_split is not None
    os.chdir(args.experiment_name)

    CRF = registry.is_crf(args.architecture)
    domain_adapt = registry.is_domain_adapt(args.architecture)
    double = registry.is_double_input(args.architecture)

    # multi-chip: shard training over the ('data','model') ICI mesh, exactly
    # as the predict CLI shards decode (cli/predict.py). Single chip -> None.
    import jax

    mesh = None
    pipeline_stages = int(getattr(args, "pipeline_stages", 0) or 0)
    sequence_shards = int(getattr(args, "sequence_shards", 0) or 0)
    expert_parallel = {"auto": None, "on": True, "off": False}[
        getattr(args, "expert_parallel", "auto")
    ]
    if getattr(args, "device_epochs", False):
        # device-resident epoch windows run the plain single-device step:
        # leave mesh=None and keep every parallel mode off
        if pipeline_stages > 1 or sequence_shards > 1 or expert_parallel is True:
            raise SystemExit(
                "--device_epochs is exclusive with --pipeline_stages/"
                "--sequence_shards/--expert_parallel on"
            )
        expert_parallel = False
    elif pipeline_stages > 1 or sequence_shards > 1:
        # the pipeline / sequence shards own the devices; Trainer validates
        # architecture, divisibility and device count
        pass
    elif (
        expert_parallel is None
        and args.architecture == "SwitchBiLSTM"
        and getattr(args, "switch", "dense") == "lstm"
        and len(jax.devices()) >= 2
    ):
        # leave mesh=None so the Trainer's expert-parallel auto-enable fires
        # (an explicit mesh suppresses it); --expert_parallel off restores
        # data parallelism over all chips
        print(
            "[train_fit] auto-enabling expert parallelism for SwitchBiLSTM "
            "switch=lstm (pass --expert_parallel off for data parallelism)",
            file=sys.stderr,
        )
    elif len(jax.devices()) > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(model_parallel=1)

    if args.architecture in ("Transformer", "BiLSTMRestrictedMHA",
                             "RecurrentLongformer"):
        # RecurrentLongformer is the registry alias for BiLSTMRestrictedMHA;
        # both must land in the same 3600-truncation family
        truncate, tv = True, 3600
    else:
        truncate, tv = False, 100

    # assemble per-fold batch lists
    fold_loaders = []
    valid_percentage = args.valid_percentage
    for fold_idx, fold in enumerate(folds):
        valid_split = int(len(fold[0]) * valid_percentage)
        if args.no_validation or val_folder:
            train_docs = fold[0]
            valid_docs = fold[2] if (val_folder and not args.no_validation) else None
        else:
            train_docs = fold[0][:-valid_split]
            valid_docs = fold[0][-valid_split:]
        test_docs = fold[1]

        train2 = valid2 = test2 = None
        if double:
            f2 = folds2[fold_idx]
            if args.no_validation or val_folder:
                train2 = f2[0]
                valid2 = f2[2] if (val_folder and not args.no_validation) else None
            else:
                train2 = f2[0][:-valid_split]
                valid2 = f2[0][-valid_split:]
            test2 = f2[1]

        if args.pca_reduce:
            others = [d for d in (valid_docs, test_docs) if d is not None]
            train_docs, projected = apply_pca(train_docs, others, args.pca_value)
            it = iter(projected)
            if valid_docs is not None:
                valid_docs = next(it)
            test_docs = next(it)

        def make_batches(docs, docs2, bs):
            if not docs:
                return None
            bs = max(bs, 1)
            bl = list(
                batches(docs, bs, crf=CRF, truncate=truncate, truncate_value=tv,
                        domain_adapt=domain_adapt)
            )
            if docs2 is not None:
                bl2 = list(
                    batches(docs2, bs, crf=CRF, truncate=truncate, truncate_value=tv)
                )
                for b, b2 in zip(bl, bl2):
                    b["src_tokens2"] = b2["src_tokens"]
            return bl

        bs = args.batch_size
        test_batches = make_batches(test_docs, test2, 1)
        if not test_batches:
            raise ValueError("There is something wrong with the test loader...")
        fold_loaders.append(
            (
                make_batches(train_docs, train2, min(bs, len(train_docs))),
                make_batches(valid_docs, valid2, min(bs, len(valid_docs)) if valid_docs else bs),
                test_batches,
                fold,
            )
        )

    np.random.seed(int(args.seed))

    # hyperparameter grid (works with or without -hs, unlike the reference)
    search_space = {
        "hidden_units": [args.hidden_units],
        "number_layers": [args.num_layers],
        "dropin": [args.dropout_in],
        "dropout": [args.dropout_out],
    }
    if args.hyperparameters_search:
        if args.hidden_units_search_space:
            search_space["hidden_units"] = args.hidden_units_search_space
        if args.number_layers_search_space:
            search_space["number_layers"] = args.number_layers_search_space
        if args.dropout_in_search_space:
            search_space["dropin"] = args.dropout_in_search_space
        if args.dropout_out_search_space:
            search_space["dropout"] = args.dropout_out_search_space
    hyperparameters = list(
        itertools.product(
            search_space["hidden_units"],
            search_space["number_layers"],
            search_space["dropin"],
            search_space["dropout"],
        )
    )

    # validate --pipeline_stages up front, before any fold trains: a bad
    # combination failing inside the per-config Trainer would waste the
    # whole preceding grid/fold run
    if pipeline_stages > 1:
        if args.architecture != "Transformer":
            raise SystemExit(
                f"--pipeline_stages applies to -a Transformer, "
                f"not {args.architecture!r}"
            )
        if len(jax.devices()) < pipeline_stages:
            raise SystemExit(
                f"--pipeline_stages {pipeline_stages} needs that many devices, "
                f"have {len(jax.devices())}"
            )
        bad_nl = [nl for nl in search_space["number_layers"]
                  if nl % pipeline_stages != 0]
        if bad_nl:
            raise SystemExit(
                f"--pipeline_stages {pipeline_stages} does not divide the "
                f"layer count(s) {bad_nl} in the search space"
            )

    # validate --sequence_shards up front, same rationale
    if sequence_shards > 1:
        if pipeline_stages > 1:
            raise SystemExit("--sequence_shards and --pipeline_stages are exclusive")
        if args.architecture != "Transformer":
            raise SystemExit(
                f"--sequence_shards applies to -a Transformer (local "
                f"attention), not {args.architecture!r}"
            )
        if not args.self_attention_window:
            raise SystemExit(
                "--sequence_shards needs local attention: set -window/"
                "--self_attention_window"
            )
        if len(jax.devices()) < sequence_shards:
            raise SystemExit(
                f"--sequence_shards {sequence_shards} needs that many devices, "
                f"have {len(jax.devices())}"
            )

    if expert_parallel is True:
        if args.architecture != "SwitchBiLSTM" or args.switch != "lstm":
            raise SystemExit(
                "--expert_parallel on applies to -a SwitchBiLSTM with "
                "--switch lstm (twin LSTM towers)"
            )
        if len(jax.devices()) < 2:
            raise SystemExit(
                f"--expert_parallel on needs 2 devices, have {len(jax.devices())}"
            )

    results_grid_f1 = {l: [] for l in search_space["number_layers"]}
    results_grid_pk = {l: [] for l in search_space["number_layers"]}
    results_grid_wd = {l: [] for l in search_space["number_layers"]}

    with open("logs", "w") as f:
        f.write("Training started all right...\n")

    embedding_dim = infer_embedding_dim(
        args.encoder, args.encoder2 if double else None, args.timing_file,
        args.pca_reduce, args.pca_value
    )

    monitor = "training_loss" if args.no_validation else "val_loss"
    best_results = {"F1": 0, "Pk": 1, "WD": 1}
    if args.metric.lower() == "b":
        best_results["B"] = 0
    # the reference initializes this to 1 (train_fit.py:101), which silently
    # drops any configuration whose monitored loss is >= 1 (e.g. CRF NLL) —
    # never hit by its focal-loss scripts but a landmine; use +inf for the
    # minimized case instead
    best_results_val = (
        float("inf") if args.metric in ("WD", "Pk") or not args.search_threshold else 0
    )
    best_hu = best_nl = best_dropin = best_dropout = None
    all_results, all_scores = {}, {}
    confidence = {}

    # --parallel_grid: train every dropout configuration in ONE lockstep
    # vmapped program per fold (train/grid.py) instead of sequentially —
    # eligible when the grid varies only dropout (the paper's grids do)
    pregrid = {}
    use_parallel_grid = False
    if getattr(args, "parallel_grid", False) and not args.infer:
        from ..train.grid import GridTrainer as _GT

        # be honest about eligibility: a silently-ignored -pg looks like a
        # lockstep run but trains serially (round-2 review finding)
        why = None
        if args.architecture not in _GT.SUPPORTED:
            why = (
                f"architecture {args.architecture!r} is not lockstep-eligible "
                f"(supported: {', '.join(_GT.SUPPORTED)})"
            )
        elif len(search_space["hidden_units"]) > 1 or len(search_space["number_layers"]) > 1:
            why = (
                "the grid varies hidden_units/number_layers (parameter shapes "
                "differ across configs; only dropout-only grids run lockstep)"
            )
        elif len(hyperparameters) <= 1:
            why = "the grid has a single configuration (nothing to batch)"
        if why is None:
            use_parallel_grid = True
        else:
            msg = f"--parallel_grid ignored: {why}; training serially."
            print(f"WARNING: {msg}", file=sys.stderr)
            with open("logs", "a") as f:
                f.write(msg + "\n")
    if use_parallel_grid:
        from ..train.grid import GridTrainer
        from ..utils import profiling

        grid_rates = [(d_in, d_out) for _hu, _nl, d_in, d_out in hyperparameters]
        hu0, nl0 = search_space["hidden_units"][0], search_space["number_layers"][0]
        emb_dim0, emb_dim20 = (
            embedding_dim if isinstance(embedding_dim, list) else (embedding_dim, 0)
        )
        for index, (train_loader, valid_loader, _test_loader, _fold) in enumerate(fold_loaders):
            check_dir = "checkpoints" + (f"_{index}" if args.save_all_checkpoints else "")
            os.makedirs(check_dir, exist_ok=True)
            gcfg = TaggerConfig(
                embedding_dim=emb_dim0,
                embedding_dim2=emb_dim20,
                hidden_dim=hu0,
                num_layers=nl0,
                tagset_size=2,
                bidirectional=args.unidirectional,
                lstm=args.NoLSTM,
                loss_fn=args.loss_function,
                cosine_loss=args.cosine_loss,
            )
            gt = GridTrainer(
                args.architecture, gcfg, grid_rates,
                lr=args.learning_rate, optimizer=args.optimizer,
                max_epochs=args.max_epochs, patience=args.patience,
                no_early_stop=args.no_early_stop, monitor=monitor,
                check_dir=check_dir, seed=int(args.seed),
                gradient_clipping=args.gradient_clipping,
                tag=f"f{index}",  # folds may share check_dir; keep ckpts apart
                mesh=mesh,  # shards the CONFIG axis over 'data'
            )
            with profiling.stage("fit_grid"):
                gt.fit(train_loader, None if args.no_validation else valid_loader)
            for gi, pt in enumerate(hyperparameters):
                best_path = gt.best_model_paths[gi]
                th, bvl = ckpt_lib.parse_checkpoint_name(best_path)
                bvl = _resolve_monitored(bvl)
                if args.no_validation or args.save_last_epoch:
                    best_path = gt.save_final(gi)
                pregrid[(pt, index)] = (best_path, th, bvl)

    for param_tuple in hyperparameters:
        hu, nl, d_in, d_out = param_tuple
        results = []
        if args.hyperparameters_search:
            with open("logs", "a") as f:
                f.write(
                    "Results for model with {} hidden units, {} layers, {} dropout in, "
                    "{} dropout out and {} batch size...\n".format(hu, nl, d_in, d_out, args.batch_size)
                )

        fold_results = []
        fold_all_results, fold_all_scores = {}, {}
        for index, (train_loader, valid_loader, test_loader, fold) in enumerate(fold_loaders):
            check_dir = "checkpoints" + (f"_{index}" if args.save_all_checkpoints else "")
            os.makedirs(check_dir, exist_ok=True)

            if isinstance(embedding_dim, list):
                emb_dim, emb_dim2 = embedding_dim
            else:
                emb_dim, emb_dim2 = embedding_dim, 0
            cfg = TaggerConfig(
                embedding_dim=emb_dim,
                embedding_dim2=emb_dim2,
                hidden_dim=hu,
                num_layers=nl,
                tagset_size=2,
                bidirectional=args.unidirectional,  # store_false flag (reference quirk)
                lstm=args.NoLSTM,  # store_false flag
                dropout_in=d_in,
                dropout_out=d_out,
                loss_fn=args.loss_function,
                nheads=args.number_heads,
                attention_window=args.self_attention_window,
                positional_encoding=args.positional_encoding,
                switch=getattr(args, "switch", "dense"),
                cosine_loss=args.cosine_loss,
            )

            trainer = Trainer(
                architecture=args.architecture,
                cfg=cfg,
                lr=args.learning_rate,
                optimizer=args.optimizer,
                max_epochs=args.max_epochs,
                patience=args.patience,
                no_early_stop=args.no_early_stop,
                monitor=monitor,
                check_dir=check_dir,
                seed=int(args.seed),
                gradient_clipping=args.gradient_clipping,
                metric=args.metric,
                use_end_boundary=args.use_end_boundary,
                zero_baseline=args.zero_baseline,
                mesh=mesh,
                pipeline_stages=pipeline_stages,
                sequence_shards=sequence_shards,
                expert_parallel=expert_parallel,
                device_epochs=args.device_epochs or None,
            )

            from ..utils import profiling

            if not args.infer and (param_tuple, index) in pregrid:
                # this configuration already trained in the lockstep grid
                trainer.best_model_path, th_pre, bvl_pre = pregrid[(param_tuple, index)]
                threshold = args.threshold if args.threshold else th_pre
                best_val_loss = args.threshold if args.threshold else bvl_pre
                if args.search_threshold and valid_loader and not args.no_validation:
                    ckpt_params, _, _, _ = ckpt_lib.load(trainer.best_model_path)
                    threshold, sth_val = trainer.search_threshold(ckpt_params, valid_loader)
                    with open("logs", "a") as f:
                        f.write(
                            f"Threshold search: best={threshold} ({args.metric}={sth_val:.4f})\n"
                        )
                    # with a working -sth, config selection runs on the
                    # searched validation metric itself
                    best_val_loss = sth_val
            elif not args.infer:
                with profiling.stage("fit"), profiling.device_trace():
                    final_params, _ = trainer.fit(
                        train_loader, None if args.no_validation else valid_loader
                    )
                threshold = (
                    args.threshold
                    if args.threshold
                    else ckpt_lib.parse_checkpoint_name(trainer.best_model_path)[0]
                )
                best_val_loss = (
                    args.threshold
                    if args.threshold
                    else _resolve_monitored(
                        ckpt_lib.parse_checkpoint_name(trainer.best_model_path)[1]
                    )
                )
                if args.search_threshold and valid_loader and not args.no_validation:
                    # working -sth: pick the threshold on validation docs
                    # (the reference's own search path is dead code)
                    ckpt_params, _, _, _ = ckpt_lib.load(trainer.best_model_path)
                    threshold, sth_val = trainer.search_threshold(ckpt_params, valid_loader)
                    with open("logs", "a") as f:
                        f.write(
                            f"Threshold search: best={threshold} ({args.metric}={sth_val:.4f})\n"
                        )
                    # with a working -sth, config selection runs on the
                    # searched validation metric itself
                    best_val_loss = sth_val
                if args.no_validation or args.save_last_epoch:
                    trainer.save_final(final_params)
            else:
                trainer.best_model_path = os.path.join(check_dir, "final=0.500.ckpt")
                threshold = 0.5
                best_val_loss = 0.5

            params, _, _, _ = ckpt_lib.load(trainer.best_model_path)
            # reference always passes the (filename-parsed or explicit) threshold
            trainer.threshold = threshold
            with profiling.stage("test"):
                res, per_doc, scores = trainer.test(params, test_loader)
            results.append([res])
            fold_results.append(res)

            if args.metric.lower() in ("b", "scaiano"):
                pk_label, wd_label, f1_label = "b_precision", "b_recall", "b_f1"
                if args.metric.lower() == "scaiano":
                    f1_label = "test_loss"
            elif args.metric == "F1":
                f1_label, pk_label, wd_label = "test_loss", "Pk_loss", "WD_loss"
            elif args.metric == "WD":
                f1_label, pk_label, wd_label = "F1_loss", "Pk_loss", "test_loss"
            else:
                f1_label, pk_label, wd_label = "F1_loss", "test_loss", "WD_loss"

            with open("logs", "a") as f:
                f.write("Results for fold number {}\n".format(index))
                if args.metric.lower() in ("b", "scaiano"):
                    f.write("B_precision score: {}\n".format(res[pk_label]))
                    f.write("B_recall score: {}\n".format(res[wd_label]))
                    f.write("B_F1 score: {}\n".format(res[f1_label]))
                    if args.metric.lower() == "b":
                        f.write("B Similarity score: {}\n".format(res["test_loss"]))
                else:
                    f.write("PK score: {}\n".format(res[pk_label]))
                    f.write("WD score: {}\n".format(res[wd_label]))
                    f.write("F1 score: {}\n".format(res[f1_label]))

            if args.all_results:
                for di, file in enumerate(fold[1]):
                    d = dict(per_doc[di])
                    if "test_loss" in d:
                        d[args.metric] = d.pop("test_loss")
                    fold_all_results[file[2]] = d
            if args.all_scores:
                for si, file in enumerate(fold[1]):
                    fold_all_scores[file[2]] = scores[si].tolist()

        # ---- best-configuration bookkeeping --------------------------------
        f1 = fold_results[-1][f1_label] if test else float(np.mean([r[f1_label] for r in fold_results]))
        pk = fold_results[-1][pk_label] if test else float(np.mean([r[pk_label] for r in fold_results]))
        wd = fold_results[-1][wd_label] if test else float(np.mean([r[wd_label] for r in fold_results]))
        metrics_now = {"F1": f1, "Pk": pk, "WD": wd}
        if args.metric.lower() == "b":
            metrics_now["B"] = (
                fold_results[-1]["test_loss"] if test
                else float(np.mean([r["test_loss"] for r in fold_results]))
            )
        if args.hyperparameters_search:
            results_grid_f1[nl].append(f1)
            results_grid_pk[nl].append(pk)
            results_grid_wd[nl].append(wd)

        # with -sth on a maximized metric (F1 / b / scaiano) selection runs
        # on the searched metric and must maximize — the reference compares
        # '<' against an init of 0, which never fires (train_fit.py:102,470;
        # defect not copied)
        maximize_sel = args.search_threshold and args.metric not in ("Pk", "WD")
        if maximize_sel:
            is_best = args.infer or best_val_loss > best_results_val
        else:
            is_best = args.infer or best_val_loss < best_results_val
        if is_best:
            best_results = metrics_now
            if not args.infer:
                best_results_val = best_val_loss
            best_hu, best_nl, best_dropin, best_dropout = hu, nl, d_in, d_out
            all_results, all_scores = fold_all_results, fold_all_scores
            if args.all_results:
                with open("all_results.json", "w") as f:
                    json.dump(all_results, f)
            if args.all_scores:
                with open("all_scores.json", "w") as f:
                    json.dump(all_scores, f)
            if not args.infer:
                best_name = os.path.join(check_dir, "best_model")
                if os.path.exists(best_name):
                    os.remove(best_name)
                os.rename(trainer.best_model_path, best_name)

            if not test:
                # cross-validation: bootstrap CIs over folds (train_fit.py:540-562)
                def bootstrap_ci(values, samples=10000):
                    values = np.asarray(values, np.float64)
                    rng_ = np.random.default_rng(0)
                    boots = rng_.choice(values, size=(samples, len(values)), replace=True).mean(axis=1)
                    return (np.percentile(boots, 97.5) - np.percentile(boots, 2.5)) / 2

                confidence = {
                    "Pk": bootstrap_ci([r[pk_label] for r in fold_results]),
                    "F1": bootstrap_ci([r[f1_label] for r in fold_results]),
                    "WD": bootstrap_ci([r[wd_label] for r in fold_results]),
                }
                if args.metric.lower() == "b":
                    confidence["B"] = bootstrap_ci([r["test_loss"] for r in fold_results])

    if args.metric.lower() in ("b", "scaiano"):
        label_map = {"Pk": "Precision", "WD": "Recall", "F1": "F1"}
    else:
        label_map = {"Pk": "Pk", "WD": "WD", "F1": "F1"}

    output = [
        "Results for experiment {} with following parameters:".format(args.experiment_name),
        "Sentence encoder: {}".format(args.encoder),
        # additive vs the reference contract: records the second modality so
        # predict.py can drive late-fusion checkpoints end to end (the line
        # does NOT start with 'Sentence encoder', so reference parsers that
        # match that prefix are unaffected)
        *(["Second sentence encoder: {}".format(args.encoder2)] if double else []),
        "Neural architecture: {}".format(args.architecture),
        "Batch size: {}".format(args.batch_size),
        "Hidden units: {}".format(best_hu),
        "Dropout in: {}".format(best_dropin),
        "Dropout out: {}".format(best_dropout),
        "Number of layers: {}".format(best_nl),
        "Optimizer: {}".format(args.optimizer),
    ]
    if test:
        output += [
            "Mean {} obtained is {}".format(label_map["Pk"], best_results["Pk"]),
            "Mean F1 obtained is {}".format(best_results["F1"]),
            "Mean {} obtained is {}".format(label_map["WD"], best_results["WD"]),
        ]
        if args.metric.lower() == "b":
            output.append("Mean Boundary Similarity obtained is {}".format(best_results["B"]))
    else:
        output += [
            "Mean {} obtained is {} with a 95% confidence interval of +- {}".format(
                label_map["Pk"], best_results["Pk"], confidence["Pk"]),
            "Mean F1 obtained is {} with a 95% confidence interval of +- {}".format(
                best_results["F1"], confidence["F1"]),
            "Mean {} obtained is {} with a 95% confidence interval of +- {}".format(
                label_map["WD"], best_results["WD"], confidence["WD"]),
        ]
        if args.metric.lower() == "b":
            output.append(
                "Mean Boundary Similarity obtained is {} with a 95% confidence interval of +- {}".format(
                    best_results["B"], confidence["B"])
            )
    if args.zero_shot_labels is not None:
        output.append("Labels: " + str(args.zero_shot_labels))

    if args.write_results:
        with open("results.txt", "w") as f:
            for line in output:
                f.write("\n" + line + "\n")

    from ..utils import profiling as _prof

    _prof.maybe_print_report()

    if args.hyperparameters_search:
        import pandas as pd

        f1_df = pd.DataFrame(results_grid_f1)
        pk_df = pd.DataFrame(results_grid_pk)
        wd_df = pd.DataFrame(results_grid_wd)
        if args.write_results:
            f1_df.to_csv("F1_fit_results.csv")
            pk_df.to_csv("Pk_fit_results.csv")
            wd_df.to_csv("WD_fit_results.csv")
        return output, (f1_df, pk_df, wd_df)
    return output


class MyParser(argparse.ArgumentParser):
    def error(self, message):
        sys.stderr.write("error: %s\n" % message)
        self.print_help()
        sys.exit(2)


def build_parser() -> argparse.ArgumentParser:
    parser = MyParser(
        description="Run training with parameters defined in the relative json file"
    )
    parser.add_argument("--experiment_name", "-exp", default="new_experiment", type=str)
    parser.add_argument("--dataset", "-data", default="choi", type=str)
    parser.add_argument("--batch_size", "-bs", default=64, type=int)
    parser.add_argument("--learning_rate", "-lr", default=0.01, type=float)
    parser.add_argument("--valid_percentage", "-vp", default=0.1, type=float)
    parser.add_argument("--encoder", "-enc", default="stsb-bert-base", type=str)
    parser.add_argument("--encoder2", "-enc2", default=None, type=str)
    parser.add_argument("--online_encoding", "-oe", action="store_true")
    parser.add_argument("--patience", "-pat", default=20, type=int)
    parser.add_argument("--architecture", "-arc", default="biLSTMCRF", type=str)
    parser.add_argument("--hidden_units", "-hu", default=25, type=int)
    parser.add_argument("--num_layers", "-nl", default=1, type=int)
    parser.add_argument("--NoLSTM", action="store_false")
    parser.add_argument("--number_heads", "-nh", default=8, type=int)
    parser.add_argument("--positional_encoding", "-pe", action="store_false")
    parser.add_argument("--threshold", "-th", default=0.0, type=float)
    parser.add_argument("--unidirectional", action="store_false")
    parser.add_argument("--max_length", type=int, required=False)
    parser.add_argument("--dropout_in", "-d_in", default=0.0, type=float)
    parser.add_argument("--dropout_out", "-d_out", default=0.0, type=float)
    parser.add_argument("--batch_second", action="store_false")
    parser.add_argument("--optimizer", "-opt", default="Adam", type=str)
    parser.add_argument("--max_epochs", "-max", default=100, type=int)
    parser.add_argument("--num_gpus", "-gpus", default=1, type=int)
    parser.add_argument("--auto_lr_finder", "-auto_lr", action="store_true")
    parser.add_argument("--save_all_checkpoints", "-savec", action="store_true")
    parser.add_argument("--save_embeddings", "-savee", action="store_true")
    parser.add_argument("--use_end_boundary", "-ueb", action="store_true")
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument("--write_results", "-wr", action="store_false")
    parser.add_argument("--hyperparameters_search", "-hs", action="store_true")
    # TPU-native extension (no reference equivalent): train the whole
    # dropout grid in one lockstep vmapped program per fold
    parser.add_argument("--parallel_grid", "-pg", action="store_true")
    # TPU-native extension: stage the Transformer layer stack over this
    # many devices (GPipe microbatching, parallel/pipeline.py); replaces
    # the DP/TP mesh for that run
    parser.add_argument("--pipeline_stages", "-pps", type=int, default=0)
    # sequence (context) parallelism: shard the UNIT axis of long documents
    # over N chips (Transformer + local attention only, parallel/sequence.py)
    parser.add_argument("--sequence_shards", "-sqs", type=int, default=0)
    # expert parallelism for SwitchBiLSTM twin towers (parallel/expert.py):
    # auto = shard when --switch lstm and >=2 devices; off = dense both-towers
    parser.add_argument(
        "--expert_parallel", default="auto", choices=["auto", "on", "off"]
    )
    # device-resident epoch windows (train/device_fit.py): K epochs per
    # dispatch with scheduler/early-stop/checkpoint decisions on device;
    # needs uniform batch shapes (ragged corpora fall back with a notice)
    parser.add_argument("--device_epochs", "-de", action="store_true")
    # SwitchBiLSTM adaptation mode (the reference's TextSegmenter `switch`
    # parameter, lightning_model.py:227-241 — never exposed by its CLI)
    parser.add_argument("--switch", default="dense", choices=["dense", "lstm"])
    parser.add_argument("--hidden_units_search_space", "-huss", nargs="*", type=int)
    parser.add_argument("--number_layers_search_space", "-nlss", nargs="*", type=int)
    parser.add_argument("--dropout_in_search_space", "-diss", nargs="*", type=float)
    parser.add_argument("--dropout_out_search_space", "-doss", nargs="*", type=float)
    parser.add_argument("--batch_size_search_space", "-bass", nargs="*", type=int)
    parser.add_argument(
        "--metric", default="Pk", type=str, choices=["Pk", "F1", "WD", "b", "scaiano"]
    )
    parser.add_argument("--delete_last_sentence", "-dls", action="store_true")
    parser.add_argument("--zero_shot_labels", "-zsl", type=str, nargs="*")
    parser.add_argument("--search_threshold", "-sth", action="store_true")
    parser.add_argument("--cosine_loss", "-cos", action="store_true")
    parser.add_argument("--gradient_clipping", "-gc", default=0.0, type=float)
    parser.add_argument("--embedding_folder", "-ef", type=str, required=True)
    parser.add_argument("--embedding_folder2", "-ef2", type=str, default=None)
    parser.add_argument("--lab_folder", "-lf", type=str, required=True)
    parser.add_argument("--inverse_augment", "-ia", action="store_true")
    parser.add_argument("--zero_baseline", "-zb", action="store_true")
    parser.add_argument(
        "--loss_function", "-loss",
        choices=["CrossEntropy", "BinaryCrossEntropy", "FocalLoss"],
        default="CrossEntropy",
    )
    parser.add_argument("--seed", default=42)
    parser.add_argument("--no_validation", "-no_val", action="store_true")
    parser.add_argument("--no_early_stop", "-no_stop", action="store_true")
    parser.add_argument("--save_last_epoch", "-s_last", action="store_true")
    parser.add_argument("--pca_reduce", "-pca", action="store_true")
    parser.add_argument("--pca_value", "-pca_v", default=167, type=int)
    parser.add_argument("--all_results", "-ar", action="store_true")
    parser.add_argument("--all_scores", "-as", action="store_true")
    parser.add_argument("--k_folds", "-kcv", default=5, type=int)
    parser.add_argument("--mask_inner_sentences", "-msk", action="store_true")
    parser.add_argument("--mask_probability", "-msk_pr", default=0.9, type=float)
    parser.add_argument("--standard_split", "-split", type=str)
    parser.add_argument("--self_attention_window", "-window", default=120, type=int)
    parser.add_argument("--both_datasets", "-bd", action="store_true")
    parser.add_argument("--infer", action="store_true")
    parser.add_argument("--timing_file", required=False, type=str)
    return parser


def cli_main(argv=None):
    args = build_parser().parse_args(argv)
    return main(args)


if __name__ == "__main__":
    cli_main()
