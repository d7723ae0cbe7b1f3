"""Production-Trainer routing of sequence and expert parallelism.

The library layers (parallel/sequence.py, parallel/expert.py) are parity-
tested in test_sequence_parallel.py / test_expert_parallel.py; these tests
assert the TRAINER reaches them and that a full fit/test cycle through the
sharded paths reproduces the single-device Trainer's numbers exactly
(dropout 0, same seed, 8-virtual-device CPU mesh).
"""
import numpy as np
import pytest

import jax

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # Trainer mesh/sequence/expert fits are compile-heavy


def _batches(rng, B=4, L=64, D=16, n_batches=2, domains=None):
    out = []
    for _ in range(n_batches):
        lengths = rng.integers(L // 2, L + 1, B)
        lengths[0] = L
        x = rng.standard_normal((B, L, D)).astype(np.float32)
        tags = (rng.random((B, L)) < 0.2).astype(np.float32)
        tags[np.arange(L)[None, :] >= lengths[:, None]] = -1.0
        b = {
            "src_tokens": x,
            "src_lengths": lengths.astype(np.int64),
            "tgt_tokens": tags,
        }
        if domains is not None:
            b["domain"] = np.asarray(domains[:B], np.int64)
        out.append(b)
    return out


def _trainer(arch, cfg, tmp_path, tag, **kw):
    return Trainer(
        architecture=arch, cfg=cfg, lr=1e-2, max_epochs=3,
        monitor="training_loss", check_dir=str(tmp_path / tag), seed=7, **kw
    )


def test_sequence_shards_trainer_parity(tmp_path, rng):
    cfg = TaggerConfig(
        embedding_dim=16, hidden_dim=32, num_layers=2, nheads=2,
        attention_window=4, loss_fn="FocalLoss",
    )
    train = _batches(rng, n_batches=2)
    test = _batches(np.random.default_rng(5), n_batches=1)

    t_ref = _trainer("Transformer", cfg, tmp_path, "ref")
    _, hist_ref = t_ref.fit([dict(b) for b in train])
    res_ref, _, _ = t_ref.test(t_ref.params, [dict(b) for b in test])

    t_seq = _trainer("Transformer", cfg, tmp_path, "seq", sequence_shards=4)
    assert t_seq.seq_mesh is not None and t_seq.mesh is None
    _, hist_seq = t_seq.fit([dict(b) for b in train])
    res_seq, _, _ = t_seq.test(t_seq.params, [dict(b) for b in test])

    for hr, hs in zip(hist_ref, hist_seq):
        np.testing.assert_allclose(
            hs["training_loss"], hr["training_loss"], rtol=2e-4, atol=1e-6
        )
    for k in res_ref:
        np.testing.assert_allclose(res_seq[k], res_ref[k], rtol=1e-5)


def test_sequence_shards_pads_unit_axis(tmp_path, rng):
    """L=60 does not divide over 4 shards; the Trainer pads to 64 and the
    results still match the unsharded run."""
    cfg = TaggerConfig(
        embedding_dim=16, hidden_dim=32, num_layers=1, nheads=2,
        attention_window=4, loss_fn="FocalLoss",
    )
    train = _batches(rng, L=60, n_batches=1)
    t_ref = _trainer("Transformer", cfg, tmp_path, "ref2")
    _, hist_ref = t_ref.fit([dict(b) for b in train])
    t_seq = _trainer("Transformer", cfg, tmp_path, "seq2", sequence_shards=4)
    _, hist_seq = t_seq.fit([dict(b) for b in train])
    np.testing.assert_allclose(
        hist_seq[-1]["training_loss"], hist_ref[-1]["training_loss"],
        rtol=2e-4, atol=1e-6,
    )


def test_expert_parallel_trainer_parity(tmp_path, rng):
    cfg = TaggerConfig(
        embedding_dim=12, hidden_dim=8, num_layers=1, switch="lstm",
        loss_fn="FocalLoss",
    )
    domains = [1, 0, 0, 1]
    train = _batches(rng, D=12, n_batches=2, domains=domains)
    test = _batches(np.random.default_rng(9), D=12, n_batches=1, domains=domains)

    t_ref = _trainer("SwitchBiLSTM", cfg, tmp_path, "dref", expert_parallel=False)
    assert t_ref.expert_mesh is None
    _, hist_ref = t_ref.fit([dict(b) for b in train])
    res_ref, _, _ = t_ref.test(t_ref.params, [dict(b) for b in test])

    # expert_parallel=None auto-enables for the twin-tower SwitchBiLSTM
    t_ex = _trainer("SwitchBiLSTM", cfg, tmp_path, "dex")
    assert t_ex.expert_mesh is not None and t_ex.mesh is None
    _, hist_ex = t_ex.fit([dict(b) for b in train])
    res_ex, _, _ = t_ex.test(t_ex.params, [dict(b) for b in test])

    for hr, he in zip(hist_ref, hist_ex):
        np.testing.assert_allclose(
            he["training_loss"], hr["training_loss"], rtol=2e-4, atol=1e-6
        )
    for k in res_ref:
        np.testing.assert_allclose(res_ex[k], res_ref[k], rtol=1e-5)


def test_expert_parallel_not_auto_for_dense_switch(tmp_path):
    cfg = TaggerConfig(embedding_dim=12, hidden_dim=8, switch="dense")
    t = _trainer("SwitchBiLSTM", cfg, tmp_path, "dd")
    assert t.expert_mesh is None  # dense heads are not expert-sized


def test_parallel_mode_validation(tmp_path):
    cfg = TaggerConfig(embedding_dim=12, hidden_dim=8)
    with pytest.raises(ValueError, match="sequence_shards applies"):
        _trainer("BiLSTM", cfg, tmp_path, "v1", sequence_shards=4)
    with pytest.raises(ValueError, match="expert_parallel applies"):
        _trainer("BiLSTM", cfg, tmp_path, "v2", expert_parallel=True)
    tcfg = TaggerConfig(embedding_dim=16, hidden_dim=32, nheads=2, num_layers=2)
    with pytest.raises(ValueError, match="needs that many devices"):
        _trainer("Transformer", tcfg, tmp_path, "v3",
                 sequence_shards=len(jax.devices()) + 1)


@pytest.mark.slow
def test_train_fit_cli_sequence_shards(tmp_path):
    """--sequence_shards through the real train_fit CLI produces the full
    artifact set (smoke; numerics covered by the Trainer parity above)."""
    import os

    from tests.synth import make_synthetic_corpus
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=8, dim=32)
    exp = str(tmp_path / "exp_seq")
    tf.EMBEDDING_SIZES["CNN"] = 32
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "Transformer", "-enc", "CNN",
            "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-3",
            "-bs", "4", "-max", "2", "-vp", "0.2", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-split", split,
            "-hu", "64", "-nl", "2", "-nh", "2", "-window", "4",
            "--sequence_shards", "4",
        ])
        main(args)
    finally:
        os.chdir(cwd)
    assert os.path.exists(os.path.join(exp, "results.txt"))
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Neural architecture: Transformer" in txt


def test_sharded_modes_route_search_threshold_and_predict(tmp_path, rng):
    """search_threshold and predict must use the sharded decode exactly like
    test() (review finding: they bypassed it and ran unsharded)."""
    cfg = TaggerConfig(
        embedding_dim=16, hidden_dim=32, num_layers=1, nheads=2,
        attention_window=4, loss_fn="FocalLoss",
    )
    valid = _batches(rng, L=60, n_batches=1)  # 60 also exercises unit padding
    t_ref = _trainer("Transformer", cfg, tmp_path, "str")
    params = t_ref.arch.init(jax.random.PRNGKey(3))
    th_ref, val_ref = t_ref.search_threshold(params, [dict(b) for b in valid])
    pred_ref = t_ref.predict(params, [dict(b) for b in valid])

    t_seq = _trainer("Transformer", cfg, tmp_path, "sts", sequence_shards=4)
    th_seq, val_seq = t_seq.search_threshold(params, [dict(b) for b in valid])
    pred_seq = t_seq.predict(params, [dict(b) for b in valid])
    assert th_seq == th_ref
    np.testing.assert_allclose(val_seq, val_ref, rtol=1e-5)
    assert pred_seq == pred_ref

    ecfg = TaggerConfig(
        embedding_dim=12, hidden_dim=8, num_layers=1, switch="lstm",
        loss_fn="FocalLoss",
    )
    ev = _batches(rng, D=12, n_batches=1, domains=[1, 0, 0, 1])
    t_dense = _trainer("SwitchBiLSTM", ecfg, tmp_path, "ed", expert_parallel=False)
    eparams = t_dense.arch.init(jax.random.PRNGKey(4))
    th_d, val_d = t_dense.search_threshold(eparams, [dict(b) for b in ev])
    pred_d = t_dense.predict(eparams, [dict(b) for b in ev])
    t_ex = _trainer("SwitchBiLSTM", ecfg, tmp_path, "ee")
    assert t_ex.expert_mesh is not None
    th_e, val_e = t_ex.search_threshold(eparams, [dict(b) for b in ev])
    pred_e = t_ex.predict(eparams, [dict(b) for b in ev])
    assert th_e == th_d
    np.testing.assert_allclose(val_e, val_d, rtol=1e-5)
    assert pred_e == pred_d
