"""Device-resident epoch windows (train/device_fit.py).

The window program must be DECISION-IDENTICAL to the host epoch loop —
same losses, same early-stop epoch, same plateau-LR trajectory, same
checkpoint filename and parameters — because both replicate the
reference's Lightning stack (ReduceLROnPlateau / EarlyStopping /
ModelCheckpoint, /root/reference/models/lightning_model.py:759-781).
On CPU the two paths are bit-identical; these tests pin that.
"""
import os

import numpy as np
import pytest

import jax

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.train import checkpoints as ckpt_lib
from multimodaltopicsegmentation_tpu.train.loop import Trainer


def _batch(rng, B=4, L=24, dim=16, boundary_p=0.15, domain=None, double=False):
    b = {
        "src_tokens": rng.standard_normal((B, L, dim)).astype(np.float32),
        "tgt_tokens": (rng.random((B, L)) < boundary_p).astype(np.float32),
        "src_lengths": np.full((B,), L, np.int32),
    }
    if domain is not None:
        b["domain"] = np.full((B,), domain, np.int32)
    if double:
        b["src_tokens2"] = rng.standard_normal((B, L, dim)).astype(np.float32)
    return b


def _fit_both(tmp_path, arch, cfg, tb, vb, **kw):
    out = {}
    for mode in ("host", "device"):
        tr = Trainer(arch, cfg, check_dir=str(tmp_path / f"ck_{mode}"),
                     device_epochs=(mode == "device"), **kw)
        params, hist = tr.fit(tb, vb)
        out[mode] = (tr, params, hist)
    return out["host"], out["device"]


def _assert_same_fit(host, device):
    tr_h, _, hist_h = host
    tr_d, _, hist_d = device
    assert len(hist_h) == len(hist_d)
    for a, b in zip(hist_h, hist_d):
        assert a["training_loss"] == pytest.approx(b["training_loss"], abs=1e-6)
        if a["val_loss"] is None:
            assert b["val_loss"] is None
        else:
            assert a["val_loss"] == pytest.approx(b["val_loss"], abs=1e-6)
    assert (os.path.basename(tr_h.best_model_path)
            == os.path.basename(tr_d.best_model_path))
    ph = ckpt_lib.load(tr_h.best_model_path)[0]
    pd = ckpt_lib.load(tr_d.best_model_path)[0]
    for a, b in zip(jax.tree.leaves(ph), jax.tree.leaves(pd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_matches_host_loop_with_early_stop(tmp_path, rng):
    """patience=4 fires mid-window (window 10): the device path must stop
    at the same epoch, keep the same best checkpoint, and truncate history
    exactly like the host `break`."""
    cfg = TaggerConfig(embedding_dim=16, hidden_dim=8, num_layers=1,
                       loss_fn="FocalLoss")
    tb = [_batch(np.random.default_rng(s)) for s in range(3)]
    vb = [_batch(np.random.default_rng(100)), _batch(np.random.default_rng(101))]
    host, device = _fit_both(tmp_path, "BiLSTM", cfg, tb, vb,
                             lr=1e-2, max_epochs=25, patience=4)
    _assert_same_fit(host, device)
    assert len(host[2]) < 25  # early stop actually fired


@pytest.mark.slow
def test_matches_host_loop_plateau_lr(tmp_path, rng):
    """Long enough that ReduceLROnPlateau(patience=10) actually cuts the
    LR: trajectory parity proves the in-scan scheduler updates the optax
    injected hyperparam exactly like host _set_lr."""
    cfg = TaggerConfig(embedding_dim=8, hidden_dim=4, num_layers=1,
                       loss_fn="FocalLoss")
    tb = [_batch(np.random.default_rng(s), B=2, L=12, dim=8) for s in range(2)]
    # monitor the (quickly plateauing) val loss of a DIFFERENT distribution
    vb = [_batch(np.random.default_rng(7), B=2, L=12, dim=8, boundary_p=0.9)]
    host, device = _fit_both(tmp_path, "BiLSTM", cfg, tb, vb,
                             lr=5e-2, max_epochs=30, no_early_stop=True)
    _assert_same_fit(host, device)


def test_matches_host_no_valid_batches(tmp_path, rng):
    cfg = TaggerConfig(embedding_dim=8, hidden_dim=4, num_layers=1,
                       loss_fn="CrossEntropy")
    tb = [_batch(np.random.default_rng(s), B=2, L=12, dim=8) for s in range(2)]
    host, device = _fit_both(tmp_path, "BiLSTM", cfg, tb, None,
                             lr=1e-2, max_epochs=7, monitor="training_loss")
    _assert_same_fit(host, device)


@pytest.mark.slow
@pytest.mark.parametrize("arch,extra", [("SwitchBiLSTM", "domain"),
                                        ("BiLSTMLateFusion", "double")])
def test_matches_host_extra_inputs(tmp_path, rng, arch, extra):
    """The domain / second-modality extras stack along the batch axis of
    the window scan like the main inputs."""
    cfg = TaggerConfig(embedding_dim=8, embedding_dim2=8, hidden_dim=4,
                       num_layers=1, loss_fn="FocalLoss")
    kw = {"domain": 0} if extra == "domain" else {"double": True}
    tb = [_batch(np.random.default_rng(s), B=2, L=12, dim=8, **kw)
          for s in range(2)]
    if extra == "domain":
        tb[1]["domain"][:] = 1
    vb = [_batch(np.random.default_rng(9), B=2, L=12, dim=8, **kw)]
    host, device = _fit_both(tmp_path, arch, cfg, tb, vb,
                             lr=1e-2, max_epochs=5, expert_parallel=False)
    _assert_same_fit(host, device)


def test_detect_anomaly_replay(tmp_path, rng):
    """NaN in train batch 1 of epoch 0: same FloatingPointError text as the
    host tripwire, and (host rule: the raise precedes the first snapshot)
    no checkpoint file is written."""
    cfg = TaggerConfig(embedding_dim=8, hidden_dim=4, num_layers=1,
                       loss_fn="FocalLoss")
    tb = [_batch(np.random.default_rng(s), B=2, L=10, dim=8) for s in range(2)]
    tb[1]["src_tokens"][0, 0, 0] = np.nan
    tr = Trainer("BiLSTM", cfg, lr=1e-3, max_epochs=5, detect_anomaly=True,
                 check_dir=str(tmp_path / "ck"), device_epochs=True)
    with pytest.raises(FloatingPointError, match="epoch 0, batch 1"):
        tr.fit(tb, None)
    assert tr.best_model_path is None
    assert not os.path.exists(str(tmp_path / "ck")) or not os.listdir(
        str(tmp_path / "ck"))


def test_ragged_batches_fall_back_to_host_loop(tmp_path, rng, capsys):
    cfg = TaggerConfig(embedding_dim=8, hidden_dim=4, num_layers=1,
                       loss_fn="FocalLoss")
    tb = [_batch(np.random.default_rng(0), B=2, L=12, dim=8),
          _batch(np.random.default_rng(1), B=2, L=20, dim=8)]
    tr = Trainer("BiLSTM", cfg, lr=1e-3, max_epochs=2,
                 check_dir=str(tmp_path / "ck"), device_epochs=True)
    params, hist = tr.fit(tb, None)
    assert len(hist) == 2
    assert "falling back to the host epoch loop" in capsys.readouterr().err


def test_exclusive_with_parallel_modes(tmp_path, rng):
    from multimodaltopicsegmentation_tpu.parallel.mesh import make_mesh

    cfg = TaggerConfig(embedding_dim=8, hidden_dim=4, num_layers=1,
                       loss_fn="FocalLoss")
    tr = Trainer("BiLSTM", cfg, max_epochs=1, check_dir=str(tmp_path / "ck"),
                 mesh=make_mesh(), device_epochs=True)
    with pytest.raises(ValueError, match="device_epochs"):
        tr.fit([_batch(np.random.default_rng(0), B=8, L=12, dim=8)], None)


def test_window_smaller_than_run_and_refit_reuses_compile(tmp_path, rng,
                                                          monkeypatch):
    """max_epochs not a multiple of the window, plus a second fit with a
    DIFFERENT max_epochs: epoch0/max_epochs are traced scalars, so the
    cached window program must be reused (no new cache entry)."""
    monkeypatch.setenv("MTS_DEVICE_EPOCH_WINDOW", "4")
    cfg = TaggerConfig(embedding_dim=8, hidden_dim=4, num_layers=1,
                       loss_fn="FocalLoss")
    tb = [_batch(np.random.default_rng(s), B=2, L=12, dim=8) for s in range(2)]
    tr = Trainer("BiLSTM", cfg, lr=1e-2, max_epochs=6, no_early_stop=True,
                 check_dir=str(tmp_path / "ck"), device_epochs=True)
    _, hist = tr.fit(tb, None)
    assert len(hist) == 6
    assert len(tr._fit_window_cache) == 1
    tr.max_epochs = 9
    _, hist = tr.fit(tb, None)
    assert len(hist) == 9
    assert len(tr._fit_window_cache) == 1
