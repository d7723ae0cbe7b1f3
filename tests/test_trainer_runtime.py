"""Trainer runtime behaviors added in round 2:

- per-document all_results entries (reference tests with batch size 1, so
  its all_results holds each document's OWN metrics,
  /root/reference/models/lightning_model.py:671-674)
- threshold search on decode-consistent probabilities for every loss head
- mesh-sharded Trainer.fit matching single-device numerics (incl. the
  zero-length document padding used to even out the batch axis)
- the detect_anomaly NaN tripwire (analogue of the reference's
  Trainer(detect_anomaly=True), /root/reference/train_fit.py:289)
"""
import numpy as np
import pytest

import jax

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.parallel.mesh import make_mesh
from multimodaltopicsegmentation_tpu.train.loop import Trainer


def _batch(rng, B=4, L=24, dim=16, boundary_p=0.15, lengths=None):
    lengths = np.full((B,), L, np.int32) if lengths is None else np.asarray(lengths, np.int32)
    return {
        "src_tokens": rng.standard_normal((B, L, dim)).astype(np.float32),
        "tgt_tokens": (rng.random((B, L)) < boundary_p).astype(np.float32),
        "src_lengths": lengths,
        "n_real": B,
    }


def _trainer(tmp_path, loss_fn="FocalLoss", arch="BiLSTM", **kw):
    cfg = TaggerConfig(embedding_dim=16, hidden_dim=8, num_layers=1, loss_fn=loss_fn)
    return Trainer(arch, cfg, lr=1e-3, max_epochs=2, monitor="training_loss",
                   check_dir=str(tmp_path / "ck"), **kw), cfg


def test_per_document_results_differ(tmp_path, rng):
    """Two documents with different error patterns -> different all_results
    entries (round-1 bug: the corpus aggregate was copied per doc)."""
    trainer, cfg = _trainer(tmp_path)
    params = trainer.arch.init(jax.random.PRNGKey(0))
    # doc 0: target has boundaries everywhere; doc 1: none except forced —
    # an untrained model cannot score these identically
    batch = _batch(rng, B=2, L=30)
    batch["tgt_tokens"][0] = (np.arange(30) % 3 == 2).astype(np.float32)
    batch["tgt_tokens"][1] = 0.0
    batch["tgt_tokens"][:, -1] = 1.0
    results, per_doc, scores = trainer.test(params, [batch])
    assert len(per_doc) == 2
    assert per_doc[0] != per_doc[1], per_doc
    # aggregate must be the mean of the per-doc entries
    key = "test_loss"
    assert results[key] == pytest.approx((per_doc[0][key] + per_doc[1][key]) / 2)


def test_per_document_scores_shapes(tmp_path, rng):
    """CE stores the full [L, C] logit rows; sigmoid heads store [L]."""
    batch = _batch(rng, B=2, L=20)
    for loss_fn, expect_cols in [("CrossEntropy", 2), ("FocalLoss", None)]:
        trainer, cfg = _trainer(tmp_path, loss_fn=loss_fn)
        params = trainer.arch.init(jax.random.PRNGKey(0))
        _, _, scores = trainer.test(params, [batch])
        for s in scores:
            if expect_cols:
                assert s.shape == (20, expect_cols)
            else:
                assert s.shape == (20,)


@pytest.mark.parametrize("loss_fn", ["CrossEntropy", "BinaryCrossEntropy", "FocalLoss"])
def test_search_threshold_decode_consistent(tmp_path, rng, loss_fn):
    """The searched threshold must be applied to the same probabilities
    head_decode thresholds — for every loss head (round-1 bug: CE compared
    raw class-0 logits against the threshold)."""
    trainer, cfg = _trainer(tmp_path, loss_fn=loss_fn)
    params = trainer.arch.init(jax.random.PRNGKey(0))
    batch = _batch(rng, B=3, L=25)
    th, val = trainer.search_threshold(params, [batch])
    assert th in [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
    assert np.isfinite(val)
    # cross-check: recompute the metric at the returned threshold via the
    # actual decode path; it must equal the search's winning value
    from multimodaltopicsegmentation_tpu.eval import metrics as M

    scores, tags = trainer.arch.decode(
        params, batch["src_tokens"], batch["src_lengths"], th
    )
    tags = np.asarray(tags)
    vals = []
    for i in range(3):
        L = int(batch["src_lengths"][i])
        vals.append(
            M.compute_Pk(
                tags[i][:L].astype(int).tolist(),
                batch["tgt_tokens"][i][:L].astype(int).tolist(),
            )
        )
    assert float(np.mean(vals)) == pytest.approx(val, abs=1e-9)


def test_search_threshold_crf_returns_default(tmp_path, rng):
    trainer, cfg = _trainer(tmp_path, arch="biLSTMCRF")
    params = trainer.arch.init(jax.random.PRNGKey(0))
    th, val = trainer.search_threshold(params, [_batch(rng, B=2, L=20)])
    assert th == 0.5


@pytest.mark.parametrize("arch,loss_fn", [("BiLSTM", "FocalLoss"),
                                          ("BiLSTM", "CrossEntropy"),
                                          ("biLSTMCRF", "CrossEntropy")])
@pytest.mark.slow
def test_mesh_fit_matches_single_device(tmp_path, rng, arch, loss_fn):
    """Trainer.fit over the 8-device mesh = single-device numerics, with an
    odd batch that forces zero-length document padding."""
    B = 7  # not divisible by the 8-wide data axis -> pad to 8
    batches = [_batch(rng, B=B, L=16)]
    t_ref, _ = _trainer(tmp_path / "a", loss_fn=loss_fn, arch=arch)
    _, hist_ref = t_ref.fit([dict(b) for b in batches])

    mesh = make_mesh(8, model_parallel=1)
    t_mesh, _ = _trainer(tmp_path / "b", loss_fn=loss_fn, arch=arch, mesh=mesh)
    _, hist_mesh = t_mesh.fit([dict(b) for b in batches])

    for r, m in zip(hist_ref, hist_mesh):
        assert r["training_loss"] == pytest.approx(m["training_loss"], rel=2e-5)


def test_detect_anomaly_tripwire(tmp_path, rng):
    trainer, cfg = _trainer(tmp_path, detect_anomaly=True)
    batch = _batch(rng, B=2, L=10)
    batch["src_tokens"][0, 0, 0] = np.nan
    with pytest.raises(FloatingPointError, match="epoch 0, batch 0"):
        trainer.fit([batch])


def test_detect_anomaly_off_trains_through(tmp_path, rng):
    trainer, cfg = _trainer(tmp_path, detect_anomaly=False)
    batch = _batch(rng, B=2, L=10)
    batch["src_tokens"][0, 0, 0] = np.nan
    trainer.fit([batch])  # must not raise


@pytest.mark.slow
def test_mesh_fit_late_fusion_matches_single_device(tmp_path, rng):
    """The 'double' extra input (second modality) shards with the batch."""
    cfg = TaggerConfig(embedding_dim=12, embedding_dim2=10, hidden_dim=8,
                       num_layers=1, loss_fn="FocalLoss")
    B, L = 7, 12
    batch = {
        "src_tokens": rng.standard_normal((B, L, 12)).astype(np.float32),
        "src_tokens2": rng.standard_normal((B, L, 10)).astype(np.float32),
        "tgt_tokens": (rng.random((B, L)) < 0.2).astype(np.float32),
        "src_lengths": np.full((B,), L, np.int32),
        "n_real": B,
    }

    def fit(mesh, sub):
        t = Trainer("BiLSTMLateFusion", cfg, lr=1e-3, max_epochs=2,
                    monitor="training_loss", check_dir=str(tmp_path / sub), mesh=mesh)
        _, hist = t.fit([dict(batch)])
        return hist

    hist_ref = fit(None, "a")
    hist_mesh = fit(make_mesh(8, model_parallel=1), "b")
    for r, m in zip(hist_ref, hist_mesh):
        assert r["training_loss"] == pytest.approx(m["training_loss"], rel=2e-5)


@pytest.mark.slow
def test_mesh_fit_domain_adapt_matches_single_device(tmp_path, rng):
    """The 'domain' extra input (per-doc ids) shards with the batch."""
    cfg = TaggerConfig(embedding_dim=12, hidden_dim=8, num_layers=1,
                       loss_fn="FocalLoss")
    B, L = 7, 12
    batch = {
        "src_tokens": rng.standard_normal((B, L, 12)).astype(np.float32),
        "tgt_tokens": (rng.random((B, L)) < 0.2).astype(np.float32),
        "src_lengths": np.full((B,), L, np.int32),
        "domain": (rng.random(B) < 0.5).astype(np.int32),
        "n_real": B,
    }

    def fit(mesh, sub):
        t = Trainer("SwitchBiLSTM", cfg, lr=1e-3, max_epochs=2,
                    monitor="training_loss", check_dir=str(tmp_path / sub), mesh=mesh)
        _, hist = t.fit([dict(batch)])
        return hist

    hist_ref = fit(None, "a")
    hist_mesh = fit(make_mesh(8, model_parallel=1), "b")
    for r, m in zip(hist_ref, hist_mesh):
        assert r["training_loss"] == pytest.approx(m["training_loss"], rel=2e-5)


def test_predict_handles_domain_and_double(tmp_path):
    """Trainer.predict must route the extra inputs exactly like test()."""
    rng = np.random.default_rng(0)
    B, L = 3, 12

    def batch(D, extra=None):
        b = {
            "src_tokens": rng.standard_normal((B, L, D)).astype(np.float32),
            "src_lengths": np.full((B,), L, np.int64),
            "tgt_tokens": (rng.random((B, L)) < 0.2).astype(np.float32),
        }
        if extra == "domain":
            b["domain"] = np.asarray([1, 0, 1], np.int64)
        if extra == "double":
            b["src_tokens2"] = rng.standard_normal((B, L, 7)).astype(np.float32)
        return b

    cfg = TaggerConfig(embedding_dim=10, hidden_dim=8, num_layers=1,
                       switch="dense", loss_fn="FocalLoss")
    t = Trainer("SwitchBiLSTM", cfg, max_epochs=1, check_dir=str(tmp_path / "a"),
                expert_parallel=False)
    params = t.arch.init(__import__("jax").random.PRNGKey(0))
    tags = t.predict(params, [batch(10, "domain")])
    assert len(tags) == B and all(len(x) == L for x in tags)

    cfg2 = TaggerConfig(embedding_dim=10, embedding_dim2=7, hidden_dim=8,
                        num_layers=1, loss_fn="FocalLoss")
    t2 = Trainer("BiLSTMLateFusion", cfg2, max_epochs=1, check_dir=str(tmp_path / "b"))
    params2 = t2.arch.init(__import__("jax").random.PRNGKey(0))
    tags2 = t2.predict(params2, [batch(10, "double")])
    assert len(tags2) == B and all(len(x) == L for x in tags2)


def test_decode_queue_window_many_batches(tmp_path, rng, monkeypatch):
    """More batches than DECODE_QUEUE_DEPTH: the sliding drain must keep
    results in batch order and identical to a one-batch-at-a-time run
    through test(), predict(), and search_threshold().

    The depth is monkeypatched down to 3 (read at call time in
    BoundedDrain): the overflow property is depth-relative, and driving
    12 batches against the production depth 8 made this the fast tier's
    single most expensive test (50 s; round-5 latency pass)."""
    from multimodaltopicsegmentation_tpu.train import loop as loop_mod

    monkeypatch.setattr(loop_mod, "DECODE_QUEUE_DEPTH", 3)
    DECODE_QUEUE_DEPTH = 3

    trainer, cfg = _trainer(tmp_path)
    params = trainer.arch.init(jax.random.PRNGKey(0))
    n = DECODE_QUEUE_DEPTH + 4
    batches = [_batch(rng, B=2, L=20) for _ in range(n)]

    results, per_doc, scores = trainer.test(params, batches)
    tags = trainer.predict(params, batches)
    th, val = trainer.search_threshold(params, batches)
    assert len(per_doc) == 2 * n and len(tags) == 2 * n

    per_doc_serial, tags_serial, scores_serial = [], [], []
    for b in batches:
        _, pd, sc = trainer.test(params, [b])
        per_doc_serial.extend(pd)
        tags_serial.extend(trainer.predict(params, [b]))
        scores_serial.extend(sc)
    assert per_doc == per_doc_serial
    assert tags == tags_serial
    for a, b in zip(scores, scores_serial):
        np.testing.assert_allclose(a, b, atol=1e-6)
    th_s, val_s = trainer.search_threshold(params, batches[:1])
    assert th in (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6) and np.isfinite(val)
    assert th_s in (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6)


def test_final_checkpoint_parse_sentinel(tmp_path, monkeypatch):
    """`final=0.500.ckpt` has no monitored loss in its name: the parse must
    return a NaN sentinel (not a synthesized 0.5 indistinguishable from a
    real loss), and train_fit's resolver must log the synthesis while
    falling back to the reference's 0.5 for selection."""
    from multimodaltopicsegmentation_tpu.train import checkpoints as ckpt_lib
    from multimodaltopicsegmentation_tpu.cli.train_fit import _resolve_monitored

    th, vl = ckpt_lib.parse_checkpoint_name("checkpoints/final=0.500.ckpt")
    assert th == 0.5 and np.isnan(vl)

    # a real checkpoint name still parses exactly
    name = ckpt_lib.checkpoint_name(epoch=7, monitored=0.1234, threshold=0.4)
    th, vl = ckpt_lib.parse_checkpoint_name(name)
    assert (th, vl) == (0.4, 0.1234)

    monkeypatch.chdir(tmp_path)
    assert _resolve_monitored(vl) == 0.1234  # real loss passes through, no log
    assert not (tmp_path / "logs").exists()
    assert _resolve_monitored(float("nan")) == 0.5
    assert "synthesized" in (tmp_path / "logs").read_text()
