"""Pipeline parallelism: pipelined encoder == single-device encoder.

Runs on the 8-virtual-device CPU mesh (conftest). The pipelined program is
one differentiable SPMD computation, so both the forward scores and the
training gradients must match the plain TransformerSegmenter bit-for-bit up
to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build
from multimodaltopicsegmentation_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_transformer_loss,
    pipeline_transformer_scores,
)

pytestmark = pytest.mark.slow  # GPipe grad-parity compiles dominate the suite


def _setup(n_layers=4, restricted=True, L=24, B=8):
    cfg = TaggerConfig(
        embedding_dim=16, hidden_dim=32, num_layers=n_layers, nheads=2,
        attention_window=4, loss_fn="FocalLoss",
    )
    from multimodaltopicsegmentation_tpu.models.transformers import TransformerSegmenter

    seg = TransformerSegmenter(cfg, restricted=restricted)
    params = seg.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, 16)), jnp.float32)
    lengths = jnp.asarray([L, L - 4, L - 7, L, 5, L, 12, 3][:B], jnp.int32)
    tags = jnp.asarray((rng.random((B, L)) < 0.2).astype(np.float32))
    return seg, params, x, lengths, tags


@pytest.mark.parametrize("n_micro", [4, 8])
@pytest.mark.parametrize("restricted", [True, False])
def test_pipeline_scores_match_single_device(n_micro, restricted):
    seg, params, x, lengths, _ = _setup(restricted=restricted)
    mesh = make_pipeline_mesh(4)
    ref = np.asarray(seg.scores(params, x, lengths))
    got = np.asarray(
        pipeline_transformer_scores(mesh, seg, params, x, lengths, n_micro)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_pipeline_grads_match_single_device():
    """grad through scan+ppermute = the reverse pipeline schedule; it must
    produce the same parameter gradients as the unpipelined loss."""
    seg, params, x, lengths, tags = _setup()
    mesh = make_pipeline_mesh(4)

    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: seg.loss(p, x, lengths, tags)
    )(params)
    pp_loss, pp_grads = jax.value_and_grad(
        lambda p: pipeline_transformer_loss(mesh, seg, p, x, lengths, tags, 4)
    )(params)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), atol=1e-6, rtol=1e-6)
    assert jax.tree.structure(ref_grads) == jax.tree.structure(pp_grads)
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(pp_grads)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-5
        )


def test_pipeline_whole_mesh_eight_stages():
    """One layer per device over all 8 CPU devices."""
    seg, params, x, lengths, _ = _setup(n_layers=8)
    mesh = make_pipeline_mesh(8)
    ref = np.asarray(seg.scores(params, x, lengths))
    got = np.asarray(
        pipeline_transformer_scores(mesh, seg, params, x, lengths, 8)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_pipeline_single_stage_fallback():
    seg, params, x, lengths, _ = _setup()
    mesh = make_pipeline_mesh(1)
    ref = np.asarray(seg.scores(params, x, lengths))
    got = np.asarray(
        pipeline_transformer_scores(mesh, seg, params, x, lengths, 4)
    )
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_pipeline_jitted_under_mesh():
    """The whole pipelined loss jits (what a production step would do)."""
    seg, params, x, lengths, tags = _setup()
    mesh = make_pipeline_mesh(4)
    f = jax.jit(
        lambda p, x, l, t: pipeline_transformer_loss(mesh, seg, p, x, l, t, 4)
    )
    loss = float(f(params, x, lengths, tags))
    assert np.isfinite(loss)


# ---------------------------------------------------------------------------
# production Trainer integration (pipeline_stages)
# ---------------------------------------------------------------------------


def _trainer_batches(B=8, L=24, D=16, n=3):
    rng = np.random.default_rng(5)
    out = []
    for _ in range(n):
        out.append({
            "src_tokens": rng.standard_normal((B, L, D)).astype(np.float32),
            "tgt_tokens": (rng.random((B, L)) < 0.2).astype(np.float32),
            "src_lengths": np.asarray([L, L - 4, L, 9, L, 14, L, 6][:B], np.int32),
            "n_real": B,
        })
    return out


def test_trainer_pipeline_matches_plain(tmp_path):
    """Trainer(pipeline_stages=4) must reproduce the unpipelined Trainer's
    loss history exactly (dropout off -> the rng plumbing difference is
    inert and the pipelined program is numerically the dense program)."""
    from multimodaltopicsegmentation_tpu.train.loop import Trainer

    cfg = TaggerConfig(
        embedding_dim=16, hidden_dim=32, num_layers=4, nheads=2,
        attention_window=4, loss_fn="FocalLoss",
    )
    histories = []
    for stages in (0, 4):
        trainer = Trainer(
            "Transformer", cfg, lr=1e-3, max_epochs=2,
            monitor="training_loss", check_dir=str(tmp_path / f"s{stages}"),
            pipeline_stages=stages,
        )
        _params, history = trainer.fit(_trainer_batches())
        histories.append([h["training_loss"] for h in history])
    np.testing.assert_allclose(histories[1], histories[0], atol=1e-5, rtol=1e-5)


def test_trainer_pipeline_validation():
    from multimodaltopicsegmentation_tpu.train.loop import Trainer

    cfg = TaggerConfig(embedding_dim=16, hidden_dim=32, num_layers=4,
                       nheads=2, attention_window=4, loss_fn="FocalLoss")
    with pytest.raises(ValueError, match="Transformer"):
        Trainer("BiLSTM", TaggerConfig(embedding_dim=16, hidden_dim=8,
                                       num_layers=1, loss_fn="FocalLoss"),
                pipeline_stages=2)
    with pytest.raises(ValueError, match="split over"):
        Trainer("Transformer", cfg, pipeline_stages=3)


def test_trainer_pipeline_varied_batch_sizes(tmp_path):
    """The per-batch-size jit cache handles a short trailing batch."""
    from multimodaltopicsegmentation_tpu.train.loop import Trainer

    cfg = TaggerConfig(embedding_dim=16, hidden_dim=32, num_layers=2,
                       nheads=2, attention_window=4, loss_fn="FocalLoss")
    batches = _trainer_batches(n=2)
    small = {k: (v[:3] if hasattr(v, "shape") else 3) for k, v in batches[0].items()}
    trainer = Trainer(
        "Transformer", cfg, lr=1e-3, max_epochs=1,
        monitor="training_loss", check_dir=str(tmp_path), pipeline_stages=2,
    )
    _params, history = trainer.fit(batches + [small])
    assert np.isfinite(history[-1]["training_loss"])


def test_cli_validates_pipeline_stages_up_front(tmp_path, monkeypatch):
    """Bad --pipeline_stages combinations must die at startup, not after a
    fold has trained."""
    from multimodaltopicsegmentation_tpu.cli import train_fit as tf
    from tests.synth import make_synthetic_corpus

    emb_dir, labs, split = make_synthetic_corpus(str(tmp_path / "corpus"))
    argv = [
        "-exp", str(tmp_path / "exp"), "-arc", "BiLSTM",
        "-enc", "wav2vec", "-ef", emb_dir, "-lf", labs,
        "-max", "1", "-bs", "2", "-split", split,
        "-s_last", "--pipeline_stages", "2",
    ]
    with pytest.raises(SystemExit, match="Transformer"):
        tf.cli_main(argv)
