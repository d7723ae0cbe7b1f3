"""predict on a multi-device mesh: documents sharded over 'data'."""
import os
import pickle

import numpy as np
import pytest

import jax

from tests.synth import make_synthetic_corpus

# multi-device collective suite: slow tier, like its shard_map siblings
# (keeps the fast tier collective-free so it can use the compile cache)
pytestmark = pytest.mark.slow


def test_predict_shards_documents(tmp_path):
    """Full predict flow on the 8-device CPU mesh, embeddings precomputed."""
    assert len(jax.devices()) == 8

    # train a tiny model first
    from multimodaltopicsegmentation_tpu.train import checkpoints as ckpt_lib
    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build

    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=10, dim=30)
    cfg = TaggerConfig(embedding_dim=30, hidden_dim=8, num_layers=1, loss_fn="FocalLoss")
    arch = build("BiLSTM", cfg)
    params = arch.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "best_model")
    ckpt_lib.save(ckpt, params, cfg, "BiLSTM")

    results_txt = tmp_path / "results.txt"
    results_txt.write_text(
        "Sentence encoder: CNN\nNeural architecture: BiLSTM\n"
        "Hidden units: 8\nNumber of layers: 1\n"
    )

    from multimodaltopicsegmentation_tpu.cli.predict import Predictor

    # CNN isn't in predict's dim table; our checkpoint carries the config, so
    # patch the parse target minimally
    import multimodaltopicsegmentation_tpu.cli.predict as P

    P.ENCODER_DIMS.append(("CNN", 30))

    pred = Predictor(str(results_txt), ckpt, threshold=0.5)
    exp = str(tmp_path / "pexp")
    results = pred.predict(
        emb_dir, exp, write_audio_segments=False, batch_size=4, verbose=False
    )
    assert len(results) == 10
    with open(os.path.join(exp, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert len(res) == 10
    for name, tags in res.items():
        n_units = np.load(os.path.join(emb_dir, name)).shape[0]
        assert len(tags) == n_units

    # single-device-equivalent decode must agree
    import jax.numpy as jnp

    for name, tags in list(res.items())[:3]:
        emb = np.load(os.path.join(emb_dir, name)).astype(np.float32)
        _s, t = arch.decode(
            params, jnp.asarray(emb[None]), jnp.asarray([len(emb)]), 0.5
        )
        np.testing.assert_array_equal(np.asarray(t)[0], np.asarray(tags, bool))
