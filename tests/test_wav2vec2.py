"""wav2vec2 JAX forward parity vs HF transformers torch on a tiny config."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.encoders import wav2vec2 as W


@pytest.fixture(scope="module")
def torch_pair():
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model

    cfg = W.Wav2Vec2Config.tiny()
    hf_cfg = HFConfig(
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        num_feat_extract_layers=len(cfg.conv_dim),
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.ffn_dim,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        hidden_act="gelu",
    )
    # tiny config: groupnorm groups == conv_dim[0]? HF uses num_groups=conv_dim[0]
    torch.manual_seed(0)
    model = Wav2Vec2Model(hf_cfg).eval()
    return model, cfg


def test_forward_matches_hf(torch_pair):
    import torch

    model, cfg = torch_pair
    # HF group norm uses num_groups = conv_dim[0]
    cfg = W.Wav2Vec2Config(
        **{**cfg.__dict__, "num_groupnorm_groups": cfg.conv_dim[0], "do_normalize": False}
    )
    params = W.convert_torch_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 1600)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(audio)).last_hidden_state.numpy()

    out = np.asarray(W.apply(params, cfg, jnp.asarray(audio)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_output_length_formula(torch_pair):
    model, cfg = torch_pair
    for n in (400, 1600, 3171):
        assert W.feature_extractor_output_length(cfg, n) == int(
            model._get_feat_extract_output_lengths(n)
        )


def test_masked_batch_matches_separate(torch_pair):
    """Padded batch with lengths must equal per-row unpadded forwards."""
    model, cfg = torch_pair
    cfg = W.Wav2Vec2Config(
        **{**cfg.__dict__, "num_groupnorm_groups": cfg.conv_dim[0], "do_normalize": True}
    )
    params = W.convert_torch_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    a1 = rng.standard_normal(1600).astype(np.float32)
    a2 = rng.standard_normal(1100).astype(np.float32)
    batch = np.zeros((2, 1600), np.float32)
    batch[0] = a1
    batch[1, :1100] = a2
    lengths = jnp.asarray(np.array([1600, 1100]))

    out = np.asarray(W.apply(params, cfg, jnp.asarray(batch), lengths))
    solo1 = np.asarray(W.apply(params, cfg, jnp.asarray(a1[None, :])))
    solo2 = np.asarray(W.apply(params, cfg, jnp.asarray(a2[None, :])))

    t1 = W.feature_extractor_output_length(cfg, 1600)
    t2 = W.feature_extractor_output_length(cfg, 1100)
    np.testing.assert_allclose(out[0, :t1], solo1[0, :t1], atol=2e-4)
    np.testing.assert_allclose(out[1, :t2], solo2[0, :t2], atol=2e-4)


def test_stacked_matches_list_storage(torch_pair, monkeypatch):
    """Stacked [L, ...] layer storage (the fast-compile default) must be
    numerically identical to legacy per-layer list storage, for every
    scan-unroll setting."""
    model, cfg = torch_pair
    cfg = W.Wav2Vec2Config(
        **{**cfg.__dict__, "num_groupnorm_groups": cfg.conv_dim[0], "do_normalize": False}
    )

    monkeypatch.setenv("MTS_W2V2_STACKED", "0")
    params_list = W.convert_torch_state_dict(model.state_dict(), cfg)
    assert isinstance(params_list["encoder_layers"], list)

    monkeypatch.setenv("MTS_W2V2_STACKED", "1")
    params_stacked = W.convert_torch_state_dict(model.state_dict(), cfg)
    assert params_stacked["encoder_layers"]["q"]["w"].shape[0] == cfg.num_layers

    rng = np.random.default_rng(2)
    audio = rng.standard_normal((2, 1600)).astype(np.float32)

    ref = np.asarray(W.apply(params_list, cfg, jnp.asarray(audio)))
    for unroll in ("1", "2", str(cfg.num_layers)):
        monkeypatch.setenv("MTS_W2V2_SCAN_UNROLL", unroll)
        out = np.asarray(W.apply(params_stacked, cfg, jnp.asarray(audio)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_choose_stacked_storage(monkeypatch):
    """Param-storage auto-selection (VERDICT r4 #4): stacked for any real
    corpus, per-layer only past the ~8e5 audio-minute break-even where its
    1.5% steady-state gain amortizes the 124-310 s extra cold compile;
    MTS_W2V2_STACKED, when set, always wins."""
    import jax

    monkeypatch.delenv("MTS_W2V2_STACKED", raising=False)
    assert W.choose_stacked_storage(1500.0)      # paper-scale corpus
    assert W.choose_stacked_storage(100_000.0)   # still under break-even
    assert not W.choose_stacked_storage(2e6)     # amortizes: per-layer
    monkeypatch.setenv("MTS_W2V2_STACKED", "1")
    assert W.choose_stacked_storage(2e6)         # operator override wins
    monkeypatch.setenv("MTS_W2V2_STACKED", "0")
    assert not W.choose_stacked_storage(1.0)

    # the explicit stacked= arg overrides the env default at init time
    monkeypatch.delenv("MTS_W2V2_STACKED", raising=False)
    cfg = W.Wav2Vec2Config.tiny()
    p = W.init_params(jax.random.PRNGKey(0), cfg, stacked=False)
    assert isinstance(p["encoder_layers"], list)
    p = W.init_params(jax.random.PRNGKey(0), cfg, stacked=True)
    assert not isinstance(p["encoder_layers"], list)
