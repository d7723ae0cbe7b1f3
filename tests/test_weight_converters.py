"""npz weight-schema fixtures: converter mapping -> reader -> forward.

Real pretrained checkpoints are unreachable here (zero egress), so these
tests lock the CONTRACT instead: tiny random state_dicts with the upstream
packages' published key layouts go through tools/convert_weights.py's pure
mapping functions, the resulting npz files through the encoders' readers,
and the loaded pytrees through the actual forwards.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_weights import map_ecapa_state_dict, map_xvector_state_dict  # noqa: E402

from multimodaltopicsegmentation_tpu.encoders import tdnn  # noqa: E402


def _bn_entries(rng, base, c):
    return {
        f"{base}.norm.weight": rng.standard_normal(c).astype(np.float32),
        f"{base}.norm.bias": rng.standard_normal(c).astype(np.float32),
        f"{base}.norm.running_mean": rng.standard_normal(c).astype(np.float32),
        f"{base}.norm.running_var": rng.random(c).astype(np.float32) + 0.5,
    }


def _conv_entries(rng, base, cout, cin, k, nested=True):
    """speechbrain Conv1d: key `<base>.conv.weight` (the wrapper's inner
    nn.Conv1d) with torch layout [Cout, Cin, K]."""
    key = f"{base}.conv.weight" if nested else f"{base}.weight"
    bkey = f"{base}.conv.bias" if nested else f"{base}.bias"
    return {
        key: rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1,
        bkey: rng.standard_normal(cout).astype(np.float32) * 0.1,
    }


def _fake_ecapa_state_dict(rng, n_mels=5, C=16, scale=8, se=4, attn=4, emb=8):
    """spkrec-ecapa-voxceleb embedding_model key layout, tiny shapes."""
    w = C // scale
    mfa_out = 3 * C
    sd = {}
    sd.update(_conv_entries(rng, "blocks.0.conv", C, n_mels, 5))
    sd.update(_bn_entries(rng, "blocks.0.norm", C))
    for j in (1, 2, 3):
        b = f"blocks.{j}"
        sd.update(_conv_entries(rng, f"{b}.tdnn1.conv", C, C, 1))
        sd.update(_bn_entries(rng, f"{b}.tdnn1.norm", C))
        for i in range(scale - 1):
            sd.update(_conv_entries(rng, f"{b}.res2net_block.blocks.{i}.conv", w, w, 3))
            sd.update(_bn_entries(rng, f"{b}.res2net_block.blocks.{i}.norm", w))
        sd.update(_conv_entries(rng, f"{b}.tdnn2.conv", C, C, 1))
        sd.update(_bn_entries(rng, f"{b}.tdnn2.norm", C))
        sd.update(_conv_entries(rng, f"{b}.se_block.conv1", se, C, 1))
        sd.update(_conv_entries(rng, f"{b}.se_block.conv2", C, se, 1))
    sd.update(_conv_entries(rng, "mfa.conv", mfa_out, 3 * C, 1))
    sd.update(_bn_entries(rng, "mfa.norm", mfa_out))
    sd.update(_conv_entries(rng, "asp.tdnn.conv", attn, 3 * mfa_out, 1))
    sd.update(_bn_entries(rng, "asp.tdnn.norm", attn))
    sd.update(_conv_entries(rng, "asp.conv", mfa_out, attn, 1))
    sd.update(_bn_entries(rng, "asp_bn", 2 * mfa_out))
    sd.update(_conv_entries(rng, "fc", emb, 2 * mfa_out, 1))
    return sd


def test_ecapa_mapping_matches_init_schema(tmp_path, rng):
    """Converted arrays must load into the exact pytree ecapa_init builds."""
    sd = _fake_ecapa_state_dict(rng)
    arrays = map_ecapa_state_dict(sd)
    out = str(tmp_path / "ecapa.npz")
    np.savez(out, **arrays)

    loaded = tdnn.ecapa_load_npz(out)
    ref = tdnn.ecapa_init(jax.random.PRNGKey(0), n_mels=5, channels=16,
                          emb_dim=8, se_channels=4, attn_channels=4)
    ls, rs = jax.tree.structure(loaded), jax.tree.structure(ref)
    assert ls == rs, f"{ls}\n!=\n{rs}"
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(ref)):
        assert a.shape == b.shape, (a.shape, b.shape)


def test_ecapa_loaded_forward(tmp_path, rng):
    sd = _fake_ecapa_state_dict(rng)
    np.savez(str(tmp_path / "e.npz"), **map_ecapa_state_dict(sd))
    params = tdnn.ecapa_load_npz(str(tmp_path / "e.npz"))
    feats = jnp.asarray(rng.standard_normal((40, 5)), jnp.float32)
    mask = jnp.ones((40,), jnp.float32)
    emb = tdnn.ecapa_apply(params, feats, mask)
    assert emb.shape == (8,)
    assert np.all(np.isfinite(np.asarray(emb)))
    # the imported weights must actually flow through the forward
    arrays = map_ecapa_state_dict(sd)
    arrays["fc_w"] = arrays["fc_w"] + 1.0
    np.savez(str(tmp_path / "e2.npz"), **arrays)
    emb2 = tdnn.ecapa_apply(tdnn.ecapa_load_npz(str(tmp_path / "e2.npz")), feats, mask)
    assert not np.allclose(np.asarray(emb), np.asarray(emb2))


def test_ecapa_gates_se_and_res2net_weights():
    """Every fake state_dict tensor must land somewhere in the npz (no key
    silently dropped)."""
    rng = np.random.default_rng(0)
    sd = _fake_ecapa_state_dict(rng)
    arrays = map_ecapa_state_dict(sd)
    n_in = sum(v.size for v in sd.values())
    n_out = sum(v.size for v in arrays.values())
    assert n_in == n_out


def _fake_xvector_state_dict(rng, n_mels=6, C=8, stats=12, emb=10):
    """speechbrain Xvector layout: blocks = [Conv1d, activation, BatchNorm1d]
    x 5 then pooling + blocks.16 Linear. Conv1d here is the direct wrapper
    (one nesting level: blocks.{3i}.conv.weight)."""
    dims = [C, C, C, C, stats]
    kernels = [5, 3, 3, 1, 1]
    sd = {}
    cin = n_mels
    for i, (c, k) in enumerate(zip(dims, kernels)):
        sd.update(_conv_entries(rng, f"blocks.{3*i}", c, cin, k, nested=True))
        sd.update(_bn_entries(rng, f"blocks.{3*i+2}", c))
        cin = c
    sd["blocks.16.w.weight"] = rng.standard_normal((emb, 2 * stats)).astype(np.float32)
    sd["blocks.16.w.bias"] = rng.standard_normal(emb).astype(np.float32)
    return sd


def test_xvector_mapping_and_forward(tmp_path, rng):
    sd = _fake_xvector_state_dict(rng)
    arrays = map_xvector_state_dict(sd)
    out = str(tmp_path / "xv.npz")
    np.savez(out, **arrays)
    params = tdnn.xvector_load_npz(out)
    feats = jnp.asarray(rng.standard_normal((30, 6)), jnp.float32)
    emb = tdnn.xvector_apply(params, feats, jnp.ones((30,), jnp.float32))
    assert emb.shape == (10,)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_openl3_reader(tmp_path, rng):
    """conv{i}/bn{i} npz schema feeds openl3.load_weights and the forward."""
    from multimodaltopicsegmentation_tpu.encoders import openl3

    ref = openl3.openl3_init(jax.random.PRNGKey(0), n_mels=32)
    arrays, i = {}, 0
    for block in ref["blocks"]:
        for lp in block:
            arrays[f"conv{i}_w"] = rng.standard_normal(lp["w"].shape).astype(np.float32) * 0.05
            arrays[f"conv{i}_b"] = rng.standard_normal(lp["b"].shape).astype(np.float32) * 0.05
            c = lp["b"].shape[0]
            arrays[f"bn{i}_scale"] = np.ones(c, np.float32)
            arrays[f"bn{i}_bias"] = np.zeros(c, np.float32)
            arrays[f"bn{i}_mean"] = np.zeros(c, np.float32)
            arrays[f"bn{i}_var"] = np.ones(c, np.float32)
            i += 1
    out = str(tmp_path / "o.npz")
    np.savez(out, **arrays)
    params = openl3.load_weights(out, n_mels=32)
    np.testing.assert_array_equal(
        np.asarray(params["blocks"][0][0]["w"]), arrays["conv0_w"]
    )
    windows = jnp.asarray(rng.standard_normal((1, openl3.OPENL3_SR)), jnp.float32)
    emb = openl3.openl3_apply(params, windows, n_mels=32)
    assert emb.shape == (1, 512)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_crepe_reader(tmp_path, rng):
    from multimodaltopicsegmentation_tpu.encoders import crepe

    ref = crepe.crepe_init(jax.random.PRNGKey(0))
    arrays = {}
    for i, lp in enumerate(ref["layers"]):
        arrays[f"conv{i}_w"] = rng.standard_normal(lp["w"].shape).astype(np.float32) * 0.05
        arrays[f"conv{i}_b"] = np.zeros(lp["b"].shape, np.float32)
        c = lp["b"].shape[0]
        arrays[f"bn{i}_scale"] = np.ones(c, np.float32)
        arrays[f"bn{i}_bias"] = np.zeros(c, np.float32)
        arrays[f"bn{i}_mean"] = np.zeros(c, np.float32)
        arrays[f"bn{i}_var"] = np.ones(c, np.float32)
    out = str(tmp_path / "c.npz")
    np.savez(out, **arrays)
    params = crepe.load_weights(out)  # proj omitted -> framework-owned proj
    np.testing.assert_array_equal(np.asarray(params["layers"][0]["w"]), arrays["conv0_w"])
    frames = jnp.asarray(rng.standard_normal((3, 1024)), jnp.float32)
    emb = crepe.crepe_apply(params, frames)
    assert emb.shape == (3, 256)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_ecapa_encoder_adapter_loads_npz(tmp_path, rng, monkeypatch):
    """MTS_ECAPA_WEIGHTS routes the engine adapter through the reader
    without the random-weights smoke gate."""
    sd = _fake_ecapa_state_dict(rng)
    out = str(tmp_path / "e.npz")
    np.savez(out, **map_ecapa_state_dict(sd))
    monkeypatch.delenv("MTS_RANDOM_ENCODER_WEIGHTS", raising=False)
    monkeypatch.setenv("MTS_ECAPA_WEIGHTS", out)
    enc = tdnn.EcapaEncoder()
    assert np.asarray(enc.params["fc_w"]).shape == (2 * 48, 8)


def test_openl3_trunk_matches_keras(tmp_path, rng):
    """Numeric parity of the openl3 conv trunk against REAL Keras semantics:
    a Keras model with the openl3 layer sequence gets random weights, they
    go through the converter's get_weights() extraction into the npz schema,
    through load_weights, and the JAX trunk must reproduce Keras's output
    (same-padding convs, eps=1e-3 batch norm inference, 2x2 max pools,
    global max pool)."""
    tf = pytest.importorskip("tensorflow")
    from multimodaltopicsegmentation_tpu.encoders import openl3

    M, T = 32, 24
    inp = tf.keras.Input((M, T, 1))
    x = inp
    for bi, block in enumerate(openl3.CONV_BLOCKS):
        for cout in block:
            x = tf.keras.layers.Conv2D(cout, 3, padding="same")(x)
            x = tf.keras.layers.BatchNormalization()(x)
            x = tf.keras.layers.ReLU()(x)
        if bi < len(openl3.CONV_BLOCKS) - 1:
            x = tf.keras.layers.MaxPooling2D(2)(x)
    x = tf.keras.layers.GlobalMaxPooling2D()(x)
    model = tf.keras.Model(inp, x)

    # randomize BN stats too (fresh BN layers have trivial ones)
    for layer in model.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            g, b, mu, var = layer.get_weights()
            layer.set_weights([
                rng.random(g.shape).astype(np.float32) + 0.5,
                rng.standard_normal(b.shape).astype(np.float32) * 0.1,
                rng.standard_normal(mu.shape).astype(np.float32) * 0.1,
                rng.random(var.shape).astype(np.float32) + 0.5,
            ])
        elif isinstance(layer, tf.keras.layers.Conv2D):
            w, b = layer.get_weights()
            layer.set_weights([
                rng.standard_normal(w.shape).astype(np.float32) * 0.1,
                rng.standard_normal(b.shape).astype(np.float32) * 0.1,
            ])

    # the converter's extraction loop (tools/convert_weights.py convert_openl3)
    arrays, ci, bi = {}, 0, 0
    for layer in model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D":
            w, b = layer.get_weights()
            arrays[f"conv{ci}_w"] = w
            arrays[f"conv{ci}_b"] = b
            ci += 1
        elif cls == "BatchNormalization":
            g, beta, mean, var = layer.get_weights()
            arrays[f"bn{bi}_scale"] = g
            arrays[f"bn{bi}_bias"] = beta
            arrays[f"bn{bi}_mean"] = mean
            arrays[f"bn{bi}_var"] = var
            bi += 1
    out = str(tmp_path / "keras.npz")
    np.savez(out, **arrays)

    params = openl3.load_weights(out, n_mels=M)
    imgs = rng.standard_normal((2, M, T, 1)).astype(np.float32)
    ours = np.asarray(openl3.conv_trunk(params, jnp.asarray(imgs)))
    theirs = model(imgs, training=False).numpy()
    # tolerance covers conv accumulation-order differences (oneDNN vs XLA)
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-4)


def test_ecapa_matches_torch_replica(tmp_path, rng):
    """Numeric parity of the ECAPA forward against an independent torch
    replica of speechbrain's published architecture (reflect-padded 'same'
    convs, TDNNBlock = conv->relu->BN(eval), SERes2Net chaining, SE over
    the time mean, MFA concat, global-context attentive stats pooling,
    stats BN, conv fc), fed from the same fake state_dict."""
    import torch
    import torch.nn.functional as F

    sd = {k: torch.from_numpy(v) for k, v in _fake_ecapa_state_dict(rng).items()}
    scale = 8

    def tconv(x, base, dilation=1):
        w, b = sd[f"{base}.conv.weight"], sd[f"{base}.conv.bias"]
        k = w.shape[-1]
        pad = (k - 1) * dilation // 2
        if pad:
            x = F.pad(x, (pad, pad), mode="reflect")
        return F.conv1d(x, w, b, dilation=dilation)

    def tbn(x, base, eps=1e-5):
        return F.batch_norm(
            x, sd[f"{base}.norm.running_mean"], sd[f"{base}.norm.running_var"],
            sd[f"{base}.norm.weight"], sd[f"{base}.norm.bias"],
            training=False, eps=eps,
        )

    def tblock(x, base, dilation=1):
        return tbn(F.relu(tconv(x, f"{base}.conv", dilation)), f"{base}.norm")

    T = 40
    feats = rng.standard_normal((T, 5)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(feats.T[None])  # [1, C, T]
        x = tblock(x, "blocks.0")
        outs = []
        for j in (1, 2, 3):
            b = f"blocks.{j}"
            res = x
            h = tblock(x, f"{b}.tdnn1")
            chunks = torch.chunk(h, scale, dim=1)
            ys = [chunks[0]]
            prev = None
            for i in range(scale - 1):
                inp = chunks[i + 1] if prev is None else chunks[i + 1] + prev
                prev = tblock(inp, f"{b}.res2net_block.blocks.{i}", dilation=j + 1)
                ys.append(prev)
            h = tblock(torch.cat(ys, dim=1), f"{b}.tdnn2")
            s = h.mean(-1)  # full-length mask -> plain time mean
            s = F.relu(F.conv1d(s[..., None], sd[f"{b}.se_block.conv1.conv.weight"],
                                sd[f"{b}.se_block.conv1.conv.bias"]))
            s = torch.sigmoid(F.conv1d(s, sd[f"{b}.se_block.conv2.conv.weight"],
                                       sd[f"{b}.se_block.conv2.conv.bias"]))
            x = res + h * s
            outs.append(x)
        h = tblock(torch.cat(outs, dim=1), "mfa")
        mu = h.mean(-1, keepdim=True)
        sg = torch.sqrt(((h - mu) ** 2).mean(-1, keepdim=True).clamp(min=1e-10))
        ctx = torch.cat([h, mu.expand_as(h), sg.expand_as(h)], dim=1)
        a = torch.tanh(tblock(ctx, "asp.tdnn"))
        a = F.conv1d(a, sd["asp.conv.conv.weight"], sd["asp.conv.conv.bias"])
        a = torch.softmax(a, dim=-1)
        mean = (a * h).sum(-1)
        var = (a * (h - mean[..., None]) ** 2).sum(-1)
        stats = torch.cat([mean, torch.sqrt(var.clamp(min=1e-10))], dim=1)
        stats = F.batch_norm(
            stats, sd["asp_bn.norm.running_mean"], sd["asp_bn.norm.running_var"],
            sd["asp_bn.norm.weight"], sd["asp_bn.norm.bias"], training=False,
        )
        ref = F.conv1d(stats[..., None], sd["fc.conv.weight"], sd["fc.conv.bias"])[0, :, 0]

    arrays = map_ecapa_state_dict({k: v.numpy() for k, v in sd.items()})
    np.savez(str(tmp_path / "e.npz"), **arrays)
    params = tdnn.ecapa_load_npz(str(tmp_path / "e.npz"))
    ours = tdnn.ecapa_apply(params, jnp.asarray(feats), jnp.ones((T,), jnp.float32))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# CRDNN VAD (speechbrain/vad-crdnn-libriparty layout)
# ---------------------------------------------------------------------------


def _fake_crdnn_state_dicts(rng, n_mels=8, channels=(4, 6), H=5, dnn_neurons=7):
    """Torch replica of the SpeechBrain VAD module chain with the wrapper
    key nesting the converter expects (Conv2d -> .conv, LayerNorm/BatchNorm
    -> .norm, Linear -> .w), returning (cnn_sd, rnn_sd, dnn_sd, forward)."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(int(rng.integers(1 << 30)))
    cnn_sd, f, cin = {}, n_mels, 1
    for i, cout in enumerate(channels):
        cnn_sd[f"block_{i}.conv.conv.weight"] = 0.3 * torch.randn(cout, cin, 3, 3)
        cnn_sd[f"block_{i}.conv.conv.bias"] = 0.1 * torch.randn(cout)
        cnn_sd[f"block_{i}.norm.norm.weight"] = 1.0 + 0.1 * torch.randn(f, cout)
        cnn_sd[f"block_{i}.norm.norm.bias"] = 0.1 * torch.randn(f, cout)
        f, cin = f // 2, cout

    rnn = torch.nn.LSTM(f * cin, H, num_layers=2, batch_first=True, bidirectional=True)
    rnn_sd = {f"rnn.{k}": v.detach().clone() for k, v in rnn.state_dict().items()}

    dnn_sd = {
        "block_0.w.weight": 0.3 * torch.randn(dnn_neurons, 2 * H),
        "block_0.w.bias": 0.1 * torch.randn(dnn_neurons),
        "block_0.norm.weight": 1.0 + 0.1 * torch.randn(dnn_neurons),
        "block_0.norm.bias": 0.1 * torch.randn(dnn_neurons),
        "block_0.norm.running_mean": 0.1 * torch.randn(dnn_neurons),
        "block_0.norm.running_var": 1.0 + 0.1 * torch.rand(dnn_neurons),
        "block_0.norm.num_batches_tracked": torch.tensor(0),
        "out.w.weight": 0.3 * torch.randn(1, dnn_neurons),
        "out.w.bias": 0.1 * torch.randn(1),
    }

    def forward(feats):
        """feats [B, T, n_mels] -> [B, T] probabilities (eval semantics)."""
        with torch.no_grad():
            x = torch.as_tensor(feats)[..., None]  # [B, T, F, 1]
            for i in range(len(channels)):
                x = F.conv2d(
                    x.permute(0, 3, 1, 2),
                    cnn_sd[f"block_{i}.conv.conv.weight"],
                    cnn_sd[f"block_{i}.conv.conv.bias"],
                    padding="same",
                ).permute(0, 2, 3, 1)
                x = F.layer_norm(
                    x, x.shape[-2:],
                    cnn_sd[f"block_{i}.norm.norm.weight"],
                    cnn_sd[f"block_{i}.norm.norm.bias"],
                )
                x = F.leaky_relu(x, 0.01)
                B, T, Fr, C = x.shape
                x = x.reshape(B, T, Fr // 2, 2, C).amax(3)
            B, T = x.shape[:2]
            x = x.reshape(B, T, -1)
            x, _ = rnn(x)
            x = x @ dnn_sd["block_0.w.weight"].T + dnn_sd["block_0.w.bias"]
            x = F.batch_norm(
                x.reshape(B * T, -1),
                dnn_sd["block_0.norm.running_mean"],
                dnn_sd["block_0.norm.running_var"],
                dnn_sd["block_0.norm.weight"],
                dnn_sd["block_0.norm.bias"],
                training=False,
            ).reshape(B, T, -1)
            x = F.leaky_relu(x, 0.01)
            x = x @ dnn_sd["out.w.weight"].T + dnn_sd["out.w.bias"]
            return torch.sigmoid(x[..., 0]).numpy()

    return cnn_sd, rnn_sd, dnn_sd, forward


def test_crdnn_vad_torch_parity(tmp_path, rng):
    """Converted SpeechBrain-layout weights must reproduce the torch stack's
    posteriors exactly (the numeric-parity evidence for the JAX forward)."""
    from convert_weights import map_crdnn_vad_state_dicts

    from multimodaltopicsegmentation_tpu.encoders import crdnn_vad

    cnn_sd, rnn_sd, dnn_sd, torch_forward = _fake_crdnn_state_dicts(rng)
    feats = rng.standard_normal((2, 20, 8)).astype(np.float32)
    ref = torch_forward(feats)

    arrays = map_crdnn_vad_state_dicts(
        {k: v.numpy() for k, v in cnn_sd.items()},
        {k: v.numpy() for k, v in rnn_sd.items()},
        {k: v.numpy() for k, v in dnn_sd.items()},
    )
    out = str(tmp_path / "vad.npz")
    np.savez(out, **arrays)
    params = crdnn_vad.load_npz(out)
    ours = np.asarray(crdnn_vad.apply(params, jnp.asarray(feats)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_crdnn_vad_padded_apply_matches_unpadded(rng):
    """Frame-axis padding + lengths (what posteriors() does to bound XLA
    recompiles) must not change the valid region: per-block re-zeroing makes
    the padded conv see exactly the unpadded 'SAME' zero halo."""
    from multimodaltopicsegmentation_tpu.encoders import crdnn_vad

    params = crdnn_vad.random_params(jax.random.PRNGKey(0), n_mels=8)
    feats = rng.standard_normal((1, 30, 8)).astype(np.float32)
    plain = np.asarray(crdnn_vad.apply(params, jnp.asarray(feats)))[0]
    padded = np.pad(feats, ((0, 0), (0, 10), (0, 0)))
    out = np.asarray(
        crdnn_vad.apply(params, jnp.asarray(padded), lengths=jnp.asarray([30]))
    )[0, :30]
    np.testing.assert_allclose(out, plain, atol=1e-6, rtol=1e-6)


def test_crdnn_vad_posteriors_and_segments(tmp_path, rng, monkeypatch):
    """MTS_VAD_WEIGHTS routes the full VAD pipeline through the CRDNN."""
    from multimodaltopicsegmentation_tpu.dsp import vad
    from multimodaltopicsegmentation_tpu.encoders import crdnn_vad

    params = crdnn_vad.random_params(jax.random.PRNGKey(1))
    out = str(tmp_path / "vad.npz")
    np.savez(out, **{k: np.asarray(v) for k, v in params.items()})

    sr = 16000
    audio = (0.1 * rng.standard_normal(3 * sr)).astype(np.float32)
    post = crdnn_vad.posteriors(crdnn_vad.load_npz(out), audio, sr)
    assert post.shape == (3 * sr // 160 + 1,)
    assert np.all((post >= 0) & (post <= 1))

    monkeypatch.setenv("MTS_VAD_WEIGHTS", out)
    vad._CRDNN_CACHE.clear()
    spans = vad.get_speech_segments(audio, sr, apply_energy_VAD=False, double_check=False)
    assert isinstance(spans, list)
    for s, t in spans:
        assert 0.0 <= s < t <= 3.05
    monkeypatch.delenv("MTS_VAD_WEIGHTS")
    vad._CRDNN_CACHE.clear()


# ---------------------------------------------------------------------------
# CREPE (torchcrepe layout)
# ---------------------------------------------------------------------------


def test_crepe_matches_torch_replica(tmp_path, rng):
    """Converted torchcrepe-layout weights through the full chain (mapper ->
    npz -> load_weights -> crepe_apply) must reproduce a torch replica of
    the CREPE trunk: conv -> ReLU -> BatchNorm(eps 1e-3) -> maxpool, with
    the keras/XLA 'SAME' padding split."""
    import torch
    import torch.nn.functional as F

    from convert_weights import map_crepe_state_dict

    from multimodaltopicsegmentation_tpu.encoders import crepe

    torch.manual_seed(0)
    layers = crepe.LAYERS  # (cout, k, stride) x 5
    sd, cin = {}, 1
    for i, (cout, k, s) in enumerate(layers):
        sd[f"conv{i+1}.weight"] = 0.2 * torch.randn(cout, cin, k, 1)
        sd[f"conv{i+1}.bias"] = 0.1 * torch.randn(cout)
        sd[f"conv{i+1}_BN.weight"] = 1.0 + 0.1 * torch.randn(cout)
        sd[f"conv{i+1}_BN.bias"] = 0.1 * torch.randn(cout)
        sd[f"conv{i+1}_BN.running_mean"] = 0.1 * torch.randn(cout)
        sd[f"conv{i+1}_BN.running_var"] = 1.0 + 0.1 * torch.rand(cout)
        cin = cout

    frames = rng.standard_normal((3, crepe.FRAME)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(frames)
        mu = x.mean(-1, keepdim=True)
        sdv = x.std(-1, unbiased=False, keepdim=True) + 1e-8
        x = ((x - mu) / sdv)[:, None, :, None]  # [N, 1, 1024, 1]
        for i, (cout, k, s) in enumerate(layers):
            t_in = x.shape[2]
            total = max((-(-t_in // s) - 1) * s + k - t_in, 0)
            x = F.pad(x, (0, 0, total // 2, total - total // 2))
            x = F.conv2d(x, sd[f"conv{i+1}.weight"], sd[f"conv{i+1}.bias"],
                         stride=(s, 1))
            x = F.relu(x)
            x = F.batch_norm(
                x, sd[f"conv{i+1}_BN.running_mean"], sd[f"conv{i+1}_BN.running_var"],
                sd[f"conv{i+1}_BN.weight"], sd[f"conv{i+1}_BN.bias"],
                training=False, eps=1e-3,
            )
            x = F.max_pool2d(x, (2, 1), (2, 1))
        trunk = x.amax(dim=2)[:, :, 0].numpy()  # [N, C] global time max

    out = str(tmp_path / "crepe.npz")
    np.savez(out, **map_crepe_state_dict(
        {k: v.numpy() for k, v in sd.items()}, n_layers=len(layers)
    ))
    params = crepe.load_weights(out)  # proj stays the framework-owned init
    ref = trunk @ np.asarray(params["proj_w"]) + np.asarray(params["proj_b"])
    ours = np.asarray(crepe.crepe_apply(params, jnp.asarray(frames)))
    # K=512 conv accumulation order differs between XLA and torch; the
    # global time-max then selects among near-ties -> ~5e-4 relative noise
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_crdnn_vad_fbank_front_end_contract(rng):
    """vad_fbank must implement speechbrain's documented STFT/Fbank chain:
    zero center padding, periodic Hamming window, HTK mel triangles,
    10*log10 with a per-utterance 80 dB floor, sentence mean subtraction —
    locked against an independent numpy computation."""
    from multimodaltopicsegmentation_tpu.encoders import crdnn_vad

    sr, win, hop, n_mels = 16000, 400, 160, 40
    audio = rng.standard_normal(sr // 4).astype(np.float32) * 0.3

    got = np.asarray(crdnn_vad.vad_fbank(jnp.asarray(audio)))

    padded = np.pad(audio, (win // 2, win // 2))
    n_frames = 1 + (len(padded) - win) // hop
    w = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(win) / win)  # periodic
    frames = np.stack([padded[i * hop : i * hop + win] * w for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames, n=win, axis=-1)) ** 2
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)
    mel2hz = lambda m: 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    fftfreqs = np.linspace(0, sr / 2, win // 2 + 1)
    mel_f = mel2hz(np.linspace(0.0, hz2mel(sr / 2), n_mels + 2))
    bank = np.zeros((n_mels, len(fftfreqs)))
    for m in range(n_mels):
        lo, c, hi = mel_f[m], mel_f[m + 1], mel_f[m + 2]
        up = (fftfreqs - lo) / (c - lo)
        down = (hi - fftfreqs) / (hi - c)
        bank[m] = np.maximum(0, np.minimum(up, down))
    db = 10.0 * np.log10(np.maximum(spec @ bank.T, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    ref = db - db.mean(axis=0, keepdims=True)

    assert got.shape == ref.shape == (n_frames, n_mels)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)
