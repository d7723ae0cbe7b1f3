"""wav2vec2 audio encoder in JAX, with HF torch weight import.

The reference runs HF `Wav2Vec2Model` ("facebook/wav2vec2-base-960h") one
unit at a time on host (/root/reference/extract_embeddings.py:176-181,
encode_batch at :534). Here the full forward is jitted JAX and a whole
document's units run as ONE padded batch on the TPU, which is the main
lever behind the predict-path speedup target (BASELINE.md).

Architecture (wav2vec2-base, do_stable_layer_norm=False):
  7-layer strided conv feature extractor (group-norm on layer 0, GELU)
  -> LayerNorm + linear feature projection (512 -> 768)
  -> grouped weight-normed positional conv (k=128, groups=16) + GELU, add
  -> post-LN transformer encoder (12 layers, 12 heads, FFN 3072)

`convert_torch_state_dict` maps a HF torch checkpoint into the param
pytree; parity vs `transformers.Wav2Vec2Model` is pinned in
tests/test_wav2vec2.py on a tiny random config (weight-level equivalence,
so real pretrained checkpoints load unchanged).

Transformer-layer params are stored STACKED ([num_layers, ...] leaves) by
default so the encoder cold-compiles in ~21 s instead of 2-5 min on the
remote-compile tunnel (~1.5% steady-state cost); MTS_W2V2_STACKED=0
restores per-layer buffers for peak throughput. See _stack_layers.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dense_attention, merge_heads, split_heads


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    num_groupnorm_groups: int = 512
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    do_normalize: bool = True  # processor zero-mean/unit-var per utterance

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def tiny(cls):
        """For parity tests."""
        return cls(
            conv_dim=(16, 16),
            conv_kernel=(10, 3),
            conv_stride=(5, 2),
            num_groupnorm_groups=4,
            hidden_size=24,
            num_layers=2,
            num_heads=2,
            ffn_dim=48,
            pos_conv_kernel=16,
            pos_conv_groups=2,
        )


def _conv1d(x, w, b=None, stride=1, groups=1, padding=0):
    """x: [B, T, Cin], w: [K, Cin/groups, Cout] -> [B, T', Cout]."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b
    return out


def _layer_norm(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _use_pallas_norm(channels: int, cfg) -> bool:
    """Fused Pallas norm+gelu gate — opt-in via MTS_PALLAS_NORM=1.

    Measured on one v5e at the predict shape (150x3199x512): XLA 9.3 ms vs
    Pallas 16-17 ms for the conv1 norm+gelu stage. The stage is VPU-bound
    (exact-GELU erf/exp over ~245M elements ~4 ms) and XLA's fusion already
    overlaps it with contiguous HBM streaming; neither a lane-blocked nor a
    two-phase time-blocked kernel beat it (ops/pallas_norm.py keeps the
    better variant + the numbers). Default stays XLA; the gate also
    requires per-channel groups (HF wav2vec2's GroupNorm has num_groups ==
    channels), lane-aligned width, and a non-CPU backend (no reverse-mode
    autodiff — inference only)."""
    import os

    if os.environ.get("MTS_PALLAS_NORM") != "1":
        return False
    if cfg.num_groupnorm_groups != channels or channels % 128 != 0:
        return False
    return jax.default_backend() not in ("cpu",)


def _group_norm(p, x, groups, eps=1e-5, frame_mask=None):
    """x: [B, T, C]; torch GroupNorm over channels (stats per group over T, C/g).

    `frame_mask` [B, T] restricts statistics to valid frames so a padded
    batch reproduces the reference's one-unit-at-a-time numerics exactly
    (HF's own batched group-norm path does NOT do this and drifts with
    padding)."""
    B, T, C = x.shape
    xg = x.reshape(B, T, groups, C // groups)
    if frame_mask is None:
        mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
    else:
        m = frame_mask[:, :, None, None]
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True) * (C // groups), 1.0)
        mu = jnp.sum(xg * m, axis=(1, 3), keepdims=True) / cnt
        var = jnp.sum(m * (xg - mu) ** 2, axis=(1, 3), keepdims=True) / cnt
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(B, T, C) * p["scale"] + p["bias"]


def init_params(rng, cfg: Wav2Vec2Config, stacked: bool = None) -> dict:
    """Random init (HF-equivalent shapes; used for tests / no-weights mode).
    `stacked=None` reads the MTS_W2V2_STACKED env default."""
    params = {"feature_extractor": [], "encoder_layers": []}
    n_keys = len(cfg.conv_dim) + 3 + 6 * cfg.num_layers
    keys = jax.random.split(rng, n_keys)
    ki = iter(keys)

    in_c = 1
    for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"w": jax.random.normal(next(ki), (k, in_c, c)) * 0.05}
        if i == 0:
            layer["gn"] = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        params["feature_extractor"].append(layer)
        in_c = c

    D = cfg.hidden_size
    params["fp_ln"] = {"scale": jnp.ones((in_c,)), "bias": jnp.zeros((in_c,))}
    params["fp_w"] = jax.random.normal(next(ki), (in_c, D)) * 0.05
    params["fp_b"] = jnp.zeros((D,))

    params["pos_conv_w"] = (
        jax.random.normal(next(ki), (cfg.pos_conv_kernel, D // cfg.pos_conv_groups, D)) * 0.02
    )
    params["pos_conv_b"] = jnp.zeros((D,))
    params["enc_ln"] = {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))}

    for _ in range(cfg.num_layers):
        lin = lambda i, o: {
            "w": jax.random.normal(next(ki), (i, o)) * 0.05,
            "b": jnp.zeros((o,)),
        }
        params["encoder_layers"].append(
            {
                "q": lin(D, D), "k": lin(D, D), "v": lin(D, D), "o": lin(D, D),
                "ln1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
                "ff1": lin(D, cfg.ffn_dim), "ff2": lin(cfg.ffn_dim, D),
                "ln2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
            }
        )
    if _stacked_storage() if stacked is None else stacked:
        params["encoder_layers"] = _stack_layers(params["encoder_layers"])
    return params


def _stack_layers(layers: list) -> dict:
    """List of identically-shaped per-layer pytrees -> one pytree with a
    leading [L] axis on every leaf.

    Stacked storage is the default because it makes the encoder compile
    FAST: 16 [L, ...] parameter buffers instead of 16*L separate arrays.
    Measured on the axon remote-compile tunnel (wav2vec2-base, 150x1s
    batch): cold compile 21 s stacked+fully-inlined vs 124-310 s with
    per-layer buffers, at a ~1.5% steady-state cost (81.7-82.1 vs
    83.3 audio-min/s — the [L,...] slices constrain XLA's per-layer buffer
    choices). `MTS_W2V2_STACKED=0` at init/convert time restores per-layer
    list storage (peak throughput, slow cold compile); `apply` handles
    both. Full numbers: docs/PERFORMANCE.md."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _stacked_storage() -> bool:
    import os

    return os.environ.get("MTS_W2V2_STACKED", "1") == "1"


# Round-4 A/B constants behind choose_stacked_storage
# (docs/PERFORMANCE.md:177-191): per-layer storage runs ~1.5% faster in
# steady state but costs 124-310 s of extra cold compile on the
# remote-compile tunnel.
_STACKED_AUDIO_MIN_PER_S = 82.0   # measured stacked throughput
_PER_LAYER_SPEEDUP = 0.015        # measured steady-state gain
_PER_LAYER_COMPILE_COST_S = 150.0 # extra cold-compile cost (low-mid of range)


def choose_stacked_storage(corpus_audio_min: float) -> bool:
    """True = stacked [L,...] storage, False = per-layer buffers.

    Auto-selection: per-layer storage only pays when the corpus is large
    enough that its ~1.5% steady-state gain amortizes the 124-310 s extra
    cold compile. At 82 audio-min/s, one audio-minute of corpus saves
    0.015/82 s ~= 0.18 ms of wall — break-even is ~8e5 audio-minutes
    (~13k hours), far beyond the paper corpora (~1.5k audio-min), so
    stacked is the practical default and this is mostly a guardrail plus
    an honest record of the tradeoff. MTS_W2V2_STACKED, when set, always
    wins (it is the operator override)."""
    import os

    if "MTS_W2V2_STACKED" in os.environ:
        return _stacked_storage()
    saving_per_audio_min = _PER_LAYER_SPEEDUP / _STACKED_AUDIO_MIN_PER_S
    return corpus_audio_min * saving_per_audio_min < _PER_LAYER_COMPILE_COST_S


def feature_extractor_output_length(cfg: Wav2Vec2Config, n_samples: int) -> int:
    n = n_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return max(n, 0)


def apply(params: dict, cfg: Wav2Vec2Config, audio: jnp.ndarray,
          lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """audio: [B, S] raw 16 kHz -> [B, T, hidden] frame embeddings (~50 Hz).

    When `lengths` is given, the per-utterance normalization and the
    attention mask respect each row's true sample count.
    """
    B, S = audio.shape
    if cfg.do_normalize:
        if lengths is None:
            mu = jnp.mean(audio, axis=-1, keepdims=True)
            var = jnp.var(audio, axis=-1, keepdims=True)
        else:
            m = (jnp.arange(S)[None, :] < lengths[:, None]).astype(audio.dtype)
            cnt = jnp.maximum(jnp.sum(m, -1, keepdims=True), 1.0)
            mu = jnp.sum(audio * m, -1, keepdims=True) / cnt
            var = jnp.sum(m * (audio - mu) ** 2, -1, keepdims=True) / cnt
            audio = audio * m
        audio = (audio - mu) * jax.lax.rsqrt(var + 1e-7)
        if lengths is not None:
            audio = audio * m

    x = audio[:, :, None]  # [B, S, 1]
    cur_len = lengths
    for i, layer in enumerate(params["feature_extractor"]):
        x = _conv1d(x, layer["w"], stride=cfg.conv_stride[i])
        if cur_len is not None:
            cur_len = jnp.maximum(
                (cur_len - cfg.conv_kernel[i]) // cfg.conv_stride[i] + 1, 0
            )
        if i == 0:
            if cur_len is None and _use_pallas_norm(x.shape[-1], cfg):
                # opt-in fused instance-norm + gelu kernel (measured SLOWER
                # than XLA at the flagship shape — see _use_pallas_norm)
                from ..ops.pallas_norm import pallas_instance_norm_gelu

                x = pallas_instance_norm_gelu(
                    x, layer["gn"]["scale"], layer["gn"]["bias"]
                )
                continue
            fm = None
            if cur_len is not None:
                fm = (jnp.arange(x.shape[1])[None, :] < cur_len[:, None]).astype(x.dtype)
            x = _group_norm(layer["gn"], x, cfg.num_groupnorm_groups, frame_mask=fm)
        x = jax.nn.gelu(x, approximate=False)

    x = _layer_norm(params["fp_ln"], x, cfg.layer_norm_eps)
    x = x @ params["fp_w"] + params["fp_b"]

    # frame-level attention mask from sample lengths
    if lengths is not None:
        def out_len(n):
            for kk, ss in zip(cfg.conv_kernel, cfg.conv_stride):
                n = (n - kk) // ss + 1
            return jnp.maximum(n, 0)
        t_valid = out_len(lengths)
        fmask = (jnp.arange(x.shape[1])[None, :] < t_valid[:, None]).astype(x.dtype)
    else:
        fmask = jnp.ones((B, x.shape[1]), x.dtype)

    # zero padded frames: the positional conv has a +-k/2 receptive field and
    # must see zeros beyond each row's valid frames (as solo processing does)
    x = x * fmask[..., None]

    # positional conv (same padding with one-sided trim for even kernels)
    k = cfg.pos_conv_kernel
    pos = _conv1d(
        x, params["pos_conv_w"], params["pos_conv_b"],
        groups=cfg.pos_conv_groups, padding=k // 2,
    )
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = _layer_norm(params["enc_ln"], x, cfg.layer_norm_eps)
    x = x * fmask[..., None]

    def _encoder_layer(x, lp):
        q = split_heads(x @ lp["q"]["w"] + lp["q"]["b"], cfg.num_heads)
        kk = split_heads(x @ lp["k"]["w"] + lp["k"]["b"], cfg.num_heads)
        v = split_heads(x @ lp["v"]["w"] + lp["v"]["b"], cfg.num_heads)
        a = merge_heads(dense_attention(q, kk, v, fmask))
        a = a @ lp["o"]["w"] + lp["o"]["b"]
        x = _layer_norm(lp["ln1"], x + a, cfg.layer_norm_eps)
        h = jax.nn.gelu(x @ lp["ff1"]["w"] + lp["ff1"]["b"], approximate=False)
        h = h @ lp["ff2"]["w"] + lp["ff2"]["b"]
        x = _layer_norm(lp["ln2"], x + h, cfg.layer_norm_eps)
        return x, None

    layers = params["encoder_layers"]
    if isinstance(layers, (list, tuple)):
        # legacy per-layer storage (MTS_W2V2_STACKED=0): separate buffers,
        # peak throughput, slow cold compile
        for lp in layers:
            x, _ = _encoder_layer(x, lp)
    else:
        # stacked [L, ...] storage. Fully inlined by default (unroll >=
        # num_layers drops the while loop entirely — measured FASTER to
        # compile than the loop form: 21 s vs 107 s at unroll=1, and
        # ~82 vs ~78 audio-min/s to run; see _stack_layers).
        import os

        unroll = int(
            os.environ.get("MTS_W2V2_SCAN_UNROLL", str(cfg.num_layers))
        )
        x, _ = jax.lax.scan(_encoder_layer, x, layers, unroll=unroll)
    return x


# ---------------------------------------------------------------------------
# HF torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_torch_state_dict(sd: dict, cfg: Wav2Vec2Config, stacked: bool = None) -> dict:
    """HF Wav2Vec2Model state_dict (torch tensors or numpy) -> param pytree."""

    def g(name):
        t = sd[name]
        return jnp.asarray(np.asarray(t.detach().cpu() if hasattr(t, "detach") else t))

    p = {"feature_extractor": [], "encoder_layers": []}
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        layer = {"w": jnp.transpose(g(f"{base}.conv.weight"), (2, 1, 0))}
        if i == 0:
            layer["gn"] = {
                "scale": g(f"{base}.layer_norm.weight"),
                "bias": g(f"{base}.layer_norm.bias"),
            }
        p["feature_extractor"].append(layer)

    p["fp_ln"] = {
        "scale": g("feature_projection.layer_norm.weight"),
        "bias": g("feature_projection.layer_norm.bias"),
    }
    p["fp_w"] = jnp.transpose(g("feature_projection.projection.weight"))
    p["fp_b"] = g("feature_projection.projection.bias")

    # weight-normed positional conv: torch [out, in/groups, k]
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        wg = g("encoder.pos_conv_embed.conv.weight_g")
        wv = g("encoder.pos_conv_embed.conv.weight_v")
    else:
        wg = g("encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        wv = g("encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    norm = jnp.sqrt(jnp.sum(wv**2, axis=(0, 1), keepdims=True))
    w = wg * wv / jnp.maximum(norm, 1e-12)  # dim=2 weight norm
    p["pos_conv_w"] = jnp.transpose(w, (2, 1, 0))  # -> [k, in/groups, out]
    p["pos_conv_b"] = g("encoder.pos_conv_embed.conv.bias")

    p["enc_ln"] = {
        "scale": g("encoder.layer_norm.weight"),
        "bias": g("encoder.layer_norm.bias"),
    }

    for i in range(cfg.num_layers):
        b = f"encoder.layers.{i}"
        lin = lambda n: {
            "w": jnp.transpose(g(f"{n}.weight")),
            "b": g(f"{n}.bias"),
        }
        p["encoder_layers"].append(
            {
                "q": lin(f"{b}.attention.q_proj"),
                "k": lin(f"{b}.attention.k_proj"),
                "v": lin(f"{b}.attention.v_proj"),
                "o": lin(f"{b}.attention.out_proj"),
                "ln1": {"scale": g(f"{b}.layer_norm.weight"), "bias": g(f"{b}.layer_norm.bias")},
                "ff1": lin(f"{b}.feed_forward.intermediate_dense"),
                "ff2": lin(f"{b}.feed_forward.output_dense"),
                "ln2": {
                    "scale": g(f"{b}.final_layer_norm.weight"),
                    "bias": g(f"{b}.final_layer_norm.bias"),
                },
            }
        )
    if _stacked_storage() if stacked is None else stacked:
        p["encoder_layers"] = _stack_layers(p["encoder_layers"])
    return p


def load_pretrained(name_or_path: str = "facebook/wav2vec2-base-960h",
                    stacked: bool = None):
    """Load a HF checkpoint (local path or cached hub name) -> (params, cfg).

    Raises a clear error when the checkpoint is unavailable (this
    environment has no network egress)."""
    cfg = Wav2Vec2Config.base()
    try:
        from transformers import Wav2Vec2Model

        model = Wav2Vec2Model.from_pretrained(name_or_path)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"wav2vec2 weights '{name_or_path}' are not available locally "
            "(no network egress). Provide a local checkpoint directory, or "
            "use the prosodic/mfcc encoders which need no weights."
        ) from e
    return convert_torch_state_dict(model.state_dict(), cfg, stacked=stacked), cfg
