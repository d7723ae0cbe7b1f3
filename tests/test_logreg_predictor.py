"""LogReg_Predictor baseline (reference predict.py:352-424)."""
import os
import pickle

import numpy as np

from multimodaltopicsegmentation_tpu.cli.predict import LogReg_Predictor
from multimodaltopicsegmentation_tpu.utils.audio import save_wav


def test_logreg_predict_writes_results_and_segments(tmp_path):
    from sklearn.linear_model import LogisticRegression

    rng = np.random.default_rng(0)
    # embeddings where dim-0 determines the boundary
    emb_dir = tmp_path / "emb"
    audio_dir = tmp_path / "audio"
    emb_dir.mkdir()
    audio_dir.mkdir()

    X = rng.standard_normal((200, 8)).astype(np.float32)
    y = (X[:, 0] > 0.8).astype(int)
    clf = LogisticRegression().fit(X, y)
    model_path = tmp_path / "logreg.pkl"
    with open(model_path, "wb") as f:
        pickle.dump(clf, f)

    sr = 16000
    n_units = 10
    doc = rng.standard_normal((n_units, 8)).astype(np.float32)
    doc[4, 0] = 5.0  # certain boundary at unit 5
    np.save(emb_dir / "docA.npy", doc)
    save_wav(str(audio_dir / "docA.wav"), np.zeros(sr * n_units, np.float32), sr)

    pred = LogReg_Predictor(
        str(model_path), uniform_interval=1, original_audio_extension=".wav"
    )
    exp = str(tmp_path / "exp")
    results = pred.predict(str(emb_dir), exp, audio_directory=str(audio_dir))

    assert "docA.npy" in results
    assert results["docA.npy"][4] == 1
    assert os.path.exists(os.path.join(exp, "results.pkl"))
    wavs = [f for f in os.listdir(exp) if f.endswith(".wav")]
    assert len(wavs) >= 2  # boundary split produced at least two segments
