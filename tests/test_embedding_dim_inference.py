"""Encoder-name -> dimension inference (train_fit.py:245-276 quirks)."""
import pytest

import numpy as np

from multimodaltopicsegmentation_tpu.cli.train_fit import infer_embedding_dim


def test_plain_encoders():
    assert infer_embedding_dim("x-vectors") == 512
    assert infer_embedding_dim("wav2vec") == 768
    assert infer_embedding_dim("wav2vec/_mean_std") == 1536
    assert infer_embedding_dim("prosodic") == 167
    assert infer_embedding_dim("mfcc") == 200


def test_early_fusion_sum():
    assert infer_embedding_dim("x-vectors+openl3/_mean_std") == 512 + 1024
    assert infer_embedding_dim("radio_news_roberta+radio_news_topseg") == 1536


def test_sentence_prefix_stripping():
    # names containing 'sentence' strip the leading path component
    enc = "RadioNewsSentence/x-vectors+RadioNewsSentence/openl3/_mean_std"
    assert infer_embedding_dim(enc) == 512 + 1024


def test_timing_file_adds_two():
    assert infer_embedding_dim("x-vectors", timing_file="t.pkl") == 514
    d = infer_embedding_dim("x-vectors", encoder2="radio_news_roberta", timing_file="t.pkl")
    assert d == [514, 770]


def test_late_fusion_pair():
    d = infer_embedding_dim("x-vectors", encoder2="radio_news_roberta")
    assert d == [512, 768]


def test_pca_overrides():
    assert infer_embedding_dim("x-vectors", pca=True, pca_value=99) == 99


def test_unknown_encoder_raises():
    with pytest.raises(ValueError, match="not recognised"):
        infer_embedding_dim("made-up-encoder")


def test_apply_pca_fits_on_train_only(rng):
    """PCA components come from the TRAIN docs and the same projection is
    reused on valid/test (reference EncoderDataset.py:51-70, with its
    index-accumulation defect fixed)."""
    from sklearn.decomposition import PCA

    from multimodaltopicsegmentation_tpu.cli.train_fit import apply_pca

    train = [(rng.standard_normal((20, 12)).astype(np.float32), [0] * 20, f"t{i}")
             for i in range(3)]
    valid = [(rng.standard_normal((9, 12)).astype(np.float32), [0] * 9, "v0")]
    test = [(rng.standard_normal((7, 12)).astype(np.float32), [0] * 7, "x0")]

    ptrain, (pvalid, ptest) = apply_pca(train, [valid, test], n_components=4)
    assert all(d[0].shape == (20, 4) for d in ptrain)
    assert pvalid[0][0].shape == (9, 4) and ptest[0][0].shape == (7, 4)
    # labels and names pass through untouched
    assert ptrain[0][1] == train[0][1] and ptrain[0][2] == "t0"

    # the projection must equal sklearn PCA fit on the concatenated TRAIN
    # embeddings applied to the valid doc
    ref = PCA(n_components=4).fit(np.concatenate([d[0] for d in train]))
    np.testing.assert_allclose(
        pvalid[0][0], ref.transform(valid[0][0]).astype(np.float32), atol=1e-4
    )
