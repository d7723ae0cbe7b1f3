"""Encoder-name -> dimension inference (train_fit.py:245-276 quirks)."""
import pytest

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
