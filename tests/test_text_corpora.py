"""Legacy text-corpus loader tests (choi / wiki formats)."""
import os

from multimodaltopicsegmentation_tpu.utils.logging_utils import predictions_analysis
from multimodaltopicsegmentation_tpu.utils.text_corpora import (
    load_choi_document,
    load_text_dataset,
    load_wiki_document,
    split_sentences,
)


def test_choi_format(tmp_path):
    doc = (
        "==========\n"
        "First sentence of segment one.\n"
        "Second sentence of segment one.\n"
        "==========\n"
        "Only sentence of segment two.\n"
        "==========\n"
    )
    p = tmp_path / "1.ref"
    p.write_text(doc)
    sents, labels = load_choi_document(str(p))
    assert len(sents) == 3
    assert labels == [0, 1, 1]
    docs = load_text_dataset("choi", str(tmp_path))
    assert len(docs) == 1 and docs[0][2] == str(p)


def test_wiki_format(tmp_path):
    doc = (
        "========,1,preface.\n"
        "Preface sentence.\n"
        "========,2,Intro.\n"
        "Intro sentence one.\n"
        "Intro sentence two.\n"
        "========,2,Body.\n"
        "Body sentence.\n"
    )
    p = tmp_path / "article"
    p.write_text(doc)
    sents, labels = load_wiki_document(str(p))
    # preface removed; two sections remain
    assert sents == ["Intro sentence one.", "Intro sentence two.", "Body sentence."]
    assert labels == [0, 1, 1]


def test_split_sentences():
    out = split_sentences("One sentence. Another one! And a third?")
    assert len(out) == 3


def test_predictions_analysis():
    r = predictions_analysis([1, 0, 1, 0], [1, 0, 0, 1])
    assert r["tp"] == 1 and r["fp"] == 1 and r["fn"] == 1 and r["tn"] == 1
    assert r["f1"] == 0.5
