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


# ---- legacy corpus loaders (BBC / BBCAudio / CNN / icsi) --------------------
import json  # noqa: E402
import pytest  # noqa: E402

from multimodaltopicsegmentation_tpu.utils.text_corpora import (  # noqa: E402
    expand_label,
    load_bbc_audio_corpus,
    load_bbc_corpus,
    load_cnn_corpus,
    load_icsi_corpus,
    load_text_dataset,
)


def test_expand_label():
    assert expand_label([1, 3], ["a", "b", "c", "d"]) == [0, 1, 0, 1]


def _bbc_show(items, date="2021-01-01"):
    return {"Items": items, "Date": date}


def test_bbc_corpus(tmp_path):
    shows = [
        _bbc_show(["One. Two.", "Three."]),          # boundaries at sents 1, 2
        _bbc_show(["Only one sentence here."]),
    ]
    (tmp_path / "train.json").write_text(json.dumps({"Transcripts": shows}))
    (tmp_path / "test.json").write_text(json.dumps({"Transcripts": shows[:1]}))
    train, test = load_bbc_corpus(str(tmp_path))
    assert len(train) == 2 and len(test) == 1
    sents, labels, _ = train[0]
    assert sents == ["One.", "Two.", "Three."]
    assert labels == [0, 1, 1]
    assert train[1][1] == [1]


def test_bbc_audio_corpus(tmp_path):
    payload = {"data": {"getProgrammeById": {"segments": [
        {"transcript": "First sentence. Second sentence."},
        {"transcript": "Third one."},
    ]}}}
    sub = tmp_path / "nested"
    sub.mkdir()
    (sub / "show.json").write_text(json.dumps(payload))
    docs = load_bbc_audio_corpus(str(tmp_path))
    assert len(docs) == 1
    sents, labels, _ = docs[0]
    assert len(sents) == 3
    assert labels == [0, 1, 1]


def test_cnn_corpus(tmp_path):
    for i in (1, 2):
        (tmp_path / f"doc{i}.txt").write_text(
            "==== preface separator\n"
            "Alpha one. Alpha two.\n"
            "==== section break\n"
            "Beta one.\n"
        )
    docs = load_cnn_corpus(str(tmp_path), n_docs=2)
    assert len(docs) == 2
    sents, labels, _ = docs[0]
    assert sents == ["Alpha one.", "Alpha two.", "Beta one."]
    assert labels == [0, 1, 1]


def _make_icsi(tmp_path):
    seg_dir = tmp_path / "segments"
    data_dir = tmp_path / "data"
    seg_dir.mkdir(); data_dir.mkdir()
    # meeting Bmr001: segment ends at 2.0 s and 4.0 s
    (seg_dir / "Bmr001.segs").write_text("seg 2.0\nseg 4.0\n")
    # utterances: starts 0 ms, 1500 ms, 2500 ms (past 2.0 s), 4500 ms (past 4.0 s)
    (data_dir / "Bmr001.dacsv").write_text(
        "u_0_1000,hello there\n"
        "u_1500_2400,more talk\n"
        "u_2500_3000,new topic starts\n"
        "u_4500_5000,final words\n"
    )
    (data_dir / "Bmr001.dadb").write_text("ignored")
    return tmp_path


def test_icsi_corpus(tmp_path):
    _make_icsi(tmp_path)
    docs = load_icsi_corpus(str(tmp_path))
    assert len(docs) == 1
    texts, labels, _ = docs[0]
    assert texts == ["hello there", "more talk", "new topic starts", "final words"]
    # utterance at 2500 ms passes the 2.0 s end -> seg_idx 0->1 (no mark, the
    # reference only marks from the second advance); 4500 ms passes 4.0 s ->
    # marks the PREVIOUS utterance; final is always a boundary
    assert labels == [0, 0, 1, 1]


def test_icsi_skips_dadb_and_unmatched(tmp_path):
    _make_icsi(tmp_path)
    (tmp_path / "data" / "Xyz999.dacsv").write_text("u_0_1,orphan\n")
    docs = load_icsi_corpus(str(tmp_path))
    assert len(docs) == 1  # dadb and the meeting without a segments file skipped


def test_dispatch_names(tmp_path):
    _make_icsi(tmp_path)
    assert len(load_text_dataset("icsi", str(tmp_path))) == 1
    with pytest.raises(ValueError):
        load_text_dataset("nope", str(tmp_path))


def test_wiki_low_granularity_drops_deep_separators(tmp_path):
    (tmp_path / "doc.txt").write_text(
        "========,1,Preface.\npre one.\n"
        "========,1,Alpha.\na one.\na two.\n"
        "========,3,Deep.\na three.\n"
        "========,2,Beta.\nb one.\n"
    )
    from multimodaltopicsegmentation_tpu.utils.text_corpora import load_wiki_document

    sents, labels = load_wiki_document(
        str(tmp_path / "doc.txt"), remove_preface_segment=True, high_granularity=False
    )
    # the level-3 separator must NOT appear as content; its sentences merge
    # into the Alpha section
    assert all(not s.startswith("====") for s in sents), sents
    assert sents == ["a one.", "a two.", "a three.", "b one."]
    assert labels == [0, 0, 1, 1]


def test_delete_last_sentence_choi(tmp_path):
    (tmp_path / "d.ref").write_text(
        "==========\ns1.\ns2.\ns3.\n==========\ns4.\ns5.\n==========\n"
    )
    from multimodaltopicsegmentation_tpu.utils.text_corpora import load_choi_corpus

    docs = load_choi_corpus(str(tmp_path))
    assert docs[0][0] == ["s1.", "s2.", "s3.", "s4.", "s5."]
    assert docs[0][1] == [0, 0, 1, 0, 1]

    dropped = load_choi_corpus(str(tmp_path), delete_last_sentence=True)
    # boundary sentences s3 and the final s5 are dropped; the boundary moves
    # to the previously kept sentence (reference load_datasets.py:170-181)
    sents, labels = dropped[0][0], dropped[0][1]
    assert sents == ["s1.", "s2.", "s4."]
    assert labels == [0, 1, 1]
