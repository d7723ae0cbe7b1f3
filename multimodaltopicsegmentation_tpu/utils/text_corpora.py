"""Text-corpus loaders (legacy lineage of the reference).

The reference carries pre-audio text-segmentation loaders
(/root/reference/utils/{load_datasets,wiki_loader_sentences,
choiloader_sentences,text_manipulation,wiki_utils}.py) that its audio
pipeline imports but never exercises. This module provides the same
capabilities in one place, without torch Datasets (documents come back as
plain (sentences, boundary_labels, path) tuples the framework's batching
layer consumes):

- Choi synthetic corpus: `.ref` files with `==========` segment delimiters
- wiki-727k-style files: `========,<level>,<title>` section separators,
  ***LIST***/***formula***/***codice*** special tokens
- sentence splitting (regex fallback; nltk punkt when available) and word
  extraction matching text_manipulation.py semantics
"""
from __future__ import annotations

import os
import re
from glob import glob
from typing import List, Tuple

CHOI_DELIMITER = "=========="
WIKI_SEPARATOR = re.compile(r"^========,\d+,.*?\.?$")
SPECIAL_TOKENS = ("***LIST***", "***formula***", "***codice***")

_MISSING_STOP_PUNCT = re.compile(r"[^.!?]\s*$")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> List[str]:
    """Sentence splitting: nltk punkt when importable, regex otherwise
    (text_manipulation.py:80-99 uses punkt; the fallback keeps the same
    segment structure for well-punctuated corpora)."""
    try:
        import nltk

        return nltk.tokenize.sent_tokenize(text)
    except Exception:
        return [s for s in _SENT_SPLIT.split(text.strip()) if s]


def extract_sentence_words(
    sentence: str, remove_special_tokens: bool = False
) -> List[str]:
    if remove_special_tokens:
        for token in SPECIAL_TOKENS:
            sentence = sentence.replace(token, "")
    return [w for w in re.split(r"\W+", sentence) if w]


def load_choi_document(path: str) -> Tuple[List[str], List[int]]:
    """One .ref file -> (sentences, 0/1 boundary labels, 1 = last sentence
    of a segment)."""
    with open(path, "r", errors="ignore") as f:
        raw = f.read()
    segments = [s.strip() for s in raw.split(CHOI_DELIMITER) if s.strip()]
    sentences, labels = [], []
    for seg in segments:
        seg_sents = [l.strip() for l in seg.splitlines() if l.strip()]
        if not seg_sents:
            continue
        sentences.extend(seg_sents)
        labels.extend([0] * (len(seg_sents) - 1) + [1])
    return sentences, labels


def load_choi_corpus(root: str):
    files = sorted(glob(os.path.join(root, "**", "*.ref"), recursive=True))
    docs = []
    for path in files:
        sents, labels = load_choi_document(path)
        if sents:
            docs.append((sents, labels, path))
    return docs


def _wiki_sections(text: str, high_granularity: bool = True) -> List[str]:
    """Split a wiki-727 file into sections on separator lines."""
    sections: List[List[str]] = [[]]
    for line in text.splitlines():
        if WIKI_SEPARATOR.match(line.strip()):
            if high_granularity or line.strip().startswith("========,1,") or line.strip().startswith("========,2,"):
                sections.append([])
                continue
        sections[-1].append(line)
    return ["\n".join(s).strip() for s in sections if "\n".join(s).strip()]


def load_wiki_document(
    path: str,
    remove_preface_segment: bool = True,
    high_granularity: bool = True,
    remove_special_tokens: bool = False,
) -> Tuple[List[str], List[int]]:
    with open(path, "r", errors="ignore") as f:
        text = f.read()
    sections = _wiki_sections(text, high_granularity)
    if remove_preface_segment and sections:
        sections = sections[1:]
    sentences, labels = [], []
    for sec in sections:
        sec_sents = [l.strip() for l in sec.splitlines() if l.strip()]
        if remove_special_tokens:
            sec_sents = [
                s for s in sec_sents if s not in SPECIAL_TOKENS
            ]
        if not sec_sents:
            continue
        sentences.extend(sec_sents)
        labels.extend([0] * (len(sec_sents) - 1) + [1])
    return sentences, labels


def load_wiki_corpus(root: str, **kwargs):
    files = sorted(
        p for p in glob(os.path.join(root, "**", "*"), recursive=True)
        if os.path.isfile(p) and not p.endswith((".pkl", ".json"))
    )
    docs = []
    for path in files:
        sents, labels = load_wiki_document(path, **kwargs)
        if sents:
            docs.append((sents, labels, path))
    return docs


def load_text_dataset(name: str, root: str):
    """Dispatch matching the reference's corpus names
    (utils/load_datasets.py: choi / wiki / BBC-style folders)."""
    name = name.lower()
    if name == "choi":
        return load_choi_corpus(root)
    if name in ("wiki", "wiki727", "wikisection", "bbc", "cnn", "icsi"):
        return load_wiki_corpus(root)
    raise ValueError(f"unknown text corpus {name!r}")
