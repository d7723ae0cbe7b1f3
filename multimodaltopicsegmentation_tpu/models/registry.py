"""Architecture registry mapping reference names to tagger classes.

Names match the reference dispatch in
/root/reference/models/lightning_model.py:193-250 exactly, so the CLI
contract (`-arc BiLSTM`, `-arc biLSTMCRF`, ...) is preserved.
"""
from __future__ import annotations

from .base import TaggerConfig
from . import taggers


def build(architecture: str, cfg: TaggerConfig):
    """Instantiate a tagger by its reference architecture name."""
    if architecture == "biLSTMCRF":
        return taggers.BiRnnCrf(cfg)
    if architecture == "BiLSTM":
        return taggers.BiLSTMTagger(cfg)
    if architecture == "BiLSTMLateFusion":
        return taggers.BiLSTMLateFusion(cfg)
    if architecture == "SimpleBiLSTM":
        return taggers.SimpleBiLSTM(cfg)
    if architecture == "MLP":
        return taggers.MLPTagger(cfg)
    if architecture == "SheikhBiLSTM":
        return taggers.SheikhBiLSTM(cfg)
    if architecture == "SwitchBiLSTM":
        return taggers.SwitchBiLSTM(cfg)
    if architecture in ("Transformer", "Transformer-CRF", "RecurrentLongT5",
                        "BiLSTMRestrictedMHA", "RecurrentLongformer"):
        from . import transformers as tr

        if architecture == "Transformer":
            # attention_window=0 encodes the dense restricted=False variant
            # (reference Transformer_segmenter restricted flag, models/CRF.py:510
            # — unreachable from TextSegmenter but convertible checkpoints
            # carry it via tools/convert_reference_checkpoint.py)
            return tr.TransformerSegmenter(cfg, restricted=cfg.attention_window > 0)
        if architecture == "Transformer-CRF":
            return tr.TransformerCRF(cfg)
        if architecture == "RecurrentLongT5":
            return tr.RecurrentLongT5(cfg)
        return tr.RecurrentLongformer(cfg)
    raise ValueError(f"No architecture named {architecture!r} implemented")


def is_crf(architecture: str) -> bool:
    return architecture.lower().endswith("crf")


def is_double_input(architecture: str) -> bool:
    return architecture == "BiLSTMLateFusion"


def is_domain_adapt(architecture: str) -> bool:
    return architecture == "SwitchBiLSTM"
