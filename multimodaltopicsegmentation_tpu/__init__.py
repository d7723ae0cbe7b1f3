"""TPU-native multimodal topic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Ighina/MultimodalTopicSegmentation (ACM ICMR 2023): raw broadcast audio ->
unitization (VAD / uniform / sentence timings) -> pre-trained audio/text
encoders -> sequence taggers (BiLSTM, BiLSTM-CRF, local-attention
transformers) -> boundary decode -> Pk / WindowDiff / F1 / WinPR / B-measure.

Everything on the compute path is jitted JAX (lax.scan recurrences, Pallas
local-attention kernels, on-device Viterbi); the runtime around it (audio IO,
resampling) has a native C++ fast path in `runtime/`.
"""

__version__ = "0.1.0"
