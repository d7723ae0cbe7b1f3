"""Unitization + label alignment (reference semantics).

Replicates the exact unit/label construction of
/root/reference/extract_embeddings.py:

- `create_uniform_segments` (:78-105): fixed- or adaptive-duration windows
  aligned to topic end-times, with the IndexError-append quirks kept;
- `create_vad_segments` (:28-76): assigns each VAD span to the topic whose
  end-time it crosses; last unit of each topic labelled 1; trailing spans
  appended as 0s with a final 1 (non-append mode);
- inference uniform units (extract_embeddings_inference.py:243-262):
  start = interval*i, end = interval*i + 1 SECOND — units are always one
  second long even under adaptive intervals (quirk kept, it defines the
  predict-path contract).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple


def create_uniform_segments(
    lab_times: Sequence[Tuple[float, float]],
    segment_duration: float = 1,
    append_labs: bool = False,
):
    segments: List[Tuple[float, float]] = []
    labs: list = []
    previous_time = 0
    for time in lab_times:
        diff = round(float(time[1])) - previous_time
        tot_segments = diff / segment_duration
        if append_labs:
            labs.append([0 for _ in range(round(tot_segments))])
            try:
                labs[-1][-1] = 1
            except IndexError:
                labs.append(1)
                segments.append((previous_time, float(time[1])))
        else:
            labs.extend([0 for _ in range(round(tot_segments))])
            try:
                labs[-1] = 1
            except IndexError:
                labs.append(1)
                segments.append((previous_time, float(time[1])))
        segments.extend(
            [
                (previous_time + segment_duration * i, previous_time + segment_duration * (i + 1))
                for i in range(round(tot_segments))
            ]
        )
        previous_time = round(float(time[1]))
    return segments, labs


def create_vad_segments(
    segmentation: Sequence,
    lab_times: Sequence,
    speechbrain: bool = False,
    append_labs: bool = False,
):
    """segmentation: list of spans; span end at index 1 (speechbrain-style
    (start, end)) or index 2 (INA-style (tag, start, end))."""
    end_index = 1 if speechbrain else 2
    index = 0
    segments, labs = [], []
    for time in lab_times:
        segment = []
        for seg in segmentation[index:]:
            index += 1
            segment.append(seg)
            if float(time[1]) < seg[end_index]:
                if segment:
                    break
        segments.append(segment)
        if append_labs:
            if len(segment) - 1 > 0:
                labs.append([0 for _ in range(len(segment) - 1)] + [1])
        else:
            labs.extend([0 for _ in range(len(segment) - 1)] + [1])

    deleted = 0
    if not append_labs:
        clean_segments = []
        for index_seg, seg in enumerate(segments):
            if not seg:
                labs.pop(index_seg - deleted)
                deleted += 1
            else:
                clean_segments.append(seg)
    else:
        clean_segments = segments

    if append_labs:
        if len(segments[-1]) > len(labs[-1]):
            labs[-1].extend([0 for _ in range(len(segmentation[index:]))])
    elif len(segmentation) > len(labs):
        labs.extend([0 for _ in range(len(segmentation[index:]))])
        labs[-1] = 1
    return clean_segments, labs


def inference_uniform_units(audio_length_s: float, interval: float):
    """[(start_s, end_s)] with the reference's 1-second unit quirk."""
    n = int(audio_length_s // interval)
    return [(interval * i, interval * i + 1) for i in range(n)]


def to_sample(sample_rate: int, time: float) -> int:
    return int(sample_rate * time)


def to_time(sample_rate: int, samples: int) -> float:
    return samples / sample_rate
