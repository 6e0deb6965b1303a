"""Endpointing rules (reference: src/aslp-online/online-endpoint.{h,cc}
— OnlineEndpointConfig with 5 OR'd rules over trailing silence,
utterance length and whether anything was decoded)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from kaldi_aslp_tpu.utils.config import Config


@dataclasses.dataclass
class EndpointRule:
    must_contain_nonsilence: bool
    min_trailing_silence_s: float
    max_relative_cost: float = float("inf")
    min_utterance_length_s: float = 0.0


@dataclasses.dataclass
class OnlineEndpointConfig(Config):
    silence_phones: str = "1"
    frame_shift_s: float = 0.01
    # defaults mirror the reference's rule set (online-endpoint.h)
    rule1_min_trailing_silence: float = 5.0   # nothing decoded yet
    rule2_min_trailing_silence: float = 0.5
    rule3_min_trailing_silence: float = 1.0
    rule4_min_trailing_silence: float = 2.0
    rule5_min_utterance_length: float = 20.0


def endpoint_detected(
    config: OnlineEndpointConfig,
    num_frames_decoded: int,
    trailing_silence_frames: int,
    decoded_something: bool,
) -> bool:
    """(reference: online-endpoint.cc EndpointDetected)."""
    if num_frames_decoded == 0:
        return False
    utt_s = num_frames_decoded * config.frame_shift_s
    sil_s = trailing_silence_frames * config.frame_shift_s
    rules = [
        EndpointRule(False, config.rule1_min_trailing_silence),
        EndpointRule(True, config.rule2_min_trailing_silence),
        EndpointRule(True, config.rule3_min_trailing_silence),
        EndpointRule(True, config.rule4_min_trailing_silence),
        EndpointRule(False, 0.0,
                     min_utterance_length_s=config.rule5_min_utterance_length),
    ]
    for rule in rules:
        if rule.must_contain_nonsilence and not decoded_something:
            continue
        if sil_s < rule.min_trailing_silence_s:
            continue
        if utt_s < rule.min_utterance_length_s:
            continue
        return True
    return False
