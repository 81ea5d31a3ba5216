from .wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    feature_frame_lengths,
    masked_mean,
)
from .heads import NomadModel, l2_normalize, nomad_loss

__all__ = [
    "NomadModel",
    "Wav2Vec2Config",
    "Wav2Vec2Model",
    "feature_frame_lengths",
    "l2_normalize",
    "masked_mean",
    "nomad_loss",
]
