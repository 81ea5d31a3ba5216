from .data import (
    PairedAudioDataset,
    TripletBatch,
    TripletDataset,
    TripletLoader,
    collate_triplets,
)
from .losses import pairwise_distance, triplet_margin_loss
from .triplet import Training, param_labels

__all__ = [
    "PairedAudioDataset",
    "Training",
    "TripletBatch",
    "TripletDataset",
    "TripletLoader",
    "collate_triplets",
    "pairwise_distance",
    "param_labels",
    "triplet_margin_loss",
]
