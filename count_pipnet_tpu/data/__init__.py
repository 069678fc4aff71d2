from .registry import get_data, get_dataloaders, DATASET_RECIPES
from .datasets import (
    ImageFolder, TwoAugDataset, TransformedDataset, Subset, stratified_split,
)
from .loader import DataLoader, make_weighted_sample_weights

__all__ = [
    "get_data", "get_dataloaders", "DATASET_RECIPES",
    "ImageFolder", "TwoAugDataset", "TransformedDataset", "Subset",
    "stratified_split", "DataLoader", "make_weighted_sample_weights",
]
