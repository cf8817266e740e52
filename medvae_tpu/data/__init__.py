from medvae_tpu.data.medmnist import (
    DATASET_CHANNELS,
    MODALITY_NAMES,
    MedMNISTDataModule,
    MedMNISTSource,
    modality_index,
)
from medvae_tpu.data.pipeline import DeviceFeeder

__all__ = [
    "DATASET_CHANNELS",
    "MODALITY_NAMES",
    "MedMNISTDataModule",
    "MedMNISTSource",
    "modality_index",
    "DeviceFeeder",
]
