"""Migration helpers for users coming from the reference PyTorch stack."""

from medvae_tpu.compat.torch_import import (
    convert_state_dict,
    import_lightning_checkpoint,
)

__all__ = ["convert_state_dict", "import_lightning_checkpoint"]
