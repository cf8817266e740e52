"""`_target_` instantiation (hydra.utils.instantiate equivalent).

The reference instantiates models and data modules from config via
`hydra.utils.instantiate(cfg.model)` (/root/reference/main.py:29,37) with targets
like ``src.models.BaseVAE``. We keep those YAML files loadable by mapping the
reference target strings onto the medvae_tpu classes; native
``medvae_tpu.*`` dotted paths import directly.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

# Reference-repo target strings → medvae_tpu dotted paths, so the original
# configs/ tree keeps working verbatim.
_COMPAT_TARGETS: Dict[str, str] = {
    "src.models.BaseVAE": "medvae_tpu.models.BaseVAE",
    "src.models.BetaVAE": "medvae_tpu.models.BetaVAE",
    "src.models.ConditionalVAE": "medvae_tpu.models.ConditionalVAE",
    "src.models.DisentangledConditionalVAE": "medvae_tpu.models.DisentangledConditionalVAE",
    "src.models.NLayerDiscriminator": "medvae_tpu.nn.NLayerDiscriminator",
    "src.data.MedMNISTDataModule": "medvae_tpu.data.MedMNISTDataModule",
}

_REGISTRY: Dict[str, Callable] = {}


def register_target(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


def _locate(target: str) -> Callable:
    if target in _REGISTRY:
        return _REGISTRY[target]
    target = _COMPAT_TARGETS.get(target, target)
    module_name, _, attr = target.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(cfg: Any, **extra_kwargs: Any) -> Any:
    """Build the object described by a config node with a ``_target_`` key.

    Non-dict nodes pass through; keys starting with ``_`` are treated as
    directives, everything else becomes constructor kwargs (nested ``_target_``
    nodes instantiate recursively).
    """
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        return cfg
    target = _locate(cfg["_target_"])
    kwargs = {}
    for k, v in cfg.items():
        if k.startswith("_"):
            continue
        if isinstance(v, dict) and "_target_" in v:
            v = instantiate(v)
        kwargs[k] = v
    kwargs.update(extra_kwargs)
    return target(**kwargs)
