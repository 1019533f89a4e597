"""Model registry: names → constructors (the TPU-native replacement for the
reference's executable-config `model = <class>` dispatch, train_model.py:34-42)."""

from __future__ import annotations

from typing import Any, Dict

from unet_zoo_tpu.models.unet import UNet
from unet_zoo_tpu.models.prob_unet import ProbUNet
from unet_zoo_tpu.models.phiseg import PHiSeg, REV_DEPTHS_3D


def _phiseg3d(**kw):
    kw.setdefault("rev_depths", REV_DEPTHS_3D)
    return PHiSeg(**kw)


MODELS: Dict[str, Any] = {
    "unet": UNet,
    "prob_unet": ProbUNet,
    "phiseg": PHiSeg,
    "phiseg3d": _phiseg3d,  # same generic net; 3D input rank + 3D rev depths
}


def get_model(name: str, **kwargs):
    try:
        return MODELS[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown model '{name}'; available: {sorted(MODELS)}") from None
