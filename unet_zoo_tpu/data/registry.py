"""Dataset registry: names -> data classes (the twin of the reference's
data/data_switch.py:2-12 string dispatch; its dead 'acdc' branch is not
reproduced)."""

from __future__ import annotations

from typing import Any, Dict

from unet_zoo_tpu.data.lidc import LIDCData
from unet_zoo_tpu.data.uzh import UZHMatData, UZHProstateData
from unet_zoo_tpu.data.brats import BratsData

DATASETS: Dict[str, Any] = {
    "lidc": LIDCData,
    "uzh_prostate": UZHProstateData,
    "uzh_mat": UZHMatData,
    "brats": BratsData,
}


def data_switch(name: str):
    try:
        return DATASETS[name]
    except KeyError:
        raise ValueError(
            f"unknown dataset '{name}'; available: {sorted(DATASETS)}"
        ) from None
