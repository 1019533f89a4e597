#!/usr/bin/env python
"""Train a unet_zoo_tpu experiment (twin of reference train_model.py CLI).

Usage: python train.py phiseg_7_5_12 [--iterations N] [--log-root DIR]
"""
import sys

from unet_zoo_tpu.training.cli import train_main

if __name__ == "__main__":
    sys.exit(train_main())
