#!/usr/bin/env python
"""Evaluate a trained experiment (twin of reference test_model.py CLI).

Usage: python eval.py phiseg_7_5_12 --checkpoint best_loss [--generate-images]
"""
import sys

from unet_zoo_tpu.training.cli import eval_main

if __name__ == "__main__":
    sys.exit(eval_main())
