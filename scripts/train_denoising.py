#!/usr/bin/env python3
"""Fine-tune for the denoise task (reference: scripts/train_denoising.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _train_cli import run

if __name__ == "__main__":
    run("denoise", "outputs/models/denoising")
