#!/usr/bin/env python3
"""Fine-tune for the sr_x4 task (reference: scripts/train_super_resolution.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _train_cli import run

if __name__ == "__main__":
    run("sr_x4", "outputs/models/super_resolution")
