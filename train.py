#!/usr/bin/env python
"""Entry point, CLI-parity with reference train.py: python train.py -s <scene>."""
from gsplat_tpu.cli.train import main

if __name__ == "__main__":
    main()
