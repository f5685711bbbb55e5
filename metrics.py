#!/usr/bin/env python
"""Entry point, CLI-parity with reference metrics.py."""
from gsplat_tpu.cli.metrics import main

if __name__ == "__main__":
    main()
