#!/usr/bin/env python
"""Entry point, CLI-parity with reference convert.py (COLMAP pipeline)."""
from gsplat_tpu.cli.convert import main

if __name__ == "__main__":
    main()
