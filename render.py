#!/usr/bin/env python
"""Entry point, CLI-parity with reference render.py."""
from gsplat_tpu.cli.render import main

if __name__ == "__main__":
    main()
