#!/usr/bin/env python
"""Entry point, CLI-parity with reference full_eval.py."""
from gsplat_tpu.cli.full_eval import main

if __name__ == "__main__":
    main()
