#!/usr/bin/env python
"""Entry point: interactive web viewer for trained models (the
SIBR_gaussianViewer_app analogue)."""
from gsplat_tpu.cli.view import main

if __name__ == "__main__":
    main()
