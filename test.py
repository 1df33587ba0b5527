#!/usr/bin/env python
"""Reference-compatible multi-checkpoint eval entry point
(see vfd_gan_tpu/cli/evaluate_models.py)."""
from vfd_gan_tpu.cli.evaluate_models import main

if __name__ == "__main__":
    main()
