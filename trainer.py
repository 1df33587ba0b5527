#!/usr/bin/env python
"""Reference-compatible training entry point (see vfd_gan_tpu/cli/trainer.py)."""
from vfd_gan_tpu.cli.trainer import main

if __name__ == "__main__":
    main()
