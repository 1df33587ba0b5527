#!/usr/bin/env python
"""Reference-compatible mp4->png dump tool (see vfd_gan_tpu/cli/frames.py)."""
from vfd_gan_tpu.cli.frames import main

if __name__ == "__main__":
    main()
