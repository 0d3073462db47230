#!/usr/bin/env python
"""Convenience wrapper: `python train.py ...` == `python -m tsdiff_tpu.cli.train ...`
(same invocation style as the reference repo)."""
from tsdiff_tpu.cli.train import main

if __name__ == "__main__":
    main()
