#!/usr/bin/env python
"""Convenience wrapper: `python sampling.py ...` == `python -m tsdiff_tpu.cli.sampling ...`
(same invocation style as the reference repo)."""
from tsdiff_tpu.cli.sampling import main

if __name__ == "__main__":
    main()
