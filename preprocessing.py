#!/usr/bin/env python
"""Convenience wrapper: `python preprocessing.py ...` == `python -m tsdiff_tpu.cli.preprocessing ...`
(same invocation style as the reference repo)."""
from tsdiff_tpu.cli.preprocessing import main

if __name__ == "__main__":
    main()
