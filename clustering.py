#!/usr/bin/env python
"""Convenience wrapper: `python clustering.py ...` == `python -m tsdiff_tpu.cli.clustering ...`
(same invocation style as the reference repo)."""
from tsdiff_tpu.cli.clustering import main

if __name__ == "__main__":
    main()
