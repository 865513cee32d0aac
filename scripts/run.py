"""Thin shim — the CLI lives in cbinfer_tpu.cli (console script
`cbinfer`); this path is kept for `python scripts/run.py` workflows."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cbinfer_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
