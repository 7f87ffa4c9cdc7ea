"""`python -m pls_tpu` → the reference-compatible CLI (see cli.py)."""

import sys

from pls_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
