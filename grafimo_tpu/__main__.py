"""Module entry point: ``python -m grafimo_tpu <workflow> ...``."""

import sys

from grafimo_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
