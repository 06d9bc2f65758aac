"""Module entry point: ``python -m grafimo_tpu <workflow> ...``."""

import os
import sys

from grafimo_tpu.cli import main

if __name__ == "__main__":
    rc = main()
    # The device-warmup daemon thread (ops/device.py) may still be inside
    # an XLA call when a workflow errors out early; normal interpreter
    # teardown kills daemon threads mid-native-code, which aborts with
    # "FATAL: exception not rethrown".  Flush and exit without teardown.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
