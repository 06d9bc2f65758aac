from grafimo_tpu.parallel.pipeline import (  # noqa: F401
    make_mesh,
    sharded_scan_step,
)
