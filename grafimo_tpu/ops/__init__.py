from grafimo_tpu.ops.encode import seqs_to_codes  # noqa: F401
from grafimo_tpu.ops.score_jax import score_batch, score_and_histogram  # noqa: F401
from grafimo_tpu.ops.qvalue import fdr_bh, qvalues_from_histogram  # noqa: F401
