from grafimo_tpu.models.motif import Motif, MotifSet  # noqa: F401
from grafimo_tpu.models.parse import load_motifs  # noqa: F401
