from cmdiad_tpu.metrics.auroc import roc_auc_score  # noqa: F401
from cmdiad_tpu.metrics.au_pro import calculate_au_pro  # noqa: F401
