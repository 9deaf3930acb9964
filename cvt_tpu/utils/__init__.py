"""Utilities: quality metrics, timers."""

from cvt_tpu.utils.metrics import recall_at_k, auc
from cvt_tpu.utils.timer import Timer

__all__ = ["recall_at_k", "auc", "Timer"]
