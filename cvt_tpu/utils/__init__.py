"""Utilities: quality metrics, timers, profiling."""

from cvt_tpu.utils.metrics import recall_at_k, auc
from cvt_tpu.utils.timer import Timer
from cvt_tpu.utils.profile import (trace, chained_time, roofline,
                                   measure_launch_overhead)

__all__ = ["recall_at_k", "auc", "Timer", "trace", "chained_time",
           "roofline", "measure_launch_overhead"]
