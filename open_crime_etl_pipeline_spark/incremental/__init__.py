from .ledger import RunLedger
from .reconcile import missing_load_dates, reconcile_replicas
from .watermark import decide_mode, incremental_window, read_watermark

__all__ = [
    "RunLedger",
    "missing_load_dates",
    "reconcile_replicas",
    "decide_mode",
    "incremental_window",
    "read_watermark",
]
