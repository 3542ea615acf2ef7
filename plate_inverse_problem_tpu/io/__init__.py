"""IO subsystem: FRF compression, reports/logs, setup folders."""
from .compress import Compressor
from .report import write_report, write_log
from .checkpoint import save_checkpoint, load_checkpoint, checkpointed_optimize

__all__ = [
    "Compressor",
    "write_report",
    "write_log",
    "save_checkpoint",
    "load_checkpoint",
    "checkpointed_optimize",
]
