"""IO subsystem: FRF compression, reports/logs, setup folders."""
from .compress import Compressor
from .report import write_report, write_log

__all__ = ["Compressor", "write_report", "write_log"]
