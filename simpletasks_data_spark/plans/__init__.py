from .history import HistorySpec, build_history
from .target import TargetTable
from .task import ImportJob

__all__ = ["ImportJob", "TargetTable", "HistorySpec", "build_history"]
