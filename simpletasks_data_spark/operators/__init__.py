from .merge import MergeStepResult, merge_source

__all__ = ["MergeStepResult", "merge_source"]
