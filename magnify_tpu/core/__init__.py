from magnify_tpu.core.xd import DataArray, Dataset, Variable, concat

__all__ = ["DataArray", "Dataset", "Variable", "concat"]
