import magnify_tpu.core.jaxcache  # noqa: F401  (enables persistent XLA cache)
from magnify_tpu.core.xd import DataArray, Dataset, Variable, concat

__all__ = ["DataArray", "Dataset", "Variable", "concat"]
