"""The component pipeline engine (layer L5).

An ordered list of named ``Dataset -> Dataset`` components folded over each
assay produced by a reader. Mirrors the engine in
/root/reference/src/magnify/pipeline.py:9-87: insertion by name/index/
first/last, duplicate-name rejection, and removal by name.
"""

from __future__ import annotations

from collections.abc import Callable

from magnify_tpu.core import registry as _registry

__all__ = ["Pipeline"]


class Pipeline:
    def __init__(self, reader: str):
        self.reader = _registry.readers.get(reader)()
        self.components: list[tuple[str, Callable]] = []

    def __call__(self, data):
        from magnify_tpu.diagnostics import stage_timer

        outputs = []
        with stage_timer("read"):
            assays = list(self.reader(data=data))
        for assay in assays:
            for name, comp in self.components:
                with stage_timer(name):
                    assay = comp(assay)
            outputs.append(assay)
        if len(outputs) == 1:
            return outputs[0]
        return outputs

    def add_pipe(
        self,
        component,
        name: str | None = None,
        after: str | int | None = None,
        before: str | int | None = None,
        first: bool = False,
        last: bool = False,
        **kwargs,
    ) -> None:
        if isinstance(component, str):
            name = component if name is None else name
            factory = _registry.components.get(component)
            func = factory(**kwargs)
        else:
            name = component.__name__ if name is None else name

            def func(xp, _c=component, _kw=kwargs):
                return _c(xp, **_kw)

        if after is None and before is None and not first and not last:
            last = True
        if (after is not None) + (before is not None) + first + last > 1:
            raise ValueError("Only one of after, before, first, and last can be set.")

        names = [n for n, _ in self.components]
        if name in names:
            raise ValueError(
                f"A component with the name '{name}' already exists in the pipeline."
            )

        if first:
            idx = 0
        elif last:
            idx = len(self.components)
        elif isinstance(before, int):
            idx = before
        elif isinstance(before, str):
            idx = names.index(before)
        elif isinstance(after, int):
            idx = after + 1
        elif isinstance(after, str):
            idx = names.index(after) + 1
        else:
            raise ValueError("before/after must be a string or int.")

        self.components.insert(idx, (name, func))

    def remove_pipe(self, name: str) -> None:
        if not self.components:
            raise ValueError(f"Cannot remove pipe '{name}': pipeline has no components")
        names = [n for n, _ in self.components]
        if name not in names:
            raise ValueError(f"Component '{name}' not found in pipeline")
        self.components.pop(names.index(name))
