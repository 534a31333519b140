"""Pipeline components (layer L4). Importing this package registers all
built-in components with the registry."""

from magnify_tpu.components import (  # noqa: F401
    filter,
    find,
    identify,
    postprocess,
    preprocess,
    quantify,
    stitch,
)
