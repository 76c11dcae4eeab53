"""Built-in sources and source building blocks — mirrors the reference's
``dlt.sources`` namespace (``dlt/sources/__init__.py``): ``incremental``
and the resource/source types are importable from here as well as from
the package root."""

from ..incremental import Incremental, incremental  # noqa: F401
from ..pipeline.resources import (  # noqa: F401
    DltResource,
    DltSource,
    resource,
    source,
    transformer,
)
