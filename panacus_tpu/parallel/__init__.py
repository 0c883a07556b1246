"""Multi-host / multi-device scale-out substrate.

The single-host multi-device path lives in ops/engine.py (item-sharded
membership matrix + shard_map dispatch); this package holds the
multi-host ingest side (parallel/ingest.py).
"""

from .ingest import (  # noqa: F401
    host_path_slice,
    init_distributed,
    merge_partials,
    partial_membership,
)
