from .hot import HotStore, committed_watermark, flush_hot, hybrid_read
from .manifest import ManifestTable, compact_partition_manifest, write_batch_manifest

__all__ = [
    "ManifestTable",
    "write_batch_manifest",
    "compact_partition_manifest",
    "HotStore",
    "hybrid_read",
    "flush_hot",
    "committed_watermark",
]
