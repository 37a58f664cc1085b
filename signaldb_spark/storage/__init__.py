from .manifest import ManifestTable, compact_partition_manifest, write_batch_manifest

__all__ = ["ManifestTable", "write_batch_manifest", "compact_partition_manifest"]
