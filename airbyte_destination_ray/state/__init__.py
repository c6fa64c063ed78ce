from .manifest import ManifestStore, PartitionManifest

__all__ = ["ManifestStore", "PartitionManifest"]
