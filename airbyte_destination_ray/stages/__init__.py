from .lww import lww_compact, make_partitioner, make_partition_merger

__all__ = ["lww_compact", "make_partitioner", "make_partition_merger"]
