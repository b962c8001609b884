"""Engine errors (mirrors /root/reference/src/lib.rs:47-53)."""


class EngineError(Exception):
    """Base error (analog of DataManagerError/StorageEngineError)."""


class MaxSizeAllocated(EngineError):
    """Storage cap would be exceeded by an ingest admission.

    Mirrors the reference's ``MaxSizeAllocated(u32)`` error raised when the
    1 TB on-disk cap would trip (/root/reference/src/lib.rs:51-52,
    /root/reference/src/data_manager.rs:229-239).
    """

    def __init__(self, attempted_bytes: int, cap_bytes: int):
        self.attempted_bytes = attempted_bytes
        self.cap_bytes = cap_bytes
        super().__init__(
            f"max size allocated: {attempted_bytes} > cap {cap_bytes}"
        )


class ChunkConflict(EngineError):
    """Write-write conflict on the metadata log (analog of the reference's
    commit-time conflict detection, /root/reference/src/rocksdb_storage_engine.rs:151-174)."""
