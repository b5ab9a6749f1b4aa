from strainer2_tpu.io.batches import PackedBatch, pack_stream, max_reads_capacity
from strainer2_tpu.io.fastx import FastxRecord, open_maybe_gzip, read_fastx

__all__ = [
    "PackedBatch",
    "pack_stream",
    "max_reads_capacity",
    "FastxRecord",
    "open_maybe_gzip",
    "read_fastx",
]
