from strainer2_tpu.index.build import StrainIndex, scan_file_codes
from strainer2_tpu.index.cuckoo import CuckooTable, build_cuckoo
from strainer2_tpu.index.hashing import cuckoo_slots, mix32

__all__ = [
    "StrainIndex",
    "scan_file_codes",
    "CuckooTable",
    "build_cuckoo",
    "cuckoo_slots",
    "mix32",
]
