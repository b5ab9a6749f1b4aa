from strainer2_tpu.ops.packing import (
    KmerWindows,
    canonical_windows,
    decode_codes_np,
    encode_ascii,
    encode_ascii_np,
    merge_code64_np,
    pack_windows,
    split_code64_np,
)

__all__ = [
    "KmerWindows",
    "canonical_windows",
    "decode_codes_np",
    "encode_ascii",
    "encode_ascii_np",
    "merge_code64_np",
    "pack_windows",
    "split_code64_np",
]
