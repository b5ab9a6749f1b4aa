import numpy as np

from strainer2_tpu.parallel.distributed import (
    host_file_partition,
    initialize,
    merge_across_hosts,
)


def test_initialize_single_process():
    assert initialize() == (0, 1)


def test_host_file_partition_covers_and_balances(tmp_path):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(13):
        p = tmp_path / f"f{i}.fa"
        p.write_bytes(b"x" * int(rng.integers(10, 10_000)))
        paths.append(str(p))
    shares = [host_file_partition(paths, h, 4) for h in range(4)]
    # disjoint and complete
    union = [p for s in shares for p in s]
    assert sorted(union) == sorted(paths)
    assert len(set(union)) == len(paths)
    # order within each share follows the original list order
    for s in shares:
        assert s == [p for p in paths if p in set(s)]


def test_merge_across_hosts_single_process_passthrough():
    counts = np.arange(100, dtype=np.uint32)
    np.testing.assert_array_equal(merge_across_hosts(counts), counts)
